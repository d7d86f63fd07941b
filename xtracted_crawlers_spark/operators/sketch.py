"""Count-min sketch: fixed-size, mergeable frequency summaries (Cormode
& Muthukrishnan, J. Algorithms 2005) as pure DataFrame ops.

Why a sketch when groupBy(term).count() is exact: the CMS table is d
rows x w columns REGARDLESS of cardinality, so it (a) merges cell-wise
across datasets/streams/snapshots without re-scanning them, (b) ships
to the driver or a dashboard at fixed cost, and (c) answers point
frequency queries with a one-sided error (estimate >= truth, over by
at most ~N/w with probability 1-(1/2)^d) — the heavy-hitter monitor
for hot hosts/terms over a 100 TB stream where keeping the exact
per-key table is the thing you're trying to avoid.

Determinism/oracle: the hash is nibbles of md5(key || 'cms' || row)
mapped to an integer column index via strpos arithmetic — byte-exact in
DuckDB, so the sketch CELLS, the estimates, and the over-estimation
guarantee are all contract-checkable. Everything is JVM/SQL expression
work: one explode over d rows + one aggregate to build; a broadcast
join + min to query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEXCHARS = "0123456789abcdef"


def cms_col_index(key: Column, row: int, w_hex: int) -> Column:
    """Column index in [0, 16^w_hex) for hash row ``row``: the first
    w_hex nibbles of md5(key || 'cms' || row). Engine uses conv(hex,16,10);
    the DuckDB oracle mirrors the same VALUE with per-nibble strpos
    arithmetic (md5 is RFC 1321 in both engines)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"cms{row}")))
    return F.conv(F.substring(h, 1, w_hex), 16, 10).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str = "term",
    d: int = 3,
    w_hex: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, col, cnt): the d x 16^w_hex sketch of key frequencies
    (optionally weighted). ONE scan of the input: each row explodes a
    d-element literal array of (row, col) structs (a union of d selects
    would plan d independent scans of the source), then one aggregate
    with map-side combine; only non-zero cells are stored."""
    weight = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_col_index(F.col(key_col), i, w_hex).alias("col"),
            )
            for i in range(d)
        ]
    )
    stacked = df.select(F.explode(cells).alias("_rc"), weight.alias("_w")).select(
        F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"), "_w"
    )
    return stacked.groupBy("row", "col").agg(F.sum("_w").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the sketch of the union of the inputs, without
    touching either input again. Requires identical (d, w_hex)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str = "term",
    d: int = 3,
    w_hex: int = 3,
) -> DataFrame:
    """probes + ``est``: min over the d cells each key hashes to (absent
    cell = 0). The sketch side is at most d*16^w_hex rows — broadcast."""
    pr = probes.select(key_col).distinct()
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_col_index(F.col(key_col), i, w_hex).alias("col"),
            )
            for i in range(d)
        ]
    )
    stacked = pr.select(F.col(key_col), F.explode(cells).alias("_rc")).select(
        key_col, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col")
    )
    joined = stacked.join(F.broadcast(cms), ["row", "col"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("cnt").cast("long").alias("est"))


def distinct_sketch(
    df: DataFrame,
    key_col: str,
    by: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count sketches (Spark's built-in Apache
    DataSketches HLL): one fixed-size binary sketch per ``by`` group —
    e.g. distinct URLs per host across a whole crawl, accumulated round
    by round with ``distinct_merge`` instead of ever re-scanning (or
    holding) the key sets. Pytest-validated (no DuckDB oracle: the
    sketch bytes are DataSketches-internal; accuracy and the
    merge==whole property are asserted instead — the contract README
    lists this operator as pytest-covered)."""
    keys = by or []
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch")
    )


def distinct_estimate(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """(by..., n_distinct): point estimates off the sketches (±~2% at
    the default lg_k=12)."""
    keys = by or []
    return sketches.select(
        *keys, F.hll_sketch_estimate("sketch").cast("long").alias("n_distinct")
    )


def distinct_merge(a: DataFrame, b: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Group-wise union of two sketch tables — the sketch of the union
    of the underlying key sets, at fixed size, without touching either
    input again (the cross-round accumulation path)."""
    keys = by or []
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def cms_heavy_hitters(
    cms: DataFrame,
    candidates: DataFrame,
    threshold: int,
    key_col: str = "term",
    d: int = 3,
    w_hex: int = 3,
) -> DataFrame:
    """Candidates whose estimated frequency reaches threshold. One-sided
    error means NO true heavy hitter is ever missed; rare collision
    over-counts can admit a light key (callers re-check exactly if that
    matters — same prune-then-verify contract as the seen-set)."""
    return cms_estimate(cms, candidates, key_col, d, w_hex).filter(
        F.col("est") >= F.lit(threshold)
    )
