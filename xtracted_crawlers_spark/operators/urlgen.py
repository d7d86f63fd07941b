"""Deterministic URL synthesis from TPC-H keys — the bridge that lets the
crawl operators (canonicalize / dedup / schedule / fetch-join) be
oracle-checked by DuckDB over the driver's shared parquet tables.

Both engines derive the identical URL string from an integer key:
  https://shop{key%50:05d}.example.test/dp/B0{upper(md5(key)[:8])}{?ref=x}
md5 is RFC-1321 in both engines, so url/url_id/host match byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_MOD = 50
QUERY_MOD = 3


def url_from_key(key: Column) -> Column:
    k = key.cast("long")
    url = F.concat(
        F.lit("https://shop"),
        F.lpad((k % HOST_MOD).cast("string"), 5, "0"),
        F.lit(".example.test/dp/B0"),
        F.upper(F.substring(F.md5(k.cast("string")), 1, 8)),
        F.when(k % QUERY_MOD == 0, F.lit("?ref=x")).otherwise(F.lit("")),
    )
    # Evaluation barrier (guide §4.4, the asNondeterministic trick for
    # JVM exprs): the constant-true nondeterministic guard leaves the
    # VALUE untouched but stops Catalyst from re-deriving the synthesis
    # inside filters it pushes below the input-spread exchange — without
    # it, a downstream filter on host/url_id is rewritten in terms of
    # the raw key and lands in the (single-row-group ⇒ ~1-task) scan
    # stage, where it re-runs md5+regex over every row 2-4× on one core
    # (measured: link_host_graph spent 4-8 s there; with the barrier the
    # synthesis runs once, in the spread stage). spark_partition_id —
    # not rand, whose [0,1) bounds Spark 4's optimizer constant-folds —
    # is nondeterministic-by-contract yet value-free here.
    return F.when(F.spark_partition_id() >= F.lit(0), url)


def url_id_from_key(key: Column) -> Column:
    """The canonical url_id of a synthesized URL, derived WITHOUT
    materializing the URL string (guide §2.3: shuffle keys, not
    payloads). Exactly equal to
    ``urlnorm.url_id(url_from_key(k))`` by construction: the synthesized
    path is ``/dp/B0`` + upper(md5(k)[:8]) and the ASIN regex
    ``/dp/((B0|BT)[A-Z0-9]{8})`` captures precisely those 10
    characters (uppercase hex ⊂ [A-Z0-9]; the regex stops before the
    optional ``?ref=x``, and ``/dp/`` occurs nowhere else). Queries
    whose OUTPUT is only the identity — dedup anti-joins, seen-set
    probes — use this to skip the concat+regexp round-trip and to
    shuffle 10-byte ids instead of 60-byte URLs; queries that exercise
    the canonicalization operator itself keep the real urlnorm path.
    Same evaluation barrier as url_from_key (see below)."""
    k = key.cast("long")
    uid = F.concat(
        F.lit("B0"), F.upper(F.substring(F.md5(k.cast("string")), 1, 8))
    )
    return F.when(F.spark_partition_id() >= F.lit(0), uid)


def sql_url_from_key(key_expr: str) -> str:
    """The DuckDB twin of url_from_key (ANSI-ish SQL string)."""
    return (
        f"'https://shop' || lpad(cast(({key_expr}) % {HOST_MOD} as varchar), 5, '0') "
        f"|| '.example.test/dp/B0' || upper(substr(md5(cast(({key_expr}) as varchar)), 1, 8)) "
        f"|| case when ({key_expr}) % {QUERY_MOD} = 0 then '?ref=x' else '' end"
    )


def urls_from(df: DataFrame, key_col: str) -> DataFrame:
    return df.select(
        F.col(key_col).cast("long").alias("k"), url_from_key(F.col(key_col)).alias("url")
    )
