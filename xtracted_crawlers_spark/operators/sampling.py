"""Deterministic corpus sampling, source mixing, and dataset splits —
the reproducibility layer of a training-data pipeline. A 100 TB corpus
can't be sampled with rand(): a retried task would re-draw and change
the output, and no two runs would build the same dataset. Every
operator here instead keys the decision on a HASH of a stable row
identity, so membership is a pure per-row function: map-only (zero
shuffle), idempotent under retries, stable across runs/cluster sizes,
and any subset can be recomputed independently.

Mechanism: the first 12 hex chars of md5(key || salt) are a uniform
draw in [0, 16^12); comparing that SLOT STRING lexicographically
against a precomputed hex threshold avoids float conversion entirely,
which is what makes the DuckDB oracles byte-exact (md5 is RFC 1321 in
both engines; lowercase hex compares identically). Different salts give
independent draws — sampling and splitting the same corpus don't
correlate.

The reference engine has no sampling surface (its corpus is whatever
the crawl fetched) — this is new training-pipeline surface, per the
task brief's LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SLOT_HEX = 12  # 48 bits of the md5 — plenty below any corpus cardinality


def hex_threshold(frac: float) -> str:
    """Hex-string threshold t such that P(slot < t) == frac (up to
    2^-48). frac >= 1 returns 'g', which every hex slot sorts below."""
    if frac <= 0:
        return ""
    if frac >= 1.0:
        return "g"
    return format(int(frac * 16**_SLOT_HEX), f"0{_SLOT_HEX}x")


def hash_slot(key_col: Column | str, salt: str) -> Column:
    """The row's deterministic draw: 12 lowercase hex chars of
    md5(key || salt)."""
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string") if isinstance(key_col, str) else key_col.cast("string"), F.lit(salt))),
        1,
        _SLOT_HEX,
    )


def sample_fraction(
    df: DataFrame, frac: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~frac of rows, keyed on key_col. Map-only:
    the predicate evaluates inside the scan's whole-stage-codegen span
    (it is computed, so it does not reach PushedFilters, but it also
    never forces an exchange or a second pass)."""
    return df.filter(hash_slot(key_col, salt) < F.lit(hex_threshold(frac)))


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Source mixing: keep rows with per-group probabilities — the
    'sample Wikipedia at 3x, Common Crawl at 0.2x' step of a training
    mix, expressed as one per-row CASE over the group column (weights
    above 1.0 clamp to keep-all; up-sampling duplication is a separate
    concern). Groups absent from ``weights`` are DROPPED — a mix is an
    allow-list. Zero shuffle, fully reproducible."""
    thr: Column = F.lit("")
    for g in sorted(weights):  # fixed order; keys are distinct anyway
        thr = F.when(F.col(group_col) == g, F.lit(hex_threshold(weights[g]))).otherwise(thr)
    return df.filter(hash_slot(key_col, salt) < thr)


def split_assign(
    key_col: Column | str,
    fracs: tuple[float, float] = (0.9, 0.05),
    salt: str = "split",
) -> Column:
    """'train' / 'val' / 'test' assignment column: cumulative hex
    thresholds over one draw, so the three sets are disjoint and
    exhaustive BY CONSTRUCTION and membership never changes when the
    corpus grows (a new row hashes to its own slot; existing rows keep
    theirs — the property rand()-splits lack)."""
    t_train = hex_threshold(fracs[0])
    t_val = hex_threshold(min(1.0, fracs[0] + fracs[1]))
    slot = hash_slot(key_col, salt)
    return (
        F.when(slot < F.lit(t_train), F.lit("train"))
        .when(slot < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fracs: tuple[float, float] = (0.9, 0.05),
    salt: str = "split",
) -> DataFrame:
    """df + a 'split' column (see split_assign)."""
    return df.withColumn("split", split_assign(key_col, fracs, salt))


def sql_hash_slot(key_expr: str, salt: str) -> str:
    """DuckDB mirror of hash_slot for the contract oracles."""
    return f"substr(md5(cast({key_expr} as varchar) || '{salt}'), 1, {_SLOT_HEX})"


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256


def dsir_features(
    docs: DataFrame,
    n_buckets: int = _DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket): hashed unigram + bigram features WITH
    multiplicity — the DSIR feature map. Tokens are lowercased
    whitespace words; the bucket is the first 8 hex chars of the md5 of
    the feature string mod n_buckets (md5 so the DuckDB oracle
    reproduces every bucket bit-for-bit; 8 hex chars = 32 bits, far
    above any sane n_buckets). Map-side only: split + transform +
    explode, no shuffle."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(words, bigrams)
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(feats).alias("feat"))
        .filter(F.col("feat") != "")
        .select("doc_id", bucket.alias("bucket"))
    )


def dsir_logweights(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = _DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Per-document DSIR importance log-weight: for every hashed n-gram
    feature f in the doc, add log p_target(f) - log p_raw(f), where both
    distributions are add-one-smoothed bucket frequencies (target =
    ``target_docs``, raw = ``docs`` — the candidate pool itself, as in
    the paper's raw distribution). Documents whose feature profile looks
    more like the target than like the pool score > 0.

    Output: (doc_id, n_feats, dsir_logweight, selected) with
    selected = dsir_logweight > 0 — the importance-resampling keep set
    under the neutral threshold. For top-k selection compose with a
    window or threshold of the caller's choice.

    Plan at 100 TB: featurize is map-side; the two distribution builds
    are bucket-keyed aggregations whose output is n_buckets rows —
    driver-free, and the log-ratio table joins back as a BROADCAST
    (n_buckets ≤ thousands). The per-doc sum is one doc-keyed
    aggregation using the deterministic sorted fold (same device as
    bm25's exact_fold: equal buckets carry equal addends, so the sorted
    fold's float result is unique) — bit-reproducible for the oracle.
    """
    feats = dsir_features(docs, n_buckets, id_col=id_col, text_col=text_col)
    tfeats = dsir_features(target_docs, n_buckets, id_col=id_col, text_col=text_col)
    tcnt = tfeats.groupBy("bucket").agg(F.count("*").alias("ct"))
    rcnt = feats.groupBy("bucket").agg(F.count("*").alias("cr"))
    # totals as 1-row crossJoin (scalar agg), constant-folded identically
    # in the oracle; add-one smoothing over n_buckets cells
    tt = tfeats.agg(F.count("*").cast("double").alias("tt"))
    rt = feats.agg(F.count("*").cast("double").alias("rt"))
    lr = (
        rcnt.join(tcnt, "bucket", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("rt") + F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("bucket", "lr"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["lr"],
                ),
                round_dp,
            ).alias("dsir_logweight"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_feats",
        "dsir_logweight",
        (F.col("dsir_logweight") > 0).alias("selected"),
    )
