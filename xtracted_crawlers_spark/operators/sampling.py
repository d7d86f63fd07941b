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
