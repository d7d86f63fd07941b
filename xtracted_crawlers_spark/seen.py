"""URL-seen set: partitioned bloom filter pre-filter + exact anti-join.

The reference's dedup gate is an exact SQL point lookup per URL
(crawlers_services.py:76-83, SURVEY.md §2 C2). At 10^10-URL scale a
per-URL lookup is impossible; the north_rule asks for a partitioned
bloom/cuckoo structure over canonicalized+hashed keys. Design:

- AUTHORITY is always the exact ``left_anti`` join on
  (user_id, job_id, url_id) — the bloom only PRUNES the join's left side.
  A bloom "no" is definitive (definitely new ⇒ skip the join); a bloom
  "maybe" goes through the exact join. False positives cost one join row,
  never a wrong answer.
- The filter is partitioned into 2^b buckets by the same hash that keys
  it, so each bucket's bit array stays small enough to build/probe inside
  one Arrow batch, build is a ``groupBy(bucket).applyInPandas`` (scales
  out), and incremental maintenance unions new keys into only the touched
  buckets.
- All hashing happens JVM-side (xxhash64 twice with different salt
  columns); the numpy kernel only does arithmetic on int64 arrays —
  no per-row Python hashing.

Persistence: the bucket table (bucket:int, bits:binary, m:long, k:int)
commits through the snapshot catalog like any other state table.

Background (PAPERS.md corpus): approximate-membership structures for
streaming dedup (e.g. "A Learned Cuckoo Filter for Approximate Membership
Queries over Variable-sized Sliding Windows on Data Streams", SIGMOD'23)
motivate the filter-prunes/exact-authority split used here — the filter
only spares join work, it never decides membership alone.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urlnorm import seen_key

BLOOM_SCHEMA = "bucket int, bits binary, m long, k int"


def _params(expected_per_bucket: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for a target false-positive rate."""
    n = max(expected_per_bucket, 16)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(128, (m + 63) // 64 * 64)  # round to whole words
    k = max(1, round(m / n * math.log(2)))
    return m, int(k)


def with_bloom_keys(df: DataFrame, n_buckets: int) -> DataFrame:
    """Attach (bloom_bucket, h1, h2) derived from the canonical identity.
    h1/h2 are independent 64-bit hashes (different salt literal); bit
    positions use double hashing h1 + i*h2."""
    k = seen_key("user_id", "job_id", "url_id")
    return (
        df.withColumn("h1", k)
        .withColumn("h2", F.xxhash64("user_id", "job_id", "url_id", F.lit("bloom-salt-2")))
        .withColumn("bloom_bucket", F.pmod(F.col("h1"), F.lit(n_buckets)).cast("int"))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(len, k) bit positions via double hashing, unsigned arithmetic."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)  # odd stride
    i = np.arange(k, dtype=np.uint64)
    return ((u1[:, None] + i[None, :] * u2[:, None]) % np.uint64(m)).astype(np.int64)


def build_bloom(
    keys: DataFrame,
    n_buckets: int = 64,
    expected_per_bucket: int = 100_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Build the partitioned bloom table from a key DataFrame that has
    user_id/job_id/url_id columns. One row per bucket."""
    m, k = _params(expected_per_bucket, fpp)
    hashed = with_bloom_keys(keys, n_buckets).select("bloom_bucket", "h1", "h2")

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        if len(pdf):
            pos = _positions(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), k, m).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bloom_bucket"].iloc[0]) if len(pdf) else -1],
                "bits": [bits.tobytes()],
                "m": [m],
                "k": [k],
            }
        )

    return hashed.groupBy("bloom_bucket").applyInPandas(make, BLOOM_SCHEMA)


def merge_bloom(bloom: DataFrame, new_keys: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Incrementally OR new keys into the touched buckets. FULL outer
    join: build_bloom materializes only buckets that held keys, so a new
    key can land in a bucket with no state row yet — a left join keyed
    on the bloom side would silently DROP it (a later probe would answer
    definitely-new: a false negative, the one thing the filter contract
    forbids). Absent buckets start from zero bits."""
    m_k = bloom.select("m", "k").first()
    m, k = int(m_k["m"]), int(m_k["k"])
    hashed = with_bloom_keys(new_keys, n_buckets).select(
        F.col("bloom_bucket").alias("bucket"), "h1", "h2"
    )
    joined = bloom.join(hashed, "bucket", "full")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        prior = pdf["bits"].dropna()
        bits = (
            np.frombuffer(prior.iloc[0], dtype=np.uint8).copy()
            if len(prior)
            else np.zeros(m // 8, dtype=np.uint8)
        )
        live = pdf[pdf["h1"].notna()]
        if len(live):
            pos = _positions(
                live["h1"].to_numpy(dtype=np.int64), live["h2"].to_numpy(dtype=np.int64), k, m
            ).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()], "m": [m], "k": [k]}
        )

    return joined.groupBy("bucket").applyInPandas(fold, BLOOM_SCHEMA)


def bloom_maybe_seen(candidates: DataFrame, bloom: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Adds boolean ``maybe_seen``: False ⇒ definitely new (bloom miss);
    True ⇒ must be checked by the exact anti-join."""
    hashed = with_bloom_keys(candidates, n_buckets)
    joined = hashed.join(
        F.broadcast(bloom.select(F.col("bucket").alias("bloom_bucket"), "bits", "m", "k")),
        "bloom_bucket",
        "left",
    )

    def probe(it):
        for pdf in it:
            out = pdf.drop(columns=["bits"])
            maybe = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                has = pdf["bits"].notna().to_numpy()
                if has.any():
                    sub = pdf[has]
                    # all rows in a partition may span buckets; probe per bucket group
                    for bits_bytes, grp in sub.groupby("bits", sort=False):
                        bits = np.frombuffer(bits_bytes, dtype=np.uint8)
                        m = int(grp["m"].iloc[0])
                        k = int(grp["k"].iloc[0])
                        pos = _positions(
                            grp["h1"].to_numpy(dtype=np.int64),
                            grp["h2"].to_numpy(dtype=np.int64),
                            k,
                            m,
                        )
                        hit = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
                        maybe[np.flatnonzero(has)[sub.index.get_indexer(grp.index)]] = hit
            out["maybe_seen"] = maybe
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.drop("bits").schema.fields
    ) + ", maybe_seen boolean"
    return joined.mapInPandas(probe, schema).drop("h1", "h2", "bloom_bucket", "m", "k")


def dedup_new_urls(
    candidates: DataFrame,
    frontier_keys: DataFrame,
    bloom: DataFrame | None = None,
    n_buckets: int = 64,
    probe=None,
) -> DataFrame:
    """C2 at scale: filter-pruned exact anti-join.

    candidates must carry user_id/job_id/url_id. Returns candidates that
    are NOT in the seen set. With a filter, only the maybe-seen slice pays
    the anti-join shuffle; definite-new rows bypass it. ``probe`` picks
    the filter kernel — bloom_maybe_seen (default) or
    cuckoo.cuckoo_maybe_seen; both flag a ``maybe_seen`` column and share
    the no-false-negative contract, so the anti-join stays the authority
    either way.
    """
    if bloom is None:
        return candidates.join(frontier_keys.select("user_id", "job_id", "url_id"),
                               ["user_id", "job_id", "url_id"], "left_anti")
    flagged = (probe or bloom_maybe_seen)(candidates, bloom, n_buckets)
    fresh = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = suspect.join(
        frontier_keys.select("user_id", "job_id", "url_id"),
        ["user_id", "job_id", "url_id"],
        "left_anti",
    )
    return fresh.unionByName(checked)
