"""Partitioned cuckoo filter: the deletion-capable twin of seen.py's
bloom (north_rule: "partitioned bloom/cuckoo-filter URL-seen set").

Where the bloom only ever grows, a cuckoo filter supports DELETE — which
is what a sliding-window seen set needs: a crawl that re-visits URLs
after an expiry window (refresh_stale / recurring ingest) can retire old
entries instead of rebuilding the filter, the pattern the AMQ-over-
sliding-windows literature motivates (see seen.py's citation). Same
architecture and same safety contract as the bloom:

- AUTHORITY is always the exact anti-join; the filter only PRUNES.
  A probe "no" is definitive; a "maybe" goes through the exact join.
- Partitioned into n_buckets by the same 64-bit key hash, one cuckoo
  TABLE per partition (binary column), built/probed inside Arrow
  batches via applyInPandas/mapInPandas — scales out, no driver bytes.
- JVM-side hashing (xxhash64); the Python kernel does integer
  arithmetic only.

Per-partition table: ``n_slots`` buckets x ``slots`` (default 4)
uint16 fingerprints, 0 = empty. fp = (h2 mod 65535) + 1 (never 0);
home bucket i1 = h1 mod n_slots, alternate i2 = i1 XOR perm(fp)
(partial-key cuckoo hashing, Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14). Insert kicks like the paper (bounded
relocations, sequential per partition — a BUILD cost); probes and
deletes are membership checks over two buckets.

Kick-exhausted fingerprints (the displaced victim of a failed chain —
NOT necessarily the new key) go to a per-partition STASH that probes
and deletes consult alongside the table, so an over-full filter
degrades in size and FPR but never produces a false negative.

Persistence: (bucket, table, stash, n_slots, slots) commits through
the snapshot catalog like the bloom table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .seen import with_bloom_keys

CUCKOO_SCHEMA = "bucket int, table binary, stash binary, n_slots long, slots int"
_MAX_KICKS = 500


def _fp(h2: np.ndarray) -> np.ndarray:
    return (h2.astype(np.uint64) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _alt(i: np.ndarray, fp: np.ndarray, n_slots: int) -> np.ndarray:
    """Alternate bucket: i XOR (fp * odd-constant) mod n_slots (power of
    two), the standard partial-key displacement."""
    return (i ^ (fp.astype(np.uint64) * np.uint64(0x5BD1E995))) % np.uint64(n_slots)


def _table_size(expected: int, slots: int, load: float) -> int:
    n = max(16, int(expected / (slots * load)))
    p = 1
    while p < n:
        p <<= 1
    return p


def _insert_all(tab: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> list[int]:
    """Sequential cuckoo insert with kick-out. Returns the fingerprints
    that could NOT be placed after _MAX_KICKS relocations (table over
    capacity). Note the homeless fingerprint after a kick chain is a
    displaced VICTIM, not necessarily the new key — it must go to the
    caller's stash, never be dropped, or an already-inserted key would
    probe 'definitely new' and break the no-false-negatives contract."""
    n_slots, slots = tab.shape
    rng_state = np.uint64(0x9E3779B97F4A7C15)
    homeless: list[int] = []
    fps = _fp(h2)
    i1s = h1.astype(np.uint64) % np.uint64(n_slots)
    for j in range(len(fps)):
        fp = fps[j]
        i = i1s[j]
        placed = False
        for _ in range(_MAX_KICKS):
            row = tab[int(i)]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                placed = True
                break
            # kick a deterministic victim slot (derived from the state so
            # builds are reproducible), swap and move to its alternate
            rng_state = (rng_state * np.uint64(6364136223846793005) + np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            v = int(rng_state % np.uint64(slots))
            fp, row[v] = row[v], fp
            i = _alt(np.uint64(i), np.uint16(fp), n_slots)
        if not placed:
            homeless.append(int(fp))
    return homeless


def _read_state(state: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, int, int]:
    n_slots = int(state["n_slots"].iloc[0])
    slots = int(state["slots"].iloc[0])
    tab = np.frombuffer(state["table"].iloc[0], dtype=np.uint16).reshape(
        n_slots, slots
    ).copy()
    stash = np.frombuffer(state["stash"].iloc[0], dtype=np.uint16).copy()
    return tab, stash, n_slots, slots


def _state_row(bucket: int, tab: np.ndarray, stash: np.ndarray, n_slots: int, slots: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": [bucket],
            "table": [tab.tobytes()],
            "stash": [stash.astype(np.uint16).tobytes()],
            "n_slots": [n_slots],
            "slots": [slots],
        }
    )


def build_cuckoo(
    keys: DataFrame,
    n_buckets: int = 64,
    expected_per_bucket: int = 100_000,
    slots: int = 4,
    load: float = 0.84,
) -> DataFrame:
    """keys (user_id, job_id, url_id) → one cuckoo table per partition,
    for EVERY one of the n_buckets partitions (cogroup against the full
    bucket range) — merge_cuckoo and delete_cuckoo rely on every bucket
    having state, otherwise keys hashing to an absent bucket would be
    silently lost and later probe as false negatives. Kick-exhausted
    fingerprints land in the per-partition stash (probed alongside the
    table), so overfilling degrades FPR/size, never correctness."""
    n_slots = _table_size(expected_per_bucket, slots, load)
    hashed = with_bloom_keys(keys, n_buckets).select("bloom_bucket", "h1", "h2")
    ids = keys.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bloom_bucket")
    )

    def make(key, _ids: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        tab = np.zeros((n_slots, slots), dtype=np.uint16)
        homeless: list[int] = []
        if len(pdf):
            homeless = _insert_all(tab, pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
        return _state_row(
            int(key[0]), tab, np.array(homeless, dtype=np.uint16), n_slots, slots
        )

    return (
        ids.groupBy("bloom_bucket")
        .cogroup(hashed.groupBy("bloom_bucket"))
        .applyInPandas(make, CUCKOO_SCHEMA)
    )


def merge_cuckoo(cuckoo: DataFrame, new_keys: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Insert new keys into the touched partitions (cogroup join);
    untouched partitions pass through byte-identical. Kick-exhausted
    fingerprints (new keys OR displaced victims) append to the stash —
    repeated merges past the sized load degrade lookup cost and FPR,
    never the no-false-negatives contract."""
    hashed = with_bloom_keys(new_keys, n_buckets).select("bloom_bucket", "h1", "h2")

    def fold(key, state: pd.DataFrame, add: pd.DataFrame) -> pd.DataFrame:
        if len(state) == 0:
            # build_cuckoo materializes ALL buckets, so this can only be
            # an n_buckets mismatch between build and merge — data loss
            # if ignored; fail the job instead
            raise ValueError(
                f"cuckoo merge: no state for bucket {int(key[0])} "
                "(n_buckets differs from build_cuckoo?)"
            )
        tab, stash, n_slots, slots = _read_state(state)
        if len(add):
            homeless = _insert_all(tab, add["h1"].to_numpy(), add["h2"].to_numpy())
            if homeless:
                stash = np.concatenate([stash, np.array(homeless, dtype=np.uint16)])
        return _state_row(int(key[0]), tab, stash, n_slots, slots)

    return (
        cuckoo.groupBy(F.col("bucket"))
        .cogroup(hashed.groupBy(F.col("bloom_bucket")))
        .applyInPandas(fold, CUCKOO_SCHEMA)
    )


def delete_cuckoo(cuckoo: DataFrame, keys: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Remove ONE fingerprint occurrence per key from its two candidate
    buckets — the sliding-window retirement path. Deleting a key that
    was never inserted is UNSAFE for cuckoo filters in general (it can
    erase another key's fingerprint); callers delete exactly what they
    inserted (the retired snapshot's keys), which is what the catalog
    guarantees here."""
    hashed = with_bloom_keys(keys, n_buckets).select("bloom_bucket", "h1", "h2")

    def fold(key, state: pd.DataFrame, rm: pd.DataFrame) -> pd.DataFrame:
        if len(state) == 0:
            raise ValueError(
                f"cuckoo delete: no state for bucket {int(key[0])} "
                "(n_buckets differs from build_cuckoo?)"
            )
        tab, stash, n_slots, slots = _read_state(state)
        if len(rm):
            fps = _fp(rm["h2"].to_numpy())
            i1s = rm["h1"].to_numpy().astype(np.uint64) % np.uint64(n_slots)
            for j in range(len(fps)):
                fp = fps[j]
                removed = False
                for i in (i1s[j], _alt(i1s[j], fp, n_slots)):
                    row = tab[int(i)]
                    hit = np.where(row == fp)[0]
                    if len(hit):
                        row[hit[0]] = 0
                        removed = True
                        break
                if not removed and len(stash):
                    hit = np.where(stash == fp)[0]
                    if len(hit):
                        stash = np.delete(stash, hit[0])
        return _state_row(int(key[0]), tab, stash, n_slots, slots)

    return (
        cuckoo.groupBy(F.col("bucket"))
        .cogroup(hashed.groupBy(F.col("bloom_bucket")))
        .applyInPandas(fold, CUCKOO_SCHEMA)
    )


def cuckoo_maybe_seen(
    candidates: DataFrame, cuckoo: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """candidates + boolean ``maybe_seen``: fingerprint present in either
    candidate bucket. Vectorized probe (no per-row Python loop); the
    filter tables join in by partition — same shape as
    seen.bloom_maybe_seen, so it drops into dedup_new_urls' slot."""
    hashed = with_bloom_keys(candidates, n_buckets)

    def probe(key, cand: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(columns=list(cand.columns) + ["maybe_seen"])
        out = cand.copy()
        if len(state) == 0:
            # build_cuckoo materializes ALL buckets, so candidates landing
            # in a stateless bucket can only mean an n_buckets mismatch
            # between build and probe; returning maybe_seen=False here
            # would be a silent FALSE NEGATIVE for every such key — fail
            # loudly, matching the merge/delete guards
            raise ValueError(
                f"cuckoo probe: no state for bucket {int(key[0])} "
                "(n_buckets differs from build_cuckoo?)"
            )
        tab, stash, n_slots, slots = _read_state(state)
        fps = _fp(cand["h2"].to_numpy())
        i1 = cand["h1"].to_numpy().astype(np.uint64) % np.uint64(n_slots)
        i2 = _alt(i1, fps, n_slots)
        hit1 = (tab[i1.astype(np.int64)] == fps[:, None]).any(axis=1)
        hit2 = (tab[i2.astype(np.int64)] == fps[:, None]).any(axis=1)
        hits = hit1 | hit2
        if len(stash):
            hits = hits | np.isin(fps, stash)
        out["maybe_seen"] = hits
        return out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in hashed.schema.fields
    ) + ", maybe_seen boolean"
    return (
        hashed.groupBy(F.col("bloom_bucket"))
        .cogroup(cuckoo.groupBy(F.col("bucket")))
        .applyInPandas(probe, schema)
        .drop("h1", "h2", "bloom_bucket")
    )
