"""Sequence packing: the final stage of a pre-training data pipeline —
lay documents end-to-end into a token stream and chunk it into
fixed-size training windows (the GPT-style "concat and chunk" plan;
documents may span window boundaries).

Scale shape: a single global stream would need one total-order window
(single-partition sort — the classic scale killer), so the stream is
SHARDED first: shard = deterministic hash of doc_id, and each shard is
its own independent token stream packed by a per-shard cumulative sum
(Window.partitionBy(shard) — shuffle on shard, then a linear pass; with
n_shards >> cores this scales out like any keyed aggregate). Training
jobs consume shards independently, which is how packed corpora are laid
out in practice (one stream per output file/worker).

Everything is integer arithmetic over a deterministic order
(doc_id within shard), so the plan is reproducible across runs and
partitionings and the DuckDB oracle reproduces it byte-for-byte.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import token_count


def pack_shard(id_col: str = "doc_id", n_shards: int = 256, salt: str = "pack"):
    """Deterministic shard in [0, n_shards): first 3 hex nibbles of
    md5(id || salt) mod n_shards (conv() engine-side; the oracle mirrors
    with strpos nibble arithmetic, same value)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return F.pmod(F.conv(F.substring(h, 1, 3), 16, 10).cast("int"), F.lit(n_shards))


def pack_documents(
    docs: DataFrame,
    window: int = 2048,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: Optional[str] = None,
    salt: str = "pack",
) -> DataFrame:
    """The packing PLAN: (doc_id, shard, n_tokens, start_offset,
    bin_first, bin_last) — where in its shard's concatenated token
    stream each document starts, and which fixed-size training windows
    it touches (bin_first < bin_last ⇔ the document spans a boundary).
    Offsets are contiguous per shard by construction: start = exclusive
    per-shard running sum of token counts in doc_id order. Pass
    ``len_col`` to pack by a precomputed length (e.g. a real tokenizer's
    count); default derives whitespace/alnum token counts JVM-side."""
    dl = F.col(len_col).cast("long") if len_col else token_count(F.col(text_col)).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        pack_shard(id_col, n_shards, salt).alias("shard"),
        dl.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_offset")
    out = d.select("doc_id", "shard", "n_tokens", start)
    return out.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / window).cast("long").alias("bin_first"),
        F.floor(
            (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / window
        ).cast("long").alias("bin_last"),
    )


def packing_stats(plan: DataFrame, window: int = 2048) -> DataFrame:
    """Per-shard accounting: documents, tokens, full windows, and the
    tail remainder (the only padding the concat-and-chunk layout ever
    needs — at most window-1 tokens per SHARD, not per document, which
    is the whole point of packing)."""
    return plan.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.floor(F.sum("n_tokens") / window).cast("long").alias("full_windows"),
        (F.sum("n_tokens") % window).cast("long").alias("tail_tokens"),
    )
