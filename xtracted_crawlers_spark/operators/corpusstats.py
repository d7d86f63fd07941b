"""Corpus growth statistics: the Heaps-law vocabulary curve.

Heaps' law (V ≈ K·nᵝ, β≈0.5) says vocabulary grows sublinearly with
corpus size; a corpus whose measured curve bends the wrong way is a
red flag (template spam inflates tokens without vocabulary; botched
dedup inflates both in lockstep).  This operator measures the curve
exactly: for each of ``n_buckets`` cumulative prefixes of the corpus,
how many documents, how many running tokens, and how many DISTINCT
terms have been seen so far.

Prefixes are defined by **id range**, not row count: bucket k covers
doc_id ≤ k/n · max(doc_id).  Range cutoffs need no global sort — the
alternative (ntile) is a single-partition window over every document,
a non-starter at 10^10 docs.  With ids assigned in crawl order (this
engine's seq assignment does exactly that) id-range prefixes ARE
chronological prefixes.

Everything is exact integer arithmetic, so the result is bit-stable
and hash-exact against a SQL oracle:

- per-term ``first_doc = min(doc_id)`` — the term joins the vocabulary
  in the first prefix containing that doc (vocabulary-sized shuffle,
  the big one, map-side combined);
- per-doc token counts (map-only) → per-bucket sums;
- cumulative sums run over exactly ``n_buckets`` rows, so the final
  ordered window is bounded by a constant, not by data size.

max(doc_id) is attached by a one-row cross join (no separate action;
the whole thing stays one lazy plan).

The reference crawler has no corpus analytics; this is part of the
training-data-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators.collocations import words_array


def corpus_report(
    docs: DataFrame,
    n_buckets: int = 10,
    top_collocations: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """One-shot corpus quality report (driver-side dict of small
    aggregates — every collect here is a bounded handful of rows):

    - ``heaps``: the vocabulary growth curve (n_buckets rows) plus the
      final totals (docs / tokens / vocab);
    - ``collocations``: top PMI word pairs — keyword-spam corpora show
      flat lift, natural language shows strong collocations;
    - ``winnow``: fingerprint census — total selected fingerprints,
      how many are shared by >=2 docs, and the max share count
      (near-duplicate / boilerplate pressure).

    Composes :func:`heaps_curve`, collocations.pmi_collocations and
    operators.winnow; each underlying job is the scale-shaped plan its
    own module documents.
    """
    from xtracted_crawlers_spark.operators import collocations, winnow

    curve = [
        {
            "bucket": r["bucket"],
            "cutoff_id": r["cutoff_id"],
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "vocab": r["vocab"],
        }
        for r in heaps_curve(docs, n_buckets=n_buckets, id_col=id_col, text_col=text_col)
        .orderBy("bucket")
        .collect()
    ]
    total = curve[-1] if curve else {"n_docs": 0, "n_tokens": 0, "vocab": 0}
    colls = [
        {"w1": r["w1"], "w2": r["w2"], "n_pair": r["n_pair"], "lift": r["lift"]}
        for r in collocations.pmi_collocations(
            docs, text_col=text_col, min_count=5, top_k=top_collocations
        ).collect()
    ]
    fps = winnow.winnow_fingerprints(docs, id_col=id_col, text_col=text_col)
    census = winnow.shared_fingerprints(fps)
    fp_stats = census.agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_shared"),
        F.coalesce(F.max("n_docs"), F.lit(0)).alias("max_share"),
    ).collect()[0]
    return {
        "docs": total["n_docs"],
        "tokens": total["n_tokens"],
        "vocab": total["vocab"],
        "heaps": curve,
        "collocations": colls,
        "winnow": {
            "fingerprints": fp_stats["n_fp"],
            "shared_by_2plus_docs": int(fp_stats["n_shared"] or 0),
            "max_share": fp_stats["max_share"],
        },
    }


def heaps_curve(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cutoff_id, n_docs, n_tokens, vocab) for cumulative
    id-range prefixes 1..n_buckets of the corpus.

    bucket k's cutoff_id = floor(k * max_id / n_buckets); n_docs /
    n_tokens / vocab count documents, running token occurrences, and
    distinct terms among docs with id ≤ cutoff.  Bucket n_buckets is
    always the whole corpus.  Empty buckets (no new docs) still appear
    with the carried cumulative values.
    """
    did = F.col(id_col)
    maxid = docs.agg(F.max(did).cast("long").alias("_max_id"))

    # Which PREFIX BUCKET a doc id first falls into: smallest k with
    # id <= floor(k*max/n)  ⇔  k = ceil(id*n/max) in exact int math.
    def bucket_of(idc):
        # greatest(_max_id, 1): a single-document corpus with doc_id 0
        # has max_id 0, and ANSI mode turns the division into a job
        # abort. With max_id 0 every id is 0, so ceil(0/1)=0 → bucket 1
        # — the same bucket the limit of the guarded formula gives.
        return F.greatest(
            F.lit(1),
            F.ceil(
                idc.cast("long") * F.lit(n_buckets)
                / F.greatest(F.col("_max_id"), F.lit(1))
            ).cast("int"),
        )

    per_doc = (
        docs.select(did.alias("_id"), F.size(words_array(F.col(text_col))).alias("_ntok"))
        .crossJoin(maxid)
        .groupBy(bucket_of(F.col("_id")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_new_docs"),
            F.sum("_ntok").cast("long").alias("_new_tokens"),
        )
    )
    first_seen = (
        docs.select(did.alias("_id"), F.explode(words_array(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.min("_id").cast("long").alias("_first"))
        .crossJoin(maxid)
        .groupBy(bucket_of(F.col("_first")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("_new_vocab"))
    )
    buckets = (
        docs.sparkSession.range(1, n_buckets + 1)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(maxid)
        .select(
            "bucket",
            # floor() BEFORE the cast: Spark's double→long cast
            # truncates but DuckDB's rounds, so the oracle would drift
            # on any non-integral quotient without the explicit floor.
            F.floor(F.col("bucket").cast("long") * F.col("_max_id") / F.lit(n_buckets))
            .cast("long")
            .alias("cutoff_id"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        buckets.join(per_doc, "bucket", "left")
        .join(first_seen, "bucket", "left")
        .select(
            "bucket",
            "cutoff_id",
            F.sum(F.coalesce("_new_docs", F.lit(0))).over(w).alias("n_docs"),
            F.sum(F.coalesce("_new_tokens", F.lit(0))).over(w).alias("n_tokens"),
            F.sum(F.coalesce("_new_vocab", F.lit(0))).over(w).alias("vocab"),
        )
    )
