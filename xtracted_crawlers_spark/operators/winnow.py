"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).

Local document fingerprinting with a GUARANTEE the repo's other
fingerprint ops don't give: any shared substring of at least w+k-1
tokens between two documents produces at least one IDENTICAL selected
fingerprint in both (the winnowing theorem), while only ~2/(w+1) of
all k-gram hashes are kept.  That makes it the standard tool for
partial-overlap detection — quotation, boilerplate reuse, plagiarism —
where whole-doc hashes (textops.fingerprint) miss and MinHash only
estimates global similarity.

Selection rule: hash every k-gram, slide a window of w consecutive
hashes, keep the minimum of each window, dedup per document.  Hashes
are md5 hex STRINGS compared lexicographically — the repo-wide
convention (see operators/dedup.py): both engines implement RFC-1321
md5 byte-identically, so the DuckDB oracle reproduces every selected
fingerprint exactly, and a uniform hash is order-equivalent under hex
lexicographic and numeric comparison.

Scale shape (100 TB): tokenize → k-gram → hash → window-min → dedup is
ONE map-only projection per document (nested higher-order array
functions, no explode before selection, no Python); per-row memory is
bounded by document length.  The only shuffles are whatever the caller
does with the selected (doc_id, fp) rows — typically a fp groupBy
(vocabulary-sized) or an equi self-join on fp to find overlapping doc
pairs, both orders of magnitude smaller than the corpus because of the
2/(w+1) thinning.

The reference crawler has no fingerprinting; this extends the dedup
family of the training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators.collocations import words_array


def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def kgram_hashes(toks: Column, k: int) -> Column:
    """md5 hex of every k-gram (space-joined) of a token array —
    positions 1..len-k+1; empty when the doc has fewer than k tokens."""
    n_grams = F.size(toks) - F.lit(k - 1)
    return F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(_empty_str_array())


def window_minima(hashes: Column, w: int) -> Column:
    """Minimum of each window of w consecutive hashes, deduped —
    the winnowing selection; empty when there are fewer than w hashes."""
    n_wins = F.size(hashes) - F.lit(w - 1)
    return F.array_distinct(
        F.when(
            n_wins >= 1,
            F.transform(
                F.sequence(F.lit(1), n_wins),
                lambda j: F.array_min(F.slice(hashes, j, w)),
            ),
        ).otherwise(_empty_str_array())
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp) — the selected winnowing fingerprints per document
    (distinct within a document). Docs shorter than w+k-1 tokens yield
    no rows.

    Still ONE map-only pass, but in TWO chained projections: the k-gram
    hash array is materialized into a named column before the window-min
    transform consumes it. Passing the k-gram expression inline instead
    makes the window lambda's ``slice(hashes, j, w)`` re-evaluate the
    whole hash-array subtree per window position — O(n²) md5 per
    document (measured r6 at sf0.1: 8.6 s → 0.36 s for the selection
    pass). Same trap class as guide §4.4's duplicated-UDF pushdown:
    lambda bodies are not subexpression-eliminated, so never hand a
    higher-order function an expensive unnamed child."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        kgram_hashes(words_array(F.col(text_col)), k).alias("_h"),
    )
    fps = window_minima(F.col("_h"), w)
    return staged.select("doc_id", F.explode(fps).alias("fp"))


def overlap_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    fp_cap: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) for doc_a < doc_b — document pairs
    sharing at least ``min_shared`` selected fingerprints: the MOSS
    match step, i.e. the near-dup / partial-overlap candidate
    generator built on :func:`winnow_fingerprints` output.

    Skew guard: a fingerprint selected by d documents emits C(d, 2)
    pairs, and boilerplate (headers, license blocks) is selected by
    essentially every page that carries it — so fingerprints shared by
    more than ``fp_cap`` documents are dropped BEFORE the self-join
    (same O(d²) containment as the co-citation hub cap; a fingerprint
    that common is boilerplate, not an overlap signal).  Join volume is
    then ≤ |kept fps| × C(fp_cap, 2), and pair counting partially
    aggregates map-side before its shuffle.

    The same pre-aggregate also drops SINGLETON fingerprints (d < 2)
    before the join: a fingerprint selected by one document can join
    only with itself, which ``doc_a < doc_b`` discards anyway — and in
    a real corpus most selected fingerprints are singletons, so the
    self-join input shrinks by that whole fraction for free (r5 verdict
    follow-up; sound for every ``min_shared``).
    """
    # Materialize the (doc_id, fp) input once (r6, the co-citation
    # lesson): the skew-guard aggregate AND both differently-aliased
    # sides of the self-join consume `fps`, and aliased projections
    # defeat exchange reuse — with `fps` typically the full winnowing
    # projection (per-window md5 minima), an unmaterialized input re-ran
    # that kernel three times. The checkpoint holds only the selected
    # fingerprints (~n_tokens/w rows per doc).
    fps = fps.select("doc_id", "fp").localCheckpoint()
    kept_fps = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_d"))
        .filter((F.col("_d") >= 2) & (F.col("_d") <= fp_cap))
        .select("fp")
    )
    kept = fps.join(kept_fps, "fp")
    a = kept.select("fp", F.col("doc_id").alias("doc_a"))
    b = kept.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def shared_fingerprints(fps: DataFrame) -> DataFrame:
    """(fp, n_docs) — how many documents selected each fingerprint;
    n_docs >= 2 marks verbatim k-token overlap between documents.
    Input rows are (doc_id, fp) unique per doc, so count(*) counts
    documents."""
    return fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
