"""Corpus collocation extraction: PMI-ranked adjacent word pairs.

The classic corpus-statistics pass of an LLM data pipeline (Church &
Hanks 1990, pointwise mutual information): which adjacent word pairs
co-occur far more often than chance predicts?  Used for tokenizer-merge
seeding, multi-word-expression mining, and corpus-quality probes ("is
this natural language or keyword spam?" — spam has flat PMI).

Scale shape (100 TB): tokenization and bigram generation are map-only
column expressions over each document; the only shuffles are two
vocabulary-sized groupBys (Heaps' law keeps count tables tiny relative
to the corpus) and two joins keyed on single words — both join inputs
are count tables, never documents.  The corpus-total token count is a
one-row aggregate attached by a single-row cross join.  The final top-k
is `orderBy().limit(k)` = TakeOrdered (per-partition heap + driver
merge of k rows), never a materialized global sort.

PMI ranking uses the exact lift ratio N*c(x,y) / (c(x)*c(y)) instead of
its logarithm: log is monotone so the ranking is identical, and the
lift is a ratio of exact int64 products — IEEE-754 division is exactly
rounded, so Spark and the DuckDB oracle produce bit-identical doubles.
(ln() is NOT exactly rounded and may differ across libms; see the
repo-wide round(,4)-on-exact-arithmetic oracle convention.)

The reference crawler (jobomix/xtracted-crawlers) has no corpus
analytics; this operator is part of the training-data-pipeline surface
the engine adds (documented as new, no reference citation possible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word := maximal run of lowercase alphanumerics.  Lowering first makes
# the token set case-insensitive; punctuation splits (doesn't join)
# tokens, matching the DuckDB oracle's regexp_extract_all verbatim.
WORD_RE = r"[a-z0-9]+"


def words_array(text: Column) -> Column:
    """Lowercased word tokens of a document as an array column."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, n_w) corpus-wide token counts — one explode + one groupBy
    with map-side partial aggregation; output is vocabulary-sized."""
    return (
        docs.select(F.explode(words_array(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, n_pair) adjacent-pair counts.  Pair generation is a
    zero-shuffle zip of the word array with its own tail; the groupBy
    is bigram-vocabulary-sized."""
    ws = words_array(F.col(text_col))
    # greatest(len-1, 0): slice raises on a negative length, and a web
    # corpus always contains token-less documents (empty pages,
    # punctuation-only, non-Latin scripts).
    tail_len = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, 1, tail_len),
        F.slice(ws, 2, tail_len),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-k adjacent-pair collocations by PMI (ranked via the exact
    lift ratio — see module docstring).  `min_count` drops hapax pairs
    whose PMI is pure noise (the standard Church-Hanks guard).

    Output: (w1, w2, n_pair, n_w1, n_w2, lift), lift rounded to 4
    decimals after exactly-rounded integer-ratio division.  Ties in
    lift are broken by (w1, w2), so the k-boundary is deterministic.
    """
    uni = unigram_counts(docs, text_col)
    total = uni.agg(F.sum("n_w").alias("n_tokens"))
    big = bigram_counts(docs, text_col).filter(F.col("n_pair") >= min_count)
    scored = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(total)  # one row: the corpus token total
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            # cast each factor to double BEFORE multiplying: int64
            # products overflow near 1 TB of tokens (ANSI mode aborts
            # the job); double mults are exactly rounded, stay exact
            # below 2^53, and the DuckDB twin mirrors the same
            # association so the round(,4) values still match bitwise.
            F.round(
                (F.col("n_tokens").cast("double") * F.col("n_pair").cast("double"))
                / (F.col("n_w1").cast("double") * F.col("n_w2").cast("double")),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(top_k)
