"""CCNet-style language-model scoring: an add-one-smoothed unigram LM
trained on (or supplied to) the corpus scores every document by mean
token log-probability, and documents are bucketed head/middle/tail —
the perplexity-quality gate of the CCNet/CC-Net pipeline (Wenzek et
al., "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"), re-expressed as pure DataFrame ops.

Shapes, 100-TB first:
- training is one tokens explode + one aggregate (map-side combined);
  the LM is (term, logp) — corpus-vocabulary-sized, NOT broadcast: the
  score join shuffles on term like any postings join.
- scoring is postings ⋈ lm + one per-doc aggregate. With
  ``exact_fold`` the per-doc sum is a deterministic left fold in term
  order (the bm25/ANN-proven technique) so the DuckDB oracle
  reproduces the doubles bit-for-bit before the shared round(,4).
- bucketing has two paths: ``perplexity_buckets`` (production) compares
  each score against approx-quantile thresholds — map-only, no global
  sort; ``perplexity_buckets_exact`` (oracle/tests) ranks with a global
  window — exact terciles, single-partition sort, fine at oracle scale
  and documented as the non-scale path.

The reference engine has no LM surface — new training-pipeline
operators per the task brief.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .search import postings


def unigram_lm(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, logp): Laplace-smoothed unigram log-probabilities with an
    explicit OOV type — logp = ln((ctf + 1) / (n_tokens + vocab + 1)),
    so the seen terms plus the single reserved OOV slot
    (ln(1 / (n_tokens + vocab + 1)), see ``oov_logp``) form a PROPER
    distribution (mass exactly 1). All counts are integer-exact, the
    ratio is one correctly-rounded division, so both engines hand ln()
    the identical double."""
    p = postings(docs, id_col=id_col, text_col=text_col)
    counts = p.groupBy("term").agg(F.sum("tf").cast("double").alias("_ctf"))
    tot = counts.agg(
        F.sum("_ctf").alias("_n"), F.count(F.lit(1)).cast("double").alias("_v")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "term",
        F.log(
            (F.col("_ctf") + F.lit(1.0)) / (F.col("_n") + F.col("_v") + F.lit(1.0))
        ).alias("logp"),
    )


def oov_logp(n_tokens: int, vocab: int) -> float:
    """The reserved OOV slot's log-probability for a LM trained on
    n_tokens total tokens over vocab distinct terms."""
    import math

    return math.log(1.0 / (n_tokens + vocab + 1.0))


def doc_lm_scores(
    docs: DataFrame,
    lm: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_logp: Optional[float] = None,
    exact_fold: bool = False,
) -> DataFrame:
    """(doc_id, dl, score): mean token log-probability under the LM
    (self-trained when lm is None — then there is no OOV by
    construction), rounded to 4 decimals. Higher = more fluent under
    the LM = lower perplexity; perplexity itself is exp(-score), kept
    in log space to stay oracle-exact. External LMs must supply
    ``oov_logp`` (typically ln(1 / (n_tokens + vocab)) of the training
    corpus) for unseen terms."""
    p = postings(docs, id_col=id_col, text_col=text_col)
    if lm is None:
        lm = unigram_lm(docs, id_col=id_col, text_col=text_col)
        joined = p.join(lm, "term")
    else:
        if oov_logp is None:
            raise ValueError("external lm requires oov_logp for unseen terms")
        joined = p.join(lm, "term", "left").withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(oov_logp)))
        )
    contrib = (F.col("tf").cast("double") * F.col("logp")).alias("contrib")
    t = joined.select("doc_id", "dl", "term", contrib)
    if exact_fold:
        total = F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, s: acc + s["contrib"],
        )
    else:
        total = F.sum("contrib")
    return t.groupBy("doc_id", "dl").agg(
        F.round(total / F.col("dl").cast("double"), 4).alias("score")
    )


def perplexity_buckets(
    scored: DataFrame, score_col: str = "score", accuracy: int = 10_000
) -> DataFrame:
    """Production bucketing: head/middle/tail by approx score terciles
    (percentile_approx collapses to one tiny aggregate; the comparison
    is then per-row). Head = highest mean logp = lowest perplexity."""
    qs = scored.agg(
        F.percentile_approx(score_col, [2.0 / 3.0, 1.0 / 3.0], accuracy).alias("_q")
    )
    b = scored.crossJoin(F.broadcast(qs))
    return b.select(
        *scored.columns,
        F.when(F.col(score_col) >= F.col("_q")[0], F.lit("head"))
        .when(F.col(score_col) >= F.col("_q")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def perplexity_buckets_exact(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """Oracle/test bucketing: exact terciles by global rank
    (score desc, doc_id) — integer arithmetic only, so the DuckDB
    mirror is byte-exact. Global window = single-partition sort:
    NOT the 100-TB path (that is perplexity_buckets)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col("doc_id").asc())
    n = F.count(F.lit(1)).over(
        Window.partitionBy()
    )
    ranked = scored.withColumn("_rn", F.row_number().over(w)).withColumn("_n", n)
    return ranked.select(
        *scored.columns,
        F.when(F.col("_rn") * 3 <= F.col("_n"), F.lit("head"))
        .when(F.col("_rn") * 3 <= F.col("_n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ---------------------------------------------------------------------
# Bigram LM + Stupid Backoff (Brants et al. 2007, "Large Language
# Models in Machine Translation") — the classic DISTRIBUTED n-gram LM:
# no discounting/normalization that needs global passes, just counts
# and one fixed backoff multiplier, which is why it scales to web-corpus
# training sets. Training = two count aggregates; scoring = two
# vocabulary-sized equi-joins (shuffle on term like any postings join;
# nothing is collected or broadcast).
# ---------------------------------------------------------------------


def _bigram_structs(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs under the shared
    tokenizer (multiplicity preserved)."""
    from .search import tokens

    a = tokens(text)
    n = F.size(a)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(a, 1, n - 1),
            F.slice(a, 2, n - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2, cnt): corpus bigram counts — one explode + one
    map-side-combined aggregate."""
    b = docs.select(F.explode(_bigram_structs(F.col(text_col))).alias("_b"))
    return b.groupBy(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")).agg(
        F.count("*").cast("long").alias("cnt")
    )


def stupid_backoff_scores(
    docs: DataFrame,
    lm_docs: Optional[DataFrame] = None,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_fold: bool = False,
) -> DataFrame:
    """(doc_id, n_bigrams, n_backoff, score): mean Stupid-Backoff log
    score over a document's bigram tokens, LM trained on ``lm_docs``
    (default: the scored corpus itself — then the bigram path always
    hits and n_backoff is 0 by construction).

        S(w2|w1) = cnt(w1 w2) / cnt(w1)          if the bigram was seen
                 = alpha * cnt(w2) / N           else if w2 was seen
                 = alpha * 1 / (N + V + 1)       else (the OOV slot)

    score = round(mean ln S, 4); docs with < 2 tokens have no bigram
    tokens and are EXCLUDED (documented inner semantics). n_backoff
    counts scored bigram tokens that fell past the bigram table —
    the observable that proves the backoff path fired.

    exact_fold orders the per-doc sum by (w1, w2) so the DuckDB twin
    (list_dot_product over the same ordering) reproduces the doubles
    bit-for-bit before the shared round(, 4)."""
    from .search import tokens

    if lm_docs is None:
        lm_docs = docs
    c2 = bigram_counts(lm_docs, id_col=id_col, text_col=text_col)
    uni = lm_docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    c1 = uni.groupBy("term").agg(F.count("*").cast("long").alias("c1"))
    tot = c1.agg(
        F.sum("c1").cast("double").alias("n"),
        F.count("*").cast("double").alias("v"),
    )

    b = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_bigram_structs(F.col(text_col))).alias("_b"),
    )
    pb = (
        b.select("doc_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    j = (
        pb.join(c2, ["w1", "w2"], "left")
        .join(c1.select(F.col("term").alias("w1"), F.col("c1").alias("_cw1")), "w1", "left")
        .join(c1.select(F.col("term").alias("w2"), F.col("c1").alias("_cw2")), "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    a = F.lit(float(alpha))
    lp = (
        F.when(
            F.col("cnt").isNotNull(),
            F.log(F.col("cnt").cast("double") / F.col("_cw1").cast("double")),
        )
        .when(
            F.col("_cw2").isNotNull(),
            F.log(a * (F.col("_cw2").cast("double") / F.col("n"))),
        )
        .otherwise(F.log(a * (F.lit(1.0) / (F.col("n") + F.col("v") + F.lit(1.0)))))
    )
    s = j.select(
        "doc_id",
        "w1",
        "w2",
        "tf",
        (F.col("tf").cast("double") * lp).alias("contrib"),
        F.when(F.col("cnt").isNull(), F.col("tf")).otherwise(F.lit(0)).cast("long").alias("_bo"),
    )
    if exact_fold:
        total = F.aggregate(
            F.array_sort(F.collect_list(F.struct("w1", "w2", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        )
    else:
        total = F.sum("contrib")
    # n_bigrams = sum(tf) computed IN the score aggregation: the left
    # joins above preserve pb's rows 1:1 (c2 is unique per (w1, w2), c1
    # per term, tot is one row), so summing tf here equals the former
    # separate pb.groupBy(doc_id) pass — integer-exact — and drops both
    # that second evaluation of the bigram postings and the final join
    # (r6: fewer passes).
    g = s.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum("_bo").cast("long").alias("n_backoff"),
        total.alias("_total"),
    )
    return g.select(
        "doc_id",
        "n_bigrams",
        "n_backoff",
        F.round(F.col("_total") / F.col("n_bigrams").cast("double"), 4).alias("score"),
    )
