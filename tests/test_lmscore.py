"""CCNet-style unigram LM scoring: probability mass sanity, known-text
score ordering, OOV handling, exact-vs-production bucketing agreement,
and the exact-fold determinism the oracle depends on."""

import math

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import lmscore


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_unigram_lm_is_a_distribution(spark):
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    lm = {r["term"]: r["logp"] for r in lmscore.unigram_lm(d).collect()}
    # counts: a=2 b=2 c=1, n=5, v=3 → logp = ln((c+1)/(5+3+1))
    assert lm["a"] == pytest.approx(math.log(3 / 9))
    assert lm["c"] == pytest.approx(math.log(2 / 9))
    # seen terms + the reserved OOV slot form a proper distribution
    mass = sum(math.exp(v) for v in lm.values()) + math.exp(lmscore.oov_logp(5, 3))
    assert mass == pytest.approx(1.0)


def test_fluent_text_beats_gibberish(spark):
    corpus_rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    corpus_rows += [(100, "zxqj vvkp qqrw")]
    d = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    scores = {r["doc_id"]: r["score"] for r in lmscore.doc_lm_scores(d).collect()}
    assert scores[0] > scores[100]


def test_external_lm_and_oov(spark):
    train = spark.createDataFrame([(1, "alpha beta alpha")], "doc_id long, text string")
    lm = lmscore.unigram_lm(train)
    # n=3 tokens, v=2 → oov = ln(1/6)
    oov = lmscore.oov_logp(3, 2)
    test = spark.createDataFrame([(9, "alpha gamma")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lmscore.doc_lm_scores(test, lm=lm)
    out = lmscore.doc_lm_scores(test, lm=lm, oov_logp=oov).collect()
    # alpha: ln(3/6); gamma OOV: ln(1/6); mean of the two
    want = round((math.log(3 / 6) + oov) / 2, 4)
    assert out[0]["score"] == pytest.approx(want, abs=1e-4)


def test_exact_fold_matches_plain_sum(docs):
    a = lmscore.doc_lm_scores(docs, exact_fold=True)
    b = lmscore.doc_lm_scores(docs, exact_fold=False)
    j = a.select("doc_id", F.col("score").alias("x")).join(
        b.select("doc_id", F.col("score").alias("y")), "doc_id"
    )
    diff = j.filter(F.abs(F.col("x") - F.col("y")) > 1e-9).count()
    assert diff == 0


def test_bucket_paths_agree(docs):
    scored = lmscore.doc_lm_scores(docs).cache()
    exact = lmscore.perplexity_buckets_exact(scored)
    approx = lmscore.perplexity_buckets(scored)
    n = scored.count()
    sizes = {r["bucket"]: r["n"] for r in exact.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert abs(sizes["head"] - n / 3) <= 1  # exact terciles
    j = exact.select("doc_id", F.col("bucket").alias("a")).join(
        approx.select("doc_id", F.col("bucket").alias("b")), "doc_id"
    )
    disagree = j.filter(F.col("a") != F.col("b")).count()
    # approx quantiles may flip only boundary docs
    assert disagree <= max(2, n // 20), disagree
    scored.unpersist()


def test_production_bucketing_is_window_free(docs):
    scored = lmscore.doc_lm_scores(docs)
    plan = lmscore.perplexity_buckets(scored)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


# ---- Stupid Backoff bigram LM (Brants et al. 2007) -------------------


def _py_stupid_backoff(score_docs, lm_docs, alpha=0.4):
    """Pure-Python reference: (doc_id -> (n_bigrams, n_backoff, score))."""
    import collections
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    c1 = collections.Counter()
    c2 = collections.Counter()
    for _, t in lm_docs:
        ws = toks(t)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
    n = float(sum(c1.values()))
    v = float(len(c1))
    out = {}
    for did, t in score_docs:
        ws = toks(t)
        bis = list(zip(ws, ws[1:]))
        if not bis:
            continue
        total = bo = 0.0
        for w1, w2 in bis:
            if (w1, w2) in c2:
                total += math.log(c2[(w1, w2)] / float(c1[w1]))
            elif w2 in c1:
                total += math.log(alpha * (c1[w2] / n))
                bo += 1
            else:
                total += math.log(alpha * (1.0 / (n + v + 1.0)))
                bo += 1
        out[did] = (len(bis), int(bo), round(total / len(bis), 4))
    return out


def test_stupid_backoff_matches_reference_all_branches(spark):
    lm_docs = [(0, "the cat sat on the mat"), (2, "the dog sat on a log")]
    score_docs = lm_docs + [
        (1, "the cat sat on a log"),      # all bigrams seen
        (3, "mat the cat"),               # unseen bigram 'mat the' -> backoff
        (5, "zebra quagga the cat"),      # OOV words -> OOV slot
        (7, "single"),                    # no bigrams -> excluded
    ]
    df = spark.createDataFrame(score_docs, "doc_id long, text string")
    lm = df.filter(F.col("doc_id") % 2 == 0)
    got = {
        r.doc_id: (r.n_bigrams, r.n_backoff, r.score)
        for r in lmscore.stupid_backoff_scores(df, lm_docs=lm, exact_fold=True).collect()
    }
    want = _py_stupid_backoff(score_docs, lm_docs)
    assert got == want
    assert 7 not in got                  # sub-2-token docs excluded
    assert got[3][1] > 0                 # backoff branch fired
    assert got[5][1] > 0                 # OOV branch fired
    assert got[1][1] == 0 and got[0][1] == 0


def test_stupid_backoff_self_trained_never_backs_off(docs):
    scored = lmscore.stupid_backoff_scores(docs)
    assert scored.filter(F.col("n_backoff") > 0).count() == 0
    # seen-bigram scores are log-ratios of counts: always <= 0
    assert scored.filter(F.col("score") > 0).count() == 0


def test_stupid_backoff_fold_matches_plain_sum(docs):
    lm = docs.filter(F.col("doc_id") % 2 == 0)
    a = {r.doc_id: r.score for r in lmscore.stupid_backoff_scores(docs, lm_docs=lm, exact_fold=True).collect()}
    b = {r.doc_id: r.score for r in lmscore.stupid_backoff_scores(docs, lm_docs=lm, exact_fold=False).collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)
