"""Count-min sketch: one-sided error (est >= truth, always), bounded
over-estimation, cell-wise mergeability == sketch of the union, weights,
and heavy hitters never missing a true heavy key."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import search, sketch

D, WHEX = 3, 3  # 3 x 4096


@pytest.fixture(scope="module")
def tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(F.explode(search.tokens(F.col("text"))).alias("term")).cache()


def test_estimate_one_sided_and_tight(spark, tokens):
    cms = sketch.cms_build(tokens, d=D, w_hex=WHEX).cache()
    exact = tokens.groupBy("term").agg(F.count("*").cast("long").alias("truth"))
    est = sketch.cms_estimate(cms, exact.select("term"), d=D, w_hex=WHEX)
    j = est.join(exact, "term").cache()
    n_terms = j.count()
    assert j.filter(F.col("est") < F.col("truth")).count() == 0  # never under
    total = tokens.count()
    # CMS bound: overshoot <= 2N/w with prob 1-(1/2)^d per key; assert a
    # loose deterministic-friendly version corpus-wide
    bad = j.filter(F.col("est") - F.col("truth") > F.lit(2 * total / 16**WHEX)).count()
    assert bad <= max(1, n_terms // 100), bad
    j.unpersist(); cms.unpersist()


def test_merge_equals_union_sketch(spark, tokens):
    a = tokens.limit(5000)
    b = tokens.subtract(spark.createDataFrame([], "term string"))  # full set
    half1 = sketch.cms_build(tokens.filter(F.length("term") <= 4), d=D, w_hex=WHEX)
    half2 = sketch.cms_build(tokens.filter(F.length("term") > 4), d=D, w_hex=WHEX)
    merged = sketch.cms_merge(half1, half2)
    whole = sketch.cms_build(tokens, d=D, w_hex=WHEX)
    diff = (
        merged.withColumnRenamed("cnt", "m")
        .join(whole.withColumnRenamed("cnt", "w"), ["row", "col"], "full")
        .filter(F.coalesce("m", F.lit(0)) != F.coalesce("w", F.lit(0)))
    )
    assert diff.count() == 0


def test_weighted_build(spark):
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)], "term string, n int")
    cms = sketch.cms_build(df, d=D, w_hex=WHEX, weight_col="n")
    est = {r["term"]: r["est"] for r in sketch.cms_estimate(
        cms, df.select("term"), d=D, w_hex=WHEX).collect()}
    assert est["x"] >= 12 and est["y"] >= 1


def test_heavy_hitters_complete(spark, tokens):
    cms = sketch.cms_build(tokens, d=D, w_hex=WHEX)
    exact = tokens.groupBy("term").agg(F.count("*").cast("long").alias("truth"))
    thr = 200
    truth_heavy = {r["term"] for r in exact.filter(F.col("truth") >= thr).collect()}
    assert truth_heavy, "fixture drift: no heavy terms at this threshold"
    found = {
        r["term"]
        for r in sketch.cms_heavy_hitters(
            cms, exact.select("term"), thr, d=D, w_hex=WHEX
        ).collect()
    }
    assert truth_heavy <= found  # one-sided: no true heavy hitter missed
    assert len(found - truth_heavy) <= max(1, len(truth_heavy))  # few collisions


def test_hll_distinct_per_group_accuracy(spark):
    from pyspark.sql import functions as F2

    df = spark.range(200_000).select(
        (F2.col("id") % 5).alias("host"),
        ((F2.col("id") * 7919) % 60_000).cast("string").alias("url"),
    )
    est = {
        r["host"]: r["n_distinct"]
        for r in sketch.distinct_estimate(
            sketch.distinct_sketch(df, "url", by=["host"]), by=["host"]
        ).collect()
    }
    exact = {
        r["host"]: r["n"]
        for r in df.groupBy("host").agg(F2.countDistinct("url").alias("n")).collect()
    }
    for h in exact:
        assert abs(est[h] - exact[h]) / exact[h] < 0.05, (h, est[h], exact[h])


def test_hll_merge_equals_whole(spark):
    from pyspark.sql import functions as F2

    df = spark.range(100_000).select(
        (F2.col("id") % 3).alias("host"), F2.col("id").cast("string").alias("url")
    )
    half1 = sketch.distinct_sketch(df.filter(F2.col("id") % 2 == 0), "url", by=["host"])
    half2 = sketch.distinct_sketch(df.filter(F2.col("id") % 2 == 1), "url", by=["host"])
    merged = sketch.distinct_estimate(
        sketch.distinct_merge(half1, half2, by=["host"]), by=["host"]
    )
    whole = sketch.distinct_estimate(
        sketch.distinct_sketch(df, "url", by=["host"]), by=["host"]
    )
    m = {r["host"]: r["n_distinct"] for r in merged.collect()}
    w = {r["host"]: r["n_distinct"] for r in whole.collect()}
    assert m == w  # identical sketches -> identical estimates


def test_cms_build_scans_input_once(spark, tokens):
    plan = sketch.cms_build(tokens, d=D, w_hex=WHEX)._jdf.queryExecution().executedPlan().toString()
    # a union-of-d-selects formulation planned d scans; the exploded
    # struct array must keep it to one (the input here is an InMemory
    # cache; count its scan nodes)
    n_scans = plan.count("InMemoryTableScan")
    assert n_scans == 1, plan[:2000]
