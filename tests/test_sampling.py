"""Deterministic sampling / mixing / splits: reproducibility guarantees
(same rows across runs and partitionings), disjoint+exhaustive splits,
fraction accuracy, allow-list mixing, and growth stability (adding rows
never reassigns existing ones — the property rand() splits lack)."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_fraction_deterministic_and_accurate(spark):
    n = 20_000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    s1 = sampling.sample_fraction(df, 0.25)
    s2 = sampling.sample_fraction(df.repartition(13), 0.25)
    a = {r["doc_id"] for r in s1.collect()}
    b = {r["doc_id"] for r in s2.collect()}
    assert a == b, "membership must not depend on partitioning"
    assert abs(len(a) / n - 0.25) < 0.02
    # different salt = independent draw
    c = {r["doc_id"] for r in sampling.sample_fraction(df, 0.25, salt="other").collect()}
    assert c != a
    overlap = len(a & c) / max(1, len(a))
    assert abs(overlap - 0.25) < 0.05  # independence: P(c|a) ~ 0.25


def test_sample_fraction_edges(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    assert sampling.sample_fraction(df, 0.0).count() == 0
    assert sampling.sample_fraction(df, 1.0).count() == 100
    assert sampling.sample_fraction(df, 1.7).count() == 100


def test_weighted_mix_allowlist(docs):
    kept = sampling.weighted_mix(
        docs, {"src1": 1.0, "src2": 0.5, "src3": 0.0}, group_col="source"
    )
    by = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(by) <= {"src1", "src2"}  # absent + zero-weight sources dropped
    total = docs.filter(F.col("source") == "src1").count()
    assert by["src1"] == total
    assert 0 < by.get("src2", 0) < docs.filter(F.col("source") == "src2").count()


def test_split_disjoint_exhaustive_stable(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = sampling.train_val_test_split(df, fracs=(0.8, 0.1))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    assert abs(counts["test"] / 10_000 - 0.1) < 0.01

    # growth stability: the first 5k rows keep their assignment when the
    # corpus doubles
    small = sampling.train_val_test_split(
        spark.range(5_000).withColumnRenamed("id", "doc_id"), fracs=(0.8, 0.1)
    )
    j = small.select("doc_id", F.col("split").alias("a")).join(
        out.select("doc_id", F.col("split").alias("b")), "doc_id"
    )
    assert j.count() == 5_000
    assert j.filter(F.col("a") != F.col("b")).count() == 0


def test_split_and_sample_independent(spark):
    """Different salts: being sampled must not skew the split."""
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    sampled = sampling.sample_fraction(df, 0.5)
    out = sampling.train_val_test_split(sampled, fracs=(0.8, 0.1))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert abs(counts["train"] / n - 0.8) < 0.02


def test_mix_plan_is_map_only(docs):
    plan = sampling.weighted_mix(docs, {"src1": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
