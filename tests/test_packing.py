"""Sequence packing plan: per-shard offsets contiguous (no gaps, no
overlaps), boundary-span bins correct, determinism under repartition,
padding bounded by one tail per shard."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import packing

W = 64


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_offsets_contiguous_per_shard(spark, docs):
    plan = packing.pack_documents(docs, window=W, n_shards=8).cache()
    assert plan.count() == docs.count()
    rows = sorted(
        plan.collect(), key=lambda r: (r["shard"], r["start_offset"])
    )
    pos = {}
    for r in rows:
        expect = pos.get(r["shard"], 0)
        assert r["start_offset"] == expect, (r["shard"], r["doc_id"])
        pos[r["shard"]] = expect + r["n_tokens"]
        # bin arithmetic
        assert r["bin_first"] == r["start_offset"] // W
        last_tok = r["start_offset"] + max(r["n_tokens"], 1) - 1
        assert r["bin_last"] == last_tok // W
        assert r["bin_last"] >= r["bin_first"]
    plan.unpersist()


def test_deterministic_under_repartition(spark, docs):
    a = packing.pack_documents(docs, window=W, n_shards=8)
    b = packing.pack_documents(docs.repartition(13), window=W, n_shards=8)
    j = a.join(
        b.select(
            "doc_id",
            F.col("shard").alias("s2"),
            F.col("start_offset").alias("o2"),
        ),
        "doc_id",
    )
    assert j.filter((F.col("shard") != F.col("s2")) | (F.col("start_offset") != F.col("o2"))).count() == 0


def test_spanning_documents_exist_and_stats_account(spark, docs):
    plan = packing.pack_documents(docs, window=W, n_shards=8).cache()
    spans = plan.filter(F.col("bin_last") > F.col("bin_first")).count()
    assert spans > 0, "window too large to exercise boundary spans"
    stats = packing.packing_stats(plan, window=W)
    srows = stats.collect()
    assert len(srows) <= 8
    tot = plan.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["n_tokens"] for r in srows) == tot
    for r in srows:
        assert 0 <= r["tail_tokens"] < W
        assert r["full_windows"] * W + r["tail_tokens"] == r["n_tokens"]
    plan.unpersist()


def test_precomputed_length_column(spark):
    d = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 40)], "doc_id long, toklen long"
    )
    plan = packing.pack_documents(
        d.withColumn("text", F.lit("")), window=32, n_shards=1, len_col="toklen"
    )
    rows = {r["doc_id"]: r for r in plan.collect()}
    assert rows[1]["start_offset"] == 0 and rows[1]["bin_last"] == 0
    assert rows[2]["start_offset"] == 10 and rows[2]["bin_first"] == 0 and rows[2]["bin_last"] == 1
    assert rows[3]["start_offset"] == 40 and rows[3]["bin_first"] == 1 and rows[3]["bin_last"] == 2


def test_packing_window_is_per_shard_not_global(spark, docs):
    plan = packing.pack_documents(docs, window=W, n_shards=8)._jdf.queryExecution().executedPlan().toString()
    # the cumsum window must partition by shard (hashpartitioning on the
    # shard expression), never a single-partition global sort
    assert "SinglePartition" not in plan, plan[:2000]
