"""Hot-host skew mitigation: salted repartition must spread a dominant
host across many partitions instead of pinning one."""

from pyspark.sql import functions as F

from xtracted_crawlers_spark import scheduler


def _partition_spread(df):
    counts = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ns = [r["n"] for r in counts]
    return len(ns), max(ns), sum(ns)


def test_salting_spreads_hot_host(spark):
    # one host owns 90% of the rows — the classic frontier hot spot
    rows = [("hot.example.test" if i % 10 != 0 else f"cold{i}.example.test", i)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "host string, job_urls_seq long")

    unsalted = df.repartition(16, F.col("host"))
    n_u, max_u, tot = _partition_spread(unsalted)
    salted = scheduler.salted_repartition(df, salt_n=16, partitions=16)
    n_s, max_s, tot_s = _partition_spread(salted)

    assert tot == tot_s == 4000
    # hash-by-host pins ~90% of rows into one partition; salting caps the
    # largest partition near the mean
    assert max_u >= 0.85 * 3600
    assert max_s <= 0.3 * 4000, (n_s, max_s)
    # salted hot-host rows land on many distinct partitions
    hot_parts = (
        salted.filter(F.col("host") == "hot.example.test")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert hot_parts >= 8
