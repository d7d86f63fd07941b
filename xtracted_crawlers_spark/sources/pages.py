"""Pages-corpus source (BASELINE.json input_hint): an Iceberg table of
Common-Crawl-style pages (url, warc_ts, html binary, text, lang).

Sandbox has no Iceberg jar, so `read_pages` reads parquet with the schema
enforced and documents the Iceberg layout the engine targets:

  CREATE TABLE pages (url string, warc_ts timestamp, html binary,
                      text string, lang string)
  USING iceberg PARTITIONED BY (bucket(1024, url))

bucket(url) partitioning makes the per-round fetch join storage-pruned:
the broadcast(selected) hash join streams only matching buckets instead
of the full corpus. On parquet the same effect is approximated by the
broadcast join alone (scan streams once, no shuffle of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def write_pages_bucketed(
    df: DataFrame, table: str = "pages_bucketed", buckets: int = 64
) -> None:
    """Spark-native bucketed twin of the documented Iceberg layout: a
    managed table bucketed AND sorted by url. A selection/frontier table
    written with the SAME bucket count joins on url with NO Exchange on
    either side (bucket-pruned, co-located sort-merge join) — the
    shuffle-free fetch-join the 10^10-row design counts on, demonstrable
    without the Iceberg jar (tests/test_plans_streaming.py asserts the
    Exchange-free plan). At 100 TB the same layout also storage-prunes
    the scan to the buckets the selection touches."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforcing reader: extra columns dropped, required columns
    must exist (fail fast at plan time, not mid-round)."""
    df = spark.read.parquet(path)
    missing = [f.name for f in PAGES_TABLE_SCHEMA.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"pages table at {path} missing columns {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in PAGES_TABLE_SCHEMA.fields]
    )
