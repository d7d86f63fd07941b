"""xtracted_crawlers_spark — a from-scratch PySpark-native crawl engine.

A URL frontier + politeness scheduler + vectorized HTML extraction engine
with the query/data-processing capabilities of the reference crawler
(jobomix/xtracted-crawlers, studied read-only at /root/reference), rebuilt
Spark-first: DataFrame plans optimized by Catalyst, Arrow-batched pandas
UDFs for extraction, snapshot-committed parquet/Iceberg-style state for
resumable, checkpointed crawl rounds.

Layout:
  session     SparkSession builder tuned for the crawl workload
  urlnorm     URL canonicalization / identity (SURVEY.md §2 C1, B4, D1)
  extract     HTML extraction: pure-Python mirror + Arrow UDF (D2-D6)
  fixtures    deterministic synthetic pages/seeds/robots generators
  catalog     snapshot store: atomic commit, time travel, resume
  frontier    frontier schema, seed ingest (A1), reset (B1), seq (F1)
  seen        partitioned bloom filter + exact anti-join dedup (C2)
  scheduler   robots/crawl-delay/token-bucket politeness, top-k (F2)
  quota       per-user api_requests budgets + derived jobs table (A5)
  crawl       the round driver loop (§3.2)
  simulator   pure-Python parity oracle for ordering + seen set + quota
  sources/    pages parquet/Iceberg reader, WARC reader/writer
  catalog_iceberg  Iceberg-native catalog (gated on the runtime jar)
  operators/  dedup, similarity, text analysis, multimodal pipeline ops
"""

__version__ = "0.1.0"
