"""SparkSession factory tuned for the crawl workload.

Defaults are sized for the sandbox (single JVM, local[N]) but every knob is
chosen for how it behaves on a real multi-executor cluster at 10^10-URL
frontier scale:

- AQE on: runtime coalescing of the many small post-filter partitions and
  skew-join splitting for hot hosts in the frontier ⋈ pages join.
- Arrow on: all extraction UDFs are Arrow-batched pandas UDFs; row-at-a-time
  Python never touches the hot path (north_rule).
- shuffle.partitions defaults to a multiple of parallelism; real deployments
  override via spark-submit --conf (or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Repo root (parent of this package). Python workers are separate processes
# that do NOT inherit the driver's sys.path mutations — without this on
# PYTHONPATH, any pandas UDF defined in this package fails to unpickle on
# executors when the driver is launched from another directory. On a real
# cluster the same is achieved with spark-submit --py-files.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_pythonpath() -> None:
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{_REPO_ROOT}{os.pathsep}{pp}" if pp else _REPO_ROOT
    import sys

    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)


def get_spark(
    app_name: str = "xtracted-crawlers-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _ensure_pythonpath()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster passes an explicit value or lets AQE
        # coalesce from a higher initial number.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 2 * os.cpu_count() if inner == "*" else 2 * int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing targets max(bytes/parallelism, minPartitionSize)
        # (parallelismFirst, the default). The stock 1 MiB floor is sized
        # for shuffle-bound stages; this engine's post-shuffle stages are
        # often COMPUTE-dense (regex canonicalization, text quality
        # scoring, URL synthesis) where a few-MB shuffle still deserves
        # every core, so the local default floor is lower. Production
        # tuning for network-bound work overrides via env/--conf
        # (guide §2.2: bytes are the right coalescing proxy only when the
        # stage cost is I/O-shaped).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (guide §4.2): bigger batches amortize the
        # per-batch JVM↔Python round-trip — extraction measured ~10%
        # faster at 8192 than 2048 (html ≈2 KB/row → ~16 MB batches).
        # Binary-heavy ops (multimodal image/audio) are bounded by
        # Spark 4's bytes cap, not the record cap, so raising records
        # can't blow their memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "67108864")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_WARM_WORKERS", "1") != "0":
        _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Pre-fork the Python UDF worker pool once per session.

    The first Arrow-UDF job of a session otherwise pays one interpreter
    fork + the full import graph (pandas/pyarrow/numpy + this package)
    PER CONCURRENT TASK — measured ~3 s × 32 workers ≈ 110 CPU-s hidden
    inside whichever job touches Python first (guide §4.5: heavyweight
    init belongs in setup, not on the hot path). A count()-shaped warmup
    does NOT work: Catalyst prunes a deterministic UDF whose output the
    action never reads, so no worker is ever forked. This warm runs the
    UDF through the noop sink (computes every column, guide §1.4) with
    enough simultaneous tasks to fork one worker per core, and each
    worker imports the extraction kernel's module graph so later
    extraction tasks start hot.

    Besides the fork+import cost, the first STRING-carrying Arrow job of
    a fresh JVM pays ~110 CPU-s of JIT warmup in SHARED runtime code —
    ArrowWriter/UTF8String/PythonRunner serialization and the hash-agg
    path (measured r6 session 3 via /proc: JVM CPU per identical
    extraction rep fell 119 → 19 → 6 CPU-s while Python-worker CPU held
    ~30 CPU-s flat). Those methods are query-independent, so one warm
    pass of struct-of-strings through a pandas UDF + xxhash aggregate
    compiles them during session setup instead of inside whichever
    query runs first. Per-query generated classes still JIT on first
    use — deliberately NOT warmed (a per-plan warm would only ever
    benefit the benchmark's shape, not a real deployment)."""
    if getattr(spark, "_xcs_workers_warm", False):
        return
    import pandas as pd
    from pyspark.sql import functions as F

    def _warm_fn(u, s):
        import xtracted_crawlers_spark.extract  # noqa: F401  (module-graph warm)

        return pd.DataFrame({"a": s.str.slice(0, 24), "b": s, "error": None})

    # annotations set explicitly: `from __future__ import annotations`
    # above would stringify inline hints out of pandas_udf's reach
    _warm_fn.__annotations__ = {"u": pd.Series, "s": pd.Series, "return": pd.DataFrame}
    _warm = F.pandas_udf(_warm_fn, "a string, b string, error string")

    par = spark.sparkContext.defaultParallelism
    (
        spark.range(150 * par, numPartitions=2 * par)
        .select(
            F.lit("u").alias("u"),
            F.concat(F.lit("warm/"), F.md5(F.col("id").cast("string"))).alias("s"),
        )
        .select(_warm("u", "s").alias("r"))
        .select("r.*")
        .agg(F.count("*"), F.max(F.xxhash64("a", "b", "error")))
        .write.format("noop").mode("overwrite").save()
    )
    spark._xcs_workers_warm = True
