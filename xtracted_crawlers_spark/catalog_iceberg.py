"""Iceberg-native catalog: the production variant of
``ParquetSnapshotCatalog`` for real clusters.

The sandbox has no iceberg-spark-runtime jar, so this module is
availability-gated (``iceberg_available``) and its test skips here — but
the DDL/MERGE the 100-TB deployment needs is code, not prose:

- one Iceberg table per logical table, frontier bucketed by the merge key
  (``bucket(N, url_id)``) so per-round MERGE INTO and the fetch join are
  storage-partitioned (no shuffle of the 10^10-row base);
- each round = one Iceberg snapshot (atomic metadata-pointer swap — the
  same recovery semantics the parquet fallback reproduces with manifest
  renames); round metrics ride on the snapshot summary via
  ``snapshot-property.*`` write options;
- ``merge_round`` is a real row-level MERGE INTO (merge-on-read), so a
  delta-sized round never rewrites the frontier;
- time travel / resume = ``VERSION AS OF`` on the snapshot id.

To enable on a cluster:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.xcs=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.xcs.type=hadoop \\
      --conf spark.sql.catalog.xcs.warehouse=<path> ...
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from .frontier import KEY


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog named ``xcs`` is configured and
    the runtime classes are on the classpath."""
    try:
        impl = spark.conf.get("spark.sql.catalog.xcs", None)
    except Exception:
        impl = None
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergSnapshotCatalog:
    """Same interface as ParquetSnapshotCatalog (commit/load/history/
    exists/latest_snapshot), backed by a configured Iceberg catalog."""

    def __init__(self, spark: SparkSession, catalog: str = "xcs", db: str = "crawl",
                 frontier_buckets: int = 64):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath / catalog not configured; "
                "use ParquetSnapshotCatalog (same semantics) instead"
            )
        self.spark = spark
        self.catalog = catalog
        self.db = db
        self.frontier_buckets = frontier_buckets
        spark.sql(f"create namespace if not exists {catalog}.{db}")

    def _qual(self, table: str) -> str:
        return f"{self.catalog}.{self.db}.{table}"

    # -- reads --------------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qual(table))

    def snapshots(self, table: str) -> list[int]:
        rows = self.spark.sql(
            f"select snapshot_id from {self._qual(table)}.snapshots order by committed_at"
        ).collect()
        return [r["snapshot_id"] for r in rows]

    def latest_snapshot(self, table: str) -> Optional[int]:
        snaps = self.snapshots(table) if self.exists(table) else []
        return snaps[-1] if snaps else None

    def history(self, table: str) -> list[dict[str, Any]]:
        """Per-snapshot lineage + metrics: Iceberg's snapshot summary
        carries the round metrics committed via snapshot-property.*."""
        rows = self.spark.sql(
            f"select snapshot_id, parent_id, summary from {self._qual(table)}.snapshots "
            "order by committed_at"
        ).collect()
        return [
            {"snapshot_id": r["snapshot_id"], "parent": r["parent_id"], **dict(r["summary"])}
            for r in rows
        ]

    def load(self, spark: SparkSession, table: str, snapshot_id: Optional[int] = None) -> DataFrame:
        if snapshot_id is None:
            return spark.read.table(self._qual(table))
        return spark.read.option("snapshot-id", snapshot_id).table(self._qual(table))

    # -- writes -------------------------------------------------------------
    def _props(self, round_id: Optional[int], metrics: Optional[dict[str, Any]]):
        props = {"round_id": str(round_id)} if round_id is not None else {}
        for k, v in (metrics or {}).items():
            props[f"metric.{k}"] = str(v)
        return props

    def commit(
        self,
        df: DataFrame,
        table: str,
        round_id: Optional[int] = None,
        metrics: Optional[dict[str, Any]] = None,
        metrics_cb: Optional[Any] = None,
    ) -> int:
        """Full-table snapshot commit (bootstrap / compaction / small
        derived tables). The frontier is bucketed by url_id so MERGE and
        the fetch join are storage-partitioned.

        metrics_cb (observe()-fused metrics, see ParquetSnapshotCatalog.
        commit) cannot reach the snapshot-property options — those are
        set before the write — so its values are stamped as round-keyed
        TBLPROPERTIES after the write, the same mechanism merge_round
        uses (and with the same history() caveat)."""
        qual = self._qual(table)
        w = df.writeTo(qual)
        for k, v in self._props(round_id, metrics).items():
            w = w.option(f"snapshot-property.{k}", v)
        if table == "frontier":
            from pyspark.sql.functions import bucket, col

            w = w.partitionedBy(bucket(self.frontier_buckets, col("url_id")))
        w.using("iceberg").createOrReplace()  # atomic snapshot swap
        sid = self.latest_snapshot(table) or 0
        if metrics_cb is not None:
            rid = round_id if round_id is not None else sid
            for k, v in metrics_cb().items():
                ek, ev = str(k).replace("'", "''"), str(v).replace("'", "''")
                self.spark.sql(
                    f"alter table {qual} set tblproperties ('round.{rid}.{ek}' = '{ev}')"
                )
        return sid

    def merge_round(
        self,
        updated: DataFrame,
        table: str = "frontier",
        round_id: Optional[int] = None,
        metrics: Optional[dict[str, Any]] = None,
    ) -> int:
        """Row-level MERGE INTO: the Iceberg-native replacement for the
        parquet catalog's delta-commit + merge-on-read read path. One
        round's touched rows upsert in place; the table's bucket layout
        keeps the merge shuffle-free on the base side.

        METRICS CAVEAT (round-2 advice): SQL MERGE cannot attach snapshot
        SUMMARY properties from PySpark — Iceberg's CommitMetadata
        .withCommitProperties is a JVM-only API and the
        `snapshot-property.*` write options only exist on DataFrame
        writes (the commit() path above, which history() reads back).
        The merge path therefore stamps round metrics as TABLE properties
        keyed by round_id (`round.<id>.<key>`, never overwritten), and
        `history()` will NOT show metrics for merge snapshots; read them
        via SHOW TBLPROPERTIES / round_metrics() instead."""
        qual = self._qual(table)
        updated.createOrReplaceTempView("_xcs_round_updates")
        on = " and ".join(f"t.{k} = s.{k}" for k in KEY)
        self.spark.sql(
            f"""
            merge into {qual} t
            using _xcs_round_updates s
            on {on}
            when matched then update set *
            when not matched then insert *
            """
        )
        # table-level per-round metric properties (see docstring caveat:
        # snapshot-summary stamping is not reachable from PySpark SQL
        # MERGE). Keyed by round so earlier rounds are never overwritten.
        sid = self.latest_snapshot(table) or 0
        rid = round_id if round_id is not None else sid
        for k, v in self._props(round_id, metrics).items():
            # single-quote-escape both sides: the API accepts arbitrary
            # metric dicts, and an unescaped quote breaks the statement
            ek, ev = str(k).replace("'", "''"), str(v).replace("'", "''")
            self.spark.sql(
                f"alter table {qual} set tblproperties ('round.{rid}.{ek}' = '{ev}')"
            )
        return sid

    def round_metrics(self, table: str = "frontier") -> dict[int, dict[str, str]]:
        """Per-round metrics stamped by merge_round, read back from table
        properties (the merge path's replacement for snapshot-summary
        metrics)."""
        rows = self.spark.sql(f"show tblproperties {self._qual(table)}").collect()
        out: dict[int, dict[str, str]] = {}
        for r in rows:
            parts = r["key"].split(".", 2)
            if len(parts) == 3 and parts[0] == "round" and parts[1].isdigit():
                out.setdefault(int(parts[1]), {})[parts[2]] = r["value"]
        return out
