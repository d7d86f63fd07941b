"""Snapshot catalog — ACID-ish table state for resumable crawl rounds.

The design target is an Iceberg catalog (each crawl round = one Iceberg
snapshot commit; resume = read latest snapshot; time travel = read any
snapshot; MERGE for row-level frontier updates). The sandbox has no
Iceberg runtime jar, so this module implements the same *semantics* over
plain parquet directories:

    root/<table>/data/snap-<N>/...parquet      immutable snapshot data
    root/<table>/manifests/<N>.json            commit record (atomic rename)

A snapshot is visible iff its manifest exists; manifests are written to a
temp name and ``os.rename``d (atomic on POSIX), so a crash mid-write never
exposes a partial commit — identical recovery semantics to Iceberg's
metadata-pointer swap. The manifest carries per-round lineage + metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

On a real cluster, swap ``ParquetSnapshotCatalog`` for an Iceberg catalog
(``df.writeTo(tbl).createOrReplace()`` / ``MERGE INTO``) — the engine only
uses this interface.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Manifest:
    table: str
    snapshot_id: int
    data_path: str
    round_id: Optional[int] = None
    parent_snapshot_id: Optional[int] = None
    metrics: dict[str, Any] = field(default_factory=dict)
    # per-partition lineage: list of {file, rows} emitted by the writer
    files: list[dict[str, Any]] = field(default_factory=list)
    # commit wall time, UTC ISO — Iceberg snapshots carry timestamp-ms;
    # freshness logic (crawl.refresh_stale) compares sitemap <lastmod>
    # against the fetch round's commit time. None in pre-r4 manifests.
    committed_at: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


class ParquetSnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "manifests")

    def _data_dir(self, table: str, snapshot_id: int) -> str:
        return os.path.join(self._table_dir(table), "data", f"snap-{snapshot_id:06d}")

    # -- reads -------------------------------------------------------------
    def snapshots(self, table: str) -> list[int]:
        d = self._manifest_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
        )

    def latest_snapshot(self, table: str) -> Optional[int]:
        snaps = self.snapshots(table)
        return snaps[-1] if snaps else None

    def manifest(self, table: str, snapshot_id: int) -> Manifest:
        with open(os.path.join(self._manifest_dir(table), f"{snapshot_id:06d}.json")) as f:
            return Manifest.from_json(f.read())

    def history(self, table: str) -> list[Manifest]:
        return [self.manifest(table, s) for s in self.snapshots(table)]

    def load(
        self, spark: SparkSession, table: str, snapshot_id: Optional[int] = None
    ) -> DataFrame:
        """Read a snapshot (latest by default) — time travel via snapshot_id."""
        sid = self.latest_snapshot(table) if snapshot_id is None else snapshot_id
        if sid is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        return spark.read.parquet(self.manifest(table, sid).data_path)

    def exists(self, table: str) -> bool:
        return self.latest_snapshot(table) is not None

    # -- writes ------------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        table: str,
        round_id: Optional[int] = None,
        metrics: Optional[dict[str, Any]] = None,
        metrics_cb: Optional[Callable[[], dict[str, Any]]] = None,
    ) -> int:
        """Write df as the next snapshot of table; atomic manifest publish.

        The parquet write happens first (to a snapshot-private dir no
        reader looks at), then the manifest rename makes it visible. A
        failure before the rename leaves the previous snapshot current.

        metrics_cb, when given, is called AFTER the data write and its
        dict is merged into the manifest metrics — this is how observe()-
        fused metrics land in the commit record: the write action itself
        computes them (df.observe upstream), so the caller never pays a
        separate aggregate pass + action just to have the numbers ready
        before the write.
        """
        parent = self.latest_snapshot(table)
        sid = (parent + 1) if parent is not None else 0
        data_path = self._data_dir(table, sid)
        if os.path.exists(data_path):  # leftover from a crashed attempt
            shutil.rmtree(data_path)
        df.write.mode("overwrite").parquet(data_path)
        if metrics_cb is not None:
            metrics = {**(metrics or {}), **metrics_cb()}

        files = [
            {"file": fn, "bytes": os.path.getsize(os.path.join(data_path, fn))}
            for fn in sorted(os.listdir(data_path))
            if fn.endswith(".parquet")
        ]
        from datetime import datetime, timezone

        man = Manifest(
            table=table,
            snapshot_id=sid,
            data_path=data_path,
            round_id=round_id,
            parent_snapshot_id=parent,
            metrics=metrics or {},
            files=files,
            committed_at=datetime.now(timezone.utc).isoformat(),
        )
        mdir = self._manifest_dir(table)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(man.to_json())
        os.rename(tmp, os.path.join(mdir, f"{sid:06d}.json"))
        return sid

    def drop(self, table: str) -> None:
        d = self._table_dir(table)
        if os.path.isdir(d):
            shutil.rmtree(d)

    # -- lifecycle ----------------------------------------------------------
    def expire_snapshots(self, table: str, keep_bases: int = 1) -> list[int]:
        """Storage GC (Iceberg expire_snapshots semantics): delete the
        data + manifests of snapshots no current reader chain needs.

        The merge-on-read reader (crawl.load_frontier) resolves state
        from the NEWEST base snapshot plus every later delta, so every
        snapshot strictly older than the keep_bases-th-newest base is
        unreachable from current state and only serves time travel.
        At a 10^10-row frontier each round adds a delta and every
        compact_every rounds a full base — without expiration, storage
        grows O(rounds); with keep_bases=1 it is bounded by one base +
        compact_every deltas per table.

        Returns the expired snapshot ids (possibly empty). keep_bases
        must be >= 1: the newest base and everything after it are always
        retained, so resume and the current MoR chain are unaffected;
        time travel older than the retained window is gone — that is the
        point."""
        if keep_bases < 1:
            raise ValueError("keep_bases must be >= 1")
        hist = self.history(table)
        bases = [
            m.snapshot_id
            for m in hist
            if m.metrics.get("kind", "base") == "base"
        ]
        if len(bases) < keep_bases:
            return []
        cutoff = bases[-keep_bases]
        expired = [m for m in hist if m.snapshot_id < cutoff]
        for m in expired:
            # manifest first: a crash between the two deletes must never
            # leave a visible snapshot without data — the reverse order
            # (data first) would
            mpath = os.path.join(self._manifest_dir(table), f"{m.snapshot_id:06d}.json")
            if os.path.exists(mpath):
                os.remove(mpath)
            if os.path.isdir(m.data_path):
                shutil.rmtree(m.data_path)
        return [m.snapshot_id for m in expired]
