"""Snapshot-versioned parquet tables — Iceberg-style atomic commits.

The north rule calls for Iceberg tables checkpointed per wave. This image has
no Iceberg runtime jar, so the same semantics are provided by a minimal
snapshot store: each table is a directory of immutable snapshots
(``<wh>/<table>/snap-0000N/`` parquet) plus a JSON manifest whose atomic
rename is the commit point. On a real cluster the calls map 1:1 to Iceberg
(`commit` → snapshot-producing overwrite/append, `read` → current snapshot,
`snapshots` → time travel / per-wave lineage); swap the backend without
touching the wave loop.

Reference analogue: BDB SYNC transactions per op (UrlsDb.java:89-95,
Db.java:75-80) — durability unit there is one key, here one wave.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ---- paths -----------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # ---- commits ---------------------------------------------------------
    def commit(self, table: str, df: DataFrame, wave: int, meta: dict | None = None) -> str:
        """Write df as the next snapshot; manifest rename = atomic commit."""
        man = self.manifest(table) or {"current": -1, "snapshots": []}
        snap_id = man["current"] + 1
        snap_dir = os.path.join(self._tdir(table), f"snap-{snap_id:05d}")
        df.write.mode("overwrite").parquet(snap_dir)
        man["current"] = snap_id
        man["snapshots"].append(
            {"id": snap_id, "wave": wave, "ts": time.time(), **(meta or {})}
        )
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path(table))  # atomic on POSIX
        self._expire(table, keep=4)
        return snap_dir

    def _expire(self, table: str, keep: int) -> None:
        """Drop snapshot data older than the last `keep` (manifest history
        stays — lineage metadata is tiny; data dirs are not)."""
        man = self.manifest(table)
        if not man:
            return
        live = {f"snap-{s['id']:05d}" for s in man["snapshots"][-keep:]}
        for d in os.listdir(self._tdir(table)):
            if d.startswith("snap-") and d not in live:
                shutil.rmtree(os.path.join(self._tdir(table), d), ignore_errors=True)

    # ---- reads -----------------------------------------------------------
    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        man = self.manifest(table)
        if man is None:
            raise FileNotFoundError(f"table {table} has no snapshots")
        snap_id = man["current"] if snapshot is None else snapshot
        return self.spark.read.parquet(
            os.path.join(self._tdir(table), f"snap-{snap_id:05d}")
        )

    def exists(self, table: str) -> bool:
        return self.manifest(table) is not None

    def current_wave(self, table: str) -> int:
        man = self.manifest(table)
        if not man or not man["snapshots"]:
            return -1
        return man["snapshots"][-1]["wave"]
