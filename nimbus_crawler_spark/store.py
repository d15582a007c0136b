"""Snapshot-committed table store — the engine's Iceberg-shaped persistence.

The reference coordinates state across Redis streams + Postgres + MinIO; the
batch engine replaces all three with versioned tables and **atomic round
commits** (SURVEY.md §4.3.4). Design target is Apache Iceberg (`MERGE INTO`,
snapshot isolation, bucket partition pruning); this sandbox has no Iceberg
runtime jar, so the same semantics are provided by a parquet snapshot catalog:

* each round writes new table versions under ``<warehouse>/<table>/v<round>``
  and append deltas under ``<warehouse>/<table>/r<round>``;
* a round is visible only after its commit marker
  ``<warehouse>/_commits/c<round>.json`` lands via atomic ``os.rename`` — the
  exact analog of an Iceberg snapshot commit, and the engine's resumability
  anchor: on restart the max committed marker wins and any uncommitted
  version directories are dead data (reference analog: XAUTOCLAIM redelivery,
  consumer.go:112-162, and the stale 'crawling' reset, url.go ResetStale).
* ``url_state`` is hash-bucketed by ``pmod(xxhash64(url), N)``; at Iceberg
  scale the per-round MERGE rewrites only touched buckets — the catalog keeps
  the bucket column in the data so the plan is partition-prunable either way.

Swapping this class for a real Iceberg catalog changes only ``read``/``commit``
(DataFrame ``MERGE INTO``), not any plan code.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .schemas import EMPTY_SCHEMAS

_COMMITS = "_commits"


class SnapshotStore:
    def __init__(self, spark: SparkSession, warehouse: str | os.PathLike):
        self.spark = spark
        self.warehouse = Path(warehouse)
        (self.warehouse / _COMMITS).mkdir(parents=True, exist_ok=True)

    # ---- commit log ----

    def _commit_path(self, round_idx: int) -> Path:
        return self.warehouse / _COMMITS / f"c{round_idx + 1:08d}.json"

    def latest_commit(self) -> dict | None:
        commits = sorted((self.warehouse / _COMMITS).glob("c*.json"))
        if not commits:
            return None
        return json.loads(commits[-1].read_text())

    def latest_round(self) -> int | None:
        c = self.latest_commit()
        return None if c is None else c["round"]

    # ---- reads ----

    def read(self, table: str) -> DataFrame:
        """Current snapshot of a versioned table (empty DF before first commit)."""
        c = self.latest_commit()
        if c is None or table not in c["tables"]:
            return self.spark.createDataFrame([], EMPTY_SCHEMAS[table])
        return self.spark.read.schema(EMPTY_SCHEMAS[table]).parquet(
            str(self.warehouse / c["tables"][table])
        )

    def read_appends(self, table: str) -> DataFrame:
        """Union of all committed append deltas for an append-only table."""
        c = self.latest_commit()
        paths = [] if c is None else c.get("appends", {}).get(table, [])
        if not paths:
            return self.spark.createDataFrame([], EMPTY_SCHEMAS[table])
        return self.spark.read.schema(EMPTY_SCHEMAS[table]).parquet(
            *[str(self.warehouse / p) for p in paths]
        )

    # ---- commit ----

    def commit(
        self,
        round_idx: int,
        snapshots: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Write table data, then publish the round atomically via the marker.

        ``snapshots`` replace the table (engine computes MERGE results as full
        DataFrames; under Iceberg this is `MERGE INTO` on touched buckets).
        ``appends`` add a delta (crawl_results / lineage / quarantine).
        """
        prev = self.latest_commit()
        tables = dict(prev["tables"]) if prev else {}
        all_appends = {k: list(v) for k, v in (prev.get("appends", {}) if prev else {}).items()}

        # Independent tables write as concurrent Spark jobs (the scheduler
        # interleaves their stages); atomicity still comes solely from the
        # marker rename below, so a failure mid-write leaves no visible state.
        from concurrent.futures import ThreadPoolExecutor

        jobs: list[tuple[str, str, object]] = []
        for name, df in (snapshots or {}).items():
            rel = f"{name}/v{round_idx + 1:08d}"
            tables[name] = rel
            jobs.append((name, rel, df))
        for name, df in (appends or {}).items():
            rel = f"{name}/r{round_idx + 1:08d}"
            all_appends.setdefault(name, []).append(rel)
            jobs.append((name, rel, df))

        def write(job):
            _name, rel, df = job
            df.write.mode("overwrite").parquet(str(self.warehouse / rel))

        if len(jobs) > 1:
            with ThreadPoolExecutor(max_workers=min(len(jobs), 6)) as ex:
                list(ex.map(write, jobs))
        else:
            for j in jobs:
                write(j)

        marker = {
            "round": round_idx,
            "tables": tables,
            "appends": all_appends,
            "meta": meta or {},
            "committed_at": time.time(),
        }
        tmp = self.warehouse / _COMMITS / f".tmp-{round_idx + 1:08d}.json"
        tmp.write_text(json.dumps(marker, indent=1))
        os.rename(tmp, self._commit_path(round_idx))  # atomic publish
        return marker

    def destroy(self) -> None:
        shutil.rmtree(self.warehouse, ignore_errors=True)
