"""Checkpoint + table IO.

Iteration state is persisted one immutable Parquet snapshot per iteration
(``runs/<run_id>/iter=<i>/``), with a JSON ``MANIFEST.json`` written *last*
as the commit marker. The manifest carries per-partition lineage (file ->
row count/bytes, read from Parquet footers — no extra Spark job) plus the
iteration's convergence metrics, satisfying the north rule's "checkpoints
per-partition lineage + convergence metrics so runs resume mid-iteration"
(BASELINE.json north_star).

Why Parquet-per-iteration and not ``df.checkpoint()``/``localCheckpoint()``:
it cuts lineage (constant-depth plans across iterations), survives process
death, and is resumable across *sessions* — ``.checkpoint()`` is RDD-format
and session-bound (SURVEY.md §4.3.5). All table IO goes through
``load_source`` so local Parquet and cluster Iceberg are one call site.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"


def load_source(spark: SparkSession, location: str, table: bool = False) -> DataFrame:
    """The SC1/SC2 seam: local partitioned Parquet now, Iceberg catalog table
    on a real cluster (``spark.read.table("cat.db.source_files")``) — the
    Iceberg runtime jar is absent offline (SURVEY.md §7.5)."""
    if table:
        return spark.read.table(location)
    return spark.read.parquet(location)


def _file_lineage(state_dir: str) -> list[dict[str, Any]]:
    """Per-partition lineage from Parquet footers (no Spark job)."""
    out = []
    for f in sorted(os.listdir(state_dir)):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(state_dir, f)
        meta = pq.ParquetFile(fp).metadata
        out.append({"file": f, "rows": meta.num_rows, "bytes": os.path.getsize(fp)})
    return out


class RunCheckpoint:
    """Per-run checkpoint directory with commit-marker manifests."""

    def __init__(self, base_dir: str, run_id: str | None = None):
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.dir = os.path.join(base_dir, self.run_id)
        os.makedirs(self.dir, exist_ok=True)

    def state_path(self, it: int) -> str:
        return os.path.join(self.dir, f"iter={it}", "state")

    def _manifest_path(self, it: int) -> str:
        return os.path.join(self.dir, f"iter={it}", MANIFEST)

    def write_data(self, df: DataFrame, it: int) -> None:
        """Stage the state parquet WITHOUT committing (no manifest yet).
        Lets callers run cheap post-write aggregates (e.g. the convergence
        delta) over the materialized files before sealing the iteration."""
        df.write.mode("overwrite").parquet(self.state_path(it))

    def commit(self, it: int, metrics: dict[str, Any], columns: list[str]) -> None:
        path = self.state_path(it)
        manifest = {
            "iter": it,
            "metrics": metrics,
            "partitions": _file_lineage(path),
            "columns": columns,
        }
        # Write-then-rename: the manifest's existence IS the commit. A crash
        # mid-write leaves an uncommitted iter that resume ignores.
        tmp = self._manifest_path(it) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(it))

    def write(self, df: DataFrame, it: int, metrics: dict[str, Any]) -> None:
        self.write_data(df, it)
        self.commit(it, metrics, df.columns)

    def committed_iters(self) -> list[int]:
        out = []
        if not os.path.isdir(self.dir):
            return out
        for d in os.listdir(self.dir):
            if d.startswith("iter=") and os.path.exists(
                os.path.join(self.dir, d, MANIFEST)
            ):
                out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def latest(self) -> int | None:
        its = self.committed_iters()
        return its[-1] if its else None

    def read(self, spark: SparkSession, it: int) -> DataFrame:
        return spark.read.parquet(self.state_path(it))

    def manifest(self, it: int) -> dict[str, Any]:
        with open(self._manifest_path(it)) as fh:
            return json.load(fh)

    def metrics_history(self) -> list[dict[str, Any]]:
        return [self.manifest(i)["metrics"] for i in self.committed_iters()]
