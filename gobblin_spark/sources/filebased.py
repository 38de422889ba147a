"""Incremental file-based source (≈ FileBasedSource/FileBasedExtractor,
gobblin-core/.../filebased/FileBasedSource.java:58 — "list files newer than
the previous snapshot; one work unit per new file set").

The snapshot of already-ingested files lives in the StateStore; each plan
call diffs the current listing against it. Reading is a plain
``spark.read.format(...).load(new_files)`` — Spark parallelizes within and
across files, so the work-unit granularity is the file list, not a task
pool. This is the batch analog of the streaming file source used by
``streaming.tail_changelog`` (which gets the same semantics from Spark's own
file-source checkpoint).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..state import StateStore


class FileSnapshotSource:
    def __init__(self, state: StateStore, store_name: str = "filesource"):
        self.state = state
        self.store = store_name

    def _seen(self) -> dict[str, int]:
        doc = self.state.get_current(self.store) or {}
        return dict(doc.get("files", {}))

    def plan(self, pattern: str) -> list[str]:
        """New or grown files since the last commit (sorted; deterministic)."""
        seen = self._seen()
        out = []
        for f in sorted(glob.glob(pattern)):
            size = os.path.getsize(f)
            if seen.get(f) != size:
                out.append(f)
        return out

    def read(self, spark: SparkSession, files: list[str], fmt: str = "parquet", **options) -> DataFrame:
        reader = spark.read.format(fmt)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(files)

    def commit(self, files: list[str]) -> None:
        """Record the ingested files (path → size) — the 'actual high
        watermark' of this source; re-listing skips them next plan."""
        seen = self._seen()
        for f in files:
            seen[f] = os.path.getsize(f)
        self.state.put(self.store, {"files": seen})
