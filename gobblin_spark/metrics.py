"""Per-batch metrics + lineage (≈ KafkaExtractorStatsTracker /
gobblin-metrics: records-in/out meters, per-partition processed counts;
reference gobblin-modules/gobblin-kafka-common/.../kafka/
KafkaExtractorStatsTracker.java:53-78).

Implemented with ``pyspark.sql.Observation`` — counters ride the batch action
itself (no extra pass over the data), the Spark-native analog of Gobblin's
in-task meters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_batch(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach read-side counters: rows, per-op breakdown."""
    obs = Observation(name)
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes_read"),
        F.min("log_offset").alias("min_offset"),
        F.max("log_offset").alias("max_offset"),
    )
    return df, obs


def observe_updates(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach write-side counters on the deduped update set."""
    obs = Observation(name)
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("keys_written"),
        F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("tombstones"),
    )
    return df, obs


def lineage_entry(batch_id: str, ranges, metrics: dict, snapshot_version: int) -> dict:
    """One lineage record per commit: which offset ranges went into which
    snapshot (≈ GMCE topicPartitionOffsetsRange carried into the Iceberg
    commit, gobblin-iceberg/.../writer/IcebergMetadataWriter.java:384-434)."""
    return {
        "batch_id": batch_id,
        "ranges": {str(r.partition): [r.low, r.high] for r in ranges},
        "metrics": metrics,
        "snapshot_version": snapshot_version,
    }
