"""Audit-count / completeness-watermark gate.

Gobblin never declares a partition "complete" until the counts it ingested
match an external audit source's expected counts — this is the operator that
catches silent data loss in production (reference:
gobblin-compaction/src/main/java/org/apache/gobblin/compaction/audit/
AuditCountClient.java:28, gobblin-iceberg/src/main/java/org/apache/gobblin/
iceberg/writer/CompletenessWatermarkUpdater.java; late-partition registration
IcebergMetadataWriter.java:759-795).

The PySpark re-expression: the engine accumulates per-partition applied-offset
counters in the table's own properties (``partition_counts`` — committed
atomically with the data, so they cannot drift), and the gate compares them
against expected counts from any audit source. Only partitions whose counts
MATCH get their ``completeness_watermark`` advanced to the committed offset
watermark; short-delivered partitions hold their previous mark until the
missing data lands."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lake import SnapshotTable


def audit_counts(df: DataFrame, partition_col: str = "log_partition") -> DataFrame:
    """Per-partition record counts — one column-pruned aggregate (the shape
    an AuditCountClient query has on either side of the pipe)."""
    return df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n_records"))


def completeness_report(
    applied: DataFrame, expected: DataFrame, partition_col: str = "log_partition"
) -> DataFrame:
    """(partition, n_applied, n_expected, complete) — the audit join. A
    partition missing on either side is incomplete (0 ≠ something or
    expected unknown ⇒ cannot be declared complete)."""
    a = applied.select(
        F.col(partition_col), F.col("n_records").alias("n_applied")
    )
    e = expected.select(
        F.col(partition_col), F.col("n_records").alias("n_expected")
    )
    j = a.join(e, partition_col, "full_outer")
    return j.select(
        partition_col,
        F.coalesce("n_applied", F.lit(0)).alias("n_applied"),
        F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
        (
            F.col("n_expected").isNotNull()
            & (F.coalesce("n_applied", F.lit(0)) == F.col("n_expected"))
        ).alias("complete"),
    )


def update_completeness_watermark(
    table: SnapshotTable, expected: dict[int, int]
) -> dict:
    """Advance ``completeness_watermark`` (per partition, to the committed
    offset watermark) ONLY where the table's cumulative applied counts equal
    the audit source's expected counts. Returns a report; holds back (keeps
    the previous mark for) every short- or over-delivered partition.

    The property write is a metadata-only commit (atomic pointer swap), the
    analog of CompletenessWatermarkUpdater stamping the Iceberg table."""
    applied = {
        int(p): int(v) for p, v in table.properties.get("partition_counts", {}).items()
    }
    watermarks = {
        int(p): int(v) for p, v in table.properties.get("watermarks", {}).items()
    }
    current = {
        int(p): int(v)
        for p, v in table.properties.get("completeness_watermark", {}).items()
    }
    advanced, held = {}, {}
    for p, exp in sorted(expected.items()):
        got = applied.get(p, 0)
        if got == exp and p in watermarks:
            advanced[p] = watermarks[p]
        else:
            held[p] = {"applied": got, "expected": exp}
    new_marks = {**{str(p): v for p, v in current.items()},
                 **{str(p): v for p, v in advanced.items()}}
    if advanced:
        table.update_properties({"completeness_watermark": new_marks})
    return {
        "advanced": advanced,
        "held": held,
        "completeness_watermark": {int(p): int(v) for p, v in new_marks.items()},
    }
