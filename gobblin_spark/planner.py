"""Watermark-range batch planning (≈ KafkaSource work-unit generation +
KafkaWorkUnitPacker bin packing).

Reference semantics re-expressed:
- one "work unit" per log partition with a ``(low, high]`` offset interval
  (gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:544-683);
- empty partitions still carry their watermark forward
  (KafkaSource.java:848 — empty work unit);
- batch size capping ≈ container-capacity packing
  (…/packer/KafkaWorkUnitPacker.java:313-345) / maxOffsetsPerTrigger.

Physical parallelism inside a batch is Spark's job (partition-pruned scan +
AQE); the planner only decides WHAT offsets each batch covers, from the
committed watermarks in the sink's own properties.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class OffsetRange:
    """Half-open-below interval (low, high] of a log partition, in the spirit
    of WatermarkInterval (gobblin-api/.../extractor/WatermarkInterval.java:30)."""

    partition: int
    low: int  # last already-applied offset (exclusive)
    high: int  # last offset this batch applies (inclusive)

    @property
    def count(self) -> int:
        return self.high - self.low


def discover_high_watermarks(changelog: DataFrame) -> dict[int, int]:
    """Max available offset per partition (distributed scan; parquet
    min/max statistics make this cheap)."""
    rows = (
        changelog.groupBy("log_partition")
        .agg(F.max("log_offset").alias("high"))
        .collect()
    )
    return {int(r["log_partition"]): int(r["high"]) for r in rows}


def plan_batches(
    available: dict[int, int],
    committed: dict[int, int] | None = None,
    max_events_per_batch: int | None = None,
) -> list[list[OffsetRange]]:
    """Slice per-partition backlogs into batches of ≤ max_events_per_batch
    total events (offsets are dense, so event count == offset delta).

    Each batch takes a proportional slice of every lagging partition, so one
    hot partition cannot starve the others (the packers' load-balancing goal).
    Partitions with no new data get no range but their watermark is carried
    forward by the committer (empty-work-unit semantics).
    """
    committed = committed or {}
    lows = {p: committed.get(p, -1) for p in available}
    batches: list[list[OffsetRange]] = []
    while True:
        backlog = {p: available[p] - lows[p] for p in available if available[p] > lows[p]}
        total = sum(backlog.values())
        if total == 0:
            break
        cap = max_events_per_batch or total
        if total <= cap * 1.1:
            # absorb a small remainder instead of emitting a near-empty extra
            # batch (every batch costs a full commit round-trip)
            cap = total
        batch: list[OffsetRange] = []
        for p in sorted(backlog):
            take = backlog[p] if total <= cap else max(1, (backlog[p] * cap) // total)
            take = min(take, backlog[p])
            batch.append(OffsetRange(p, lows[p], lows[p] + take))
            lows[p] += take
        batches.append(batch)
    return batches


def range_predicate(ranges: list[OffsetRange]):
    """Pushdown-friendly filter: partition pruning on log_partition (a hive
    partition column of the changelog) + offset row-group skipping via parquet
    stats on log_offset."""
    pred = None
    for r in ranges:
        clause = (
            (F.col("log_partition") == F.lit(r.partition))
            & (F.col("log_offset") > F.lit(r.low))
            & (F.col("log_offset") <= F.lit(r.high))
        )
        pred = clause if pred is None else (pred | clause)
    return pred if pred is not None else F.lit(False)
