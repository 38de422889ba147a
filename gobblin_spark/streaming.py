"""Structured Streaming tail of the changelog (≈ the reference's streaming
task flow, StreamModelTaskRunner.java:79-171, re-expressed as
readStream → foreachBatch → fenced MERGE → checkpoint).

Mapping of reference semantics (SURVEY §2.11):
- ``FlushControlMessage`` every flush interval (FlushingExtractor.java:84-85)
  ⇒ the micro-batch trigger (``processingTime`` / ``availableNow``);
- per-record ack + committable-watermark tracking
  (FineGrainedWatermarkTracker.java:181-200) ⇒ micro-batch atomicity: the
  whole batch commits (MERGE + watermarks in one snapshot swap) or replays;
- resume from committed watermarks (KafkaStreamingExtractor.java:305-313)
  ⇒ two independent layers: the stream checkpoint (source progress) AND the
  table's own watermark fencing — if the checkpoint is lost, redelivered
  batches are fenced out by offset, so end-to-end delivery stays exactly-once;
- ``maxOffsetsPerTrigger`` throttling ⇒ ``maxFilesPerTrigger`` on the file
  source (or Kafka's own option when tailing Kafka).

The file-based source here models a binlog landing zone (new files appear as
the log grows); the same ``foreachBatch`` body works unchanged over
``readStream.format("kafka")``.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from .engine import CdcEngine


def tail_changelog(
    engine: CdcEngine,
    changelog_path: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    on_batch=None,
):
    """Start the streaming tail; returns the StreamingQuery.

    Use ``available_now=True`` to drain the current backlog and stop (the
    incremental-batch mode Gobblin's batch jobs implement); a positive
    ``trigger_seconds`` for a continuous tail (the streaming mode).
    """
    spark = engine.spark
    if schema is None:
        schema = spark.read.parquet(changelog_path).schema

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_path)

    def _apply(batch_df, epoch_id: int):
        result = engine.apply_stream_batch(batch_df, batch_id=f"epoch-{epoch_id:06d}")
        if on_batch is not None:
            on_batch(result)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def drain(engine: CdcEngine, changelog_path: str, checkpoint_dir: str, **kwargs) -> list[dict]:
    """Run the tail until the current backlog is fully applied, then stop.
    Returns the per-batch apply results."""
    results: list[dict] = []
    q = tail_changelog(
        engine,
        changelog_path,
        checkpoint_dir,
        available_now=True,
        on_batch=results.append,
        **kwargs,
    )
    q.awaitTermination()
    return results
