"""Batch/streaming duality of sessionization: the batch gaps-and-islands
operator (operators/temporal.py sessionize) must agree with Structured
Streaming's native ``session_window`` aggregation on the same feed —
session extents and event counts, across micro-batch boundaries that cut
sessions in half. (Only session SETS are compared, not per-key ordinals:
session_window does not define a sequence number.)"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.temporal import sessionize


def _mk_events(n=400, n_users=12, seed=3):
    """Deterministic event feed with real inter-session silences."""
    import random

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    clocks = {u: base for u in range(n_users)}
    for i in range(n):
        u = rng.randrange(n_users)
        # mostly short gaps, occasionally a > 30 min silence
        gap = rng.choice([30, 70, 200, 500, 2100, 4000])
        clocks[u] += dt.timedelta(seconds=gap)
        rows.append((u, clocks[u]))
    return rows


def test_session_window_streaming_matches_batch_sessionize(spark, tmp_path):
    rows = _mk_events()
    cut = len(rows) * 2 // 3
    src = str(tmp_path / "landing")
    os.makedirs(src)

    def land(chunk, name):
        t = pa.table(
            {
                "uid": pa.array([r[0] for r in chunk], pa.int64()),
                "ts": pa.array([r[1] for r in chunk], pa.timestamp("us")),
            }
        )
        pq.write_table(t, os.path.join(src, name))

    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    land(rows[:cut], "a.parquet")
    land(rows[cut:], "b.parquet")

    stream = (
        spark.readStream.schema("uid long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("uid", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "uid",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["uid"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }

    ev = spark.createDataFrame(rows, "uid long, ts timestamp")
    batch = sessionize(ev, "uid", "ts", gap_minutes=30)
    expect = {
        (r["uid"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    # streaming emits only watermark-closed sessions; every emitted session
    # must match a batch session exactly, and the bulk must have been emitted
    assert got <= expect, f"streaming emitted sessions batch never saw: {got - expect}"
    assert len(got) >= len(expect) * 0.6, (len(got), len(expect))

    # end semantics differ: session_window's end = last_event + gap
    ends = {
        (r["uid"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    for r in spark.read.parquet(out_dir).collect():
        end, n = ends[(r["uid"], r["session_start"])]
        assert r["session_end"] == end + dt.timedelta(minutes=30)
        assert r["n_events"] == n
