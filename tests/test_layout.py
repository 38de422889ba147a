"""Z-order layout: bit-exact Morton values vs a Python reference, the
axis-aligned bounding-box guarantee per prefix bucket, and the clustered
repartition's file-count/sort shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.layout import (
    z_prefix_bucket,
    z_value,
    zorder_repartition,
    zorder_stats,
)


def _z_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_matches_python_reference(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value(F.col("x"), F.col("y"), 16).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _z_py(x, y, 16), (x, y)


def test_prefix_buckets_are_bounded_boxes(spark):
    """Every prefix bucket must span at most 2^(bits - floor(p/2)) in x
    and 2^(bits - ceil(p/2)) in y — the multi-dim pruning property."""
    rng = random.Random(11)
    bits, p = 10, 4
    pts = [(rng.randrange(1 << bits), rng.randrange(1 << bits)) for _ in range(3000)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = zorder_stats(df, "x", "y", bits=bits, prefix_bits=p).collect()
    assert len(rows) <= (1 << p)
    max_span_x = 1 << (bits - p // 2)
    max_span_y = 1 << (bits - (p + 1) // 2)
    for r in rows:
        assert r["max_x"] - r["min_x"] < max_span_x, r
        assert r["max_y"] - r["min_y"] < max_span_y, r
    # buckets jointly cover all rows
    assert sum(r["n_rows"] for r in rows) == len(pts)


def test_repartition_clusters_and_sorts(spark):
    rng = random.Random(3)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = zorder_repartition(df, "x", "y", bits=16, prefix_bits=3)
    assert out.columns == ["x", "y"]  # helpers dropped
    assert out.rdd.getNumPartitions() == 8
    # within each partition rows are z-sorted (collect preserves
    # within-partition row order; the narrow projection doesn't reorder)
    rows = out.select("x", "y", F.spark_partition_id().alias("pid")).collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(_z_py(r["x"], r["y"], 16))
    assert sum(len(v) for v in by_pid.values()) == len(pts)
    for pid, zs in by_pid.items():
        assert zs == sorted(zs), f"partition {pid} not z-sorted"
    # range partitioning: partitions hold contiguous, non-interleaved z
    # runs (a hash repartition would mix non-adjacent buckets and void
    # the bounding-box pruning property)
    spans = sorted(
        (min(zs), max(zs)) for zs in by_pid.values() if zs
    )
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "partitions interleave in z"


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        z_value(F.col("x"), F.col("y"), 40)
    with pytest.raises(ValueError):
        z_prefix_bucket(F.lit(0), bits=16, prefix_bits=0)
