"""Shared physical-layout helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, col: str) -> DataFrame:
    """Rebalance for a CPU-bound-per-byte stage (hashing, decoding, pandas
    UDFs): hash repartition on ``col`` with a width floor of the cluster
    parallelism.

    A plain REBALANCE hint is wrong here — AQE coalesces by BYTES, and a few
    MB of input collapses to one partition even though its per-row CPU cost
    is thousands of times its size (a single unsplittable parquet row group
    has the same effect). The explicit count keeps every core busy in the
    sandbox while staying data-proportional at scale (never below the
    source's own partition count)."""
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, df.rdd.getNumPartitions())
    return df.repartition(n, F.col(col))
