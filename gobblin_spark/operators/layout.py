"""Z-order (Morton) layout — multi-dimensional file clustering for the
lake's data files.

The lake's sort orders (`lake.py` sort_order + file column stats) give
min/max pruning on ONE leading column; a workload that probes BOTH
(host, time) — the web-crawl point-lookup shape — wants files whose
bounding boxes are tight in both dimensions at once. Interleaving the
bits of the two keys (Morton order) gives a single sort key whose
prefix-ranges are axis-aligned boxes: writing files by z-prefix bounds
BOTH columns per file, so either predicate prunes.

Everything is bit-exact BIGINT arithmetic (shifts/and/or in codegen —
no UDF, no floats), so any engine reproduces the assignment: z_value is
a pure expression, and a z-PREFIX bucket (the top 2k bits) is the
deterministic file-assignment rail — unlike repartitionByRange, whose
sampled boundaries are not reproducible across engines or runs.

Scale shape: z computation is per-row codegen (zero shuffle); the
layout write is one repartition on the prefix bucket — the same single
exchange any clustered write pays. Iceberg's Z-order rewrite
(RewriteDataFiles ZORDER) is the production analogue of exactly this.

Reference parity: Gobblin's writers partition by time only
(TimeBasedWriterPartitioner); multi-dim clustering is part of the lake
layout family this engine adds (see SnapshotTable sort orders,
lake.py:403).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns: result bit 2i is x's bit i, bit 2i+1 is y's bit i. Pure
    codegen (shiftleft/and/or over 2*bits terms); 2*bits <= 62 keeps the
    result in a non-negative BIGINT."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        bit_x = F.shiftright(xm, i).bitwiseAND(F.lit(1))
        bit_y = F.shiftright(ym, i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit_x, 2 * i))
        terms.append(F.shiftleft(bit_y, 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def z_prefix_bucket(z: Column, bits: int = 16, prefix_bits: int = 6) -> Column:
    """The top ``prefix_bits`` of a z-value — the deterministic file/
    bucket assignment. Each bucket is an axis-aligned box in (x, y)
    space: the prefix fixes ceil(prefix_bits/2) high bits of y and
    floor(prefix_bits/2) high bits of x (y holds the odd/top bit), so x
    spans at most 2^(bits - floor(prefix_bits/2)) values and y at most
    2^(bits - ceil(prefix_bits/2)) — the pruning guarantee the layout
    exists for."""
    if not (1 <= prefix_bits <= 2 * bits):
        raise ValueError(f"prefix_bits must be in [1, {2 * bits}], got {prefix_bits}")
    return F.shiftright(z, 2 * bits - prefix_bits)


def zorder_stats(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    bits: int = 16,
    prefix_bits: int = 6,
) -> DataFrame:
    """Per-z-prefix-bucket bounding boxes — what the manifest's file
    column stats would record after a z-ordered write: (bucket, n_rows,
    min/max of both dimensions). The tightness of these boxes IS the
    multi-dim pruning property; a point or range predicate on either
    column eliminates every bucket whose box misses it."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    z = z_value(x, y, bits)
    return (
        df.select(
            x.alias("_x"),
            y.alias("_y"),
            z_prefix_bucket(z, bits, prefix_bits).alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )


def zorder_repartition(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    bits: int = 16,
    prefix_bits: int = 6,
) -> DataFrame:
    """Cluster rows for a z-ordered write: one RANGE exchange on
    (bucket, z), rows sorted by full z within each output task so
    parquet row-group stats stay tight too. The caller writes the result
    with its usual writer.

    Range, NOT hash: ``repartition(n, bucket)`` would place buckets by
    murmur3-hash collisions — ~1/e of files empty and files mixing
    NON-adjacent buckets, whose merged min/max stats span the whole
    domain and prune nothing. Range partitioning keeps every output
    task a CONTIGUOUS z run: a file's bounding box is the union of
    ADJACENT prefix boxes, which is exactly the locality Morton order
    exists to provide (Iceberg's ZORDER rewrite makes the same
    sort-then-split choice). Boundaries come from Spark's range
    sampler — balanced by construction; for the bit-exact DETERMINISTIC
    assignment (stats, pruning proofs, oracles) use z_prefix_bucket."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    z = z_value(x, y, bits)
    return (
        df.withColumn("_z", z)
        .withColumn("_z_bucket", z_prefix_bucket(F.col("_z"), bits, prefix_bits))
        .repartitionByRange(1 << prefix_bits, "_z_bucket", "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_z_bucket")
    )
