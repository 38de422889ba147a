"""Portable frequency / cardinality sketches — the PLANNING side of skew
and dedup handling.

The engine already *reacts* to skew (dedup.lww_salted salts hot keys
before the fold shuffle; planner.py packs by size estimate). What picks
the hot keys and sizes the strategy at 10^10 events is a cheap sketch
pass, not a full groupBy: a count-min sketch bounds any key's frequency
from one O(d*w)-row aggregation however many distinct keys exist, and a
K-minimum-values sketch estimates distinct cardinality from the k
smallest hashes — the join-strategy input (broadcast vs shuffle, bucket
count, Bloom m-bits) that Spark's own CBO derives from column stats.

Both sketches are DETERMINISTIC and ENGINE-PORTABLE, the same rail as
operators/membership.py: positions/hashes derive from the two 60-bit
halves of md5 (Kirsch-Mitzenmacher double hashing), so a SQL oracle on a
different engine reproduces every counter and every kept hash exactly —
estimates included, collisions included. Nothing here samples or uses a
process-local seed.

Scale shape:
- cms_build: one explode(depth) + groupBy(row,col) count — map-side
  combinable, output <= d*w rows regardless of input size (a 4x1024
  sketch of 10^10 events is 4096 rows). The input never shuffles.
- cms_estimate / cms_probe: the collected counter table rides the plan
  as a literal array (<= 32 KB at 4x1024); the probe is min() over d
  codegen array lookups — zero shuffle, zero joins.
- kmv_build: global top-k ascending over DISTINCT hashes — Spark
  executes orderBy+limit as TakeOrdered (per-partition top-k, driver
  merge), never a full sort shuffle; the distinct is the only exchange
  and is map-side combinable.

No direct reference counterpart: Gobblin sizes work units from byte
counts (KafkaSource.getWorkunits; see SURVEY §2.2) — record-frequency
sketching belongs to the query-planning layer this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_families import double_hash_positions, portable_hash60

_MAX_DEPTH = 8


def cms_positions(value: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` column indices in ``[0, width)`` for a string
    value — row i probes column (h1 + i*h2) mod width. Delegates to the
    ONE shared Kirsch–Mitzenmacher rail (dedup_families.
    double_hash_positions) so the sketch, the Bloom filter, and every
    SQL oracle stay in sync. Purely codegen."""
    if depth < 1 or depth > _MAX_DEPTH:
        raise ValueError(f"depth must be in [1, {_MAX_DEPTH}], got {depth}")
    return double_hash_positions(value, depth, width)


def cms_build(
    df: DataFrame, col: str | Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Distributed count-min build: returns counters as ``(row_idx int,
    col_idx long, cnt long)`` — at most depth*width rows however large the
    input. One map-side-combinable groupBy; the input itself never
    shuffles (only the <= d*w counter rows do)."""
    value = F.col(col) if isinstance(col, str) else col
    pos = F.posexplode(cms_positions(value, depth, width))
    return (
        df.select(pos.alias("row_idx", "col_idx"))
        .groupBy("row_idx", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_table(
    df: DataFrame, col: str | Column, depth: int = 4, width: int = 1024
) -> list[int]:
    """Collect a built sketch into the flat ``row_idx*width + col_idx``
    counter list that probes embed in the plan. Metadata-sized by
    construction (d*w longs — 32 KB at 4x1024)."""
    flat = [0] * (depth * width)
    for r in cms_build(df, col, depth, width).collect():
        flat[r["row_idx"] * width + r["col_idx"]] = r["cnt"]
    return flat


def cms_estimate(
    df: DataFrame,
    col: str | Column,
    table: list[int],
    depth: int,
    width: int,
    out_col: str = "est_count",
) -> DataFrame:
    """Zero-shuffle frequency estimate: ``out_col`` = min over the d
    counters addressed by the value's positions — the classic CM upper
    bound (never under-counts; over-counts only by collision mass). The
    counter table travels as a plan literal; the probe is array indexing
    in codegen — no join, no aggregation, no Python."""
    if len(table) != depth * width:
        raise ValueError(
            f"table has {len(table)} entries, expected depth*width = {depth * width}"
        )
    value = F.col(col) if isinstance(col, str) else col
    tarr = F.lit(table)
    pos = cms_positions(value, depth, width)
    lookups = [
        F.element_at(
            tarr,
            (F.lit(i * width) + F.element_at(pos, i + 1)).cast("int") + 1,
        )
        for i in range(depth)
    ]
    return df.withColumn(
        out_col, lookups[0] if depth == 1 else F.least(*lookups)
    )


def hot_keys(
    df: DataFrame,
    col: str | Column,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Hot-key detection for the salting decision (dedup.lww_salted /
    SURVEY §2.2 skew handling): keys whose CM estimate >= the threshold.
    Because CM never under-counts, every truly-hot key is returned (no
    false negatives — the property the salting decision needs);
    collision mass can promote a few cold keys, which costs a harmless
    extra salt. Output: (key, est_count); the caller broadcasts it.

    ``candidates`` is the probe set (single column named ``key``). THIS
    is where the sketch pays for itself: probe a NEW batch's keys — or
    next hour's stream — against a sketch built on an earlier window,
    with zero shuffle per probe. When ``candidates`` is omitted the
    probe set is df's own distinct keys, which costs the same
    map-side-combinable shuffle as an exact ``groupBy(key).count()`` —
    correct, but the exact count would do as well; reuse across batches
    is the reason to sketch."""
    value = F.col(col) if isinstance(col, str) else col
    table = cms_table(df, value, depth, width)
    keys = (
        candidates
        if candidates is not None
        else df.select(value.alias("key")).distinct()
    )
    return cms_estimate(keys, "key", table, depth, width).filter(
        F.col("est_count") >= threshold
    )


# ---------------------------------------------------------------------------
# K-minimum-values distinct-cardinality estimator


def kmv_build(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``col`` — the KMV sketch
    itself, mergeable across partitions/batches by union + re-top-k.
    Executed as distinct + TakeOrdered (per-partition top-k, driver-side
    k-way merge): the only exchange is the map-side-combinable distinct."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    value = F.col(col) if isinstance(col, str) else col
    # NULL values hash to NULL and must be excluded BEFORE the top-k:
    # Spark sorts NULLS FIRST ascending (a NULL would usurp a bottom-k
    # slot and skew the estimate by ~k/(k-1)), DuckDB sorts NULLS LAST —
    # the filter keeps the kept set identical on both engines
    return (
        df.select(portable_hash60(value).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """One-row distinct-cardinality estimate: if the k-th smallest of n
    uniform 60-bit hashes is h_k, then n ~= (k-1) * 2^60 / h_k (the
    classic KMV / bottom-k estimator, Bar-Yossef et al. 2002). When fewer
    than k distinct values exist the sketch IS the exact answer.

    The estimate is floor()ed under IEEE-double arithmetic — (k-1)*2^60
    is exactly representable and hardware division rounds identically on
    any engine, so the integer result is portable and oracle-checkable.
    Output: (k_used long, kth_hash long, est_distinct long)."""
    sk = kmv_build(df, col, k).agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    exact = F.col("k_used") < F.lit(k)
    est = F.floor(
        F.lit(float((k - 1) * (1 << 60))) / F.col("kth_hash").cast("double")
    )
    return sk.select(
        F.col("k_used").cast("long").alias("k_used"),
        "kth_hash",
        F.when(exact, F.col("k_used").cast("long"))
        .otherwise(est)
        .cast("long")
        .alias("est_distinct"),
    )
