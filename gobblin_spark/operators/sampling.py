"""Training-data export operators: deterministic sampling and token-budget
shard packing.

A 100 TB corpus leaves the lake as TRAINING SHARDS: sampled (per-language /
per-quality-stratum rates), shuffled (decorrelated from crawl order), and
packed into fixed-token-budget files. Both operators here are deterministic
functions of the data — re-running the export on the same snapshot yields
byte-identical shard assignments (the property that makes exports resumable
and auditable), and both are expressible to an independent SQL engine, which
is what the DuckDB contract oracles check.

Scale notes:
- ``sample_stratified`` is a pure row-local filter (portable md5-derived
  hash threshold): zero shuffle, predicate runs inside the parquet scan
  stage, survives any scale trivially.
- ``pack_shards`` needs a GLOBAL cumulative sum over a deterministic
  ordering — the textbook Window-over-global-ORDER-BY collapses to a single
  partition (every row through one task: unusable at 10^10 docs). Here it is
  a two-phase prefix sum: rows are bucketed by hash-range (bucket order ==
  global hash order), per-bucket subtotals (metadata-sized: one row per
  bucket) are prefix-summed on the driver and broadcast-joined back as
  offsets, and the within-bucket cumsum runs as a Window partitioned BY
  BUCKET — full parallelism, one shuffle of (id, weight) pairs. The hash
  ordering doubles as the decorrelating global shuffle: crawl-adjacent pages
  land in different shards by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup_families import portable_hash60

_HASH_SPAN = 1 << 60  # portable_hash60 range: [0, 2^60)


def sample_hash_bp(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic per-row basis-point draw in [0, 10000): the same md5
    construction DuckDB replicates (``('0x'||substr(md5(salt||id),1,15))
    ::BIGINT % 10000``). Salting decorrelates independent samples over the
    same ids (different salt ⇒ independent draw)."""
    return F.pmod(
        portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(10000),
    )


def sample_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions_bp: dict[str, int],
    default_bp: int = 0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its stratum's probability (basis points),
    deterministically: row survives iff hash(salt||id) % 10000 < rate.
    Row-local — no shuffle, no RNG state, reproducible across runs and
    engines; strata not in ``fractions_bp`` fall back to ``default_bp``."""
    rate = F.lit(default_bp)
    for stratum, bp in sorted(fractions_bp.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.filter(sample_hash_bp(id_col, salt) < rate)


def pack_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 256,
    salt: str = "",
) -> DataFrame:
    """Assign every row a ``shard_id`` such that consecutive shards (in the
    deterministic hash-shuffled order) each hold ~``budget`` total weight:
    shard_id = floor(prefix_weight / budget), where prefix_weight is the sum
    of weights of all rows strictly before this one. A shard fills until the
    cumulative weight crosses the budget (the last doc may overshoot — docs
    are atomic), matching greedy sequential packing of the shuffled stream.

    Distributed prefix sum (see module docstring): hash-range buckets give a
    partition-parallel ordering; driver sees only n_buckets subtotal rows.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - n_buckets.bit_length() + 1  # bucket = high-order hash bits
    h = portable_hash60(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_h")
    rows = df.select(F.col(id_col), F.col(weight_col).cast("long").alias("_w"), h)
    # bucket by the TOP hash bits (integer shift — no float rounding, no
    # overflow): bucket order is exactly global hash order
    rows = rows.withColumn("_bkt", F.shiftright("_h", shift).cast("int"))
    # phase 1: per-bucket subtotals — metadata-sized (n_buckets rows)
    subtotals = {
        r["_bkt"]: r["t"]
        for r in rows.groupBy("_bkt").agg(F.sum("_w").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += subtotals.get(b, 0)
    off_df = df.sparkSession.createDataFrame(offsets, "_bkt int, _off long")
    # phase 2: within-bucket cumsum, partitioned BY bucket (parallel), plus
    # the broadcast prefix offset = exact global prefix weight
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.withColumn("_prev", F.coalesce(F.sum("_w").over(w), F.lit(0)))
        .join(F.broadcast(off_df), "_bkt")
        .select(
            F.col(id_col),
            F.col("_w").alias("weight"),
            # INTEGER floor division: double `/` then cast loses exactness
            # once the global prefix weight passes 2^53 — real at the
            # 100 TB corpus this packs; `div` stays in long arithmetic
            F.expr(f"(_prev + _off) div {int(budget)}").alias("shard_id"),
        )
    )


def shard_stats(packed: DataFrame) -> DataFrame:
    """Roll-up for export planning / the contract oracle: one row per shard."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("weight").alias("total_weight")
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_cols: list[Column],
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-``k`` rows of every group under a deterministic total
    order — the per-host/per-domain CAP a web corpus needs before training
    export (C4-style governance: no single domain dominates; keep each
    host's best ``k`` documents, drop the rest).

    SKEW-SAFE two-phase plan, not the textbook single window: a hot host
    with 10^8 rows would funnel its entire group through one task under
    ``row_number() OVER (PARTITION BY host)``. Phase 1 ranks within
    (group, input-partition-id) — the pre-shuffle partition id acts as a
    built-in salt, so a hot group spreads over as many tasks as it has
    input splits and each task keeps only its local top-k. Phase 2 ranks
    the survivors (≤ k × splits-per-group rows, k-bounded, shuffle-light)
    globally per group. Same result as the naive window by construction
    — phase 1 can never evict a global top-k row, because a row beaten by
    k rows in its own split is beaten by k rows globally.

    ``order_cols`` must be a deterministic total order (tie-break on a
    unique id last). With ``rank_col`` set, the global 1-based rank is
    kept in the output."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    local = Window.partitionBy(
        F.col(group_col), F.spark_partition_id()
    ).orderBy(*order_cols)
    survivors = (
        df.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= k)
        .drop("_lrk")
    )
    final = Window.partitionBy(group_col).orderBy(*order_cols)
    out = survivors.withColumn(
        rank_col or "_grk", F.row_number().over(final)
    ).filter(F.col(rank_col or "_grk") <= k)
    return out if rank_col else out.drop("_grk")


def seeded_shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard_id",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic seeded global shuffle into training shards — the
    export-order rail of an LLM data pipeline: training wants documents
    in a reproducible pseudo-random order, re-derivable months later
    from (seed, corpus) alone, never an engine's partition-iteration
    accident.

    shard = portable_hash60(seed|key) mod n_shards; position within the
    shard = rank by (hash, key). Because the hash is the md5-derived
    portable rail shared by every operator here, a different engine (or
    the same corpus re-exported next quarter) reproduces the byte order
    exactly — and changing the seed is a full reshuffle.

    CONTRACT: ``key_col`` must uniquely identify rows (a document id).
    Rows sharing a key value share the sort tuple, and row_number breaks
    that tie arbitrarily — positions among duplicates would then vary by
    run/engine, which is exactly what this operator exists to prevent.
    Dedup first (the pipeline's exact-dedup stage) or key by a unique id.

    Scale shape: this is a global shuffle done WITHOUT a global sort —
    one exchange on the shard id, then each shard sorts independently
    (shards are the parallel unit; pick n_shards from target shard
    size). No driver-side state, no sampled range boundaries.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = portable_hash60(
        F.concat(F.lit(f"{int(seed)}|"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_h"), F.col(key_col))
    return (
        df.withColumn("_h", h)
        .withColumn(shard_col, F.pmod(F.col("_h"), F.lit(int(n_shards))))
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("_h")
    )
