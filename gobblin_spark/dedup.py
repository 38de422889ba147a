"""Last-writer-wins dedup per key (≈ the reference's only relational operator:
gobblin-compaction/.../mapreduce/RecordKeyDedupReducerBase.java:58-76 "keep one
record per key, max over delta fields";
gobblin-compaction/.../avro/AvroKeyDedupReducer.java:82-93 lexicographic delta
comparator).

Three physical strategies, same semantics — winner = argmax(version_cols)
per key, lexicographic:

- ``lww_latest``          groupBy + max_by(struct). Map-side partial
                          aggregation means each input partition emits ≤1 row
                          per key BEFORE the shuffle, so hot keys cost
                          O(#partitions) shuffled rows, not O(#events):
                          inherently skew-resistant. Default.
- ``lww_latest_salted``   explicit two-stage salted reduce (pre-reduce on
                          (key, salt), then final per-key reduce). Same
                          guarantee made explicit; useful when the aggregate
                          buffer must stay small or AQE is disabled.
- ``lww_latest_window``   window row_number()==1 — simplest plan, but shuffles
                          every row of a key to one task (skew-prone); kept for
                          oracle-equivalence testing and small dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered(df: DataFrame, version_cols: list[str]):
    return F.struct(*[F.col(c) for c in version_cols])


def lww_latest(df: DataFrame, key_cols: list[str], version_cols: list[str]) -> DataFrame:
    """Keep, per key, the row with the lexicographically greatest version.

    Ties on the full version tuple are impossible in a changelog (offset is
    unique per partition); if fed tied rows, max_by picks an arbitrary one.
    """
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), _ordered(df, version_cols)).alias("_w")
    )
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_latest_salted(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted LWW: stage 1 reduces (key, salt) groups (salt spreads a
    hot key over n_salts reducers), stage 2 reduces the ≤n_salts survivors per
    key. Mirrors the skew-handling intent of the reference's bi-level work-unit
    packer (gobblin-modules/gobblin-kafka-common/.../packer/
    KafkaBiLevelWorkUnitPacker.java:47-60)."""
    payload = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in version_cols]), F.lit(n_salts))
    )
    stage1 = salted.groupBy(*key_cols, "_salt").agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), _ordered(df, version_cols)).alias("_w")
    )
    stage1 = stage1.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    return lww_latest(stage1, key_cols, version_cols)


def lww_latest_window(df: DataFrame, key_cols: list[str], version_cols: list[str]) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in version_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
