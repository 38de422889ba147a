"""Schema evolution: union-by-name merge with widening (≈ IcebergMetadataWriter
candidate-schema computation + updateSchema,
gobblin-iceberg/.../writer/IcebergMetadataWriter.java:455,1039-1078; mid-stream
analog KafkaSchemaChangeInjector.java:53-77).

Rules (Iceberg-compatible): new columns are appended nullable; int→long,
float→double widening allowed; anything else incompatible raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDEN = {
    ("integer", "long"): "long",
    ("float", "double"): "double",
    ("date", "timestamp"): "timestamp",
    ("date", "timestamp_ntz"): "timestamp_ntz",
}

# TIMESTAMP vs TIMESTAMP_NTZ is a session artifact, not a schema change: the
# same parquet column (isAdjustedToUTC=false) reads as TimestampType under
# spark.sql.parquet.inferTimestampNTZ=false and TimestampNTZType under a
# vanilla Spark 4 session. The engine must be correct under ANY session (the
# entry point doesn't control the session), so the merge keeps the TABLE's
# existing flavor and `conform` casts the incoming side — a monotone,
# order-preserving cast under the session time zone.
_EQUIV = {frozenset(("timestamp", "timestamp_ntz"))}


def _merge_type(old: T.DataType, new: T.DataType, path: str) -> T.DataType:
    if old == new:
        return old
    key = (old.typeName(), new.typeName())
    rkey = (new.typeName(), old.typeName())
    if frozenset(key) in _EQUIV:
        return old
    if key in _WIDEN:
        return new
    if rkey in _WIDEN:
        return old
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return merge_schemas(old, new)
    raise ValueError(f"incompatible schema change at {path}: {old} -> {new}")


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union-by-name; old column order preserved, new columns appended."""
    fields: list[T.StructField] = []
    new_by_name = {f.name: f for f in new.fields}
    for f in old.fields:
        if f.name in new_by_name:
            merged = _merge_type(f.dataType, new_by_name[f.name].dataType, f.name)
            fields.append(T.StructField(f.name, merged, True))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    old_names = {f.name for f in old.fields}
    for f in new.fields:
        if f.name not in old_names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def conform(df: DataFrame, target: T.StructType, keep: list[str] | None = None) -> DataFrame:
    """Project df onto target schema: missing columns become typed nulls,
    present columns are cast (widening only, by construction). ``keep`` passes
    extra physical columns (e.g. a precomputed partition key) through
    unchanged — re-deriving them would break Catalyst's recognition of an
    existing hash partitioning on the original attribute."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            col = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for k in keep or []:
        cols.append(F.col(k))
    return df.select(*cols)
