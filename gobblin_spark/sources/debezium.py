"""Debezium-envelope decode: the de-facto binlog/WAL wire format → the
engine's changelog shape, as pure column expressions.

The reference ingests database change streams whose records are Debezium
envelopes (the format its Kafka CDC topics carry; the reference's analogue
is the converter chain decoding the envelope payload —
gobblin-modules/gobblin-kafka-common KafkaExtractor decode +
EnvelopeSchemaConverter.java, which unwraps a (schema, payload) wrapper the
same way). A Debezium JSON envelope is

    {"schema": {...optional...},
     "payload": {"before": {..row..} | null,
                 "after":  {..row..} | null,
                 "op": "c" | "u" | "d" | "r",
                 "ts_ms": <wallclock millis>,
                 "source": {"ts_ms": <db commit millis>,
                            "file": "binlog.000017", "pos": 4711, ...}}}

with two standard wrinkles this module handles:

- **flat vs wrapped**: with the JsonConverter's ``schemas.enable=false``
  (the common Kafka Connect deployment) the value is the payload object
  itself, no ``schema``/``payload`` wrapper. Decode tries the wrapped shape
  first and falls back to flat via ``coalesce`` over two ``from_json``
  parses — no Python, one pass.
- **tombstones**: Debezium emits a null-value record after every delete so
  log-compacted topics drop the key. A null ``value`` with a non-null
  ``key`` decodes to a delete carrying only the key columns.

Op mapping onto the engine's changelog vocabulary: ``c`` (create) and ``r``
(snapshot read) → ``I``, ``u`` → ``U``, ``d`` → ``D``. The row image is
``after`` for c/u/r and ``before`` for d (Debezium's contract: deletes have
``after = null``). Event-time ordering uses ``source.ts_ms`` (the DB commit
timestamp) when present, else the envelope ``ts_ms``; the total order the
LWW fold needs comes from the binlog position (``source.pos``), which maps
onto the engine's ``log_offset`` fencing key exactly as a Kafka offset
would.

Everything is ``from_json`` + struct-field projection — zero Python in the
record path, same discipline as ``kafka_wire_to_changelog``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fields every Debezium ``source`` block carries that the engine uses.
#: Real blocks carry more (db, table, server_id, gtid ...) — from_json
#: ignores extras, and ``extra_source_fields`` declares any the caller
#: wants surfaced.
_BASE_SOURCE_FIELDS = (
    T.StructField("ts_ms", T.LongType()),
    T.StructField("file", T.StringType()),
    T.StructField("pos", T.LongType()),
)


def payload_schema(
    row_schema: T.StructType, extra_source_fields: list[T.StructField] | None = None
) -> T.StructType:
    """The ``payload`` struct type for a given table row schema."""
    source_fields = list(_BASE_SOURCE_FIELDS) + list(extra_source_fields or ())
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("source", T.StructType(source_fields)),
        ]
    )


def envelope_schema(
    row_schema: T.StructType, extra_source_fields: list[T.StructField] | None = None
) -> T.StructType:
    """The wrapped ``{"schema": ..., "payload": ...}`` envelope type.

    ``schema`` is declared as an unparsed string-typed hole (its content is
    Connect-schema metadata the engine never needs; declaring it StringType
    makes from_json skip it cheaply regardless of its actual shape)."""
    return T.StructType(
        [
            T.StructField(
                "payload", payload_schema(row_schema, extra_source_fields)
            ),
        ]
    )


OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_to_changelog(
    df: DataFrame,
    row_schema: T.StructType,
    key_schema: T.StructType | None = None,
    value_col: str = "value",
    key_col: str = "key",
    partition_col: str = "partition",
    offset_col: str = "offset",
    extra_source_fields: list[T.StructField] | None = None,
) -> DataFrame:
    """Decode a batch of Debezium records into the engine's changelog shape.

    ``df`` is anything wire-shaped: a Kafka micro-batch (binary
    key/value + partition/offset) or a file tail with the same columns.
    Output columns: ``log_partition``, ``log_offset``, ``op`` (I/U/D), the
    ``row_schema`` columns (null except the key columns for tombstones),
    ``_ts_ms`` (DB commit millis, envelope wallclock fallback),
    ``_binlog_file``, ``_binlog_pos``. ``log_offset`` is COALESCE(binlog
    pos, transport offset) — inside one binlog file the position is the
    total apply order, exactly the role a Kafka offset plays for the
    engine's gaps-and-islands fencing.
    """
    env_t = envelope_schema(row_schema, extra_source_fields)
    pay_t = payload_schema(row_schema, extra_source_fields)

    value_str = F.col(value_col).cast("string")
    wrapped = F.from_json(value_str, env_t).getField("payload")
    flat = F.from_json(value_str, pay_t)
    # wrapped parse yields NULL payload when the value has no "payload" key
    # (schemas.enable=false); the flat parse of a WRAPPED value yields a
    # struct with null op/after, never wins the coalesce.
    pay = F.coalesce(wrapped, flat)

    op_code = pay.getField("op")
    is_tombstone = value_str.isNull()
    op = (
        F.when(is_tombstone, F.lit("D"))
        .when(op_code == "d", F.lit("D"))
        .when(op_code == "u", F.lit("U"))
        .when(op_code.isin("c", "r"), F.lit("I"))
        .otherwise(F.lit(None).cast("string"))
    )

    row_img = F.when(op_code == "d", pay.getField("before")).otherwise(
        pay.getField("after")
    )

    key_parsed = None
    if key_schema is not None and key_col in df.columns:
        key_parsed = F.from_json(F.col(key_col).cast("string"), key_schema)

    row_cols = []
    for f in row_schema.fields:
        c = row_img.getField(f.name)
        if key_parsed is not None and f.name in key_schema.fieldNames():
            # tombstone / malformed rows: recover key columns from the
            # record key (Debezium's key is the table PK)
            c = F.coalesce(c, key_parsed.getField(f.name))
        row_cols.append(c.alias(f.name))

    src = pay.getField("source")
    return df.select(
        F.col(partition_col).cast("int").alias("log_partition"),
        F.coalesce(src.getField("pos"), F.col(offset_col).cast("long")).alias(
            "log_offset"
        ),
        op.alias("op"),
        *row_cols,
        F.coalesce(src.getField("ts_ms"), pay.getField("ts_ms")).alias("_ts_ms"),
        src.getField("file").alias("_binlog_file"),
        src.getField("pos").alias("_binlog_pos"),
    )


def encode_debezium(
    df: DataFrame,
    row_cols: list[str],
    op_col: str = "op",
    ts_ms_col: str = "_ts_ms",
    file_col: str = "_binlog_file",
    pos_col: str = "_binlog_pos",
    wrapped: bool = False,
) -> DataFrame:
    """Inverse direction (tests + round-trip contracts): changelog rows →
    Debezium JSON ``value`` strings. ``op`` here is Debezium's own c/u/d/r
    vocabulary. Deletes carry ``before`` and a null ``after``; everything
    else carries ``after`` only — the asymmetry the decoder relies on."""
    row_struct = F.struct(*[F.col(c) for c in row_cols])
    is_del = F.col(op_col) == "d"
    payload = F.struct(
        F.when(is_del, row_struct).alias("before"),
        F.when(~is_del, row_struct).alias("after"),
        F.col(op_col).alias("op"),
        F.col(ts_ms_col).cast("long").alias("ts_ms"),
        F.struct(
            F.col(ts_ms_col).cast("long").alias("ts_ms"),
            F.col(file_col).alias("file"),
            F.col(pos_col).cast("long").alias("pos"),
        ).alias("source"),
    )
    body = F.struct(payload.alias("payload")) if wrapped else payload
    return df.withColumn("value", F.to_json(body))
