"""Avro binary envelope decode WITHOUT the spark-avro jar (absent in this
environment, and no network to pull it): a minimal pure-Python Avro binary
codec for FLAT records, plus the Confluent-style envelope framing
(magic 0x00 + big-endian 4-byte schema id + Avro body) and a Spark
``mapInPandas`` decoder with per-record schema-id dispatch — the
``EnvelopeSchemaConverter`` path (reference: gobblin-modules/
gobblin-kafka-common/.../converter/EnvelopeSchemaConverter.java:114-138:
look up writer schema by id, decode payload, hand record downstream).

Supported types: null, boolean, int, long, float, double, bytes, string and
the 2-branch nullable union ["null", T] — the shapes CDC envelopes actually
use. Nested records/arrays/maps are out of scope here; with the spark-avro
package on the cluster, swap ``decode_envelope`` for ``from_avro`` and keep
the same framing helpers.

Decoding a byte-oriented format is inherently per-record work — the rows
stream through Arrow batches (mapInPandas), which is the same execution shape
spark-avro's JVM decoder and fastavro's C decoder use; only the inner loop is
slower here.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

MAGIC = b"\x00"

# (python struct fmt, size) for the fixed-width avro primitives
_FLOAT = struct.Struct("<f")
_DOUBLE = struct.Struct("<d")


# ----------------------------------------------------------- varint / zigzag
def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# -------------------------------------------------------------- record codec
def _encode_value(typ, v) -> bytes:
    if isinstance(typ, list):  # nullable union ["null", T]
        if v is None:
            return _zz_encode(typ.index("null"))
        other = 1 - typ.index("null")
        return _zz_encode(other) + _encode_value(typ[other], v)
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zz_encode(int(v))
    if typ == "float":
        return _FLOAT.pack(v)
    if typ == "double":
        return _DOUBLE.pack(v)
    if typ in ("bytes", "string"):
        raw = v.encode("utf-8") if typ == "string" else bytes(v)
        return _zz_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {typ}")


def _decode_value(typ, buf: bytes, pos: int):
    if isinstance(typ, list):
        idx, pos = _zz_decode(buf, pos)
        branch = typ[idx]
        if branch == "null":
            return None, pos
        return _decode_value(branch, buf, pos)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zz_decode(buf, pos)
    if typ == "float":
        return _FLOAT.unpack_from(buf, pos)[0], pos + 4
    if typ == "double":
        return _DOUBLE.unpack_from(buf, pos)[0], pos + 8
    if typ in ("bytes", "string"):
        n, pos = _zz_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported avro type: {typ}")


def encode_record(fields: list[tuple[str, object]], rec: dict) -> bytes:
    """Avro binary body for a flat record schema [(name, type), ...]."""
    return b"".join(_encode_value(t, rec.get(n)) for n, t in fields)


def decode_record(fields: list[tuple[str, object]], buf: bytes) -> dict:
    out, pos = {}, 0
    for n, t in fields:
        out[n], pos = _decode_value(t, buf, pos)
    return out


# ---------------------------------------------------------- envelope framing
def wrap_envelope(schema_id: int, body: bytes) -> bytes:
    """Confluent wire format: 0x00 magic + big-endian int32 schema id."""
    return MAGIC + struct.pack(">I", schema_id) + body


def envelope_schema_id(payload: bytes) -> int:
    if not payload or payload[0:1] != MAGIC:
        raise ValueError("not an envelope payload (bad magic byte)")
    return struct.unpack_from(">I", payload, 1)[0]


# ------------------------------------------------------------ spark operator
def decode_envelope(df, registry: dict[int, list[tuple[str, object]]], bin_col="payload"):
    """Decode enveloped Avro payloads to typed columns, dispatching each
    record to its WRITER schema by envelope schema id (the schema-registry
    model — a stream may interleave schema versions mid-flight). Columns are
    the union of all registry schemas; records lacking a field get NULL, so
    downstream schema-merge-on-write sees one widest frame per batch.

    Output schema: all original columns except ``bin_col``, plus the decoded
    fields and ``_schema_id``. Corrupt / non-envelope payloads yield NULLs
    with ``_schema_id = -1`` (row-level quality policies divert them)."""
    import pandas as pd
    from pyspark.sql import types as T

    _AVRO_TO_SPARK = {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }

    def spark_type(t):
        if isinstance(t, list):
            return spark_type(next(x for x in t if x != "null"))
        return _AVRO_TO_SPARK[t]

    # Registry versions may WIDEN a field (int in v1, long in v2); the union
    # output schema must take the widest type or values decoded under the
    # wider writer schema get forced into the narrower Spark type (overflow /
    # Arrow cast error). Avro's promotion chain: int → long → float → double.
    _PROMOTE = ["int", "long", "float", "double"]

    def _base(t):
        return next(x for x in t if x != "null") if isinstance(t, list) else t

    def _widen(a, b):
        ba, bb = _base(a), _base(b)
        if ba == bb:
            return a
        if ba in _PROMOTE and bb in _PROMOTE:
            return _PROMOTE[max(_PROMOTE.index(ba), _PROMOTE.index(bb))]
        raise ValueError(
            f"irreconcilable registry types for a shared field: {ba} vs {bb}"
        )

    union_fields: dict[str, object] = {}
    for fields in registry.values():
        for n, t in fields:
            union_fields[n] = _widen(union_fields[n], t) if n in union_fields else t
    passthrough = [f for f in df.schema.fields if f.name != bin_col]
    out_schema = T.StructType(
        passthrough
        + [T.StructField(n, spark_type(t), True) for n, t in union_fields.items()]
        + [T.StructField("_schema_id", T.IntegerType(), True)]
    )
    names = [f.name for f in passthrough]
    fieldnames = list(union_fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                base = {n: pdf[n].iloc[i] for n in names}
                payload = pdf[bin_col].iloc[i]
                try:
                    raw = bytes(payload)
                    sid = envelope_schema_id(raw)
                    rec = decode_record(registry[sid], raw[5:])
                    rows.append(
                        {**base, **{n: rec.get(n) for n in fieldnames}, "_schema_id": sid}
                    )
                except Exception:
                    rows.append(
                        {**base, **dict.fromkeys(fieldnames), "_schema_id": -1}
                    )
            yield pd.DataFrame(rows, columns=names + fieldnames + ["_schema_id"])

    return df.mapInPandas(gen, out_schema)
