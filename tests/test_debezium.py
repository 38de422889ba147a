from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.sources.debezium import (
    OP_MAP,
    debezium_to_changelog,
    encode_debezium,
    envelope_schema,
    payload_schema,
)

ROW = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)
KEY = T.StructType([T.StructField("url", T.StringType())])


def _wire(spark, records):
    """records: list of (key_json|None, value_json|None, partition, offset)"""
    return spark.createDataFrame(
        [
            (k.encode() if k else None, v.encode() if v else None, p, o)
            for k, v, p, o in records
        ],
        schema=T.StructType(
            [
                T.StructField("key", T.BinaryType()),
                T.StructField("value", T.BinaryType()),
                T.StructField("partition", T.IntegerType()),
                T.StructField("offset", T.LongType()),
            ]
        ),
    )


def _env(op, row, pos, ts_ms=1000, wrapped=True, file="binlog.000001"):
    payload = {
        "before": row if op == "d" else None,
        "after": None if op == "d" else row,
        "op": op,
        "ts_ms": ts_ms + 5,  # wallclock, intentionally != source.ts_ms
        "source": {"ts_ms": ts_ms, "file": file, "pos": pos, "db": "web"},
    }
    return json.dumps({"schema": {"type": "struct"}, "payload": payload} if wrapped else payload)


def test_ops_and_row_image(spark):
    row = {"url": "http://a", "warc_ts": 7, "lang": "en"}
    recs = [
        (None, _env("c", row, 10), 0, 100),
        (None, _env("u", dict(row, lang="de"), 11), 0, 101),
        (None, _env("r", row, 12), 0, 102),
        (None, _env("d", row, 13), 0, 103),
    ]
    out = debezium_to_changelog(_wire(spark, recs), ROW).orderBy("log_offset").collect()
    assert [r["op"] for r in out] == ["I", "U", "I", "D"]
    # binlog pos wins over transport offset as the fencing key
    assert [r["log_offset"] for r in out] == [10, 11, 12, 13]
    assert out[1]["lang"] == "de"
    # delete decodes the BEFORE image (after is null per Debezium contract)
    assert out[3]["url"] == "http://a" and out[3]["warc_ts"] == 7
    # source.ts_ms (db commit time) preferred over envelope wallclock
    assert all(r["_ts_ms"] == 1000 for r in out)
    assert out[0]["_binlog_file"] == "binlog.000001"


def test_flat_payload_schemas_disabled(spark):
    row = {"url": "http://b", "warc_ts": 1, "lang": "fr"}
    recs = [(None, _env("c", row, 20, wrapped=False), 1, 5)]
    out = debezium_to_changelog(_wire(spark, recs), ROW).collect()
    assert out[0]["op"] == "I" and out[0]["url"] == "http://b"
    assert out[0]["log_partition"] == 1 and out[0]["log_offset"] == 20


def test_tombstone_null_value_decodes_key_only_delete(spark):
    recs = [('{"url": "http://gone"}', None, 2, 9)]
    out = debezium_to_changelog(_wire(spark, recs), ROW, key_schema=KEY).collect()
    r = out[0]
    assert r["op"] == "D" and r["url"] == "http://gone"
    assert r["warc_ts"] is None and r["_binlog_pos"] is None
    # no binlog pos on a tombstone -> transport offset is the fencing key
    assert r["log_offset"] == 9


def test_missing_source_pos_falls_back_to_offset(spark):
    v = json.dumps({"after": {"url": "u", "warc_ts": 1, "lang": "en"}, "op": "c", "ts_ms": 50})
    out = debezium_to_changelog(_wire(spark, [(None, v, 0, 77)]), ROW).collect()
    assert out[0]["log_offset"] == 77 and out[0]["_ts_ms"] == 50


def test_unknown_op_yields_null_op(spark):
    v = _env("x", {"url": "u", "warc_ts": 1, "lang": "en"}, 1)
    out = debezium_to_changelog(_wire(spark, [(None, v, 0, 1)]), ROW).collect()
    assert out[0]["op"] is None  # caller's quality gate diverts these


@pytest.mark.parametrize("wrapped", [False, True])
def test_encode_decode_roundtrip(spark, wrapped):
    src = spark.createDataFrame(
        [
            ("http://r/%d" % i, i * 10, "en", op, 1000 + i, "binlog.000002", 500 + i)
            for i, op in enumerate(["c", "u", "d", "r"])
        ],
        "url string, warc_ts long, lang string, op string, _ts_ms long, _binlog_file string, _binlog_pos long",
    )
    wire = (
        encode_debezium(src, ["url", "warc_ts", "lang"], wrapped=wrapped)
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.col("_binlog_pos"))
        .select("value", "partition", "offset")
    )
    out = {
        r["log_offset"]: r
        for r in debezium_to_changelog(wire, ROW).collect()
    }
    for r in src.collect():
        d = out[r["_binlog_pos"]]
        assert d["op"] == OP_MAP[r["op"]]
        assert d["url"] == r["url"] and d["warc_ts"] == r["warc_ts"]
        assert d["_ts_ms"] == r["_ts_ms"] and d["_binlog_file"] == r["_binlog_file"]


def test_no_python_in_record_path(spark):
    """The decode plan must be pure column expressions (no BatchEvalPython /
    ArrowEvalPython / mapInPandas nodes)."""
    v = _env("c", {"url": "u", "warc_ts": 1, "lang": "en"}, 1)
    plan = debezium_to_changelog(
        _wire(spark, [(None, v, 0, 1)]), ROW
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "InPandas" not in plan


def test_decoded_stream_replays_through_engine_lww(spark, tmp_path):
    """End-to-end: Debezium wire records -> decode -> LWW fold matches the
    direct fold of the logical events (the decode layer is transparent)."""
    from gobblin_spark.dedup import lww_latest

    rows = []
    pos = 0
    for i in range(40):
        url = "http://site/%d" % (i % 7)
        op = ["c", "u", "u", "d"][i % 4]
        rows.append(
            (None, _env(op, {"url": url, "warc_ts": i, "lang": "en"}, pos, ts_ms=i), i % 3, pos)
        )
        pos += 1
    decoded = debezium_to_changelog(_wire(spark, rows), ROW, key_schema=KEY)
    folded = lww_latest(
        decoded.withColumnRenamed("_ts_ms", "event_ms"),
        key_cols=["url"],
        version_cols=["event_ms", "log_offset"],
    )
    top = {r["url"]: r for r in folded.collect()}
    # independent driver-side fold
    expect = {}
    for _, v, _, o in rows:
        p = json.loads(v)["payload"]
        row = p["before"] if p["op"] == "d" else p["after"]
        expect[row["url"]] = (p["source"]["ts_ms"], o, p["op"])
    for url, (ts, o, op) in expect.items():
        assert top[url]["log_offset"] == o, url
        assert top[url]["op"] == OP_MAP[op]


def test_schema_builders_shape():
    env = envelope_schema(ROW)
    assert env.fieldNames() == ["payload"]
    pay = payload_schema(ROW, [T.StructField("gtid", T.StringType())])
    assert pay["source"].dataType.fieldNames() == ["ts_ms", "file", "pos", "gtid"]
