"""Kafka tail wiring: wire-schema → changelog mapping, watermark-resume
offset arithmetic, and the foreachBatch body over the EXACT wire shape the
Spark Kafka source emits — end-to-end without a broker (a static DataFrame
of KAFKA_WIRE_SCHEMA feeds the identical transform + apply path). The
broker-attached entry (`tail_kafka`) needs the spark-sql-kafka jar + a
reachable broker and is skip-marked in this sandbox — the same
deployable-claim pattern as the Iceberg backend conformance suite.

Reference: KafkaSource.java:544-683 (offset resume/bootstrap),
KafkaExtractor record decode → converter chain."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.engine import CdcEngine
from gobblin_spark.lake import SnapshotTable
from gobblin_spark.sources import (
    KAFKA_WIRE_SCHEMA,
    kafka_stream_options,
    kafka_wire_to_changelog,
    starting_offsets_from_watermarks,
    tail_kafka,
)

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _wire_row(partition, offset, op, url, ts, html: bytes | None, lang="en"):
    import base64

    payload = {
        "op": op,
        "url": url,
        "warc_ts": ts,
        "html_b64": base64.b64encode(html).decode() if html is not None else None,
        "lang": lang,
    }
    return Row(
        key=url.encode(),
        value=json.dumps(payload).encode(),
        topic="pages",
        partition=partition,
        offset=offset,
        timestamp=None,
        timestampType=0,
    )


@pytest.fixture()
def wire_batch(spark):
    rows = [
        _wire_row(0, 0, "I", "https://a.example/1", "2026-01-01 00:00:00", b"<p>v1</p>"),
        _wire_row(0, 1, "U", "https://a.example/1", "2026-01-01 00:01:00", b"<p>v2</p>"),
        _wire_row(1, 0, "I", "https://a.example/2", "2026-01-01 00:00:30", b"<p>x</p>"),
        _wire_row(1, 1, "D", "https://a.example/2", "2026-01-01 00:02:00", None),
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_starting_offsets_resume_arithmetic():
    # committed watermark = last APPLIED offset; Spark wants the FIRST to read
    so = starting_offsets_from_watermarks("pages", {0: 41, 1: -1, 2: 0})
    assert so == {"pages": {"0": 42, "1": -2, "2": 1}}
    # latest-bootstrap policy for never-seen partitions
    so = starting_offsets_from_watermarks("pages", {3: -1}, default="latest")
    assert so == {"pages": {"3": -1}}
    # no state at all -> plain bootstrap string
    assert starting_offsets_from_watermarks("pages", {}) == "earliest"
    # and it composes with the option builder as real JSON
    opts = kafka_stream_options(
        "broker:9092", "pages", starting_offsets=starting_offsets_from_watermarks(
            "pages", {0: 41}
        )
    )
    assert json.loads(opts["startingOffsets"]) == {"pages": {"0": 42}}


def test_wire_to_changelog_mapping(spark, wire_batch):
    out = kafka_wire_to_changelog(wire_batch, VALUE_SCHEMA)
    assert set(out.columns) == {
        "log_partition",
        "log_offset",
        "op",
        "url",
        "warc_ts",
        "html",
        "lang",
    }
    rows = {(r["log_partition"], r["log_offset"]): r for r in out.collect()}
    assert rows[(0, 1)]["html"] == b"<p>v2</p>"  # base64 round-trip to binary
    assert rows[(1, 1)]["op"] == "D" and rows[(1, 1)]["html"] is None
    assert rows[(0, 0)]["warc_ts"] is not None


def test_foreachbatch_body_applies_wire_batch_exactly_once(
    spark, tmp_path, wire_batch
):
    """The exact body tail_kafka registers: wire batch → changelog → fenced
    apply_stream_batch. A duplicate delivery (checkpoint loss) must fence."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TABLE_SCHEMA, key="url", n_buckets=4
    )
    eng = CdcEngine(spark, t, job_id="kw", extract=False)
    changelog = kafka_wire_to_changelog(wire_batch, VALUE_SCHEMA)
    r1 = eng.apply_stream_batch(changelog, batch_id="kafka-000000")
    assert not r1.get("skipped")
    # LWW result: url/1 at v2; url/2 deleted
    got = {r["url"]: r for r in t.read().collect()}
    assert list(got) == ["https://a.example/1"]
    assert got["https://a.example/1"]["html"] == b"<p>v2</p>"
    # committed watermarks = last applied offset per partition
    assert eng.committed_watermarks() == {0: 1, 1: 1}
    # redelivered identical batch is fenced out (exactly-once past the
    # checkpoint), and the resume options ask the broker for offset 2
    r2 = eng.apply_stream_batch(changelog, batch_id="kafka-000000-redelivery")
    assert r2.get("skipped") is True
    so = starting_offsets_from_watermarks("pages", eng.committed_watermarks())
    assert so == {"pages": {"0": 2, "1": 2}}


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no Kafka broker / spark-sql-kafka jar in the sandbox; set "
    "KAFKA_BOOTSTRAP=host:port (with the jar on the classpath) to run",
)
def test_tail_kafka_against_live_broker(spark, tmp_path):
    """Deployable-claim test: real readStream.format('kafka') tail applying
    into the table with watermark fencing. Requires an external broker with
    a 'pages' topic carrying the JSON wire payload."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TABLE_SCHEMA, key="url", n_buckets=4
    )
    eng = CdcEngine(spark, t, job_id="kw-live", extract=False)
    q = tail_kafka(
        eng,
        brokers=os.environ["KAFKA_BOOTSTRAP"],
        topic="pages",
        checkpoint_dir=str(tmp_path / "ckpt"),
        value_schema=VALUE_SCHEMA,
        available_now=True,
    )
    q.awaitTermination()
    assert t.read().count() >= 0  # shape check; content depends on the topic
