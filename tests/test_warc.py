"""WARC source: round-trip framing, length-driven robustness, fan-out."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gobblin_spark.sources.warc import (
    build_warc_record,
    build_warcinfo,
    parse_warc,
    synth_warc_archives,
)


def test_roundtrip_fields_and_fanout(spark):
    docs = spark.createDataFrame(
        [(i, f"body of doc {i} — ünïcödé ✓" * (1 + i % 3)) for i in range(20)]
        + [(20, None), (21, "")],
        "doc_id long, text string",
    )
    arch = synth_warc_archives(docs, n_files=4)
    assert arch.count() == 4
    rec = parse_warc(arch)
    rows = rec.collect()
    info = [r for r in rows if r["warc_type"] == "warcinfo"]
    resp = {r["target_uri"]: r for r in rows if r["warc_type"] == "response"}
    assert len(info) == 4, "each member opens with warcinfo"
    assert len(resp) == 22
    for i in range(20):
        r = resp[f"http://site/{i}"]
        body = (f"body of doc {i} — ünïcödé ✓" * (1 + i % 3)).encode("utf-8")
        assert bytes(r["body"]) == body
        assert r["http_status"] == 200
        assert r["file_id"] == i % 4
        # WARC Content-Length covers the whole HTTP block
        head_len = 77 + len(str(len(body)))
        assert r["content_length"] == head_len + len(body)
        assert r["warc_date"].endswith("Z") and r["warc_date"].startswith("2024-01-01")
    assert bytes(resp["http://site/20"]["body"]) == b""  # NULL text -> empty
    assert bytes(resp["http://site/21"]["body"]) == b""


def test_parser_is_length_driven_not_marker_driven(spark):
    """A body that CONTAINS a fake WARC header must not derail parsing."""
    evil = "WARC/1.0\r\nWARC-Type: response\r\n\r\nHTTP/1.1 200 OK\r\n\r\nfake"
    docs = spark.createDataFrame(
        [(1, evil), (2, "normal")], "doc_id long, text string"
    )
    rows = parse_warc(synth_warc_archives(docs, n_files=1)).collect()
    resp = {r["target_uri"]: r for r in rows if r["warc_type"] == "response"}
    assert len(resp) == 2
    assert bytes(resp["http://site/1"]["body"]) == evil.encode("utf-8")


def test_build_record_deterministic_and_status():
    b1 = build_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"hi", status=404)
    b2 = build_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"hi", status=404)
    assert b1 == b2
    assert b"HTTP/1.1 404 Not Found\r\n" in b1
    rid = hashlib.md5(b"http://x/1").hexdigest()
    assert f"<urn:md5:{rid}>".encode() in b1
    info = build_warcinfo("f.warc")
    assert info.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")


def test_parse_plan_uses_mapinpandas_only(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = parse_warc(synth_warc_archives(docs, n_files=1))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # downstream column ops stay JVM-side on the parsed rows
    n = out.filter(F.col("warc_type") == "response").count()
    assert n == 1


def test_malformed_http_block_degrades_per_record(spark):
    """A truncated/statusless HTTP payload keeps the raw payload as body
    with status None instead of killing the whole member."""
    import pandas as pd
    from gobblin_spark.sources.warc import _parse_member, build_warc_record

    # well-formed neighbor + record whose HTTP block is truncated pre-\r\n\r\n
    ok = build_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"fine")
    bad_http = b"HTTP/1.1 200 OK\r\nContent-Len"  # no header terminator
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/2\r\n"
        b"Content-Length: " + str(len(bad_http)).encode() + b"\r\n\r\n"
    )
    statusless = b"HTTP/1.1\r\n\r\nbody"
    head2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/3\r\n"
        b"Content-Length: " + str(len(statusless)).encode() + b"\r\n\r\n"
    )
    blob = ok + head + bad_http + b"\r\n\r\n" + head2 + statusless + b"\r\n\r\n"
    rows = list(_parse_member(0, blob))
    by_uri = {r[2]: r for r in rows}
    assert by_uri["http://x/1"][5] == 200 and bytes(by_uri["http://x/1"][6]) == b"fine"
    assert by_uri["http://x/2"][5] is None
    assert bytes(by_uri["http://x/2"][6]) == bad_http, "raw payload preserved"
    assert by_uri["http://x/3"][5] is None
