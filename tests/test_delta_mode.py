"""Merge-on-read delta commits: final-state equivalence with rewrite mode,
tombstones across generations, compaction fold, schema evolution, and the
recompaction trigger on generation growth."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.compaction import RecompactionConditions, recompaction_due
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lake import SnapshotTable

_CLOG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("log_partition", T.IntegerType()),
        T.StructField("log_offset", T.LongType()),
    ]
)

_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _clog(spark, n=200, n_urls=30, seed=11):
    import random

    rnd = random.Random(seed)
    rows = []
    for o in range(n):
        u = rnd.randrange(n_urls)
        op = "D" if rnd.random() < 0.15 else "U"
        rows.append(
            (
                f"u{u}",
                op,
                _ts(rnd.randrange(10_000)),  # out-of-order event time
                None if op == "D" else f"body-{u}-{o}".encode(),
                0,
                o,
            )
        )
    return spark.createDataFrame(rows, _CLOG_SCHEMA)


def _state(table):
    return sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]) if r["html"] else None)
        for r in table.read_visible().collect()
    )


def test_delta_mode_final_state_equals_rewrite(spark, tmp_path):
    clog = _clog(spark)
    states = {}
    for mode in ("rewrite", "delta"):
        t = SnapshotTable.create(
            spark, str(tmp_path / mode), _TABLE_SCHEMA, key="url", n_buckets=4
        )
        engine = CdcEngine(spark, t, job_id=mode, extract=False, merge_mode=mode)
        engine.run(clog, max_events_per_batch=50)  # 4 commits each
        states[mode] = _state(t)
        assert engine.committed_watermarks() == {0: 199}
    assert states["delta"] == states["rewrite"]
    # delta table really has multiple generations before compaction
    dt_ = SnapshotTable(spark, str(tmp_path / "delta"))
    assert any(
        len(dt_._bucket_entries(e)) > 1 for e in dt_.manifest()["buckets"].values()
    )


def test_delta_tombstone_across_generations(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=2)
    engine = CdcEngine(spark, t, job_id="d", extract=False, merge_mode="delta")
    engine.run(
        spark.createDataFrame(
            [("a", "U", _ts(1), b"v1", 0, 0), ("b", "U", _ts(1), b"w1", 0, 1)], _CLOG_SCHEMA
        )
    )
    # delete in a LATER generation hides every earlier version
    engine.run(spark.createDataFrame([("a", "D", _ts(5), None, 0, 2)], _CLOG_SCHEMA))
    assert {r["url"] for r in t.read_visible().collect()} == {"b"}
    # an OLDER update arriving after the delete cannot resurrect the row
    engine.run(spark.createDataFrame([("a", "U", _ts(2), b"late", 0, 3)], _CLOG_SCHEMA))
    assert {r["url"] for r in t.read_visible().collect()} == {"b"}


def test_compaction_folds_generations(spark, tmp_path):
    clog = _clog(spark, n=120)
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=4)
    engine = CdcEngine(spark, t, job_id="d", extract=False, merge_mode="delta")
    engine.run(clog, max_events_per_batch=30)
    before = _state(t)
    cond = RecompactionConditions(
        max_applied_ratio=None, max_versions=None, max_files_per_bucket=2
    )
    assert recompaction_due(t, cond)["due"]  # generations piled up
    t.compact()
    assert all(len(t._bucket_entries(e)) == 1 for e in t.manifest()["buckets"].values())
    assert not recompaction_due(t, cond)["due"]
    assert _state(t) == before  # fold is state-preserving
    # and ingestion continues on top of the folded table
    engine.run(_clog(spark, n=160))
    assert engine.committed_watermarks() == {0: 159}


def test_delta_schema_evolution(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=2)
    engine = CdcEngine(spark, t, job_id="d", extract=False, merge_mode="delta")
    engine.run(spark.createDataFrame([("a", "U", _ts(1), b"v1", 0, 0)], _CLOG_SCHEMA))
    widened = T.StructType(list(_CLOG_SCHEMA.fields) + [T.StructField("lang", T.StringType())])
    engine.run(
        spark.createDataFrame([("b", "U", _ts(2), b"w1", 0, 1, "en")], widened)
    )
    rows = {r["url"]: r["lang"] for r in t.read_visible().collect()}
    assert rows == {"a": None, "b": "en"}  # old generation null-filled on read