"""rebucket(): hash-bucket-count evolution as one atomic rewrite (≈ Iceberg
partition-spec evolution bucket(N,key)→bucket(M,key) materialized eagerly).
Single-spec invariant: after the commit every reader, point lookup, and
co-partitioned merge uses the NEW bucket function; time travel resolves
probes against each era's own layout; a stale in-flight delta merge aborts
instead of landing rows in the wrong buckets."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from gobblin_spark.lake import CommitConflictError, SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.IntegerType()),
    ]
)

EPOCH = dt.datetime(2026, 1, 1)


def _upd(spark, rows):
    data = [
        (u, EPOCH + dt.timedelta(seconds=ts), n, EPOCH + dt.timedelta(seconds=ts), off, deleted)
        for (u, ts, n, off, deleted) in rows
    ]
    return spark.createDataFrame(
        data,
        T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField("_version_ts", T.TimestampType()),
                T.StructField("_version_off", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
            ]
        ),
    )


ROWS = [(f"u{i}", 10, i, i, False) for i in range(40)] + [("gone", 10, -1, 99, True)]


def _table(spark, tmp_path, **kw):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4, **kw)
    t.merge(_upd(spark, ROWS), mode="delta")
    return t


def test_rebucket_preserves_rows_and_layout(spark, tmp_path):
    t = _table(spark, tmp_path)
    res = t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    assert fresh.n_buckets == 16
    assert {r["url"]: r["n"] for r in fresh.read_visible().collect()} == {
        f"u{i}": i for i in range(40)
    }
    # data dirs on disk follow the new layout
    dirs = os.listdir(os.path.join(t.root, f"data/v{res['version']:06d}"))
    assert len([d for d in dirs if d.startswith("_bucket=")]) > 4


def test_rebucket_keeps_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    hidden = fresh.read(include_hidden=True)
    assert hidden.filter("url = 'gone' AND _deleted").count() == 1


def test_point_lookup_after_rebucket(spark, tmp_path):
    t = _table(spark, tmp_path, sort_order=["url"])
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    got = fresh.read(key_equals="u7").collect()
    assert [r["n"] for r in got] == [7]


def test_time_travel_probe_uses_era_layout(spark, tmp_path):
    t = _table(spark, tmp_path)
    v_old = t.version
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    # probe the OLD snapshot: bucket resolution must use the era's n_buckets=4
    got = fresh.read(at_version=v_old, key_equals="u7").collect()
    assert [r["n"] for r in got] == [7]
    got_new = fresh.read(key_equals="u7").collect()
    assert [r["n"] for r in got_new] == [7]


def test_merge_after_rebucket(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    fresh.merge(_upd(spark, [("u7", 20, 700, 200, False)]), mode="delta")
    final = SnapshotTable(spark, t.root)
    assert final.read(key_equals="u7").collect()[0]["n"] == 700


def test_stale_delta_merge_across_rebucket_aborts(spark, tmp_path):
    t = _table(spark, tmp_path)
    stale = SnapshotTable(spark, t.root)
    stale.manifest()  # cache the 4-bucket head
    t.rebucket(16)
    # the stale handle's files are bucketed under n=4 — rebasing them onto a
    # 16-bucket manifest would misplace rows; the conflict must surface
    with pytest.raises(CommitConflictError):
        stale.merge(_upd(spark, [("u1", 20, 111, 201, False)]), mode="delta")
    # replay against the refreshed table succeeds
    stale._manifest = None
    stale.merge(_upd(spark, [("u1", 20, 111, 201, False)]), mode="delta")
    assert SnapshotTable(spark, t.root).read(key_equals="u1").collect()[0]["n"] == 111


def test_changes_between_across_rebucket_is_no_change(spark, tmp_path):
    t = _table(spark, tmp_path)
    v_old = t.version
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    # pure re-layout: identical logical state ⇒ empty changelog
    assert fresh.changes_between(v_old, fresh.version).count() == 0


def test_rebucket_sharded_manifest(spark, tmp_path):
    t = _table(spark, tmp_path, manifest_shards=2)
    t.rebucket(16)
    fresh = SnapshotTable(spark, t.root)
    assert fresh.n_buckets == 16
    assert fresh.read_visible().count() == 40
