"""Time travel (read at_version) and incremental change reads
(changes_between) — the CDC *read* side of the snapshot table
(≈ Iceberg VERSION AS OF + incremental changelog scan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.lake import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.IntegerType()),
    ]
)


def _upd(spark, rows):
    data = [
        (
            u,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            n,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            off,
            deleted,
        )
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


@pytest.fixture(params=["rewrite", "delta"])
def table3(request, spark, tmp_path):
    """v1: a,b inserted · v2: a updated, b deleted, c inserted · v3: compact."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.merge(_upd(spark, [("a", 1, 1, 10, False), ("b", 1, 2, 11, False)]), mode=request.param)
    t.merge(
        _upd(spark, [("a", 5, 100, 20, False), ("b", 6, 0, 21, True), ("c", 7, 3, 22, False)]),
        mode=request.param,
    )
    t.compact()
    return t


def test_read_at_version(table3):
    t = table3
    assert t.version == 3
    v1 = {r["url"]: r["n"] for r in t.read(at_version=1).collect()}
    assert v1 == {"a": 1, "b": 2}
    v2 = {r["url"]: r["n"] for r in t.read(at_version=2).collect()}
    assert v2 == {"a": 100, "c": 3}
    # current read unaffected
    assert {r["url"]: r["n"] for r in t.read_visible().collect()} == v2


def test_changes_between_classifies(table3):
    t = table3
    ch = {r["url"]: r for r in t.changes_between(1, 2).collect()}
    assert {u: r["_change_type"] for u, r in ch.items()} == {
        "a": "update",
        "b": "delete",
        "c": "insert",
    }
    # insert/update carry v_to values; delete carries the last-visible row
    assert ch["a"]["n"] == 100 and ch["c"]["n"] == 3 and ch["b"]["n"] == 2
    # hidden columns never leak
    assert not any(c.startswith("_version") for c in ch["a"].asDict())


def test_changes_across_compaction_is_empty(table3):
    # compaction rewrites files but changes no logical rows
    assert table3.changes_between(2, 3).count() == 0


def test_changes_prune_untouched_buckets(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=16)
    t.merge(_upd(spark, [(f"u{i}", 1, i, i, False) for i in range(64)]))
    t.merge(_upd(spark, [("u0", 5, 999, 100, False)]))
    m1, m2 = t.manifest_at(1)["buckets"], t.manifest_at(2)["buckets"]
    changed = [b for b in m2 if m1.get(b) != m2.get(b)]
    assert len(changed) == 1  # manifest diff isolates the single touched bucket
    ch = t.changes_between(1, 2).collect()
    assert [(r["url"], r["_change_type"], r["n"]) for r in ch] == [("u0", "update", 999)]


def test_changes_full_window_equals_current_state(table3):
    t = table3
    ch = t.changes_between(0, t.version)
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    got = {(r["url"], r["n"]) for r in ch.collect()}
    want = {(r["url"], r["n"]) for r in t.read_visible().collect()}
    assert got == want


def test_changes_per_commit_granularity(spark, tmp_path):
    """per_commit mode (Iceberg changelog-view carry-over shape): a key
    changed by two commits in the window surfaces ONCE PER COMMIT with its
    intermediate version, where net mode folds it to a single row."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.merge(_upd(spark, [("a", 1, 1, 10, False), ("b", 1, 2, 11, False)]))
    t.merge(_upd(spark, [("a", 5, 100, 20, False)]), mode="delta")
    t.merge(
        _upd(spark, [("a", 9, 200, 30, False), ("b", 9, 0, 31, True)]), mode="delta"
    )
    per = sorted(
        (r["url"], r["_commit_version"], r["_change_type"], r["n"])
        for r in t.changes_between(1, 3, granularity="per_commit").collect()
    )
    assert per == [
        ("a", 2, "update", 100),  # the intermediate version net mode folds away
        ("a", 3, "update", 200),
        ("b", 3, "delete", 2),
    ]
    net = {(r["url"], r["_change_type"], r["n"]) for r in t.changes_between(1, 3).collect()}
    assert net == {("a", "update", 200), ("b", "delete", 2)}
    # empty window: zero rows, schema still carries the commit column
    empty = t.changes_between(2, 2, granularity="per_commit")
    assert empty.count() == 0 and "_commit_version" in empty.columns
    with pytest.raises(ValueError, match="granularity"):
        t.changes_between(1, 3, granularity="bogus")


def test_expired_snapshot_raises(table3):
    t = table3
    t.expire_snapshots(keep_last=2)
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read(at_version=1)
    # retained versions still readable
    assert t.read(at_version=t.version).count() == 2


def test_changes_between_bad_window(table3):
    with pytest.raises(ValueError):
        table3.changes_between(2, 1)
