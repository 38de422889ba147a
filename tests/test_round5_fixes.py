"""Round-5 hardening (r4 ADVICE items): overlapping-rename rejection,
atomic data-dir claims, rename-based stale-lock reclaim, locked
fast_forward, and the event-time delta-purge fence default."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.lake import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.IntegerType()),
    ]
)


def _upd(spark, rows):
    data = [
        (
            u,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            a,
            b,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            off,
            deleted,
        )
        for (u, ts, a, b, off, deleted) in rows
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


def _table(spark, tmp_path, name="t", **kw):
    root = str(tmp_path / name)
    t = SnapshotTable.create(spark, root, SCHEMA, key="url", n_buckets=4, **kw)
    t.merge(_upd(spark, [("u1", 1, 10, 20, 1, False), ("u2", 2, 30, 40, 2, False)]))
    return t


# ------------------------------------------------ 1. overlapping rename sets
def test_alter_schema_rejects_rename_swap(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="overlap"):
        t.alter_schema(renames={"a": "b", "b": "a"})
    with pytest.raises(ValueError, match="overlap"):
        t.alter_schema(renames={"a": "b", "b": "c"})
    # table still fully readable (no durable transition was committed)
    assert t.read().count() == 2
    # the safe sequential path still achieves a swap
    t.alter_schema(renames={"a": "tmp_x"})
    t2 = SnapshotTable(spark, t.root)
    t2.alter_schema(renames={"b": "a"})
    t3 = SnapshotTable(spark, t.root)
    t3.alter_schema(renames={"tmp_x": "b"})
    rows = {
        r["url"]: (r["a"], r["b"])
        for r in SnapshotTable(spark, t.root).read().collect()
    }
    assert rows == {"u1": (20, 10), "u2": (40, 30)}


# --------------------------------------------------- 2. atomic data-dir claim
def test_alloc_data_rel_claims_atomically(spark, tmp_path):
    t = _table(spark, tmp_path)
    r1 = t._alloc_data_rel(99)
    r2 = t._alloc_data_rel(99)  # second claimant must get a DISTINCT dir
    assert r1 != r2
    assert os.path.isdir(os.path.join(t.root, r1))
    assert os.path.isdir(os.path.join(t.root, r2))


def test_concurrent_delta_writers_do_not_clobber_data(spark, tmp_path):
    """Both writers base on the same head and race delta commits: writer B
    rebases, and — critically — A's data files survive B's overwrite-mode
    write (the pre-fix bug: both picked data/v2, B's write deleted A's
    files, A's committed manifest referenced clobbered data)."""
    t = _table(spark, tmp_path)
    a = SnapshotTable(spark, t.root)
    b = SnapshotTable(spark, t.root)
    a.manifest(), b.manifest()
    ra = a.merge(_upd(spark, [("u1", 10, 11, 21, 10, False)]), mode="delta")
    rb = b.merge(_upd(spark, [("u2", 11, 31, 41, 11, False)]), mode="delta")
    assert rb.get("rebased")
    rows = {
        r["url"]: (r["a"], r["b"])
        for r in SnapshotTable(spark, t.root).read().collect()
    }
    assert rows == {"u1": (11, 21), "u2": (31, 41)}, (ra, rb)


# ------------------------------------------- 3. stale-lock reclaim via rename
def test_stale_lock_reclaim_leaves_fresh_lock_alone(spark, tmp_path, monkeypatch):
    """A lock that is refreshed between the waiter's stat and its reclaim
    attempt must NOT be stolen: the content re-verification restores it."""
    t = _table(spark, tmp_path)
    lock = os.path.join(t.root, "meta", "_lock.main")
    with open(lock, "w") as f:
        f.write("dead-writer\n")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    monkeypatch.setattr(SnapshotTable, "LOCK_TIMEOUT_S", 5.0)
    # normal reclaim still works end-to-end
    t.update_properties({"k": "v"})
    assert SnapshotTable(spark, t.root).properties["k"] == "v"
    assert not os.path.exists(lock)


def test_stale_lock_reclaim_no_leftover_claim_files(spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path)
    lock = os.path.join(t.root, "meta", "_lock.main")
    with open(lock, "w") as f:
        f.write("dead\n")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    monkeypatch.setattr(SnapshotTable, "LOCK_TIMEOUT_S", 5.0)
    t.update_properties({"k": "v"})
    leftovers = [
        f for f in os.listdir(os.path.join(t.root, "meta")) if ".reclaim-" in f
    ]
    assert leftovers == []


# ----------------------------------------------------- 4. locked fast_forward
def test_fast_forward_validates_against_disk_head(spark, tmp_path):
    """fast_forward must see a commit that landed AFTER this handle cached
    its manifest — the stale cached head would otherwise let the swap
    silently discard the concurrent commit."""
    t = _table(spark, tmp_path)
    br = t.create_branch("audit")
    br.merge(_upd(spark, [("u3", 5, 50, 60, 5, False)]), mode="delta")
    # a concurrent writer advances MAIN after `t` cached its manifest
    other = SnapshotTable(spark, t.root)
    other.merge(_upd(spark, [("u4", 6, 70, 80, 6, False)]), mode="delta")
    # main's new head is NOT an ancestor of the audit branch tip → the
    # publish must refuse rather than discard u4's commit
    with pytest.raises(ValueError, match="diverged"):
        t.fast_forward("audit")
    assert SnapshotTable(spark, t.root).read().filter(F.col("url") == "u4").count() == 1


def test_fast_forward_happy_path_still_publishes(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("audit")
    br.merge(_upd(spark, [("u3", 5, 50, 60, 5, False)]), mode="delta")
    t.fast_forward("audit")
    assert SnapshotTable(spark, t.root).read().filter(F.col("url") == "u3").count() == 1


# --------------------------------------- 5. event-time delta purge fence
def test_delta_purge_default_fence_covers_future_dated_events(spark, tmp_path):
    """Rows with event timestamps AHEAD of the driver wall clock must not
    escape a default-fenced compliance purge (pre-fix: fence defaulted to
    time.time(), compared against event-time versions)."""
    t = _table(spark, tmp_path)
    future = int((time.time() + 86400 * 30) )  # 30 days ahead of wall clock
    fdt = dt.datetime.fromtimestamp(future)
    upd = spark.createDataFrame(
        [("u9", fdt, 99, 1, fdt, 9, False)],
        T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField("_version_ts", T.TimestampType()),
                T.StructField("_version_off", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
            ]
        ),
    )
    t.merge(upd, mode="delta")
    res = t.delete_where("a >= 99", mode="delta")  # default fence
    assert res["mode"] == "delta"
    assert SnapshotTable(spark, t.root).read().filter(F.col("url") == "u9").count() == 0
    # and the fence is still a point-in-time statement: a LATER re-upsert
    # matching the predicate resurrects
    upd2 = spark.createDataFrame(
        [("u9", fdt + dt.timedelta(seconds=10), 99, 2, fdt + dt.timedelta(seconds=10), 10, False)],
        upd.schema,
    )
    SnapshotTable(spark, t.root).merge(upd2, mode="delta")
    assert (
        SnapshotTable(spark, t.root).read().filter(F.col("url") == "u9").count() == 1
    )
