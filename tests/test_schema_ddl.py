"""Column rename/drop DDL (≈ Iceberg UpdateSchema.renameColumn/deleteColumn;
the reference evolves Iceberg schemas via IcebergMetadataWriter.java:1039-1078):
metadata-only commits, era data resolved through an ordered name-transition
walk — Iceberg field-id semantics without rewriting a byte of data."""

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
        T.StructField("tag", T.StringType()),
    ]
)

EPOCH = dt.datetime(2026, 1, 1)


def _upd(spark, rows, schema=None):
    """rows: (url, ts_sec, *visible_tail, off, deleted)."""
    base = schema or SCHEMA
    data = [
        (u, EPOCH + dt.timedelta(seconds=ts), *tail, EPOCH + dt.timedelta(seconds=ts), off, d)
        for (u, ts, *tail, off, d) in rows
    ]
    return spark.createDataFrame(
        data,
        T.StructType(
            list(base.fields)
            + [
                T.StructField("_version_ts", T.TimestampType()),
                T.StructField("_version_off", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
            ]
        ),
    )


def _table(spark, tmp_path, **kw):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4, **kw)
    t.merge(
        _upd(spark, [("a", 10, 1, "x", 1, False), ("b", 10, 2, "y", 2, False)]),
        mode="delta",
    )
    return t


def test_rename_is_metadata_only_and_reads_old_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    import os

    dirs_before = sorted(os.listdir(os.path.join(t.root, "data")))
    t.alter_schema(renames={"n": "score"})
    assert sorted(os.listdir(os.path.join(t.root, "data"))) == dirs_before
    fresh = SnapshotTable(spark, t.root)
    assert fresh.schema().fieldNames() == ["url", "warc_ts", "score", "tag"]
    rows = {r["url"]: r["score"] for r in fresh.read_visible().collect()}
    assert rows == {"a": 1, "b": 2}


def test_merge_after_rename_lww_across_eras(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(renames={"n": "score"})
    t = SnapshotTable(spark, t.root)
    renamed = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    t.merge(_upd(spark, [("a", 20, 100, "x2", 5, False)], renamed), mode="delta")
    rows = {
        r["url"]: (r["score"], r["tag"])
        for r in SnapshotTable(spark, t.root).read_visible().collect()
    }
    # new-era row wins LWW for a; old-era b resolves through the rename walk
    assert rows == {"a": (100, "x2"), "b": (2, "y")}


def test_drop_then_readd_reads_null_for_old_data(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(drops=["tag"])
    t = SnapshotTable(spark, t.root)
    assert t.schema().fieldNames() == ["url", "warc_ts", "n"]
    # re-add a column with the SAME name: a new field — old bytes must not leak
    readd = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    t.merge(_upd(spark, [("c", 30, 3, "fresh", 9, False)], readd), mode="delta")
    rows = {r["url"]: r["tag"] for r in SnapshotTable(spark, t.root).read_visible().collect()}
    assert rows == {"a": None, "b": None, "c": "fresh"}


def test_time_travel_sees_old_names(spark, tmp_path):
    t = _table(spark, tmp_path)
    v_before = t.version
    t.alter_schema(renames={"n": "score"})
    fresh = SnapshotTable(spark, t.root)
    old = fresh.read(at_version=v_before)
    assert "n" in old.columns and "score" not in old.columns
    assert "score" in fresh.read_visible().columns


def test_changes_between_across_rename(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.version
    t.alter_schema(renames={"n": "score"})
    t = SnapshotTable(spark, t.root)
    renamed_field = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    t.merge(_upd(spark, [("a", 20, 100, "x2", 5, False)], renamed_field), mode="delta")
    ch = {
        r["url"]: (r["_change_type"], r["score"])
        for r in SnapshotTable(spark, t.root).changes_between(v0, t.version).collect()
    }
    # only a changed; its old-era value walks forward into the score column
    assert ch == {"a": ("update", 100)}


def test_fold_across_rename_boundary(spark, tmp_path):
    t = _table(spark, tmp_path, max_generations=3)
    t.alter_schema(renames={"n": "score"})
    t = SnapshotTable(spark, t.root)
    renamed_field = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("score", T.IntegerType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    # stack generations past the cap so the in-commit fold reads BOTH eras
    for i in range(2, 7):
        t.merge(
            _upd(spark, [("a", 10 * i, i, "x", i, False)], renamed_field), mode="delta"
        )
        t = SnapshotTable(spark, t.root)
    rows = {r["url"]: r["score"] for r in t.read_visible().collect()}
    assert rows == {"a": 6, "b": 2}


def test_sort_order_follows_rename(spark, tmp_path):
    t = _table(spark, tmp_path, sort_order=["n"])
    t.alter_schema(renames={"n": "score"})
    assert SnapshotTable(spark, t.root).sort_order == ["score"]
    t2 = SnapshotTable(spark, t.root)
    t2.alter_schema(drops=["score"])
    assert SnapshotTable(spark, t.root).sort_order == []


def test_guards(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError):
        t.alter_schema(renames={"url": "link"})  # merge key protected
    with pytest.raises(ValueError):
        t.alter_schema(drops=["_deleted"])  # hidden protected
    with pytest.raises(ValueError):
        t.alter_schema(renames={"n": "tag"})  # collision
    with pytest.raises(ValueError):
        t.alter_schema(renames={"ghost": "g2"})  # unknown column
    with pytest.raises(ValueError):
        t.alter_schema()  # nothing to do
    t.delete_where("n >= 99", mode="delta")
    with pytest.raises(ValueError):  # pending pred may reference the column
        SnapshotTable(spark, t.root).alter_schema(renames={"n": "score"})


def test_rename_rebases_on_concurrent_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    stale = SnapshotTable(spark, t.root)
    stale.manifest()  # cache the pre-race head
    t.update_properties({"k": "v"})
    res = stale.alter_schema(renames={"n": "score"})  # conflicts, rebases
    fresh = SnapshotTable(spark, t.root)
    assert fresh.properties["k"] == "v"
    assert fresh.schema().fieldNames() == ["url", "warc_ts", "score", "tag"]
    assert res["version"] == fresh.version


def test_sharded_manifest_rename(spark, tmp_path):
    t = _table(spark, tmp_path, manifest_shards=2)
    t.alter_schema(renames={"tag": "label"})
    rows = {
        r["url"]: r["label"]
        for r in SnapshotTable(spark, t.root).read_visible().collect()
    }
    assert rows == {"a": "x", "b": "y"}


def test_compact_after_rename_materializes_current_names(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(renames={"n": "score"})
    t = SnapshotTable(spark, t.root)
    t.compact()
    fresh = SnapshotTable(spark, t.root)
    rows = {r["url"]: r["score"] for r in fresh.read_visible().collect()}
    assert rows == {"a": 1, "b": 2}
    # post-compact entries are all current-era: the walk is a no-op
    m = fresh.manifest()
    assert all(
        e["schema_id"] == m["current_schema_id"]
        for ent in m["buckets"].values()
        for e in fresh._bucket_entries(ent)
    )
