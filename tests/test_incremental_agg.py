"""Incremental MV maintenance: the delta algebra on synthetic changelogs
(group-migrating updates, deletes, vanishing groups) and end-to-end
equivalence against from-scratch recompute over a real SnapshotTable's
changes_between feed."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.lake import SnapshotTable
from gobblin_spark.operators.incremental_agg import (
    maintain,
    mv_apply,
    mv_compute,
    mv_delta,
)

def _measures():
    # F.col needs an active SparkContext in pyspark 4 — build lazily
    return {"mv_sum": F.col("amount")}


def _state(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, amount long")


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id long, grp string, amount long, _change_type string"
    )


def _mv_dict(df):
    return {r["grp"]: (r["mv_count"], r["mv_sum"]) for r in df.collect()}


def test_insert_update_delete_including_group_migration(spark):
    prev = _state(
        spark,
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50)],
    )
    mv1 = mv_compute(prev, ["grp"], _measures())
    # id=2 migrates a->b with a new amount; id=3 updates in place;
    # id=5 deleted (old image rides in the changelog); id=6 inserted.
    changes = _changes(
        spark,
        [
            (2, "b", 25, "update"),
            (3, "b", 35, "update"),
            (5, "c", 50, "delete"),
            (6, "a", 60, "insert"),
        ],
    )
    new_state = _state(
        spark,
        [(1, "a", 10), (2, "b", 25), (3, "b", 35), (4, "b", 40), (6, "a", 60)],
    )
    mv2 = maintain(mv1, changes, prev, ["id"], ["grp"], _measures())
    assert _mv_dict(mv2) == _mv_dict(mv_compute(new_state, ["grp"], _measures()))
    # group c vanished entirely (count hit zero) — must be dropped, not 0-row
    assert "c" not in _mv_dict(mv2)


def test_empty_changes_is_identity(spark):
    prev = _state(spark, [(1, "a", 10), (2, "b", 20)])
    mv1 = mv_compute(prev, ["grp"], _measures())
    changes = _changes(spark, [])
    mv2 = maintain(mv1, changes, prev, ["id"], ["grp"], _measures())
    assert _mv_dict(mv2) == _mv_dict(mv1)


def test_delta_alone_groups_by_each_rows_own_group(spark):
    prev = _state(spark, [(1, "a", 100)])
    changes = _changes(spark, [(1, "b", 100, "update")])
    d = {r["grp"]: (r["mv_count"], r["mv_sum"]) for r in
         mv_delta(changes, prev, ["id"], ["grp"], _measures()).collect()}
    assert d == {"a": (-1, -100), "b": (1, 100)}


def test_apply_drops_zero_count_groups(spark):
    mv = spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 5)], "grp string, mv_count long, mv_sum long"
    )
    delta = spark.createDataFrame(
        [("b", -1, -5), ("c", 3, 9)], "grp string, mv_count long, mv_sum long"
    )
    out = _mv_dict(mv_apply(mv, delta, ["grp"], ["mv_sum"]))
    assert out == {"a": (2, 30), "c": (3, 9)}


SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("grp", T.StringType()),
        T.StructField("amount", T.LongType()),
    ]
)


def _batch(spark, rows):
    data = [
        (
            u,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            g,
            a,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=ts),
            off,
            deleted,
        )
        for (u, ts, g, a, off, deleted) in rows
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


def test_maintained_mv_tracks_snapshot_table_changelog(spark, tmp_path):
    """v1..v3 commits on a real table; the MV maintained purely from
    changes_between + pruned pre-image reads equals a from-scratch
    groupBy at every version."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.merge(_batch(spark, [
        ("u1", 1, "x", 10, 1, False),
        ("u2", 1, "x", 20, 2, False),
        ("u3", 1, "y", 30, 3, False),
    ]))
    t.merge(_batch(spark, [
        ("u2", 2, "y", 21, 4, False),   # migrates x -> y
        ("u4", 2, "y", 40, 5, False),   # insert
    ]), mode="delta")
    t.merge(_batch(spark, [
        ("u3", 3, "y", 0, 6, True),     # delete
        ("u1", 3, "x", 11, 7, False),   # in-place update
    ]), mode="delta")

    mv = mv_compute(t.read(at_version=1), ["grp"], _measures())
    for v_from, v_to in [(1, 2), (2, 3)]:
        mv = maintain(
            mv,
            t.changes_between(v_from, v_to),
            t.read(at_version=v_from),
            ["url"],
            ["grp"],
            _measures(),
        )
        direct = mv_compute(t.read(at_version=v_to), ["grp"], _measures())
        assert _mv_dict(mv) == _mv_dict(direct), f"v{v_from}->v{v_to}"
    assert _mv_dict(mv) == {"x": (1, 11), "y": (2, 61)}


def test_mv_tracks_engine_commits(spark, tmp_path):
    """Composition with the REAL ingest loop: the engine replays a
    changelog in multiple fenced batches; an MV maintained from each
    commit's changes_between window equals the from-scratch aggregate of
    the final table — the downstream-consumer story end to end."""
    import os

    from gobblin_spark.engine import CdcEngine
    from helpers import setup_pipeline

    pages, clog, table, eng = setup_pipeline(spark, str(tmp_path))
    v0 = table.version
    eng.run(os.path.join(str(tmp_path), "changelog"), max_events_per_batch=80)
    head = SnapshotTable(spark, table.root)

    measures = {"mv_n": F.length(F.coalesce(F.col("text"), F.lit("")))}
    # bootstrap empty MV at v0, then fold every commit's net window
    mv = mv_compute(head.read(at_version=v0), ["lang"], measures)
    versions = [v0] + [
        v for v in range(v0 + 1, head.version + 1)
    ]
    for v_from, v_to in zip(versions, versions[1:]):
        mv = maintain(
            mv,
            head.changes_between(v_from, v_to),
            head.read(at_version=v_from),
            ["url"],
            ["lang"],
            measures,
        )
    direct = mv_compute(head.read(at_version=head.version), ["lang"], measures)
    assert _mv_dict2(mv, "lang", "mv_n") == _mv_dict2(direct, "lang", "mv_n")


def _mv_dict2(df, g, m):
    return {r[g]: (r["mv_count"], r[m]) for r in df.collect()}


def test_null_group_merges_not_splits(spark):
    """Regression: mv_apply must merge a NULL group's delta into the
    existing NULL-group row (an outer join's null-unsafe keys would
    split them into two rows / strand deletes forever)."""
    prev = _state(spark, [(1, None, 10), (2, "b", 20)])
    mv1 = mv_compute(prev, ["grp"], _measures())
    changes = _changes(spark, [(3, None, 5, "insert"), (1, None, 10, "delete")])
    mv2 = maintain(mv1, changes, prev, ["id"], ["grp"], _measures())
    new_state = _state(spark, [(3, None, 5), (2, "b", 20)])
    assert _mv_dict(mv2) == _mv_dict(mv_compute(new_state, ["grp"], _measures()))
    assert _mv_dict(mv2)[None] == (1, 5)


def test_new_group_with_all_null_measure_matches_recompute(spark):
    """Regression: a group born entirely from NULL-measure rows must
    carry measure 0 in the maintained MV (as mv_compute does), not NULL
    (F.sum over all-NULL)."""
    prev = _state(spark, [(1, "a", 10)])
    mv1 = mv_compute(prev, ["grp"], _measures())
    changes = _changes(spark, [(2, "z", None, "insert"), (3, "z", None, "insert")])
    mv2 = maintain(mv1, changes, prev, ["id"], ["grp"], _measures())
    new_state = _state(spark, [(1, "a", 10), (2, "z", None), (3, "z", None)])
    assert _mv_dict(mv2) == _mv_dict(mv_compute(new_state, ["grp"], _measures()))
    assert _mv_dict(mv2)["z"] == (2, 0)
