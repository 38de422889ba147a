"""Version-selection retention policies (VERDICT r2 #9) — pure policy unit
tests over fabricated histories + contract-grade application on a live
table. Reference: gobblin-data-management retention/policy + policy/
(NewestKRetentionPolicy.java:39, TimeBasedRetentionPolicy.java:48,
CombineRetentionPolicy.java, NewestKSelectionPolicy.java:140)."""

from __future__ import annotations

import os

import pytest

from gobblin_spark.retention import (
    CombineRetentionPolicy,
    NewestKRetentionPolicy,
    NewestKSelectionPolicy,
    SelectAfterTimeBasedPolicy,
    SelectBeforeTimeBasedPolicy,
    TimeBasedRetentionPolicy,
    VersionInfo,
    apply_retention,
    list_versions,
)
from tests.test_iceberg_backend import SCHEMA, _updates
from gobblin_spark.lake import SnapshotTable


def _hist(*specs):
    """specs: (version, committed_at) newest-first; last one current=False."""
    vs = [VersionInfo(version=v, committed_at=t) for v, t in specs]
    if vs:
        vs[0] = VersionInfo(vs[0].version, vs[0].committed_at, vs[0].data_dirs, True)
    return vs


HIST = _hist((5, 500.0), (4, 400.0), (3, 300.0), (2, 200.0), (1, 100.0))


def test_newest_k_retention():
    assert NewestKRetentionPolicy(2).deletable(HIST) == {1, 2, 3}
    assert NewestKRetentionPolicy(10).deletable(HIST) == set()
    with pytest.raises(ValueError):
        NewestKRetentionPolicy(0)


def test_time_based_retention_injectable_now():
    # age > 250s at now=600 → cutoff 350 → versions 1..3
    assert TimeBasedRetentionPolicy(250.0, now=600.0).deletable(HIST) == {1, 2, 3}
    assert TimeBasedRetentionPolicy(10_000.0, now=600.0).deletable(HIST) == set()
    # pre-timestamp manifests (committed_at 0.0) count as old
    old = _hist((2, 0.0), (1, 0.0))
    assert TimeBasedRetentionPolicy(1.0, now=100.0).deletable(old) == {1, 2}


def test_combine_union_and_intersect():
    newest2 = NewestKRetentionPolicy(2)          # {1,2,3}
    aged = TimeBasedRetentionPolicy(350.0, now=600.0)  # cutoff 250 → {1,2}
    assert CombineRetentionPolicy([newest2, aged], op="intersect").deletable(HIST) == {1, 2}
    assert CombineRetentionPolicy([newest2, aged], op="union").deletable(HIST) == {1, 2, 3}
    with pytest.raises(ValueError):
        CombineRetentionPolicy([], op="union")
    with pytest.raises(ValueError):
        CombineRetentionPolicy([newest2], op="xor")


def test_selection_policies():
    assert [v.version for v in NewestKSelectionPolicy(2).select(HIST)] == [5, 4]
    assert [v.version for v in NewestKSelectionPolicy(2, exclude=True).select(HIST)] == [3, 2, 1]
    assert [v.version for v in SelectBeforeTimeBasedPolicy(300.0).select(HIST)] == [2, 1]
    assert [v.version for v in SelectAfterTimeBasedPolicy(300.0).select(HIST)] == [5, 4, 3]


def test_apply_retention_on_live_table(spark, tmp_path):
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "t"), SCHEMA, key="url", n_buckets=4)
    for i in range(4):
        t.merge(_updates(spark, [(f"u{i}", f"v{i}", 1, i)]))
    hist = list_versions(t)
    assert [v.version for v in hist] == [4, 3, 2, 1, 0] and hist[0].is_current
    assert all(hist[i].committed_at >= hist[i + 1].committed_at for i in range(len(hist) - 1))

    removed = apply_retention(t, NewestKRetentionPolicy(2))
    assert removed == [0, 1, 2]
    # table still fully readable; current untouched
    assert {r["url"] for r in t.read_visible().collect()} == {"u0", "u1", "u2", "u3"}
    # surviving manifests' data dirs still exist, orphaned ones are gone
    survivors = list_versions(t)
    assert [v.version for v in survivors] == [4, 3]
    live_dirs = set().union(*(v.data_dirs for v in survivors))
    on_disk = {f"data/{d}" for d in os.listdir(os.path.join(t.root, "data"))}
    assert live_dirs <= on_disk and on_disk <= live_dirs


def test_apply_retention_never_deletes_current(spark, tmp_path):
    t = SnapshotTable.create(spark, os.path.join(str(tmp_path), "t"), SCHEMA, key="url", n_buckets=4)
    t.merge(_updates(spark, [("a", "v1", 1, 1)]))
    # a policy that wants everything gone still can't take the current version
    removed = apply_retention(t, TimeBasedRetentionPolicy(0.0, now=10**12))
    assert t.version not in removed
    assert {r["url"] for r in t.read_visible().collect()} == {"a"}


def test_remove_orphans_sweeps_crash_strands(spark, tmp_path):
    """Crash-stranded artifacts (written-but-never-committed data dir with a
    Spark _temporary tree, half-written shard .tmp, mkstemp stray in meta/)
    are swept once quiescent past the grace window; everything a retained
    manifest references survives, and the table stays byte-identical."""
    from gobblin_spark.retention import remove_orphans

    t = SnapshotTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, key="url", n_buckets=4
    )
    for i in range(3):
        t.merge(_updates(spark, [(f"u{i}", f"v{i}", 1, i)]))
    before = {(r["url"], r["text"]) for r in t.read_visible().collect()}

    # simulate a crash between data write and pointer swap
    strand = os.path.join(t.root, "data", "v000099")
    os.makedirs(os.path.join(strand, "_temporary", "0"))
    open(os.path.join(strand, "part-00000.parquet"), "wb").write(b"x" * 64)
    os.makedirs(os.path.join(t.root, "meta", "shards"), exist_ok=True)
    open(os.path.join(t.root, "meta", "shards", "s_999.json.tmp"), "w").write("{}")
    open(os.path.join(t.root, "meta", "tmpabc123"), "w").write("")

    now = os.path.getmtime(strand) + 10.0
    # inside the grace window: nothing is deleted, strands reported as recent
    res = remove_orphans(t, grace_s=3600.0, now=now)
    assert res["removed_dirs"] == [] and res["removed_files"] == []
    assert "data/v000099" in res["kept_recent"]
    assert os.path.isdir(strand)

    # past the grace window: strands swept, referenced dirs untouched
    res = remove_orphans(t, grace_s=5.0, now=now + 60.0)
    assert res["removed_dirs"] == ["data/v000099"]
    assert sorted(res["removed_files"]) == [
        "meta/shards/s_999.json.tmp",
        "meta/tmpabc123",
    ]
    assert not os.path.exists(strand)
    live_dirs = set().union(*(v.data_dirs for v in list_versions(t)))
    on_disk = {f"data/{d}" for d in os.listdir(os.path.join(t.root, "data"))}
    assert on_disk == live_dirs
    assert {(r["url"], r["text"]) for r in t.read_visible().collect()} == before
    # manifests and the pointer are never candidates
    assert os.path.exists(os.path.join(t.root, "meta", "_current"))


def test_remove_orphans_spares_all_retained_history(spark, tmp_path):
    """Every version still on disk (not just the current one) keeps its data:
    time travel to any retained manifest must survive an orphan sweep."""
    from gobblin_spark.retention import remove_orphans

    t = SnapshotTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, key="url", n_buckets=4
    )
    for i in range(3):
        t.merge(_updates(spark, [(f"u{i}", f"v{i}", 1, i)]))
    res = remove_orphans(t, grace_s=0.0, now=os.path.getmtime(t.root) + 10**6)
    assert res["removed_dirs"] == [] and res["removed_files"] == []
    # historical read still works after the sweep
    old = t.read(at_version=1)
    assert old.count() >= 1
