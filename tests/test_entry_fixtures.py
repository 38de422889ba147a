"""Shared contract-query fixtures (r4 verdict next #2b): the engine-level
lake queries share disk-cached, atomically-published fixture tables instead
of each building a private multi-commit table per correctness run. These
tests pin the cache mechanics (build-once, signature invalidation, stale
sweep) and the clone isolation that keeps mutating consumers from
corrupting the shared base.
"""

from __future__ import annotations

import os

import __spark_entry__ as entry


def _mk_sfdir(tmp_path, payload: bytes = b"events-v1") -> str:
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "events.parquet").write_bytes(payload)
    return str(sf)


def test_shared_fixture_builds_once(tmp_path, monkeypatch):
    monkeypatch.setattr(entry.tempfile, "gettempdir", lambda: str(tmp_path / "t"))
    os.makedirs(tmp_path / "t")
    sf = _mk_sfdir(tmp_path)
    calls = []

    def builder(root):
        calls.append(root)
        os.makedirs(root)
        with open(os.path.join(root, "marker"), "w") as f:
            f.write("built")

    r1 = entry._shared_fixture(sf, "unit", builder)
    r2 = entry._shared_fixture(sf, "unit", builder)
    assert r1 == r2 and len(calls) == 1
    assert open(os.path.join(r1, "marker")).read() == "built"
    # the published name never exposes a half-built tree: the builder wrote
    # into a .build-* sibling, not the final path
    assert calls[0] != r1 and calls[0].startswith(r1 + ".build-")


def test_shared_fixture_invalidates_on_testdata_change(tmp_path, monkeypatch):
    monkeypatch.setattr(entry.tempfile, "gettempdir", lambda: str(tmp_path / "t"))
    os.makedirs(tmp_path / "t")
    sf = _mk_sfdir(tmp_path)
    calls = []

    def builder(root):
        calls.append(root)
        os.makedirs(root)

    r1 = entry._shared_fixture(sf, "unit", builder)
    # regenerated testdata (different size ⇒ different signature) must both
    # rebuild AND sweep the stale generation — fixtures may not pin bytes
    # from inputs that no longer exist
    with open(os.path.join(sf, "events.parquet"), "wb") as f:
        f.write(b"events-v2-with-longer-payload")
    r2 = entry._shared_fixture(sf, "unit", builder)
    assert r2 != r1 and len(calls) == 2
    assert not os.path.exists(r1)


def test_clone_is_isolated(tmp_path, monkeypatch):
    monkeypatch.setattr(entry.tempfile, "gettempdir", lambda: str(tmp_path / "t"))
    os.makedirs(tmp_path / "t")
    sf = _mk_sfdir(tmp_path)

    def builder(root):
        os.makedirs(os.path.join(root, "pages"))
        with open(os.path.join(root, "pages", "state"), "w") as f:
            f.write("base")

    root = entry._shared_fixture(sf, "unit", builder)
    clone = entry._clone_table(os.path.join(root, "pages"))
    with open(os.path.join(clone, "state"), "w") as f:
        f.write("mutated")
    assert open(os.path.join(root, "pages", "state")).read() == "base"


def test_mutating_lake_queries_leave_base_fixture_untouched(spark):
    """End-to-end: run the two most destructive consumers (purge + rebucket)
    and assert the shared base table's head version and bucket count are
    unchanged — the clone boundary is what makes sharing sound."""
    from gobblin_spark.lake import SnapshotTable

    sf = "/root/testdata/sf0.001"
    path, _ = entry._base_table_fixture(spark, sf)
    before = SnapshotTable(spark, path)
    v0, nb0 = before.version, before.n_buckets
    entry.queries()["cdc_purge_delta"](spark, sf).count()
    entry.queries()["cdc_rebucket"](spark, sf).count()
    after = SnapshotTable(spark, path)
    assert (after.version, after.n_buckets) == (v0, nb0)
