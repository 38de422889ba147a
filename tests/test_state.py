"""State store round-trips (≈ FsStateStoreTest,
gobblin-metastore/src/test/java/org/apache/gobblin/metastore/FsStateStoreTest.java)."""

from __future__ import annotations

from gobblin_spark.state import StateStore


def test_put_get_current_roundtrip(tmp_path):
    s = StateStore(str(tmp_path))
    assert s.get_current("job") is None
    s.put("job", {"watermarks": {"0": 5}})
    s.put("job", {"watermarks": {"0": 9}})
    cur = s.get_current("job")
    assert cur["watermarks"] == {"0": 9}
    assert cur["seq"] == 1


def test_history_ordered(tmp_path):
    s = StateStore(str(tmp_path))
    for i in range(5):
        s.put("job", {"i": i})
    assert [d["i"] for d in s.history("job")] == list(range(5))


def test_stores_isolated(tmp_path):
    s = StateStore(str(tmp_path))
    s.put("a", {"x": 1})
    s.put("b", {"x": 2})
    assert s.get_current("a")["x"] == 1
    assert s.get_current("b")["x"] == 2
