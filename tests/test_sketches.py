"""Frequency/cardinality sketches: portable positions, exact counter
packing, the never-under-count CM bound, hot-key no-false-negatives, and
KMV exact-below-k / estimate-above-k behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_positions,
    cms_table,
    hot_keys,
    kmv_build,
    kmv_estimate,
)


def _h(s: str) -> tuple[int, int]:
    hx = hashlib.md5(s.encode()).hexdigest()
    return int(hx[0:15], 16), int(hx[16:31], 16)


def _py_positions(s: str, depth: int, width: int) -> list[int]:
    h1, h2 = _h(s)
    return [(h1 + i * h2) % width for i in range(depth)]


def _corpus(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


def test_positions_match_reference_python(spark):
    vals = ["", "a", "url-42", "ünïcödé ✓", "x" * 500]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["v"]: r["pos"]
        for r in df.select(
            "v", cms_positions(F.col("v"), 5, 997).alias("pos")
        ).collect()
    }
    for v in vals:
        assert got[v] == _py_positions(v, 5, 997), v


def test_build_counters_equal_python(spark):
    counts = {f"k{i}": (i % 7) + 1 for i in range(40)}
    depth, width = 3, 128
    expect: dict[tuple[int, int], int] = {}
    for k, n in counts.items():
        for i, p in enumerate(_py_positions(k, depth, width)):
            expect[(i, p)] = expect.get((i, p), 0) + n
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in cms_build(_corpus(spark, counts), "key", depth, width).collect()
    }
    assert got == expect


def test_estimate_never_undercounts_and_is_exact_without_collisions(spark):
    counts = {f"key-{i}": 1 + 10 * i for i in range(20)}
    depth, width = 4, 2048  # sparse: collisions vanishingly unlikely
    df = _corpus(spark, counts)
    table = cms_table(df, "key", depth, width)
    keys = spark.createDataFrame([(k,) for k in counts], "key string")
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(keys, "key", table, depth, width).collect()
    }
    for k, n in counts.items():
        assert est[k] >= n, "CM must never under-count"
        assert est[k] == n, f"no-collision sketch should be exact for {k}"
    # an unseen key with no colliding mass estimates 0
    unseen = spark.createDataFrame([("never-seen-xyz",)], "key string")
    (r,) = cms_estimate(unseen, "key", table, depth, width).collect()
    assert r["est_count"] >= 0


def test_hot_keys_no_false_negatives_under_forced_collisions(spark):
    # width 16 forces heavy collision mass; hot set must still be complete
    counts = {f"cold{i}": 2 for i in range(60)} | {"hot-a": 500, "hot-b": 300}
    got = {
        r["key"]
        for r in hot_keys(_corpus(spark, counts), "key", 300, depth=4, width=16).collect()
    }
    assert {"hot-a", "hot-b"} <= got, "a truly-hot key can never be missed"


def test_estimate_validates_table_size(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError):
        cms_estimate(df, "key", [0] * 10, depth=4, width=16)


def test_kmv_exact_below_k(spark):
    vals = [f"v{i}" for i in range(17)]
    df = spark.createDataFrame([(v,) for v in vals * 3], "key string")  # dups collapse
    (r,) = kmv_estimate(df, "key", k=64).collect()
    assert r["k_used"] == 17
    assert r["est_distinct"] == 17, "below k the sketch IS the exact answer"


def test_kmv_sketch_matches_python_bottom_k(spark):
    vals = [f"item-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    k = 32
    got = [r["h"] for r in kmv_build(df, "key", k).collect()]
    expect = sorted(_h(v)[0] for v in vals)[:k]
    assert got == expect


def test_kmv_estimate_reasonable_above_k(spark):
    n = 3000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "key string")
    (r,) = kmv_estimate(df, "key", k=256).collect()
    # rel. std. err ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(r["est_distinct"] - n) / n < 0.25, r["est_distinct"]


def test_kmv_estimate_portable_arithmetic(spark):
    """The floor((k-1)*2^60 / h_k) double arithmetic must equal the same
    computation in Python (IEEE doubles both sides) — the property the
    DuckDB oracle relies on."""
    vals = [f"p{i}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    k = 16
    hk = sorted(_h(v)[0] for v in vals)[k - 1]
    import math

    expect = math.floor(float((k - 1) * (1 << 60)) / float(hk))
    (r,) = kmv_estimate(df, "key", k=k).collect()
    assert r["kth_hash"] == hk
    assert r["est_distinct"] == expect


def test_kmv_excludes_null_values(spark):
    """A NULL value hashes to NULL and must not usurp a bottom-k slot
    (Spark sorts NULLS FIRST; DuckDB NULLS LAST — excluding them keeps
    the kept set identical on both engines)."""
    vals = [(f"v{i}",) for i in range(40)] + [(None,)]
    df = spark.createDataFrame(vals, "key string")
    ks = [r["h"] for r in kmv_build(df, "key", k=8).collect()]
    assert len(ks) == 8 and all(h is not None for h in ks)
    expect = sorted(_h(f"v{i}")[0] for i in range(40))[:8]
    assert ks == expect
