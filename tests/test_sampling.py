"""Deterministic sampling + shard packing (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.sampling import (
    pack_shards,
    sample_stratified,
    shard_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de", 50 + (i * 37) % 400) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, w long")


def test_stratified_deterministic_and_rate(docs):
    s1 = sample_stratified(docs, "doc_id", "lang", {"en": 5000, "de": 1000})
    s2 = sample_stratified(docs, "doc_id", "lang", {"en": 5000, "de": 1000})
    a = sorted(r["doc_id"] for r in s1.collect())
    assert a == sorted(r["doc_id"] for r in s2.collect())
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 2000 en docs @50%, 1000 de @10%: binomial, generous tolerance
    assert 850 <= counts["en"] <= 1150
    assert 55 <= counts["de"] <= 150


def test_stratified_default_and_zero(docs):
    none_kept = sample_stratified(docs, "doc_id", "lang", {"en": 0}, default_bp=0)
    assert none_kept.count() == 0
    all_en = sample_stratified(docs, "doc_id", "lang", {"en": 10000}, default_bp=0)
    assert all_en.count() == 2000 and all_en.filter(F.col("lang") == "de").count() == 0


def test_stratified_salt_decorrelates(docs):
    a = {r["doc_id"] for r in sample_stratified(docs, "doc_id", "lang", {"en": 3000}, salt="s1").collect()}
    b = {r["doc_id"] for r in sample_stratified(docs, "doc_id", "lang", {"en": 3000}, salt="s2").collect()}
    inter = len(a & b)
    # independent draws: |a∩b| ≈ 0.3 · |a|, certainly not ≈ |a|
    assert inter < 0.6 * min(len(a), len(b))


def _reference_pack(pdf: pd.DataFrame, budget: int) -> dict[int, int]:
    """Single-threaded greedy packer over the md5-hash-shuffled order."""

    def h60(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    pdf = pdf.assign(_h=pdf.doc_id.map(h60)).sort_values(["_h", "doc_id"])
    out, acc = {}, 0
    for r in pdf.itertuples(index=False):
        out[r.doc_id] = acc // budget
        acc += r.w
    return out


def test_pack_matches_sequential_reference(docs):
    pdf = docs.select("doc_id", "w").toPandas()
    want = _reference_pack(pdf, budget=10_000)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, "doc_id", "w", budget=10_000, n_buckets=16).collect()
    }
    assert got == want


def test_pack_invariant_under_bucket_count(docs):
    a = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, "doc_id", "w", budget=25_000, n_buckets=4).collect()
    }
    b = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(docs, "doc_id", "w", budget=25_000, n_buckets=64).collect()
    }
    assert a == b  # the parallel decomposition must not leak into the result


def test_pack_shard_stats(docs):
    packed = pack_shards(docs, "doc_id", "w", budget=30_000, n_buckets=8)
    stats = {r["shard_id"]: r for r in shard_stats(packed).collect()}
    sids = sorted(stats)
    assert sids == list(range(len(sids)))  # contiguous shard ids from 0
    total = sum(r["total_weight"] for r in stats.values())
    assert total == sum(r["w"] for r in docs.select("w").collect())
    # every shard but the last crosses the budget (docs are atomic: a shard
    # closes only once its cumulative weight reaches the boundary)
    for s in sids[:-1]:
        assert stats[s]["total_weight"] >= 30_000 - 449  # max single weight below budget
    # no shard holds more than budget + one max-weight doc
    assert all(r["total_weight"] < 30_000 + 450 for r in stats.values())


def test_pack_rejects_bad_bucket_count(docs):
    with pytest.raises(ValueError):
        pack_shards(docs, "doc_id", "w", budget=1000, n_buckets=6)


# ------------------------------------------------------- per-group top-k cap


def test_top_k_per_group_equals_naive_window(spark):
    """The skew-safe two-phase plan returns exactly the naive window's
    answer, including rank values, on a skewed multi-partition input."""
    import random

    from pyspark.sql import Window as W

    from gobblin_spark.operators.sampling import top_k_per_group

    rng = random.Random(11)
    rows = [("hot", i, rng.randrange(10**6)) for i in range(5000)] + [
        (f"g{i % 37}", 10000 + i, rng.randrange(10**6)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "host string, id long, score long").repartition(16)
    order = [F.col("score").desc(), F.col("id").asc()]
    got = top_k_per_group(df, "host", 7, order, rank_col="rk")
    naive = (
        df.withColumn("rk", F.row_number().over(W.partitionBy("host").orderBy(*order)))
        .filter(F.col("rk") <= 7)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # hot group capped at exactly 7
    assert got.filter(F.col("host") == "hot").count() == 7


def test_top_k_per_group_small_groups_pass_through(spark):
    from gobblin_spark.operators.sampling import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 3.0), ("b", 3, 1.0)], "g string, id long, s double"
    )
    out = top_k_per_group(df, "g", 10, [F.col("s").desc(), F.col("id")])
    assert out.count() == 3 and "_grk" not in out.columns and "_lrk" not in out.columns


def test_seeded_shuffle_matches_python_reference(spark):
    import hashlib

    from gobblin_spark.operators.sampling import seeded_shuffle_shards

    keys = [f"doc-{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = {
        r["k"]: (r["shard_id"], r["shard_pos"])
        for r in seeded_shuffle_shards(df, "k", n_shards=8, seed=42).collect()
    }

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    by_shard = {}
    for k in keys:
        by_shard.setdefault(h60(f"42|{k}") % 8, []).append(k)
    for sid, members in by_shard.items():
        members.sort(key=lambda k: (h60(f"42|{k}"), k))
        for pos, k in enumerate(members, 1):
            assert out[k] == (sid, pos), k
    # positions are contiguous 1..n per shard and the seed reshuffles
    out2 = {
        r["k"]: (r["shard_id"], r["shard_pos"])
        for r in seeded_shuffle_shards(df, "k", n_shards=8, seed=43).collect()
    }
    assert out2 != out
