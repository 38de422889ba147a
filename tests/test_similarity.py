"""Similarity-operator properties: blocked exact near-dup equals brute force,
LSH scale path recalls planted near-duplicates, verify stage exactness."""

from __future__ import annotations

import random

import numpy as np

from gobblin_spark.operators.similarity import (
    embedding_neardup_pairs,
    lsh_neardup_pairs,
)

DIM = 16


def _corpus(spark, n=60, n_dups=12, seed=7):
    """Random unit-ish vectors + planted near-duplicates (sim ≥ 0.99)."""
    rnd = np.random.RandomState(seed)
    vecs = rnd.normal(size=(n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    planted = []
    for j in range(n_dups):
        src = j * 3 % n
        noise = rnd.normal(scale=0.01, size=DIM)
        v = vecs[src] + noise
        rows.append((10_000 + j, [float(x) for x in v]))
        planted.append((src, 10_000 + j))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        planted,
        {i: np.array(v, dtype=np.float32) for i, v in rows},
    )


def _brute(pyvecs, t):
    out = set()
    ids = sorted(pyvecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = pyvecs[a].astype(np.float64), pyvecs[b].astype(np.float64)
            sim = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4)
            if sim >= t:
                out.add((a, b))
    return out


def test_blocked_exact_neardup_equals_brute_force(spark):
    emb, _, pyvecs = _corpus(spark)
    got = {
        (r["a_id"], r["b_id"])
        for r in embedding_neardup_pairs(emb, min_sim_x10k=8000, n_chunks=4).collect()
    }
    assert got == _brute(pyvecs, 0.8)


def test_lsh_neardup_recalls_planted_duplicates(spark):
    emb, planted, pyvecs = _corpus(spark)
    got = {
        (r["a_id"], r["b_id"])
        for r in lsh_neardup_pairs(emb, min_sim_x10k=9500, dim=DIM).collect()
    }
    exact = _brute(pyvecs, 0.95)
    # precision 1 always (exact verify); at sim≥0.99 recall is 1-4e-7 —
    # every planted duplicate must surface
    assert got <= exact
    for pair in planted:
        assert tuple(sorted(pair)) in got


def test_contract_lsh_recall_floor(spark):
    """Enforce the contract query's recall floor (round-3 verdict #7): the
    `emb_lsh_recall` witness reports exact-vs-LSH recall as a value-checked
    NUMBER, but a future re-parametrization could quietly degrade recall and
    simply re-oracle the worse value — this assertion makes that a test
    failure instead. Floor = 9000 bp (the measured recall at the shipped
    parametrization is 10000; 9000 is the separable-regime guarantee)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
    row = entrymod.queries()["emb_lsh_recall"](spark, sf_dir).collect()[0]
    assert row["n_exact"] > 0, "witness must run over a non-empty planted corpus"
    assert row["recall_bp"] >= 9000, (
        f"LSH scale-path recall degraded: {row['recall_bp']} bp < 9000 floor"
    )


def test_random_seed_determinism(spark):
    emb, _, _ = _corpus(spark)
    a = sorted(map(tuple, lsh_neardup_pairs(emb, 9000, dim=DIM).collect()))
    b = sorted(map(tuple, lsh_neardup_pairs(emb, 9000, dim=DIM).collect()))
    assert a == b


def test_ivf_trained_quantizer_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from gobblin_spark.operators.similarity import cosine_topk, ivf_topk, train_centroids

    emb, planted, _ = _corpus(spark, n=60, n_dups=12)
    # training is fully deterministic: identical centroids on repeat runs
    c1 = sorted((r["cell"], tuple(r["cv"])) for r in train_centroids(emb, 8).collect())
    c2 = sorted((r["cell"], tuple(r["cv"])) for r in train_centroids(emb, 8).collect())
    assert c1 == c2
    # planted near-dup (sim>=0.99) must be the exact top-1 for its query;
    # the trained coarse quantizer routes both to probed cells: IVF top-1
    # recall over the planted queries stays high (it's approximate — allow
    # a small miss budget, but a toy/broken quantizer scores near 0.5)
    queries = emb.filter(F.col("vec_id") >= 10_000)
    exact1 = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=1).collect()
    }
    ivf1 = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk(emb, queries, k=1, n_cells=8, nprobe=3).collect()
    }
    hits = sum(1 for q, n in exact1.items() if ivf1.get(q) == n)
    assert hits >= int(0.8 * len(exact1)), (hits, len(exact1))
