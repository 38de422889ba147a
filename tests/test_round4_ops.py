"""Round-4 new operators: partial-image patch merge (operators/patch.py),
chunk-frequency boilerplate dedup, incremental dedup-against-history, and
cluster-representative selection (operators/dedup_families.py,
operators/clustering.py).

The contract queries in __spark_entry__ value-check these against DuckDB at
sf0.01; here the SEMANTICS are pinned on hand-built edge cases the synthetic
corpus cannot guarantee to contain (delete-then-recreate, never-rewritten
columns after a tombstone, trailing tombstone, tie-broken keepers,
fully-boilerplate documents).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.patch import patch_merge
from gobblin_spark.operators.dedup_families import (
    chunk_frequency_dedup,
    dedup_against_history,
)
from gobblin_spark.operators.clustering import cluster_representatives


# ------------------------------------------------------------ patch merge


def _fold(events):
    """Driver-side reference fold: replay the changelog in version order row
    by row — the semantics patch_merge must reproduce in one aggregate."""
    state = {}
    for ts, eid, key, op, a, b in sorted(events, key=lambda e: (e[0], e[1])):
        if op == "D":
            state.pop(key, None)
        else:
            row = state.setdefault(key, {"a": None, "b": None})
            if a is not None:
                row["a"] = a
            if b is not None:
                row["b"] = b
            row["v"] = (ts, eid)
    return state


EVENTS = [
    # key 1: plain patches, no delete — per-column last non-null
    (1, 1, 1, "U", 10, None),
    (2, 2, 1, "U", None, "x"),
    (3, 3, 1, "U", 20, None),
    # key 2: delete resets; only column a re-written afterwards
    (1, 4, 2, "U", 1, "old"),
    (2, 5, 2, "D", None, None),
    (3, 6, 2, "U", 7, None),
    # key 3: trailing tombstone — row must NOT survive
    (1, 7, 3, "U", 5, "gone"),
    (9, 8, 3, "D", None, None),
    # key 4: delete then nothing live before it either (insert after)
    (1, 9, 4, "D", None, None),
    (2, 10, 4, "U", None, "fresh"),
    # key 5: same ts, ordering falls to event_id; later eid wins
    (5, 11, 5, "U", 100, None),
    (5, 12, 5, "U", 200, None),
]


def test_patch_merge_matches_reference_fold(spark):
    df = spark.createDataFrame(
        EVENTS, "ts long, event_id long, k long, op string, a long, b string"
    )
    out = patch_merge(
        df, ["k"], ["ts", "event_id"], ["a", "b"], F.col("op") == "D"
    )
    got = {r["k"]: r.asDict() for r in out.collect()}
    exp = _fold(EVENTS)
    assert sorted(got) == sorted(exp)
    for k, row in exp.items():
        assert got[k]["a"] == row["a"], (k, got[k], row)
        assert got[k]["b"] == row["b"], (k, got[k], row)
        assert (got[k]["last_ts"], got[k]["last_event_id"]) == row["v"]


def test_patch_merge_is_single_exchange(spark):
    df = spark.createDataFrame(
        EVENTS, "ts long, event_id long, k long, op string, a long, b string"
    )
    plan = patch_merge(
        df, ["k"], ["ts", "event_id"], ["a", "b"], F.col("op") == "D"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # one hash agg, map-side combined


# --------------------------------------------------- chunk-frequency dedup


def test_chunk_dedup_strips_hot_chunks_and_recomposes(spark):
    boiler = "all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique words {i} tail{i} x{i}") for i in range(5)]
        + [(99, "totally original prose only")],
        "doc_id long, text string",
    )
    out = chunk_frequency_dedup(
        docs, words_per_chunk=3, max_occurrences=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # 'all rights reserved' appears 5x > 4 -> stripped everywhere
    for i in range(5):
        assert by_id[i]["n_removed"] == 1
        assert by_id[i]["clean_text"] == f"unique words {i} tail{i} x{i}"
    assert by_id[99]["n_removed"] == 0
    assert by_id[99]["clean_text"] == "totally original prose only"


def test_chunk_dedup_fully_boilerplate_doc_empties(spark):
    docs = spark.createDataFrame(
        [(i, "spam spam spam") for i in range(6)], "doc_id long, text string"
    )
    out = chunk_frequency_dedup(docs, words_per_chunk=3, max_occurrences=2).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


# ------------------------------------------------ dedup against history


def test_history_dedup_keep_first_and_anti_join(spark):
    history = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # in history -> dropped
            (11, "brand new"),     # survives
            (12, "brand new"),     # dup within batch, larger id -> dropped
            (13, "another one"),   # survives
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup_against_history(batch, history).collect()
    )
    assert got == [11, 13]


# ------------------------------------------- cluster representatives


def test_cluster_representatives_longest_wins_ties_to_min_id(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5), (7, 1000)],
        "doc_id long, n_chars long",
    )
    rows = cluster_representatives(pairs, docs).collect()
    keep = {r["doc_id"]: r["keep"] for r in rows}
    # cluster {1,2,3}: 2 and 3 tie on n_chars=90 -> min id 2 wins
    assert keep == {1: False, 2: True, 3: False, 10: True, 11: False}
    # unclustered doc 7 never appears
    assert 7 not in keep
    # every cluster has exactly one keeper
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], []).append(r["keep"])
    assert all(sum(v) == 1 for v in clusters.values())
