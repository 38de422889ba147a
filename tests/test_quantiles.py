"""Exact group quantiles: hand-computed type-1 ranks, ties, NULL
exclusion, p=max, and input validation."""

from __future__ import annotations

import pytest

from gobblin_spark.operators.quantiles import group_quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_type1_ranks_hand_computed(spark):
    # group a: sorted [10,20,30,40] (n=4): p25->rank ceil(1.0)=1 -> 10,
    # p50->rank 2 -> 20, p75->rank 3 -> 30, p100->rank 4 -> 40
    # group b: [7] (n=1): every p -> 7
    rows = [("a", 40), ("a", 10), ("a", 30), ("a", 20), ("b", 7)]
    out = {
        (r["g"], r["p_bp"]): (r["value"], r["n_values"])
        for r in group_quantiles(
            _df(spark, rows), ["g"], "v", [2500, 5000, 7500, 10000]
        ).collect()
    }
    assert out[("a", 2500)] == (10, 4)
    assert out[("a", 5000)] == (20, 4)
    assert out[("a", 7500)] == (30, 4)
    assert out[("a", 10000)] == (40, 4)
    for p in (2500, 5000, 7500, 10000):
        assert out[("b", p)] == (7, 1)


def test_ties_yield_deterministic_value(spark):
    # [5,5,5,9] n=4: p50 -> rank 2 -> 5 regardless of which tied row ranks 2nd
    rows = [("a", 5), ("a", 9), ("a", 5), ("a", 5)]
    (r,) = group_quantiles(_df(spark, rows), ["g"], "v", [5000]).collect()
    assert (r["value"], r["n_values"]) == (5, 4)


def test_nulls_excluded(spark):
    rows = [("a", 1), ("a", None), ("a", 3)]
    (r,) = group_quantiles(_df(spark, rows), ["g"], "v", [10000]).collect()
    assert (r["value"], r["n_values"]) == (3, 2)


def test_p_validation(spark):
    with pytest.raises(ValueError):
        group_quantiles(_df(spark, [("a", 1)]), ["g"], "v", [0])
    with pytest.raises(ValueError):
        group_quantiles(_df(spark, [("a", 1)]), ["g"], "v", [10001])
