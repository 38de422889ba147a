"""LWW dedup strategies: all three physical plans agree with each other and
with a pandas argmax oracle (≈ KeyDedupReducerTest,
gobblin-compaction/src/test/.../mapreduce/KeyDedupReducerTest.java:50,81)."""

from __future__ import annotations

import pandas as pd

from gobblin_spark.dedup import lww_latest, lww_latest_salted, lww_latest_window
from gobblin_spark.fixtures import make_changelog


def _expected(clog: pd.DataFrame) -> dict:
    idx = (
        clog.assign(_v=list(zip(clog["warc_ts"], clog["log_offset"])))
        .groupby("url")["_v"]
        .idxmax()
    )
    return {
        r["url"]: (r["warc_ts"], r["log_offset"]) for r in clog.loc[idx].to_dict("records")
    }


def test_three_strategies_agree_and_match_oracle(spark):
    clog = make_changelog(600, n_urls=30, n_partitions=4, seed=7)
    sdf = spark.createDataFrame(clog[["url", "warc_ts", "log_offset", "op"]])
    exp = _expected(clog)

    for fn in (lww_latest, lww_latest_salted, lww_latest_window):
        got = {
            r["url"]: (pd.Timestamp(r["warc_ts"]), r["log_offset"])
            for r in fn(sdf, ["url"], ["warc_ts", "log_offset"]).collect()
        }
        assert got == exp, fn.__name__


def test_hot_key_skew_present_and_handled(spark):
    clog = make_changelog(2000, n_urls=100, n_partitions=4, seed=11)
    counts = clog["url"].value_counts()
    # fixture guarantees hot keys (~20% of traffic on 3 urls)
    assert counts.iloc[:3].sum() > 0.12 * len(clog)
    sdf = spark.createDataFrame(clog[["url", "warc_ts", "log_offset"]]).repartition(8)
    out = lww_latest(sdf, ["url"], ["warc_ts", "log_offset"])
    assert out.count() == clog["url"].nunique()
    # physical plan: partial (map-side) aggregation runs BELOW the shuffle —
    # each input partition emits ≤1 row per key, so a hot key costs
    # O(#partitions) shuffled rows, not O(#events)
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("partial_max_by")
    exchange = plan.find("Exchange hashpartitioning")
    assert partial != -1 and exchange != -1
    assert partial > exchange  # tree prints top-down: partial agg is beneath
