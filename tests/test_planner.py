"""Planner unit tests (≈ KafkaSource offset-resolution + packer tests,
gobblin-modules/gobblin-kafka-common/src/test/.../workunit/packer/)."""

from __future__ import annotations

from gobblin_spark.planner import OffsetRange, plan_batches, range_predicate


def test_full_backlog_single_batch():
    batches = plan_batches({0: 99, 1: 49}, committed=None)
    assert batches == [[OffsetRange(0, -1, 99), OffsetRange(1, -1, 49)]]


def test_resume_from_committed():
    batches = plan_batches({0: 99, 1: 49}, committed={0: 99, 1: 20})
    assert batches == [[OffsetRange(1, 20, 49)]]


def test_no_backlog_no_batches():
    assert plan_batches({0: 10}, committed={0: 10}) == []
    assert plan_batches({}, committed={}) == []


def test_capped_batches_cover_exactly_once():
    available = {0: 999, 1: 99, 2: 499}
    batches = plan_batches(available, committed={2: 99}, max_events_per_batch=300)
    seen = {p: -1 if p != 2 else 99 for p in available}
    for batch in batches:
        total = sum(r.count for r in batch)
        assert total <= 300 + len(available)  # proportional rounding slack
        for r in batch:
            assert r.low == seen[r.partition]  # contiguous, no gap, no overlap
            assert r.high > r.low
            seen[r.partition] = r.high
    assert seen == available


def test_proportional_slicing_balances_partitions():
    batches = plan_batches({0: 8999, 1: 999}, max_events_per_batch=1000)
    first = {r.partition: r.count for r in batches[0]}
    assert first[0] > first[1] > 0  # both make progress; hot partition gets more


def test_range_predicate_filters_and_prunes(spark):
    df = spark.range(0, 40).selectExpr(
        "cast(id % 4 as int) as log_partition", "cast(id div 4 as long) as log_offset"
    )
    pred = range_predicate([OffsetRange(0, -1, 3), OffsetRange(2, 5, 9)])
    rows = {(r["log_partition"], r["log_offset"]) for r in df.filter(pred).collect()}
    assert rows == {(0, o) for o in range(4)} | {(2, o) for o in range(6, 10)}
    # predicate is a plain conjunction/disjunction of comparisons on the
    # partition + offset columns → pushes to parquet scan / prunes partitions
    assert df.filter(range_predicate([])).count() == 0
