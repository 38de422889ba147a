"""Round-2 modules: offset reset policies, audit/completeness gate,
re-compaction conditions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.audit import update_completeness_watermark
from gobblin_spark.compaction import (
    RecompactionConditions,
    compact_if_due,
    recompaction_due,
)
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lake import SnapshotTable
from gobblin_spark.planner import (
    OffsetOutOfRangeError,
    plan_batches,
    resolve_start_offsets,
)

# ------------------------------------------------------------ reset policies


def test_resolve_in_range_is_identity():
    lows = resolve_start_offsets({0: 100, 1: 50}, {0: 40}, {0: 0, 1: 0})
    assert lows == {0: 40, 1: -1}


def test_truncated_log_policies():
    avail, committed, earliest = {0: 100}, {0: 150}, {0: 0}
    with pytest.raises(OffsetOutOfRangeError, match="truncated"):
        resolve_start_offsets(avail, committed, earliest)
    assert resolve_start_offsets(avail, committed, earliest, "latest") == {0: 100}
    assert resolve_start_offsets(avail, committed, earliest, "nearest") == {0: 100}
    assert resolve_start_offsets(avail, committed, earliest, "earliest") == {0: -1}


def test_retention_expired_policies():
    avail, committed, earliest = {0: 1000}, {0: 100}, {0: 300}
    with pytest.raises(OffsetOutOfRangeError, match="expired"):
        resolve_start_offsets(avail, committed, earliest)
    assert resolve_start_offsets(avail, committed, earliest, "earliest") == {0: 299}
    assert resolve_start_offsets(avail, committed, earliest, "nearest") == {0: 299}
    assert resolve_start_offsets(avail, committed, earliest, "latest") == {0: 1000}
    # exactly at the floor: nothing lost, no reset
    assert resolve_start_offsets(avail, {0: 299}, earliest) == {0: 299}


def test_bootstrap_lookback():
    # fresh pipeline starts at most `lookback` offsets behind the head…
    assert resolve_start_offsets({0: 1000}, {}, {0: 0}, bootstrap_lookback=100) == {0: 900}
    # …but never before the retention floor, and committed partitions ignore it
    assert resolve_start_offsets({0: 1000}, {}, {0: 950}, bootstrap_lookback=100) == {0: 949}
    assert resolve_start_offsets({0: 1000}, {0: 500}, {0: 0}, bootstrap_lookback=100) == {0: 500}


def test_bootstrap_against_trimmed_log():
    assert resolve_start_offsets({0: 1000}, {}, {0: 300}) == {0: 299}
    batches = plan_batches({0: 1000}, {}, earliest={0: 300})
    assert batches[0][0].low == 299 and batches[0][0].high == 1000


_CLOG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("log_partition", T.IntegerType()),
        T.StructField("log_offset", T.LongType()),
    ]
)

_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _clog(spark, offsets):
    return spark.createDataFrame(
        [(f"u{o}", "U", _ts(o), f"h{o}".encode(), 0, o) for o in offsets], _CLOG_SCHEMA
    )


def test_engine_replay_over_truncated_changelog(spark, tmp_path):
    """Retention expiry between runs: default errors loudly; reset_policy=
    'earliest' resumes from the retention floor."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=4)
    engine = CdcEngine(spark, t, job_id="r", extract=False)
    engine.run(_clog(spark, range(100)))
    assert engine.committed_watermarks() == {0: 99}

    # retention expired offsets 100..299 before the next run
    trimmed = _clog(spark, range(300, 400))
    with pytest.raises(OffsetOutOfRangeError):
        engine.plan(trimmed)
    engine2 = CdcEngine(spark, t, job_id="r", extract=False, reset_policy="earliest")
    engine2.run(trimmed)
    assert engine2.committed_watermarks() == {0: 399}
    assert t.read_visible().count() == 200  # 0..99 and 300..399


# ---------------------------------------------------------- commit policies


class _FlakyEngine(CdcEngine):
    """Fails any batch containing a chosen offset — once (simulated task
    crash); subsequent runs succeed."""

    def __init__(self, *a, poison_offset: int, **kw):
        super().__init__(*a, **kw)
        self.poison_offset = poison_offset
        self.tripped = False

    def apply_batch(self, changelog, ranges, batch_id=None):
        if not self.tripped and any(
            r.low < self.poison_offset <= r.high for r in ranges
        ):
            self.tripped = True
            raise RuntimeError("simulated task failure")
        return super().apply_batch(changelog, ranges, batch_id)


def test_commit_policy_partial_isolates_failure_and_recovers(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=4)
    clog = _clog(spark, range(100))
    engine = _FlakyEngine(spark, t, job_id="p", extract=False, poison_offset=30)

    # full (default): the failure aborts the loop after batch 1 committed
    import pytest as _pt

    with _pt.raises(RuntimeError, match="simulated"):
        engine.run(clog, max_events_per_batch=25)
    assert engine.committed_watermarks() == {0: 24}

    # partial: the failed batch poisons its partition's LATER ranges (they
    # would otherwise fence the failed interval out) but commits nothing bogus
    engine2 = _FlakyEngine(spark, t, job_id="p", extract=False, poison_offset=60)
    results = engine2.run(clog, max_events_per_batch=25, commit_policy="partial")
    assert any(r.get("failed") for r in results)
    applied = [r for r in results if not r.get("failed") and not r.get("skipped")]
    assert applied  # progress before the poisoned range still committed
    wm = engine2.committed_watermarks()[0]
    assert wm < 59  # never advanced over the failed interval

    # next run retries exactly the un-committed work and completes
    engine3 = CdcEngine(spark, t, job_id="p", extract=False)
    engine3.run(clog)
    assert engine3.committed_watermarks() == {0: 99}
    assert t.read_visible().count() == 100


# -------------------------------------------------------- completeness gate


def test_completeness_gate_holds_until_counts_match(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=4)
    engine = CdcEngine(spark, t, job_id="c", extract=False)
    full = _clog(spark, range(100))
    expected = {0: 100}

    # short delivery: only half the offsets have landed
    engine.run(full.filter(F.col("log_offset") < 50))
    report = update_completeness_watermark(t, expected)
    assert report["advanced"] == {}
    assert report["held"][0] == {"applied": 50, "expected": 100}
    assert "completeness_watermark" not in t.properties

    # the rest lands → the gate advances to the committed watermark
    engine.run(full)
    report = update_completeness_watermark(t, expected)
    assert report["advanced"] == {0: 99}
    assert report["held"] == {}
    assert t.properties["completeness_watermark"] == {"0": 99}

    # over-delivery (duplicated audit mismatch) also holds — never advances
    report = update_completeness_watermark(t, {0: 42})
    assert report["advanced"] == {} and 0 in report["held"]
    assert t.properties["completeness_watermark"] == {"0": 99}


# ---------------------------------------------------- recompaction triggers


def test_recompaction_conditions_and_fold(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _TABLE_SCHEMA, key="url", n_buckets=4)
    engine = CdcEngine(spark, t, job_id="k", extract=False)
    engine.run(_clog(spark, range(40)), max_events_per_batch=10)  # 4 commits

    cond = RecompactionConditions(max_applied_ratio=None, max_versions=2)
    verdict = recompaction_due(t, cond)
    assert verdict["due"] and any("versions" in r for r in verdict["reasons"])

    result = compact_if_due(t, cond)
    assert result["compacted"]
    # bookkeeping stamped: immediately re-evaluating is not due
    assert not recompaction_due(t, cond)["due"]

    # ratio condition: apply ~50% new rows on top of 40 compacted rows
    engine.run(_clog(spark, range(40, 60)))
    cond2 = RecompactionConditions(max_applied_ratio=0.3, max_versions=None)
    verdict = recompaction_due(t, cond2)
    assert verdict["due"] and any("ratio" in r for r in verdict["reasons"])

    # tombstone-ratio condition (opt-in scan): delete most rows
    dels = spark.createDataFrame(
        [(f"u{o}", "D", _ts(1000 + o), None, 0, 60 + o) for o in range(50)],
        _CLOG_SCHEMA,
    )
    engine.run(dels)
    cond3 = RecompactionConditions(
        max_applied_ratio=None, max_versions=None, max_tombstone_ratio=0.4
    )
    verdict = recompaction_due(t, cond3)
    assert verdict["due"] and verdict["stats"]["tombstone_ratio"] > 0.4
