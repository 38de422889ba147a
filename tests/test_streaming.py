"""Structured Streaming tail: incremental drain equivalence + exactly-once
under checkpoint loss / redelivery (≈ TaskContinuousTest semantics,
gobblin-runtime/src/test/.../TaskContinuousTest.java:72 — stream records in,
poll committed watermarks, assert table/watermark consistency)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from gobblin_spark.fixtures import _to_arrow, make_changelog
from gobblin_spark.lake import SnapshotTable
from gobblin_spark.engine import CdcEngine
from gobblin_spark.streaming import drain, drain_evolving

from conftest import table_fingerprint
from helpers import PAGES_SCHEMA, oracle_final, visible_with_offset


@pytest.fixture()
def stream_env(spark, tmp_path):
    tmp = str(tmp_path)
    clog = make_changelog(600, n_urls=60, n_partitions=4, seed=7)
    src = os.path.join(tmp, "landing")
    os.makedirs(src)
    cut = int(len(clog) * 0.6)
    seg_a, seg_b = clog.iloc[:cut], clog.iloc[cut:]
    table = SnapshotTable.create(
        spark, os.path.join(tmp, "table"), PAGES_SCHEMA, key="url", n_buckets=8
    )
    engine = CdcEngine(spark, table)
    ckpt = os.path.join(tmp, "ckpt")
    return clog, seg_a, seg_b, src, table, engine, ckpt


def _land(df, src, name):
    pq.write_table(_to_arrow(df.reset_index(drop=True)), os.path.join(src, name))


def test_stream_drain_incremental_equals_oracle(spark, stream_env):
    clog, seg_a, seg_b, src, table, engine, ckpt = stream_env

    _land(seg_a, src, "part-000.parquet")
    r1 = drain(engine, src, ckpt)
    assert any(not r.get("skipped") for r in r1)
    wm_after_a = engine.committed_watermarks()
    assert wm_after_a  # watermarks committed with the data

    _land(seg_b, src, "part-001.parquet")
    r2 = drain(engine, src, ckpt)
    assert any(not r.get("skipped") for r in r2)

    got = table_fingerprint(visible_with_offset(table))
    exp = table_fingerprint(oracle_final(clog, None))
    assert got == exp


def test_stream_redelivery_is_fenced(spark, stream_env):
    clog, seg_a, seg_b, src, table, engine, ckpt = stream_env
    _land(seg_a, src, "part-000.parquet")
    _land(seg_b, src, "part-001.parquet")
    drain(engine, src, ckpt)
    version = table.version
    fp = table_fingerprint(visible_with_offset(table))

    # lose the stream checkpoint: the source redelivers EVERYTHING; the
    # engine's table-level watermark fencing must skip it all
    shutil.rmtree(ckpt)
    r = drain(engine, src, ckpt)
    assert all(x.get("skipped") for x in r)
    assert table.version == version
    assert table_fingerprint(visible_with_offset(table)) == fp


def test_stream_schema_evolution_mid_tail(spark, stream_env):
    """A column added MID-TAIL (a widened file arriving after the stream
    froze its schema) must land in the table, not be silently dropped: the
    widened batch fails before commit, the tail restarts with the merged
    schema, and the replayed batch flows through schema-merge-on-write
    (≈ KafkaSchemaChangeInjector end-to-end, now in streaming too)."""
    clog, seg_a, seg_b, src, table, engine, ckpt = stream_env

    _land(seg_a, src, "part-000.parquet")
    frozen = spark.read.parquet(src).schema  # the schema the stream froze

    import pyarrow as pa

    widened = _to_arrow(seg_b.reset_index(drop=True)).append_column(
        "source_tag", pa.array(["crawl-b"] * len(seg_b), type=pa.string())
    )
    pq.write_table(widened, os.path.join(src, "part-001.parquet"))

    # maxFilesPerTrigger=1 ⇒ the old-schema file applies in batch 1; batch 2
    # surfaces the widened file, aborts uncommitted, and the drain restarts
    results = drain_evolving(
        engine, src, ckpt, schema=frozen, max_files_per_trigger=1
    )
    applied = [r for r in results if not r.get("skipped")]
    assert len(applied) >= 2

    assert "source_tag" in table.schema().fieldNames()
    rows = table.read_visible()
    tagged = rows.filter(rows.source_tag == "crawl-b").count()
    assert tagged > 0  # the widened rows kept their new column
    # rows written before the evolution read back as NULL for the new column
    assert rows.filter(rows.source_tag.isNull()).count() > 0
    got = table_fingerprint(visible_with_offset(table))
    assert got == table_fingerprint(oracle_final(clog, None))


def test_stream_many_microbatches(spark, stream_env):
    """maxFilesPerTrigger=1 forces one micro-batch per file — same final
    state, several commits."""
    clog, seg_a, seg_b, src, table, engine, ckpt = stream_env
    third = len(clog) // 3
    for i in range(3):
        _land(clog.iloc[i * third : None if i == 2 else (i + 1) * third], src, f"f{i}.parquet")
    results = drain(engine, src, ckpt, max_files_per_trigger=1)
    assert sum(1 for r in results if not r.get("skipped")) == 3
    got = table_fingerprint(visible_with_offset(table))
    assert got == table_fingerprint(oracle_final(clog, None))


def test_stateful_lww_change_feed(spark, stream_env):
    """applyInPandasWithState custom stateful operator: per-key LWW change
    feed emits exactly the version-increasing rows, across micro-batches."""
    from gobblin_spark.streaming import stateful_lww_updates

    clog, seg_a, seg_b, src, table, engine, ckpt = stream_env
    _land(seg_a, src, "a.parquet")
    sink = os.path.join(os.path.dirname(ckpt), "feed_out")

    schema = spark.read.parquet(os.path.join(src, "a.parquet")).schema

    def drain_once():
        q = (
            stateful_lww_updates(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                key_col="url",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain_once()
    _land(seg_b, src, "b.parquet")
    drain_once()

    emitted = spark.read.parquet(sink).toPandas()

    # 1. the max emitted version per key == the batch LWW winner
    final = emitted.sort_values(["warc_ts", "log_offset"]).groupby("url").tail(1)
    batch_lww = clog.sort_values(["warc_ts", "log_offset"]).groupby("url").tail(1)
    got = {r.url: (r.warc_ts, r.log_offset) for r in final.itertuples()}
    exp = {r.url: (r.warc_ts, r.log_offset) for r in batch_lww.itertuples()}
    assert got == exp
    # 2. exactly one emission per key per STRICT improvement: seg_a's max
    #    always emits; seg_b emits iff its max beats seg_a's (stale
    #    redeliveries are suppressed by the state)
    def _maxv(df):
        top = df.sort_values(["warc_ts", "log_offset"]).groupby("url").tail(1)
        return {r.url: (r.warc_ts, r.log_offset) for r in top.itertuples()}

    ma, mb = _maxv(seg_a), _maxv(seg_b)
    expected_emissions = {
        url: (1 if url in ma else 0)
        + (1 if url in mb and (url not in ma or mb[url] > ma[url]) else 0)
        for url in set(ma) | set(mb)
    }
    n_per_key = emitted.groupby("url").size().to_dict()
    assert n_per_key == {u: n for u, n in expected_emissions.items() if n}
    # the fixture must actually exercise suppression
    assert any(n == 1 and u in ma and u in mb for u, n in expected_emissions.items())
