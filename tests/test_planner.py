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


def test_pack_work_units_worst_fit_decreasing():
    from gobblin_spark.planner import pack_work_units

    sizes = {0: 10.0, 1: 8.0, 2: 7.0, 3: 3.0, 4: 2.0, 5: 2.0}
    bins = pack_work_units(sizes, 3)
    loads = sorted(sum(sizes[k] for k in b) for b in bins)
    # WFD on this input balances to 10/10/12
    assert loads == [10.0, 10.0, 12.0]
    assert sorted(k for b in bins for k in b) == list(sizes)


def test_pack_work_units_more_bins_than_units():
    from gobblin_spark.planner import pack_work_units

    bins = pack_work_units({7: 5.0}, 4)
    assert sum(len(b) for b in bins) == 1


def test_pack_bi_level_groups_stay_bundled_under_capacity():
    from gobblin_spark.planner import pack_bi_level

    sizes = {i: 1.0 for i in range(12)}
    groups = {i: ("a" if i < 6 else "b") for i in range(12)}
    bins = pack_bi_level(sizes, groups, 4, capacity_frac=1.0)
    assert sorted(k for b in bins for k in b) == list(range(12))
    # capacity = (12/4)/1 = 3 → bundles of ≤3, same-group members bundled
    for b in bins:
        for k in b:
            assert sizes[k] == 1.0


def test_estimate_partition_stats(spark):
    from gobblin_spark.planner import estimate_partition_stats
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 4).cast("int").alias("log_partition"),
        F.encode(F.lit("x" * 10), "utf-8").alias("html"),
    )
    stats = estimate_partition_stats(df)
    assert set(stats) == {0, 1, 2, 3}
    assert all(v["n_events"] == 25 and v["avg_bytes"] == 10 for v in stats.values())


# ------------------------------------------------- footer-stat discovery
def _mini_changelog(spark, tmp_path, n=500, parts=4):
    from gobblin_spark.datagen import synth_changelog, write_changelog

    path = str(tmp_path / "changelog")
    write_changelog(synth_changelog(spark, n, n_partitions=parts), path)
    return path


def test_footer_watermarks_match_scan(spark, tmp_path):
    """Metadata-only discovery (parquet footer stats, the Kafka-endOffsets
    analogue) must agree exactly with the distributed double scan."""
    from gobblin_spark.planner import (
        discover_high_watermarks,
        discover_low_watermarks,
        discover_watermarks,
        footer_watermarks,
    )

    path = _mini_changelog(spark, tmp_path)
    df = spark.read.parquet(path)
    lows_scan = discover_low_watermarks(df)
    highs_scan = discover_high_watermarks(df)

    fw = footer_watermarks(list(df.inputFiles()))
    assert fw is not None, "hive-layout changelog must take the footer path"
    assert fw == (lows_scan, highs_scan)

    # the combined entrypoint: footer path only when a source path is named
    assert discover_watermarks(df, source_path=path) == (lows_scan, highs_scan)
    assert discover_watermarks(df) == (lows_scan, highs_scan)  # scan fallback


def test_footer_watermarks_refuse_non_hive_layout(spark, tmp_path):
    """A changelog written without the log_partition= layout cannot resolve
    partitions from paths — footer path declines, scan fallback answers."""
    from gobblin_spark.datagen import synth_changelog
    from gobblin_spark.planner import discover_watermarks, footer_watermarks

    path = str(tmp_path / "flat")
    synth_changelog(spark, 300, n_partitions=3).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    assert footer_watermarks(list(df.inputFiles())) is None
    lows, highs = discover_watermarks(df, source_path=path)  # falls back
    assert set(lows) == set(highs) == {0, 1, 2}


def test_engine_run_by_path_equals_run_by_dataframe(spark, tmp_path):
    """Planning from footer stats must replay to the identical table state
    as planning from the scan (same batches, same fenced commits)."""
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.lake import SnapshotTable
    from pyspark.sql import types as T

    path = _mini_changelog(spark, tmp_path, n=800, parts=4)
    df = spark.read.parquet(path)
    meta = {"op", "log_partition", "log_offset"}
    schema = T.StructType([f for f in df.schema.fields if f.name not in meta])

    finals = []
    for tag, arg in (("bypath", path), ("bydf", df)):
        t = SnapshotTable.create(
            spark, str(tmp_path / f"tbl_{tag}"), schema, key="url", n_buckets=4
        )
        CdcEngine(spark, t, job_id=tag, extract=False).run(
            arg, max_events_per_batch=300
        )
        finals.append(
            sorted(
                (r["url"], r["warc_ts"], r["content_length"])
                for r in t.read().collect()
            )
        )
    assert finals[0] == finals[1] and len(finals[0]) > 0


def test_footer_partition_stats_counts_match_scan(spark, tmp_path):
    """Footer-derived per-partition event counts must equal the scan's; byte
    sizes are the compressed on-disk truth (> 0, roughly proportional)."""
    from gobblin_spark.planner import estimate_partition_stats, footer_partition_stats

    path = _mini_changelog(spark, tmp_path, n=600, parts=3)
    df = spark.read.parquet(path)
    scan = estimate_partition_stats(df)
    foot = footer_partition_stats(list(df.inputFiles()))
    assert foot is not None
    assert set(foot) == set(scan)
    for p in scan:
        assert foot[p]["n_events"] == scan[p]["n_events"]
        assert foot[p]["total_bytes"] > 0 and foot[p]["avg_bytes"] > 0
    # "compressed on-disk bytes" must mean exactly that: the summed chunk
    # sizes can never exceed the physical file sizes (footer/magic overhead
    # sits outside the chunks), and must account for most of them
    import os

    disk = sum(
        os.path.getsize(f.replace("file://", "")) for f in df.inputFiles()
    )
    footed = sum(s["total_bytes"] for s in foot.values())
    assert 0 < footed <= disk
    assert footed >= 0.5 * disk, "chunk bytes should dominate file bytes"
    # non-hive layout declines
    flat = str(tmp_path / "flat2")
    df.write.mode("overwrite").parquet(flat)
    assert footer_partition_stats(list(spark.read.parquet(flat).inputFiles())) is None


def test_footer_map_process_pool_path(tmp_path):
    """Above _FOOTER_PROCESS_THRESHOLD files, _footer_map dispatches to a
    process pool (footer thrift parsing holds the GIL — 32 threads convoy
    ~10x slower than one thread on fast storage); results must be identical
    to the threaded path, including the any-file-opts-out -> None contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gobblin_spark import planner

    n_files = planner._FOOTER_PROCESS_THRESHOLD + 8
    parts = 4
    files = []
    for p in range(parts):
        (tmp_path / f"log_partition={p}").mkdir()
    for i in range(n_files):
        p = i % parts
        base = (i // parts) * 2
        tbl = pa.table({"log_offset": pa.array([base, base + 1], type=pa.int64())})
        f = str(tmp_path / f"log_partition={p}" / f"part-{i:05d}.parquet")
        pq.write_table(tbl, f)
        files.append(f)
    fw = planner.footer_watermarks(files)
    assert fw is not None
    lows, highs = fw
    per_part = n_files // parts + (1 if n_files % parts else 0)
    for p in range(parts):
        assert lows[p] == 0
        n_p = len([i for i in range(n_files) if i % parts == p])
        assert highs[p] == 2 * n_p - 1
    st = planner.footer_partition_stats(files)
    assert st is not None and sum(s["n_events"] for s in st.values()) == 2 * n_files
    # one non-hive file anywhere opts the whole (process-pooled) plan out
    flat = str(tmp_path / "flat.parquet")
    pq.write_table(pa.table({"log_offset": pa.array([0], type=pa.int64())}), flat)
    assert planner.footer_watermarks(files + [flat]) is None
