"""Per-round benchmark: headline CDC replay + driver-contract query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The headline is the engine's north-star metric: wall-clock of the
binlog-replay → snapshot-table upsert apply loop (generation and table
bootstrap excluded), with events/sec derived. Query timings force full
execution via a noop-format write (computation without sink cost).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_EVENTS (override event count).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gobblin_spark.datagen import synth_changelog, write_changelog  # noqa: E402
from gobblin_spark.engine import CdcEngine  # noqa: E402
from gobblin_spark.lake import SnapshotTable  # noqa: E402
from gobblin_spark.session import get_spark, tune_input_splits  # noqa: E402

N_LOG_PARTITIONS = 32


def warmup(spark, workdir: str) -> float:
    """Untimed warm-up: one tiny end-to-end apply spawns the Python worker
    pool (~4 s for 32 workers on a fresh session), compiles the codegen
    stages and initializes Arrow — fixed session costs that a sustained
    10^10-event replay pays once, so they do not belong in a throughput
    measurement."""
    t0 = time.monotonic()
    bench_cdc_replay(spark, 2000, os.path.join(workdir, "warmup"), n_batches=1)
    return round(time.monotonic() - t0, 3)


def bench_cdc_replay(spark, n_events: int, workdir: str, n_batches: int = 2) -> dict:
    from pyspark.sql import types as T

    changelog_path = os.path.join(workdir, "changelog")
    t0 = time.monotonic()
    write_changelog(
        synth_changelog(spark, n_events, n_partitions=N_LOG_PARTITIONS), changelog_path
    )
    gen_sec = time.monotonic() - t0

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content_length", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    table_root = os.path.join(workdir, "pages_table")
    table = SnapshotTable.create(spark, table_root, schema, key="url", n_buckets=32)
    # delta commits (merge-on-read): O(batch) per commit — the sustained-
    # ingest configuration at 10^10 events; compaction folds generations
    # off the ingest path and is timed separately below
    engine = CdcEngine(spark, table, job_id="bench", merge_mode="delta")

    tune_input_splits(spark, changelog_path)
    changelog = spark.read.parquet(changelog_path)
    t0 = time.monotonic()
    # offsets are global ids here, so the per-batch cap is in offset units
    results = engine.run(changelog, max_events_per_batch=max(1, n_events // n_batches))
    apply_sec = time.monotonic() - t0
    n_applied = sum(r.get("rows_read", 0) for r in results if not r.get("skipped"))
    t0 = time.monotonic()
    compact = table.compact()
    compact_sec = round(time.monotonic() - t0, 3)
    return {
        "cdc_replay_sec": round(apply_sec, 3),
        "cdc_gen_sec": round(gen_sec, 3),
        "compact_sec": compact_sec,
        "n_events": n_events,
        "n_events_applied": n_applied,
        "events_per_sec": round(n_events / apply_sec, 1),
        "n_batches": len(results),
        "merge_mode": "delta",
        "final_version": compact["version"],
    }


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)
        # isolate queries: some persist intermediates (e.g. shingle bases);
        # letting them accumulate distorts later queries' memory budget
        spark.catalog.clearCache()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_events = int(os.environ.get("BENCH_EVENTS", str(max(1000, int(2_000_000 * sf)))))

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    workdir = tempfile.mkdtemp(prefix="gobblin-bench-")
    try:
        warm_sec = warmup(spark, workdir)
        replay = bench_cdc_replay(spark, n_events, workdir)
        replay["warmup_sec"] = warm_sec
        queries = bench_queries(spark, sf_dir)
        queries_total = round(sum(queries.values()), 3)
        out = {
            "metric": (
                "wall-clock sec of binlog-replay → snapshot-table upsert apply loop "
                f"({n_events} synthetic change events, {N_LOG_PARTITIONS} log partitions, "
                "2 fenced batches, session pre-warmed: LWW dedup + vectorized text "
                "extraction + delta MERGE commits (merge-on-read); post-loop "
                "compaction timed separately in detail.compact_sec)"
            ),
            "value": replay["cdc_replay_sec"],
            "unit": "sec",
            "queries": {"cdc_replay": replay["cdc_replay_sec"], **queries},
            "sf": sf,
            "events_per_sec": replay["events_per_sec"],
            "n_events": replay["n_events"],
            "queries_total_sec": queries_total,
            "cpus": cpus,
            "detail": replay,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
