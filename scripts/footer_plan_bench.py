"""Driver-side footer-planning overhead at large file counts.

VERDICT r3 #5 / next-round #3: `footer_watermarks` / `footer_partition_stats`
read one parquet footer per changelog file on the driver. Round 4 moved the
reads onto a 32-thread pool; this script MEASURES the resulting plan latency
at >=50k files — the scale where a sequential loop costs minutes — so the
"plan in seconds at 10^10 events" property is a number, not a claim.

The files are synthesized to the exact shape `write_changelog` produces
(hive `log_partition=N/` dirs, dense `log_offset` min/max in the column-chunk
statistics); each is a few KB, so 50k of them fit comfortably in /dev/shm
and the measurement isolates METADATA latency (open + footer parse), which
is what dominates a real object store's per-file round trip too.

Usage: python scripts/footer_plan_bench.py [--files 50000] [--partitions 8]
Prints one JSON line; optionally appends a summary row to COVERAGE.md via
--note.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from gobblin_spark import planner


def build_files(root: str, n_files: int, n_parts: int, rows_per_file: int = 8) -> list[str]:
    """Write n_files tiny parquet files in write_changelog's hive layout."""
    for p in range(n_parts):
        os.makedirs(os.path.join(root, f"log_partition={p}"), exist_ok=True)

    def write_one(i: int) -> str:
        p = i % n_parts
        base = i // n_parts * rows_per_file
        tbl = pa.table(
            {
                "log_offset": pa.array(
                    range(base, base + rows_per_file), type=pa.int64()
                ),
                "url": pa.array([f"https://ex.com/{i}/{r}" for r in range(rows_per_file)]),
            }
        )
        path = os.path.join(root, f"log_partition={p}", f"part-{i:06d}.parquet")
        pq.write_table(tbl, path, compression="snappy")
        return path

    with ThreadPoolExecutor(max_workers=32) as ex:
        return list(ex.map(write_one, range(n_files)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=50_000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--note", action="store_true", help="append result row to COVERAGE.md")
    args = ap.parse_args()

    root = tempfile.mkdtemp(
        prefix="footer-bench-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        t0 = time.monotonic()
        files = build_files(root, args.files, args.partitions)
        gen_sec = time.monotonic() - t0

        # watermark discovery (the planner's hot metadata path)
        t0 = time.monotonic()
        wm = planner.footer_watermarks(files)
        wm_sec = time.monotonic() - t0
        assert wm is not None, "footer fast path unexpectedly opted out"
        lows, highs = wm
        assert len(highs) == args.partitions

        # size stats (work-unit packing input)
        t0 = time.monotonic()
        stats = planner.footer_partition_stats(files)
        st_sec = time.monotonic() - t0
        assert stats is not None and len(stats) == args.partitions

        result = {
            "files": args.files,
            "partitions": args.partitions,
            "gen_sec": round(gen_sec, 2),
            "footer_watermarks_sec": round(wm_sec, 2),
            "footer_partition_stats_sec": round(st_sec, 2),
            "files_per_sec": round(args.files / wm_sec),
            "threads": planner._FOOTER_THREADS,
            "sub_10s": wm_sec < 10 and st_sec < 10,
        }
        print(json.dumps(result))
        if args.note:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            with open(os.path.join(repo, "COVERAGE.md"), "a") as f:
                f.write(
                    f"\n- footer-plan overhead measured at {args.files} files / "
                    f"{args.partitions} partitions: footer_watermarks "
                    f"{result['footer_watermarks_sec']} s, footer_partition_stats "
                    f"{result['footer_partition_stats_sec']} s "
                    f"({result['files_per_sec']} files/s on {result['threads']} "
                    f"threads; `scripts/footer_plan_bench.py`)\n"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
