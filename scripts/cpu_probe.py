"""Pure-CPU scaling probe: cache-resident work at k pinned cores.

Separates the two host-noise mechanisms the scaling bench has to reason
about: CPU frequency/steal (this probe measures it — cache-resident sha256
over a 4 KB buffer, no memory traffic) vs memory-bus contention
(scripts/membw_probe.py measures that). Measured on this sandbox VM
(2026-08-18): per-core throughput drops only ~8% from 1 to 4-8 pinned cores
(209.7k -> ~193k ops/s/core), so the hardware supports >=0.9 N->4N scaling
for compute-bound work; what deflates measured job ratios is bandwidth.

Usage: python scripts/cpu_probe.py [--procs 1 4 8] [--seconds 6]
Prints one JSON line: {"ops_per_sec_by_nprocs": {"1": ..., "4": [...]}}
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import time


def _work(seconds: float, cpu: int, q) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except (AttributeError, OSError):
        pass
    buf = b"x" * 4096
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < seconds:
        hashlib.sha256(buf).digest()
        n += 1
    q.put(n / (time.monotonic() - t0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="*", default=[1, 4, 8])
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    out: dict[str, list[float]] = {}
    for k in args.procs:
        q: mp.Queue = mp.Queue()
        ps = [
            mp.Process(target=_work, args=(args.seconds, i, q)) for i in range(k)
        ]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        out[str(k)] = [round(r, 1) for r in sorted(rates)]
    print(json.dumps({"ops_per_sec_by_nprocs": out}))


if __name__ == "__main__":
    main()
