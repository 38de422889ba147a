"""Memory-bandwidth probe for the benchmark host.

The CDC apply pipeline is memory-streaming-heavy (KB-scale rows moving
through scan → partial agg → shuffle → final agg → Arrow → join → parquet),
so its scaling ceiling on a single box is the memory subsystem, not core
count. This probe measures aggregate copy bandwidth at increasing process
counts, independent of Spark/JVM — used in BENCH.md to separate the
environment's envelope from the engine's scaling behavior.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _burn(q):
    a = np.ones(64_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 4:
        np.copyto(b, a)
        n += 1
    q.put(n * 128e6)  # bytes moved (read + write)


def main() -> None:
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        total = sum(q.get() for _ in ps)
        out[procs] = round(total / 4 / 1e9, 1)
    print(json.dumps({"aggregate_copy_GBps_by_nprocs": out}))


if __name__ == "__main__":
    main()
