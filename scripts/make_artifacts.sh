#!/usr/bin/env bash
# Regenerate every shipped evidence artifact at HEAD, in one shot, so they
# cannot skew against the code (round-2 verdict #8: a stale pytest_full.log
# under-reported the suite). Run AFTER the last code commit of a session:
#
#   bash scripts/make_artifacts.sh            # pytest log + sf0.1 bench
#   SKIP_BENCH=1 bash scripts/make_artifacts.sh   # tests only (fast-ish)
#
# Artifacts are SEQUENTIAL on purpose — two Spark workloads on this box
# pollute each other's timings (see BENCH.md noise policy).
set -euo pipefail
cd "$(dirname "$0")/.."

stamp=$(date -u +%Y-%m-%dT%H:%M:%SZ)
head=$(git rev-parse --short HEAD)

echo "== pytest (full suite) @ ${head} ${stamp}" | tee pytest_full.log
python -m pytest tests/ -q 2>&1 | tee -a pytest_full.log

if [[ -z "${SKIP_BENCH:-}" ]]; then
    echo "== bench.py @ ${head} ${stamp} (sf0.1, stdout JSON -> BENCH_LOCAL.json)"
    python bench.py 2>bench_stderr.log | tail -1 > BENCH_LOCAL.json
    python -c "import json; d=json.load(open('BENCH_LOCAL.json')); print('events_per_sec', d['events_per_sec'], 'queries_total', d['queries_total_sec'])"
fi

echo "artifacts regenerated at HEAD=${head} ${stamp}"
