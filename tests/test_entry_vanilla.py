"""Environment-drift gate: the FULL queries() registry must pass its DuckDB
oracles under a DEFAULT-CONFIG SparkSession — no gobblin_spark.session
overrides (UTC timezone pin, inferTimestampNTZ=false, AQE knobs).

Round 4 shipped two contract queries that were green under the tuned pytest
session but raised AnalysisException under the driver's vanilla session
(unix_micros over a TIMESTAMP_NTZ parquet read, masked by
spark.sql.parquet.inferTimestampNTZ.enabled=false in session.py). A vanilla
session cannot coexist with the tuned one inside a single JVM — getOrCreate
returns the existing session — so this test shells out to
scripts/run_vanilla_parity.py in a fresh interpreter, exactly like the
driver does.

Runs at sf0.001 to keep the subprocess cheap; the drift class it guards
(config-dependent analysis errors, timezone-dependent values) is
scale-independent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_VANILLA_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_full_registry_under_vanilla_session():
    env = dict(os.environ)
    # Ensure the subprocess does NOT inherit a tuned profile by accident.
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_vanilla_parity.py"),
            "--sf-dir",
            SF_DIR,
            "--cpus",
            "8",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    records = [json.loads(ln) for ln in lines]
    bad = [
        r
        for r in records
        if not r.get("summary")
        and (
            r.get("err")
            or r.get("hash_match") is False
            or r.get("rows_match") is False
            or r.get("schema_match") is False
        )
    ]
    assert proc.returncode == 0 and not bad, (
        f"vanilla-session failures: {json.dumps(bad, indent=1)[:4000]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    summary = next((r for r in records if r.get("summary")), None)
    assert summary and summary["checked"] >= 60, summary
