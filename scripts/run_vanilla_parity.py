#!/usr/bin/env python3
"""Run the FULL queries() registry under a DEFAULT-CONFIG SparkSession and
compare every query against its DuckDB oracle.

This replicates the driver's correctness gate more faithfully than the pytest
parity suite, which builds its session through gobblin_spark.session.get_spark
and therefore inherits the repo's config overrides (UTC session timezone,
inferTimestampNTZ=false, AQE knobs). Round 4 shipped two queries that were
green under the tuned session but raised AnalysisException under the driver's
vanilla session (unix_micros over a TIMESTAMP_NTZ parquet read) — this
harness exists so that class of environment drift fails in-repo.

Usage:  python scripts/run_vanilla_parity.py [--sf-dir DIR] [--queries a,b,c]
Prints one JSON line per query and a final summary line; exit code 0 iff all
checked queries match.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v, pd):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _canon(df, pd) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False):
        vals = [
            (_canon_cell(None, pd) if pd.isna(v) else _canon_cell(v, pd))
            if not isinstance(v, (list, tuple))
            else str(v)
            for v in rec
        ]
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_VANILLA_SF", "/root/testdata/sf0.001"))
    ap.add_argument("--queries", default="", help="comma-separated subset; default all")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    # The point of this harness: NO repo config overrides. Only the master
    # and the UI flag (driver parity — the driver also runs headless).
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("vanilla-parity")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(queries)

    failures = 0
    for name in names:
        rec = {"query": name}
        try:
            got = queries[name](spark, args.sf_dir).toPandas()
            if name in oracles:
                exp = con.sql(oracles[name]).df()
                rec["spark_rows"] = len(got)
                rec["oracle_rows"] = len(exp)
                rec["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                rec["rows_match"] = len(got) == len(exp)
                cg, ce = _canon(got, pd), _canon(exp, pd)
                rec["hash_match"] = cg == ce
                if not (rec["schema_match"] and rec["rows_match"] and rec["hash_match"]):
                    failures += 1
                    diffs = [(a, b) for a, b in zip(cg, ce) if a != b][:2]
                    rec["first_diffs"] = diffs
            else:
                rec["spark_rows"] = len(got)
                rec["rows_only"] = True
        except Exception as e:  # noqa: BLE001 — report every query, keep going
            failures += 1
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        print(json.dumps(rec, default=str), flush=True)

    print(json.dumps({"summary": True, "checked": len(names), "failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
