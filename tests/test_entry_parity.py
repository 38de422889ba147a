"""Replicates the driver's correctness gate: run every queries() entry on
Spark at sf0.01, run its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive canonical value hash."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


_CON = None


def _duck():
    global _CON
    if _CON is None:
        _CON = duckdb.connect()
        for t in TABLES:
            path = f"{SF_DIR}/{t}.parquet"
            if os.path.exists(path):
                _CON.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return _CON


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _canon(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False):
        vals = [(_canon_cell(None) if pd.isna(v) else _canon_cell(v)) if not isinstance(v, (list, tuple)) else str(v) for v in rec]
        out.append("|".join(vals))
    return sorted(out)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = _duck().sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} vs {len(exp)}"
    cg, ce = _canon(got), _canon(exp)
    mism = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
    assert cg == ce, f"{name}: first diffs {[(cg[i], ce[i]) for i in mism]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
