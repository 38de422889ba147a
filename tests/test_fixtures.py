"""Fixture generator invariants (FIXTURES.md §2 embedded scenarios)."""

from __future__ import annotations

import pandas as pd

from gobblin_spark.fixtures import make_changelog, make_pages, partition_for


def test_deterministic_regeneration():
    a = make_changelog(500, n_urls=50, n_partitions=4, seed=42)
    b = make_changelog(500, n_urls=50, n_partitions=4, seed=42)
    pd.testing.assert_frame_equal(a, b)
    pa_ = make_pages(30, seed=42)
    pb = make_pages(30, seed=42)
    pd.testing.assert_frame_equal(pa_, pb)


def test_offsets_dense_and_increasing_per_partition():
    c = make_changelog(800, n_urls=60, n_partitions=4, seed=1)
    for p, g in c.groupby("log_partition"):
        offs = g["log_offset"].tolist()
        assert offs == list(range(len(offs)))


def test_url_partition_consistency_and_empty_partition():
    c = make_changelog(800, n_urls=60, n_partitions=4, seed=1)
    for r in c[["url", "log_partition"]].drop_duplicates().to_dict("records"):
        assert partition_for(r["url"], 4) == r["log_partition"]
    assert 3 not in set(c["log_partition"])  # last partition always empty


def test_scenarios_present():
    c = make_changelog(1000, n_urls=80, n_partitions=4, seed=42)
    # duplicates: verbatim payload at a later offset
    dup = c.duplicated(subset=["url", "op", "warc_ts", "html"], keep=False)
    assert dup.sum() >= 10
    # out-of-order event time vs offset order within a partition
    ooo = 0
    for _, g in c.groupby("log_partition"):
        ooo += (g.sort_values("log_offset")["warc_ts"].diff() < pd.Timedelta(0)).sum()
    assert ooo > 30
    # deletes exist and have null html
    d = c[c["op"] == "D"]
    assert len(d) > 20 and d["html"].isna().all()
    # hot keys
    assert c["url"].value_counts().iloc[:3].sum() > 0.12 * len(c)


def test_v2_schema_segment():
    base = make_changelog(200, n_urls=20, n_partitions=4, seed=42)
    highs = base.groupby("log_partition")["log_offset"].max().astype(int).to_dict()
    v2 = make_changelog(
        100,
        n_urls=20,
        n_partitions=4,
        seed=43,
        start_offsets={p: v + 1 for p, v in highs.items()},
        v2=True,
    )
    assert "fetch_status" in v2.columns
    assert str(v2["content_length"].dtype) == "Int64"
    assert str(base["content_length"].dtype) == "Int32"
    for p, g in v2.groupby("log_partition"):
        assert g["log_offset"].min() == highs[int(p)] + 1
