"""Byte-identity invariant for the vectorized extractor (BASELINE.json
input_hint: byte-identical extracted text per url across runs, Arrow batch
sizes, and parallelism)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gobblin_spark.extract import extract_text, extract_text_series, extract_text_udf
from gobblin_spark.fixtures import make_html, make_pages


def _sample_htmls(n=200, seed=7):
    rng = np.random.RandomState(seed)
    return [make_html(rng, f"https://s{i}.example/p/{i}", i) for i in range(n)]


def test_scalar_vs_vectorized_byte_identity():
    htmls = _sample_htmls()
    ref = [extract_text(h) for h in htmls]
    vec = extract_text_series(pd.Series(htmls)).tolist()
    assert ref == vec
    # and actually extracts: boilerplate gone, content present
    assert all("var t" not in t and "Home" not in t for t in ref)
    assert all("Page" in t for t in ref)


def test_batch_size_independence():
    htmls = _sample_htmls()
    s = pd.Series(htmls)
    whole = extract_text_series(s).tolist()
    chunked = []
    for i in range(0, len(s), 7):
        chunked.extend(extract_text_series(s.iloc[i : i + 7]).tolist())
    assert whole == chunked


def test_null_html_yields_null():
    assert extract_text(None) is None
    out = extract_text_series(pd.Series([None, b"<p>x</p>"], dtype=object))
    assert pd.isna(out.iloc[0]) and out.iloc[1] == "x"


def test_udf_parallelism_independence(spark):
    pages = make_pages(64, seed=3)
    sdf = spark.createDataFrame(pages[["url", "html"]])

    def hashes(df):
        rows = (
            df.withColumn("text", extract_text_udf(F.col("html")))
            .select("url", F.sha2(F.col("text"), 256).alias("h"))
            .collect()
        )
        return sorted((r["url"], r["h"]) for r in rows)

    h1 = hashes(sdf.repartition(1))
    h8 = hashes(sdf.repartition(8))
    assert h1 == h8
    # matches the single-threaded reference byte-for-byte
    ref = sorted(
        (u, hashlib.sha256(extract_text(h).encode()).hexdigest())
        for u, h in zip(pages["url"], pages["html"])
    )
    assert h1 == ref
