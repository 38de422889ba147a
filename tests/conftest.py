from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from gobblin_spark.extract import extract_text
from gobblin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gobblin-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def table_fingerprint(rows: pd.DataFrame) -> str:
    """Order-insensitive hash of (url, warc_ts, log_offset, lang, text) —
    the cross-implementation table-state comparator used by replay tests."""
    recs = []
    for r in rows.to_dict("records"):
        text = r.get("text")
        if text is None and r.get("html") is not None:
            text = extract_text(r["html"])
        recs.append(
            "|".join(
                [
                    str(r["url"]),
                    str(pd.Timestamp(r["warc_ts"]).value),
                    str(r.get("log_offset")),
                    str(r.get("lang")),
                    hashlib.sha256((text or "").encode()).hexdigest(),
                ]
            )
        )
    recs.sort()
    return hashlib.sha256("\n".join(recs).encode()).hexdigest()
