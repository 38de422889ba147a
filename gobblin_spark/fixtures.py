"""Deterministic synthetic fixtures: web-page snapshot + CDC changelog.

FIXTURES.md §1-3. All generation is a pure function of the ``seed`` argument
(single seeded numpy RandomState, driver-side), so fixtures are byte-identical
at any Spark parallelism — the precondition for exactly-once final-table-state
equivalence tests and the byte-identical-text invariant.

Changelog shape mirrors a binlog/Kafka topic (reference semantics:
gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:544 — one work
unit per partition with an offset-range watermark interval): url → partition by
crc32, ``log_offset`` dense and strictly increasing within a partition.

Embedded scenarios (each deterministic, labeled via the ``scenario`` column):
duplicates (~2% verbatim redelivery at later offsets), same-key bursts,
delete-then-reinsert, update-after-delete (older warc_ts ⇒ must stay deleted),
hot-key skew (3 urls ≈ 20% of events), an always-empty partition (watermark
carry-forward), ~15% out-of-order warc_ts.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text

BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_W = [0.5, 0.15, 0.12, 0.13, 0.10]

_VOCAB = (
    "web crawl page data spark merge upsert lake table stream change event "
    "offset partition watermark schema column text html extract dedup key "
    "batch commit snapshot replay state lineage metric skew salt bucket"
).split()


def url_for(i: int, n_hosts: int = 20) -> str:
    return f"https://site{i % n_hosts}.example/p/{i}"


def partition_for(url: str, n_partitions: int) -> int:
    """url → log partition. Maps into n_partitions-1 slots so the last
    partition is always empty (empty-workunit watermark carry-forward,
    reference: KafkaSource.java:848)."""
    slots = max(1, n_partitions - 1)
    return zlib.crc32(url.encode("utf-8")) % slots


def _paragraph(rng: np.random.RandomState, n_words: int) -> str:
    return " ".join(_VOCAB[j] for j in rng.randint(0, len(_VOCAB), n_words))


def make_html(rng: np.random.RandomState, url: str, version: int) -> bytes:
    """Templated html: boilerplate (nav/script/style/footer) + content
    paragraphs. Content varies per (url, version) draw."""
    paras = "".join(
        f"<p>{_paragraph(rng, 8 + int(rng.randint(0, 12)))}</p>"
        for _ in range(2 + int(rng.randint(0, 3)))
    )
    html = (
        f"<html><head><title>{url} v{version}</title>"
        "<script>var t = 1 &amp;&amp; 2;</script><style>.m{color:red}</style></head>"
        "<body><nav><ul><li>Home</li><li>Docs</li><li>About</li></ul></nav>"
        f"<div id=\"main\"><h1>Page {version} &quot;snapshot&quot;</h1>{paras}</div>"
        "<footer>contact &lt;ops&gt; &amp; legal</footer></body></html>"
    )
    return html.encode("utf-8")


def make_pages(n_urls: int, seed: int = 42, n_hosts: int = 20) -> pd.DataFrame:
    """Initial target-table snapshot (FIXTURES.md §1)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_urls):
        url = url_for(i, n_hosts)
        html = make_html(rng, url, 0)
        ts = BASE_TS - np.timedelta64(86_400, "s") + np.timedelta64(int(rng.randint(0, 43_200)), "s")
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": extract_text(html),
                "lang": LANGS[int(rng.choice(len(LANGS), p=LANG_W))],
            }
        )
    df = pd.DataFrame(rows)
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df


def make_changelog(
    n_events: int,
    n_urls: int,
    n_partitions: int = 8,
    seed: int = 42,
    n_hosts: int = 20,
    start_offsets: dict[int, int] | None = None,
    v2: bool = False,
) -> pd.DataFrame:
    """Binlog-style change events (FIXTURES.md §2); ``v2=True`` emits the
    schema-evolution segment (§3): adds ``fetch_status:int`` and widens
    ``content_length`` int32→int64.

    ``start_offsets`` lets a v2 segment continue per-partition offsets from a
    base segment's highs.
    """
    rng = np.random.RandomState(seed + (1 if v2 else 0))
    pool = int(n_urls * 1.25) or 1  # ~20% brand-new urls beyond the snapshot
    hot = [url_for(i, n_hosts) for i in range(min(3, pool))]

    events: list[dict] = []

    def emit(url, op, ts, version):
        if op == "D":
            html, lang = None, None
        else:
            html = make_html(rng, url, version)
            lang = LANGS[int(rng.choice(len(LANGS), p=LANG_W))]
        events.append(
            {"url": url, "op": op, "warc_ts": ts, "html": html, "lang": lang}
        )

    i = 0
    while i < n_events:
        # event time: generally advancing with the stream; ~15% late
        ts = BASE_TS + np.timedelta64(i * 1000 + int(rng.randint(0, 997)), "ms")
        if rng.rand() < 0.15:
            ts -= np.timedelta64(int(rng.randint(60, 7_200)), "s")
        if rng.rand() < 0.20:
            url = hot[int(rng.randint(0, len(hot)))]
        else:
            url = url_for(int(rng.randint(0, pool)), n_hosts)
        r = rng.rand()
        if r < 0.02 and i + 4 < n_events:
            # same-key race burst: several U for one url, distinct versions
            for b in range(4):
                bts = ts + np.timedelta64(b, "ms")
                emit(url, "U", bts, i + b)
            i += 4
        elif r < 0.04 and i + 2 < n_events:
            # delete-then-reinsert (newer ts wins) …
            emit(url, "D", ts, i)
            emit(url, "I", ts + np.timedelta64(5, "s"), i + 1)
            i += 2
        elif r < 0.06 and i + 2 < n_events:
            # … and update-after-delete with OLDER warc_ts: must stay deleted
            emit(url, "D", ts, i)
            emit(url, "U", ts - np.timedelta64(int(rng.randint(600, 3_600)), "s"), i + 1)
            i += 2
        else:
            op = ["I", "U", "D"][int(rng.choice(3, p=[0.6, 0.3, 0.1]))]
            emit(url, op, ts, i)
            i += 1

    # at-least-once redelivery: ~2% verbatim duplicates appended later
    n_dup = max(1, len(events) // 50)
    for j in rng.choice(len(events), n_dup, replace=False):
        events.append(dict(events[int(j)]))

    df = pd.DataFrame(events)
    df["log_partition"] = df["url"].map(lambda u: partition_for(u, n_partitions)).astype("int32")
    # dense, strictly increasing offsets within each partition (binlog order)
    base = {p: (start_offsets or {}).get(p, 0) for p in range(n_partitions)}
    offs = np.empty(len(df), dtype="int64")
    for pos, p in enumerate(df["log_partition"].to_numpy()):
        offs[pos] = base[int(p)]
        base[int(p)] += 1
    df["log_offset"] = offs
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    clen = df["html"].map(lambda h: len(h) if h is not None else None)
    if v2:
        df["content_length"] = clen.astype("Int64")
        df["fetch_status"] = pd.array(
            rng.choice([200, 200, 200, 304, 404], len(df)), dtype="Int32"
        )
    else:
        df["content_length"] = clen.astype("Int32")
    cols = ["log_partition", "log_offset", "op", "url", "warc_ts", "html", "lang", "content_length"]
    if v2:
        cols.append("fetch_status")
    return df[cols]


_ARROW_FIELDS = {
    "log_partition": pa.int32(),
    "log_offset": pa.int64(),
    "op": pa.string(),
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "lang": pa.string(),
    "text": pa.string(),
    "fetch_status": pa.int32(),
}


def _to_arrow(df: pd.DataFrame) -> pa.Table:
    fields = []
    for c in df.columns:
        if c == "content_length":
            t = pa.int64() if str(df[c].dtype) == "Int64" else pa.int32()
        else:
            t = _ARROW_FIELDS[c]
        fields.append(pa.field(c, t))
    return pa.Table.from_pandas(df, schema=pa.schema(fields), preserve_index=False)


def write_changelog(df: pd.DataFrame, path: str) -> None:
    """Write hive-partitioned by log_partition (Spark partition pruning reads
    only the planned partitions)."""
    table = _to_arrow(df)
    pq.write_to_dataset(table, root_path=path, partition_cols=["log_partition"])


def write_pages(df: pd.DataFrame, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    fields = [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
    pq.write_table(
        pa.Table.from_pandas(df, schema=pa.schema(fields), preserve_index=False),
        os.path.join(path, "pages.parquet"),
    )
