"""WARC (Web ARChive, ISO 28500) ingestion — the container format web
crawls ship in (Common Crawl, Heritrix, wget --warc).

The reference ingests line/record-oriented files through
``FileBasedSource``/``FileBasedExtractor`` (filebased.py's model,
``gobblin-core/.../filebased/FileBasedExtractor.java``); a webtext ingest
needs the crawl-native container: length-prefixed WARC records
(version line, named headers, Content-Length, payload, blank-line
terminator) concatenated into multi-GB archive members.

Physical model: one archive file = one opaque binary row
(``spark.read.format("binaryFile")`` at deployment; synthesized rows in
the sandbox). Parsing is a per-file sequential walk — WARC is not
splittable mid-record without an index — so parallelism is the number of
archive files, the same unit Common Crawl publishes (100k × ~1 GB
segments), and record rows fan out 1:N through ``mapInPandas`` exactly
like the media codecs (multimodal.py): Arrow-batched, no driver
involvement, no Python in any per-record hot loop that Spark could have
run (header parsing is inherently imperative; it happens once per
record, not per byte).

Everything here is stdlib-only and byte-deterministic, so contract
oracles can recompute record framing (lengths, digests) symbolically
from the source table without a parser of their own.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_CRLF = b"\r\n"
_HTTP_HEAD = (
    "HTTP/1.1 %d %s\r\n"
    "Content-Type: text/html; charset=utf-8\r\n"
    "Content-Length: %d\r\n"
    "\r\n"
)
_STATUS_TEXT = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}


def build_warc_record(
    target_uri: str,
    warc_date: str,
    body: bytes,
    status: int = 200,
    warc_type: str = "response",
) -> bytes:
    """One WARC/1.0 record with an HTTP response block as payload.
    Deterministic: the record id is the md5 of the target URI, so equal
    inputs build identical bytes on every host."""
    http = (_HTTP_HEAD % (status, _STATUS_TEXT.get(status, "OK"), len(body))).encode(
        "ascii"
    ) + body
    rid = hashlib.md5(target_uri.encode("utf-8")).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + http + _CRLF + _CRLF


def build_warcinfo(filename: str) -> bytes:
    """The warcinfo record real crawlers open every archive with."""
    body = b"software: gobblin-spark-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: warcinfo\r\n"
        f"WARC-Filename: {filename}\r\n"
        f"Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + body + _CRLF + _CRLF


def synth_warc_archives(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 8,
) -> DataFrame:
    """Deterministic crawl archives from a documents table: doc i becomes a
    response record (uri http://site/<id>, date 2024-01-01T00:00:00Z +
    <id> s, body = utf-8 text), grouped into ``n_files`` members by
    id % n_files, each opened by a warcinfo record, records in id order.
    Distributed build: one groupBy + applyInPandas per member — the
    sandbox stand-in for ``binaryFile`` reads of real archives."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("file_id", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        fid = int(pdf["_fid"].iloc[0])
        parts = [build_warcinfo(f"synth-{fid:05d}.warc")]
        base = pd.Timestamp("2024-01-01T00:00:00")
        for did, text in zip(pdf[id_col], pdf[text_col]):
            ts = (base + pd.Timedelta(seconds=int(did))).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            body = ("" if text is None else str(text)).encode("utf-8")
            parts.append(
                build_warc_record(f"http://site/{int(did)}", ts, body)
            )
        return pd.DataFrame({"file_id": [fid], "payload": [b"".join(parts)]})

    return (
        docs.select(id_col, text_col)
        .withColumn("_fid", F.pmod(F.col(id_col), F.lit(n_files)).cast("int"))
        .groupBy("_fid")
        .applyInPandas(build, out_schema)
    )


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def _parse_member(fid: int, blob: bytes) -> Iterator[tuple]:
    """Walk one archive member record-by-record. Length-driven (never
    scans payload bytes for markers — bodies may contain anything,
    including WARC headers)."""
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record padding
        while i < n and blob[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        eol = blob.index(_CRLF, i)
        version = blob[i:eol].decode("utf-8", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"bad record header at byte {i}: {version!r}")
        i = eol + 2
        hdrs: dict[str, str] = {}
        while True:
            eol = blob.index(_CRLF, i)
            if eol == i:  # blank line: end of headers
                i += 2
                break
            line = blob[i:eol].decode("utf-8", "replace")
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
            i = eol + 2
        clen = int(hdrs["content-length"])
        payload = blob[i : i + clen]
        i += clen
        wtype = hdrs.get("warc-type", "")
        status, body = None, payload
        if wtype == "response" and payload[:5] == b"HTTP/":
            # degrade PER RECORD on a malformed HTTP block (truncated head,
            # statusless line — real crawl archives contain both): keep the
            # raw payload as body with status None rather than raising and
            # killing the whole multi-GB member (row-level err philosophy,
            # same as converters.chain_with_dlq)
            try:
                he = payload.index(b"\r\n\r\n")
                status_line = payload[: payload.index(_CRLF)].decode(
                    "ascii", "replace"
                )
                status = int(status_line.split(" ")[1])
                body = payload[he + 4 :]
            except (ValueError, IndexError):
                status, body = None, payload
        yield (
            fid,
            wtype,
            hdrs.get("warc-target-uri"),
            hdrs.get("warc-date"),
            clen,
            status,
            body,
        )


def parse_warc(archives: DataFrame, bin_col: str = "payload", file_col: str = "file_id") -> DataFrame:
    """Archive members → one row per WARC record (1:N fan-out through
    mapInPandas). Response records additionally split the HTTP block into
    status + body; other record types pass their payload through."""
    import pandas as pd

    cols = RECORD_SCHEMA.fieldNames()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[bin_col]):
                rows.extend(_parse_member(int(fid), bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return archives.select(file_col, bin_col).mapInPandas(gen, RECORD_SCHEMA)
