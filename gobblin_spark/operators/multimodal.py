"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_meta`` parses only deterministic byte-level facts
(length, magic-number format sniff, sha256) and ``extract_features`` emits a
deterministic fake feature vector derived from the payload digest — clearly
marked. The Spark-side plumbing — schema, batch iteration, partition-size
control — is real and tested; swapping in a real decoder (PIL / torchaudio /
pyav) means replacing only the two pure functions marked STUB below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .util import spread

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
]

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("digest", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: a real implementation would decode pixels/samples here
    (PIL.Image.open / soundfile.read). This deterministic stand-in derives a
    16-dim float vector from the sha256 digest so the full pipeline shape is
    testable without media libraries."""
    digest = hashlib.sha256(payload).digest()
    return (np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0).round(6)


def binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column, via mapInPandas (streams
    Arrow batches; never materializes the partition)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "format": payloads.map(
                        lambda b: _sniff_format(bytes(b)) if b is not None else None
                    ),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, META_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Image resize over opaque binary payloads — Spark plumbing real, decode
    STUBBED. A real implementation decodes with PIL and re-encodes; this
    deterministic stand-in emits a payload-derived pseudo-image of the target
    size header + digest (so output size/schema behave like the real op)."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resize(b):
                if b is None:
                    return None
                # STUB: real decode+resize goes here (PIL.Image.open(...).resize)
                return hashlib.sha256(bytes(b) + f"{width}x{height}".encode()).digest()

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": pdf[bin_col].map(_resize),
                }
            )

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Video frame sampling — 1:N row fan-out through mapInPandas (each input
    payload yields ceil(pseudo_frames / every_n) frame rows). Decode STUBBED:
    frame count is derived from payload length (a real impl uses pyav); frame
    payloads are deterministic digests. The fan-out shape, schema, and
    partition behavior are the real thing."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                payload = bytes(b)
                n_frames = max(1, len(payload) // 64)  # STUB: pyav stream probe
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    frames.append(hashlib.sha256(payload + fi.to_bytes(4, "big")).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, out_schema)


def extract_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Feature extraction over binary payloads (STUB decode, real plumbing).
    Deterministic by construction — independent of batch size / parallelism."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(b)).tolist() if b is not None else None
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, FEATURE_SCHEMA)
