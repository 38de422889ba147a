"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

Decode status (round 5): REAL stdlib-only decode (``media_codecs``) for
P6 PPM, 24-bit BMP, **PNG** (zlib inflate + all five scanline filters,
color types 0/2/3/4/6 at 8-bit), **GIF** (LZW, animation, interlace),
**baseline AND progressive JPEG** (Huffman + dequant + numpy IDCT,
4:4:4/4:2:2/4:2:0, restart markers; SOF2 spectral-selection +
successive-approximation multi-scan decode since round 5), PCM WAV, and
back-to-back-P6 "video" frame streams. resize/features/frame-sample
operate on actual pixel/sample values for those formats, and the DuckDB
contract oracles check the pixel math value-for-value. The only formats
still behind the deterministic sha256 STUB are the genuinely native-codec
ones (arithmetic-coded JPEG, H.264 video — no libjpeg/PIL/pyav in this
container, verified each round); swapping in a real decoder means
replacing only the fallback branches marked STUB below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .media_codecs import (
    decode_avi_mjpeg,
    decode_bmp,
    decode_gif,
    decode_gif_frames,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_avi_mjpeg,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_ppm,
    encode_wav,
    resize_nn,
    sniff_format,
)
from .util import spread

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


_sniff_format = sniff_format  # round-2 name, kept for callers/tests


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
    """Image resize over opaque binary payloads. REAL decode→nearest-neighbor
    resample→re-encode for PPM/BMP (stdlib codecs, actual pixels — the NN
    index map ``src = out·dim//out_dim`` is replicated by the DuckDB oracle
    value-for-value); compressed formats fall back to the deterministic
    sha256 STUB (no PIL/cv2 in this container)."""

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
                payload = bytes(b)
                fmt = sniff_format(payload)
                try:
                    if fmt == "ppm":
                        _, _, arr = decode_ppm(payload)
                        return encode_ppm(resize_nn(arr, width, height))
                    if fmt == "bmp":
                        _, _, arr = decode_bmp(payload)
                        return encode_bmp(resize_nn(arr, width, height))
                    if fmt == "png":
                        _, _, arr = decode_png(payload)
                        return encode_png(resize_nn(arr, width, height))
                    if fmt == "gif":
                        # decoded pixels are palette values, so re-encode's
                        # quantization is the identity (tested)
                        _, _, arr = decode_gif(payload)
                        return encode_gif(resize_nn(arr, width, height))
                    if fmt == "jpeg":
                        # re-encode with a flat-1 quantizer: near-lossless
                        # (±3/channel, tested) and still a real baseline JPEG
                        _, _, arr = decode_jpeg(payload)
                        return encode_jpeg(resize_nn(arr, width, height), quant=1)
                except ValueError:
                    pass  # corrupt/unsupported variant → stub fallback
                # STUB fallback (arithmetic JPEG, H.264, …: native-only)
                return hashlib.sha256(payload + f"{width}x{height}".encode()).digest()

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
    payload yields ceil(n_frames / every_n) frame rows). REAL decode for
    PPM frame streams (back-to-back P6 frames — the uncompressed video
    container stand-in), animated GIF, and **MJPEG AVI** (RIFF walk; each
    sampled frame is emitted as its standalone baseline-JPEG payload, so
    downstream image ops decode it with decode_jpeg). Genuinely native-only
    containers (H.264/MP4 — no pyav in this container) fall back to the
    deterministic sha256 STUB: frame count derived from payload length,
    frame payloads digest-derived."""

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
                fmt = sniff_format(payload)
                if fmt in ("ppm", "gif", "avi"):
                    try:
                        if fmt == "ppm":
                            decoded = decode_ppm_stream(payload)
                        elif fmt == "gif":
                            decoded = decode_gif_frames(payload)
                        else:  # MJPEG AVI: frames already ARE standalone JPEGs
                            decoded = decode_avi_mjpeg(payload)
                    except ValueError:
                        decoded = None
                    if decoded is not None:
                        for fi in range(0, len(decoded), every_n):
                            ids.append(int(i))
                            idxs.append(fi)
                            if fmt == "ppm":
                                frames.append(encode_ppm(decoded[fi]))
                            elif fmt == "gif":
                                frames.append(encode_gif(decoded[fi]))
                            else:
                                frames.append(decoded[fi])
                        continue
                n_frames = max(1, len(payload) // 64)  # STUB: pyav stream probe
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    frames.append(hashlib.sha256(payload + fi.to_bytes(4, "big")).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, out_schema)


def _decode_any_image(payload: bytes) -> np.ndarray | None:
    fmt = sniff_format(payload)
    try:
        if fmt == "ppm":
            return decode_ppm(payload)[2]
        if fmt == "bmp":
            return decode_bmp(payload)[2]
        if fmt == "png":
            return decode_png(payload)[2]
        if fmt == "gif":
            return decode_gif(payload)[2]
        if fmt == "jpeg":
            return decode_jpeg(payload)[2]
    except ValueError:
        return None
    return None


def extract_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Feature extraction over binary payloads. REAL decode where a stdlib
    codec exists — images (PPM/BMP) yield ``[width, height, sum_r, sum_g,
    sum_b]``, PCM WAV yields ``[rate, channels, n_frames, sample_sum]`` —
    all integer-valued and exactly representable in float32 at the supported
    media sizes, which is what lets the DuckDB oracle recompute them
    closed-form. Other formats (JPEG/PNG — no PIL/cv2 in this container)
    fall back to the deterministic 16-dim digest STUB."""

    def _features(b) -> list | None:
        if b is None:
            return None
        payload = bytes(b)
        arr = _decode_any_image(payload)
        if arr is not None:
            sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            return [
                float(arr.shape[1]),
                float(arr.shape[0]),
                float(sums[0]),
                float(sums[1]),
                float(sums[2]),
            ]
        if sniff_format(payload) == "wav":
            try:
                rate, ch, samples = decode_wav(payload)
            except ValueError:
                samples = None
            if samples is not None:
                return [
                    float(rate),
                    float(ch),
                    float(samples.shape[0]),
                    float(samples.sum(dtype=np.int64)),
                ]
        return _fake_decode(payload).tolist()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_features(b) for b in pdf[bin_col]]
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, FEATURE_SCHEMA)


# ------------------------------------------------------------- typed stats
def image_stats(
    df: DataFrame,
    passthrough: list[str],
    bin_col: str = "payload",
    spread_col: str | None = None,
) -> DataFrame:
    """REAL image decode → typed long stats (width, height, px_sum), keeping
    ``passthrough`` id columns — the value-level witness the contract oracles
    check. Rows whose payload can't be decoded by a stdlib codec get NULL
    stats (explicitly visible, never silently faked)."""

    out_schema = T.StructType(
        [df.schema[c] for c in passthrough]
        + [
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("px_sum", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sums = [], [], []
            for b in pdf[bin_col]:
                arr = _decode_any_image(bytes(b)) if b is not None else None
                if arr is None:
                    widths.append(None), heights.append(None), sums.append(None)
                else:
                    widths.append(arr.shape[1])
                    heights.append(arr.shape[0])
                    sums.append(int(arr.sum(dtype=np.int64)))
            out = pdf[passthrough].copy()
            out["width"] = pd.array(widths, dtype="Int64")
            out["height"] = pd.array(heights, dtype="Int64")
            out["px_sum"] = pd.array(sums, dtype="Int64")
            yield out

    cols = df.select(*passthrough, bin_col)
    return spread(cols, spread_col or passthrough[0]).mapInPandas(gen, out_schema)


def audio_stats(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """REAL PCM-WAV decode (stdlib ``wave``) → typed long stats per payload:
    sample rate, channel count, frame count, exact int sum of samples."""

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("rate", T.LongType()),
            T.StructField("channels", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"rate": [], "channels": [], "n_frames": [], "sample_sum": []}
            for b in pdf[bin_col]:
                try:
                    rate, ch, samples = decode_wav(bytes(b)) if b is not None else (None,) * 3
                except ValueError:
                    rate = ch = samples = None
                if samples is None:
                    for k in rows:
                        rows[k].append(None)
                else:
                    rows["rate"].append(rate)
                    rows["channels"].append(ch)
                    rows["n_frames"].append(samples.shape[0])
                    rows["sample_sum"].append(int(samples.sum(dtype=np.int64)))
            out = pdf[[id_col]].copy()
            for k, v in rows.items():
                out[k] = pd.array(v, dtype="Int64")
            yield out

    return spread(df.select(id_col, bin_col), id_col).mapInPandas(gen, out_schema)


# ------------------------------------------------- deterministic media synth
# Closed-form synthetic media (the ORACLE CONTRACT — the DuckDB side of every
# multimodal contract query recomputes these formulas symbolically, so the
# Spark side must build payloads bit-exactly from them):
#
#   image(doc_id):  w = 8 + doc_id%5, h = 6 + doc_id%4
#                   px[y,x,c] = (doc_id + 7y + 11x + 13c) % 256
#   video(doc_id):  n_frames = 3 + doc_id%7, each frame 6×4
#                   px[f,y,x,c] = (doc_id + 17f + 7y + 11x + 13c) % 256
#   audio(doc_id):  rate = 8000 + 1000*(doc_id%4), mono,
#                   n = 50 + doc_id%20, s[i] = ((7*doc_id + 13i) % 2048) - 1024
def _synth_image_array(did: int) -> np.ndarray:
    w, h = 8 + did % 5, 6 + did % 4
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((did + 7 * y + 11 * x + 13 * c) % 256).astype(np.uint8)


def _synth_payload_op(df: DataFrame, id_col: str, build) -> DataFrame:
    out_schema = T.StructType([df.schema[id_col], T.StructField("payload", T.BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({id_col: ids, "payload": [build(int(i)) for i in ids]})

    return spread(df.select(id_col), id_col).mapInPandas(gen, out_schema)


def synth_image_payloads(df: DataFrame, id_col: str = "doc_id", fmt: str = "mixed") -> DataFrame:
    """Deterministic synthetic images (closed form above), encoded as real
    P6 PPM / 24-bit BMP / PNG bytes. ``fmt='mixed'`` rotates by id % 3 so one
    pipeline exercises all three stdlib decoders (the contract oracle
    recomputes stats from the closed form, so it is format-blind — a decode
    bug in ANY of the three codecs breaks the value hash). PNG payloads
    alternate the filter the encoder writes (None for id%2==0, Up otherwise)
    so both vectorized decode branches are on the contract path."""

    def build(did: int) -> bytes:
        arr = _synth_image_array(did)
        chosen = fmt if fmt != "mixed" else ("ppm", "bmp", "png")[did % 3]
        if chosen == "bmp":
            return encode_bmp(arr)
        if chosen == "png":
            return encode_png(arr, filter_type=0 if did % 2 == 0 else 2)
        return encode_ppm(arr)

    return _synth_payload_op(df, id_col, build)


def synth_video_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic 'video': back-to-back P6 frames (closed form
    above) — a real parseable stream for ``sample_frames``."""

    def build(did: int) -> bytes:
        n_frames = 3 + did % 7
        out = []
        for f in range(n_frames):
            y = np.arange(4, dtype=np.int64)[:, None, None]
            x = np.arange(6, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            out.append(encode_ppm(((did + 17 * f + 7 * y + 11 * x + 13 * c) % 256).astype(np.uint8)))
        return b"".join(out)

    return _synth_payload_op(df, id_col, build)


def synth_gif_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic ANIMATED GIFs: the same closed-form frames as
    ``synth_video_payloads`` (so the oracle shares the formula), LZW-encoded
    through ``encode_gif``'s 6×7×6 quantizer — the oracle applies the
    quantization closed form (r'=(r*6//256)*51, g'=(g*7//256)*255//6) to the
    synthetic pixel formula. Interlace alternates by id so both row orders
    sit on the contract path."""

    def build(did: int) -> bytes:
        n_frames = 3 + did % 7
        frames = []
        for f in range(n_frames):
            y = np.arange(4, dtype=np.int64)[:, None, None]
            x = np.arange(6, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            frames.append(((did + 17 * f + 7 * y + 11 * x + 13 * c) % 256).astype(np.uint8))
        return encode_gif(frames, interlace=bool(did % 2))

    return _synth_payload_op(df, id_col, build)


def synth_jpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic JPEGs: per-8×8-block-constant grayscale
    images with block value (did + 29·bx + 37·by) % 256, encoded through the
    real entropy coder with a flat-8 quantizer — that combination makes the
    decode EXACT (see media_codecs JPEG module note), so the DuckDB contract
    oracle recomputes px_sum from the closed form and value-checks the whole
    bitstream path: Huffman tables, DC prediction, zigzag, byte stuffing,
    dequant, IDCT. Every did % 2 == 1 payload is PROGRESSIVE (SOF2
    multi-scan: spectral selection + successive approximation + EOB runs —
    round 5), so both T.81 coding processes sit on the driver-verified
    contract path; restart markers ride every did % 6 == 0 baseline
    payload."""

    def build(did: int) -> bytes:
        bw, bh = 2 + did % 3, 2 + did % 2
        bx = np.arange(bw, dtype=np.int64)[None, :]
        by = np.arange(bh, dtype=np.int64)[:, None]
        vals = ((did + 29 * bx + 37 * by) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        if did % 2 == 1:
            return encode_jpeg_progressive(img, quant=8)
        return encode_jpeg(img, quant=8, restart_interval=2 if did % 3 == 0 else 0)

    return _synth_payload_op(df, id_col, build)


def synth_mjpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic MJPEG AVIs: 3 + did % 5 block-constant
    grayscale frames, each entropy-coded as a real baseline JPEG (flat-8
    quantizer ⇒ exact decode; frame f block value
    (did + 19·f + 29·bx + 37·by) % 256 over a (2 + did % 2) × 2 block grid),
    wrapped in a standard RIFF/AVI container — the compressed-video analogue
    of the GIF contract fixture."""

    def build(did: int) -> bytes:
        bw, bh = 2 + did % 2, 2
        bx = np.arange(bw, dtype=np.int64)[None, :]
        by = np.arange(bh, dtype=np.int64)[:, None]
        frames = []
        for f in range(3 + did % 5):
            vals = ((did + 19 * f + 29 * bx + 37 * by) % 256).astype(np.uint8)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
            frames.append(encode_jpeg(img, quant=8))
        return encode_avi_mjpeg(frames, w=8 * bw, h=8 * bh)

    return _synth_payload_op(df, id_col, build)


def synth_audio_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PCM16 WAV (closed form above)."""

    def build(did: int) -> bytes:
        n = 50 + did % 20
        i = np.arange(n, dtype=np.int64)
        samples = ((7 * did + 13 * i) % 2048 - 1024).astype("<i2")
        return encode_wav(8000 + 1000 * (did % 4), samples)

    return _synth_payload_op(df, id_col, build)
