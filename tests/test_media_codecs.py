"""Stdlib media codecs + real-decode multimodal paths (round-3 VERDICT #4).

The codecs make resize/features/frame-sample REAL (actual pixels/samples) for
uncompressed formats — P6 PPM, 24-bit BI_RGB BMP, PCM16 WAV — with the sha256
stub demoted to a fallback for compressed formats this container can't decode
(no PIL/cv2/pyav). Reference intent: gobblin converters operate on real
payload bytes, e.g. gobblin-core converter.avro (decode-then-transform).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gobblin_spark.operators.media_codecs import (
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    resize_nn,
    sniff_format,
)
from gobblin_spark.operators.multimodal import (
    _synth_image_array,
    audio_stats,
    extract_features,
    image_stats,
    resize_images,
    sample_frames,
    synth_audio_payloads,
    synth_image_payloads,
    synth_video_payloads,
)


# ------------------------------------------------------------- pure codecs
def test_ppm_roundtrip_and_comments():
    arr = _synth_image_array(7)
    w, h, back = decode_ppm(encode_ppm(arr))
    assert (w, h) == (arr.shape[1], arr.shape[0]) and (back == arr).all()
    # header comments + arbitrary whitespace are legal PPM
    p = b"P6\n# comment line\n3 2\n255\n" + bytes(range(18))
    w, h, a = decode_ppm(p)
    assert (w, h) == (3, 2) and a[1, 2, 2] == 17


@pytest.mark.parametrize("did", range(8))  # widths 8..12 → hits all row paddings
def test_bmp_roundtrip_padding_and_bottom_up(did):
    arr = _synth_image_array(did)
    payload = encode_bmp(arr)
    w, h, back = decode_bmp(payload)
    assert (w, h) == (arr.shape[1], arr.shape[0])
    assert (back == arr).all()  # catches BGR order + bottom-up row flip


def test_wav_roundtrip_and_error_normalization():
    s = ((7 * 5 + 13 * np.arange(60)) % 2048 - 1024).astype("<i2")
    rate, ch, back = decode_wav(encode_wav(9000, s))
    assert rate == 9000 and ch == 1 and (back[:, 0] == s).all()
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEgarbage")


def test_ppm_stream_and_truncation():
    frames = [_synth_image_array(d) for d in (1, 2, 3)]
    st = b"".join(encode_ppm(f) for f in frames)
    dec = decode_ppm_stream(st)
    assert len(dec) == 3 and all((a == b).all() for a, b in zip(dec, frames))
    with pytest.raises(ValueError):
        decode_ppm_stream(st[:-5])  # truncated last frame


def test_resize_nn_floor_index_map():
    arr = _synth_image_array(3)
    h, w = arr.shape[:2]
    out = resize_nn(arr, 4, 3)
    for y in range(3):
        for x in range(4):
            assert (out[y, x] == arr[y * h // 3, x * w // 4]).all()


def test_sniff_format_magics():
    arr = _synth_image_array(0)
    assert sniff_format(encode_ppm(arr)) == "ppm"
    assert sniff_format(encode_bmp(arr)) == "bmp"
    assert sniff_format(encode_wav(8000, np.zeros(4, dtype="<i2"))) == "wav"
    assert sniff_format(b"\x89PNG....") == "png"
    assert sniff_format(b"\xff\xd8\xffdata") == "jpeg"
    assert sniff_format(b"nonsense") == "unknown"


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filters[y] — exercises decoder
    branches (Sub/Average/Paeth) our encoder never writes."""
    import struct
    import zlib

    h, w = arr.shape[0], arr.shape[1]
    a = arr.astype(np.int64).reshape(h, w * 3)
    bpp = 3
    raw = b""
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        f = filters[y]
        cur = a[y]
        line = np.zeros(w * 3, dtype=np.int64)
        for x in range(w * 3):
            av = int(cur[x - bpp]) if x >= bpp else 0
            bv = int(prev[x])
            cv = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                line[x] = cur[x]
            elif f == 1:
                line[x] = (cur[x] - av) & 0xFF
            elif f == 2:
                line[x] = (cur[x] - bv) & 0xFF
            elif f == 3:
                line[x] = (cur[x] - (av + bv) // 2) & 0xFF
            else:
                p = av + bv - cv
                pa, pb, pc = abs(p - av), abs(p - bv), abs(p - cv)
                pr = av if pa <= pb and pa <= pc else bv if pb <= pc else cv
                line[x] = (cur[x] - pr) & 0xFF
        raw += bytes([f]) + line.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 2])
def test_png_roundtrip_encoder_filters(filter_type):
    for did in (0, 3, 7):
        arr = _synth_image_array(did)
        payload = encode_png(arr, filter_type=filter_type)
        assert sniff_format(payload) == "png"
        w, h, out = decode_png(payload)
        assert (w, h) == (arr.shape[1], arr.shape[0])
        assert np.array_equal(out, arr)


def test_png_all_five_scanline_filters_decode():
    arr = _synth_image_array(5)  # 8+5%5=8... w=13? w = 8+0, compute per id
    h = arr.shape[0]
    # every filter appears at least once, incl. row 0 edge cases
    filters = [(i % 5) for i in range(h)]
    payload = _png_with_filters(arr, filters)
    w, hh, out = decode_png(payload)
    assert np.array_equal(out, arr)
    # and the reverse order (Paeth on row 0: b = c = 0)
    payload = _png_with_filters(arr, [4] + [(3 - i) % 5 for i in range(h - 1)])
    assert np.array_equal(decode_png(payload)[2], arr)


def test_png_color_types():
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # grayscale (type 0): value v -> RGB (v,v,v)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    p = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, out = decode_png(p)
    assert (w, h) == (4, 3) and np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    # palette (type 3): indices resolve through PLTE
    palette = np.array([[250, 1, 2], [3, 250, 4], [5, 6, 250]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    p = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, out = decode_png(p)
    assert np.array_equal(out, palette[idx])
    # RGBA (type 6): alpha dropped
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., :3] = _synth_image_array(1)[:2, :2]
    rgba[..., 3] = 128
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    p = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(p)[2], rgba[..., :3])


def test_png_rejects_malformed():
    arr = _synth_image_array(2)
    good = encode_png(arr)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNGnope")
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated chunk
    # 16-bit depth declines (stub fallback upstream, never wrong pixels)
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


# ------------------------------------------------------ Spark-side real ops
def test_extract_features_real_image_and_audio_stub_fallback(spark):
    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    img = extract_features(synth_image_payloads(docs, fmt="mixed")).collect()
    by_id = {r["doc_id"]: r["feature"] for r in img}
    for did in range(4):
        arr = _synth_image_array(did)
        sums = arr.reshape(-1, 3).sum(axis=0)
        assert by_id[did] == [
            float(arr.shape[1]), float(arr.shape[0]),
            float(sums[0]), float(sums[1]), float(sums[2]),
        ]
    wav = extract_features(synth_audio_payloads(docs)).collect()
    for r in wav:
        did = r["doc_id"]
        n = 50 + did % 20
        expect_sum = float(((7 * did + 13 * np.arange(n)) % 2048 - 1024).sum())
        assert r["feature"] == [float(8000 + 1000 * (did % 4)), 1.0, float(n), expect_sum]
    # undecodable payload → 16-dim deterministic stub, not a crash
    stub = extract_features(
        spark.createDataFrame([(1, b"not-an-image")], "doc_id long, payload binary")
    ).collect()
    assert len(stub[0]["feature"]) == 16


def test_resize_images_real_pixels_roundtrip(spark):
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    resized = resize_images(synth_image_payloads(docs, fmt="ppm"), width=4, height=3)
    stats = {r["doc_id"]: r for r in image_stats(resized, ["doc_id"]).collect()}
    for did in range(5):
        arr = _synth_image_array(did)
        expect = int(resize_nn(arr, 4, 3).sum())
        assert (stats[did]["width"], stats[did]["height"]) == (4, 3)
        assert stats[did]["px_sum"] == expect


def test_sample_frames_real_stream_and_stub_fallback(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    frames = sample_frames(synth_video_payloads(docs), every_n=2)
    got = {(r["doc_id"], r["frame_idx"]): r for r in frames.collect()}
    for did in range(6):
        n_frames = 3 + did % 7
        idxs = list(range(0, n_frames, 2))
        assert sorted(fi for (d, fi) in got if d == did) == idxs
        # each emitted frame is a real standalone P6 payload with the right pixels
        for fi in idxs:
            _, _, arr = decode_ppm(bytes(got[(did, fi)]["frame"]))
            y, x, c = np.ix_(np.arange(4), np.arange(6), np.arange(3))
            assert (arr == (did + 17 * fi + 7 * y + 11 * x + 13 * c) % 256).all()
    # non-PPM payload → digest stub fan-out (length-derived count), unchanged
    stub = sample_frames(
        spark.createDataFrame([(9, b"z" * 640)], "doc_id long, payload binary"), every_n=2
    ).collect()
    assert len(stub) == 5 and len(bytes(stub[0]["frame"])) == 32


def test_image_audio_stats_null_on_undecodable(spark):
    df = spark.createDataFrame(
        [(1, bytes(encode_bmp(_synth_image_array(1)))), (2, b"JUNK")],
        "doc_id long, payload binary",
    )
    st = {r["doc_id"]: r for r in image_stats(df, ["doc_id"]).collect()}
    assert st[1]["px_sum"] == int(_synth_image_array(1).sum()) and st[2]["px_sum"] is None
    au = {r["doc_id"]: r for r in audio_stats(df).collect()}
    assert au[1]["rate"] is None and au[2]["rate"] is None


def test_multimodal_ops_avoid_per_row_python_udf(spark):
    """All multimodal ops must ride mapInPandas (Arrow batches), never
    per-row BatchEvalPython."""
    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    for df in (
        extract_features(synth_image_payloads(docs)),
        image_stats(resize_images(synth_image_payloads(docs, fmt="ppm"), 4, 3), ["doc_id"]),
        audio_stats(synth_audio_payloads(docs)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
