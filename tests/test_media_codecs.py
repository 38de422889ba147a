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
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_bmp,
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
