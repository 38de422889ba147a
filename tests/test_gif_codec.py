"""GIF codec unit tests (pure stdlib+numpy, no Spark).

The GIF LZW variant's trap is the width-bump synchronization: encoder and
decoder keep one-behind dictionaries, and both must widen the code size at
the same code index (giflib's rule: after code k, when the table holds
2^width entries). A roundtrip that crosses every width boundary (9→10→11→12)
plus a dictionary-overflow reset is the regression net for that; the
compositing tests cover interlace, transparency and disposal modes.
"""

import numpy as np
import pytest

from gobblin_spark.operators.media_codecs import (
    _gif_palette,
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    quantize_gif,
    resize_nn,
    sniff_format,
)


def _synth(h, w, seed=0):
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((seed + 7 * y + 11 * x + 13 * c) % 256).astype(np.uint8)


def test_lzw_roundtrip_simple():
    data = bytes([1, 1, 1, 2, 2, 3, 1, 1, 1, 1]) * 5
    assert bytes(_lzw_decode_gif(_lzw_encode_gif(data, 2), 2)) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' immediately forces the decoder's code == len(table) branch
    for n in (3, 10, 100):
        data = bytes([0]) * n
        assert bytes(_lzw_decode_gif(_lzw_encode_gif(data, 2), 2)) == data


def test_lzw_roundtrip_crosses_all_width_bumps_and_reset():
    # mcs=8: width bumps at table sizes 512/1024/2048/4096, then dict reset.
    # A non-repeating-ish long sequence grows the dictionary past 4096.
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
    assert bytes(_lzw_decode_gif(_lzw_encode_gif(data, 8), 8)) == data


def test_gif_roundtrip_single_frame():
    arr = _synth(13, 17)
    payload = encode_gif(arr)
    assert sniff_format(payload) == "gif"
    w, h, out = decode_gif(payload)
    assert (w, h) == (17, 13)
    np.testing.assert_array_equal(out, quantize_gif(arr))


def test_gif_quantization_closed_form():
    # the oracle replicates r'=(r*6//256)*51, g'=(g*7//256)*255//6, b' like r
    arr = np.arange(256, dtype=np.uint8).repeat(3).reshape(1, 256, 3)
    q = quantize_gif(arr)
    v = np.arange(256, dtype=np.int64)
    np.testing.assert_array_equal(q[0, :, 0], (v * 6 // 256) * 51)
    np.testing.assert_array_equal(q[0, :, 1], (v * 7 // 256) * 255 // 6)
    np.testing.assert_array_equal(q[0, :, 2], (v * 6 // 256) * 51)
    # quantization is idempotent (palette values map to themselves), so a
    # decode → resize → re-encode pipeline loses nothing further
    np.testing.assert_array_equal(quantize_gif(q), q)


def test_gif_interlaced_roundtrip():
    arr = _synth(11, 7, seed=5)  # odd height exercises all four passes
    out = decode_gif(encode_gif(arr, interlace=True))[2]
    np.testing.assert_array_equal(out, quantize_gif(arr))


def test_gif_animation_frames():
    frames = [_synth(6, 9, seed=s) for s in range(4)]
    decoded = decode_gif_frames(encode_gif(frames))
    assert len(decoded) == 4
    for got, src in zip(decoded, frames):
        np.testing.assert_array_equal(got, quantize_gif(src))


def test_gif_resize_composes():
    arr = _synth(8, 12)
    q = quantize_gif(arr)
    payload = encode_gif(arr)
    _, _, dec = decode_gif(payload)
    out = decode_gif(encode_gif(resize_nn(dec, 5, 3)))[2]
    np.testing.assert_array_equal(out, resize_nn(q, 5, 3))


def _manual_gif(frame_blocks: bytes, w: int, h: int, bg_idx: int = 1) -> bytes:
    import struct

    pal = _gif_palette()
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, bg_idx, 0) + pal.tobytes()
    return head + frame_blocks + b"\x3b"


def _frame_block(idx: np.ndarray, fx: int, fy: int, gce_flags: int | None,
                 transparent: int = 0, disposal: int = 0) -> bytes:
    import struct

    fh, fw = idx.shape
    out = b""
    if gce_flags is not None:
        flags = (disposal << 2) | gce_flags
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, 0, transparent, 0)
    out += struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, 0)
    comp = _lzw_encode_gif(np.ascontiguousarray(idx, dtype=np.uint8).tobytes(), 8)
    out += bytes([8])
    for i in range(0, len(comp), 255):
        c = comp[i : i + 255]
        out += bytes([len(c)]) + c
    return out + b"\x00"


def test_gif_transparency_composites_over_previous():
    pal = _gif_palette()
    # frame 1: solid color 9; frame 2: color 20 with a transparent hole at (0,0)
    f1 = np.full((2, 2), 9, dtype=np.uint8)
    f2 = np.full((2, 2), 20, dtype=np.uint8)
    f2[0, 0] = 77  # the transparent index
    blocks = _frame_block(f1, 0, 0, gce_flags=0, disposal=1) + _frame_block(
        f2, 0, 0, gce_flags=1, transparent=77, disposal=0
    )
    frames = decode_gif_frames(_manual_gif(blocks, 2, 2))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], np.broadcast_to(pal[9], (2, 2, 3)))
    expect = np.broadcast_to(pal[20], (2, 2, 3)).copy()
    expect[0, 0] = pal[9]  # hole shows the previous frame
    np.testing.assert_array_equal(frames[1], expect)


def test_gif_disposal_restore_background():
    pal = _gif_palette()
    bg_idx = 3
    # frame 1 covers a sub-rect with disposal=2 (restore bg); frame 2 is a
    # transparent full-canvas frame, so it shows bg where frame 1 was
    f1 = np.full((1, 1), 9, dtype=np.uint8)
    f2 = np.full((2, 2), 77, dtype=np.uint8)  # all-transparent
    blocks = _frame_block(f1, 1, 1, gce_flags=0, disposal=2) + _frame_block(
        f2, 0, 0, gce_flags=1, transparent=77, disposal=0
    )
    frames = decode_gif_frames(_manual_gif(blocks, 2, 2, bg_idx=bg_idx))
    expect1 = np.broadcast_to(pal[bg_idx], (2, 2, 3)).copy()
    expect1[1, 1] = pal[9]
    np.testing.assert_array_equal(frames[0], expect1)
    np.testing.assert_array_equal(frames[1], np.broadcast_to(pal[bg_idx], (2, 2, 3)))


def test_gif_disposal_restore_previous():
    pal = _gif_palette()
    f1 = np.full((2, 2), 9, dtype=np.uint8)
    f2 = np.full((1, 1), 20, dtype=np.uint8)  # overlay at (0,0), disposal=3
    f3 = np.full((1, 1), 77, dtype=np.uint8)  # transparent: reveals RESTORED canvas
    blocks = (
        _frame_block(f1, 0, 0, gce_flags=0, disposal=1)
        + _frame_block(f2, 0, 0, gce_flags=0, disposal=3)
        + _frame_block(f3, 0, 0, gce_flags=1, transparent=77, disposal=0)
    )
    frames = decode_gif_frames(_manual_gif(blocks, 2, 2))
    assert (frames[1][0, 0] == pal[20]).all()
    # frame 3's transparent pixel shows frame 1's color again (not frame 2's)
    np.testing.assert_array_equal(frames[2], np.broadcast_to(pal[9], (2, 2, 3)))


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"GIF8")
    with pytest.raises(ValueError):
        decode_gif(b"notagif")
