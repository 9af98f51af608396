"""Real-codec tests: the PNG/PPM/WAV kernels decode actual bytes to
actual pixels/samples. The PNG decoder is pinned against independently
hand-built byte streams (chunk-by-chunk, every filter type), not just
its own encoder's round-trip."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aiports_data_warehouse_etl_spark.functions import mediacodec as mc


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(width, height, color_type, raw_scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


def test_png_filter0_hand_built():
    # 2x2 RGB, filter 0 rows: known pixel values
    rows = (
        b"\x00" + bytes([255, 0, 0, 0, 255, 0])
        + b"\x00" + bytes([0, 0, 255, 10, 20, 30])
    )
    px = mc.decode_png(_hand_png(2, 2, 2, rows))
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[1, 1].tolist() == [10, 20, 30]


def test_png_all_filter_types():
    """Gray 4x3 image exercising Sub(1), Up(2), Average(3), Paeth(4)."""
    base = np.array(
        [[10, 20, 30], [15, 25, 35], [100, 110, 120], [90, 95, 105]],
        dtype=np.uint8,
    )
    # build filtered scanlines by applying each filter forward
    lines = []
    prev = np.zeros(3, dtype=np.int16)
    for y, ft in enumerate([1, 2, 3, 4]):
        cur = base[y].astype(np.int16)
        enc = np.zeros(3, dtype=np.int16)
        for x in range(3):
            a = int(cur[x - 1]) if x >= 1 else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x >= 1 else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(cur[x]) - pred) % 256
        lines.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = cur
    px = mc.decode_png(_hand_png(3, 4, 0, b"".join(lines)))
    assert px.reshape(4, 3).tolist() == base.tolist()


def test_png_roundtrip_rgba():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(3, 7, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    # header with a comment line
    data = b"P5\n# a comment\n2 2\n255\n" + bytes([1, 2, 3, 4])
    px = mc.decode_ppm(data)
    assert px.reshape(2, 2).tolist() == [[1, 2], [3, 4]]


def test_wav_roundtrip_stats():
    t = np.arange(800)
    sig = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    data = mc.encode_wav(sig, 8000)
    samples, rate = mc.decode_wav(data)
    assert rate == 8000 and samples.shape == (800, 1)
    assert np.array_equal(samples.ravel(), sig.astype(np.int32))


def test_sniff_format():
    assert mc.sniff_format(mc.encode_png(np.zeros((1, 1), np.uint8))) == "png"
    assert mc.sniff_format(b"P6 1 1 255 abc") == "ppm"
    assert mc.sniff_format(mc.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert mc.sniff_format(b"\x00\x01\x02") is None
    assert mc.sniff_format(None) is None


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = mc.resize_nearest(img, 2, 2)
    assert small.reshape(2, 2).tolist() == [[0, 2], [8, 10]]
    big = mc.resize_nearest(img, 8, 8)
    assert big.shape == (8, 8, 1)
    assert big[0, 0, 0] == 0 and big[7, 7, 0] == 15


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + b"junkjunkjunk")
    with pytest.raises(ValueError):
        mc.decode_image(b"not an image at all")


# ---------------------------------------------------------------------------
# YUV4MPEG2
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_mono_and_420():
    fr = (np.arange(4 * 6 * 8).reshape(4, 6, 8) % 256).astype(np.uint8)
    for mono in (True, False):
        data = mc.encode_y4m(fr, 30, 1, mono=mono)
        assert mc.sniff_format(data) == "y4m"
        dec, fn, fd = mc.decode_y4m(data)
        assert (fn, fd) == (30, 1)
        np.testing.assert_array_equal(dec, fr)


def test_y4m_malformed_rejected():
    fr = np.zeros((2, 4, 4), np.uint8)
    good = mc.encode_y4m(fr, 25, 1)
    with pytest.raises(ValueError):
        mc.decode_y4m(good[:-3])  # truncated final frame
    with pytest.raises(ValueError):
        mc.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\x00" * 48)
    with pytest.raises(ValueError):
        mc.decode_y4m(b"P6\n1 1\n255\nabc")  # not y4m at all


def test_y4m_fps_fraction():
    fr = np.zeros((1, 2, 2), np.uint8)
    dec, fn, fd = mc.decode_y4m(mc.encode_y4m(fr, 30000, 1001))
    assert (fn, fd) == (30000, 1001)
    assert dec.shape == (1, 2, 2)


# ---------------------------------------------------------------------------
# Baseline JPEG (functions/jpegcodec.py)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_psnr():
    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    rng = np.random.default_rng(7)
    grad = np.linspace(0, 255, 100)[None, :] * np.ones((75, 1))
    img = np.clip(grad + rng.normal(0, 10, (75, 100)), 0, 255).astype(
        np.uint8
    )  # non-multiple-of-8 dims exercise edge-replicate padding
    enc = J.encode_jpeg(img, quality=90)
    dec = J.decode_jpeg(enc)
    assert dec.shape == (75, 100, 1)
    err = dec[:, :, 0].astype(float) - img.astype(float)
    psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
    assert psnr > 35.0, psnr
    # lossy but structured: the file must be smaller than raw pixels
    assert len(enc) < img.size


def test_jpeg_flat_image_is_lossless_and_tiny():
    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    flat = np.full((16, 24), 128, np.uint8)
    enc = J.encode_jpeg(flat, 90)
    dec = J.decode_jpeg(enc)
    assert np.array_equal(dec[:, :, 0], flat)
    assert len(enc) < 400  # DC-only blocks collapse to EOBs


def test_jpeg_quality_monotone():
    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8).astype(np.uint8)
    sizes = [len(J.encode_jpeg(img, q)) for q in (30, 60, 95)]
    assert sizes == sorted(sizes), sizes


def test_jpeg_sniff_and_dispatch():
    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    img = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    enc = J.encode_jpeg(img, 95)
    assert mc.sniff_format(enc) == "jpeg"
    via_dispatch = mc.decode_image(enc)
    assert via_dispatch.shape == (8, 8, 1)


def test_jpeg_rejects_unsupported():
    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xffnot really")
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4, 3), np.uint8))  # color: use luminance()
    # truncated entropy stream must raise, not fabricate pixels
    good = J.encode_jpeg(np.arange(256, dtype=np.uint8).reshape(16, 16), 90)
    with pytest.raises(ValueError):
        J.decode_jpeg(good[: len(good) // 2])
