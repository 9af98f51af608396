"""Real media codecs built on the Python stdlib only (zlib, wave,
struct) + numpy — no PIL/opencv/ffmpeg in this environment.

Formats:
- PNG  — full decoder for non-interlaced 8-bit gray / gray+alpha /
         RGB / RGBA: chunk walk, zlib inflate, per-scanline unfilter
         (filter types 0-4 per the PNG spec §9), plus a minimal
         encoder (filter 0). Pure format logic, no external deps.
- PPM/PGM (P6/P5) — binary NetPBM parse/emit.
- WAV  — stdlib ``wave`` PCM16/PCM8 decode + encode.

These back the multimodal operators (`operators/multimodal.py`): the
reference pipeline has no media handling (parity holds at zero); this
is the brief-mandated training-data extension, so the kernels here are
REAL — decode failures fall back to byte-level features, they don't
fake pixel statistics.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(data: bytes | None) -> str | None:
    """Magic-byte format detection; None = unknown/undecodable."""
    if not data:
        return None
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:2] in (b"P6", b"P5") and len(data) > 2 and data[2:3] in b" \t\n\r":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth). Returns (height, width, channels) uint8."""
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(channels, stride):
                cur[x] = (int(cur[x]) + int(cur[x - channels])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (h, w, channels) uint8."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, channels = 8, None, None, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * channels)
    if len(raw) != expected:
        raise ValueError(f"PNG pixel data {len(raw)} != expected {expected}")
    return _unfilter(raw, width, height, channels)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, {1,2,3,4}) uint8 as a filter-0 PNG."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PPM / PGM (binary NetPBM)
# ---------------------------------------------------------------------------


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary P6 (RGB) / P5 (gray) with maxval 255."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header tokens: magic, width, height, maxval — comments (#...) allowed
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = width * height * ch
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return px.reshape(height, width, ch)


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    if ch not in (1, 3):
        raise ValueError("PPM supports 1 or 3 channels")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to ((n_frames, n_channels) int32 samples, rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        ch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 1:  # 8-bit WAV is unsigned, centred at 128
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n_frames,) or (n_frames, ch) int16 samples as PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Kernels used by the multimodal operators
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch PNG/PPM/JPEG decode by magic bytes."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "jpeg":
        from aiports_data_warehouse_etl_spark.functions.jpegcodec import (
            decode_jpeg,
        )

        return decode_jpeg(data)
    raise ValueError("not a decodable image")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample to (height, width, ch)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def luminance(arr: np.ndarray) -> np.ndarray:
    """Rec.601 luma from (h, w, ch) uint8 -> (h, w) float64."""
    a = arr.astype(np.float64)
    if a.shape[2] >= 3:
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return a[:, :, 0]


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m) — uncompressed video container (the ffmpeg/x264
# interchange format): one stream header line, then per-frame FRAME
# markers followed by raw planar YUV. Supported colourspaces: Cmono
# (luma only) and C420/C420jpeg/C420mpeg2 (4:2:0 subsampled chroma).
# ---------------------------------------------------------------------------


def decode_y4m(data: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a Y4M stream → (frames[T, H, W] uint8 luma, fps_num,
    fps_den). Chroma planes are size-validated and skipped — the
    analytics kernels consume luma. Raises ValueError on malformed
    headers/truncated frames (never fabricates pixels)."""
    if data[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    header = data[9:nl].decode("ascii", "strict")
    width = height = None
    fps_num, fps_den = 25, 1
    cspace = "420"
    for tok in header.split():
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok[0] == "C":
            cspace = tok[1:]
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if cspace.startswith("420"):
        frame_bytes = width * height + 2 * ((width // 2) * (height // 2))
    elif cspace == "mono":
        frame_bytes = width * height
    else:
        raise ValueError(f"unsupported Y4M colourspace C{cspace}")

    frames = []
    pos = nl + 1
    luma = width * height
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data[pos:pos + luma], dtype=np.uint8).reshape(
                height, width
            )
        )
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, height, width), np.uint8), fps_num, fps_den


def encode_y4m(
    frames: np.ndarray, fps_num: int = 25, fps_den: int = 1, mono: bool = True
) -> bytes:
    """Emit a Y4M stream from (T, H, W) uint8 luma frames — Cmono by
    default, or C420 with neutral (128) chroma planes."""
    t, h, w = frames.shape
    cs = b"Cmono" if mono else b"C420"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps_num, fps_den, cs)]
    chroma = b"\x80" * (2 * ((w // 2) * (h // 2)))
    for i in range(t):
        out.append(b"FRAME\n")
        out.append(frames[i].astype(np.uint8).tobytes())
        if not mono:
            out.append(chroma)
    return b"".join(out)
