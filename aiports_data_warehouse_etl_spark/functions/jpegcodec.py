"""Baseline JPEG codec (grayscale), pure Python + numpy.

Implements the public ITU-T T.81 baseline process for single-component
(luma) images: 8×8 DCT blocks, Annex-K luminance quantization and
Huffman tables, zigzag run-length entropy coding, byte stuffing,
restart-marker handling on decode. No external codec libraries — this
backs the multimodal operators' JPEG path the same way
`mediacodec.py` backs PNG/PPM/WAV/Y4M.

Scope honesty: ENCODE writes exactly this profile; DECODE accepts any
baseline single-component JPEG (including restart intervals and
custom tables) and raises ValueError on everything else (progressive,
multi-component color, arithmetic coding) — callers fall back to
byte-level features, pixels are never faked.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table, row-major natural order
_QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)

# Annex K.3.1 / K.3.2: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II matrix
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _T[_i, _j] = (
            (1.0 / np.sqrt(8.0))
            if _i == 0
            else 0.5 * np.cos((2 * _j + 1) * _i * np.pi / 16.0)
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the T.81 canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_qtbl(quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (_QTBL_LUMA * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w) or (h, w, 1) uint8 grayscale as baseline JPEG."""
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("encode_jpeg takes grayscale (use luminance())")
        arr = arr[:, :, 0]
    h, w = arr.shape
    qt = _scaled_qtbl(quality)
    qt2d = qt.reshape(8, 8).astype(np.float64)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)

    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = arr
    padded[h:, :w] = arr[h - 1 :, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    # vectorized DCT of all blocks: (bh, bw, 8, 8)
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ij,bcjk,lk->bcil", _T, blocks, _T)
    quant = np.round(coefs / qt2d).astype(np.int32)
    zz = quant.reshape(bh, bw, 64)[:, :, :]  # natural order per block
    zz = zz.reshape(bh * bw, 8, 8).reshape(bh * bw, 64)[:, _ZIGZAG]

    bw_ = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _category(diff)
        code, length = dc_codes[s]
        bw_.write(code, length)
        if s:
            v = diff if diff > 0 else diff + (1 << s) - 1
            bw_.write(v, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_codes[0xF0]  # ZRL
                bw_.write(c, ln)
                run -= 16
            s = _category(v)
            c, ln = ac_codes[(run << 4) | s]
            bw_.write(c, ln)
            ev = v if v > 0 else v + (1 << s) - 1
            bw_.write(ev, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw_.write(c, ln)
    bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(int(qt[z]) for z in _ZIGZAG))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht_dc = seg(
        0xFFC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    )
    dht_ac = seg(
        0xFFC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    )
    sos = seg(0xFFDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bytes(bw_.out) + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    real marker and records it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = 0xFF00 | nxt
                raise ValueError("hit marker inside entropy decode")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for restart intervals)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = 0xFF00 | d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("no marker found")


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _read_symbol(r: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG to (h, w, 1) uint8."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as exc:
        # malformed headers/tables surface as ValueError, the uniform
        # "undecodable" contract the multimodal fallback path expects
        raise ValueError(f"malformed JPEG: {type(exc).__name__}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = 0
    dc_id = ac_id = 0
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT, possibly several tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT, possibly several tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if len(bits) < 16 or i + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[i + 17 : i + 17 + n])
                htrees[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nf = struct.unpack(">BHHB", body[:6])
            if precision != 8 or nf != 1:
                raise ValueError("only 8-bit single-component baseline")
            sampling = body[7]
            if sampling != 0x11:
                raise ValueError("subsampling unsupported for 1 component")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            break
    if h is None or w is None:
        raise ValueError("missing SOF0")
    qt = qtables[comp_q].astype(np.float64)
    dc_tree = htrees[(0, dc_id)]
    ac_tree = htrees[(1, ac_id)]

    bh, bw = -(-h // 8), -(-w // 8)
    zz_blocks = np.zeros((bh * bw, 64), dtype=np.float64)
    r = _BitReader(data, pos)
    pred = 0
    for bi in range(bh * bw):
        if restart and bi and bi % restart == 0:
            m = r.align_to_marker()
            if not (0xFFD0 <= m <= 0xFFD7):
                raise ValueError("expected restart marker")
            pred = 0
        s = _read_symbol(r, dc_tree)
        diff = _extend(r.bits(s), s) if s else 0
        pred += diff
        blk = zz_blocks[bi]
        blk[0] = pred
        k = 1
        while k < 64:
            rs = _read_symbol(r, ac_tree)
            run, size = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            blk[k] = _extend(r.bits(size), size)
            k += 1

    # dequantize (tables stored zigzag), inverse zigzag, IDCT
    zz_blocks *= qt[None, :]
    nat = np.zeros_like(zz_blocks)
    nat[:, _ZIGZAG] = zz_blocks
    coefs = nat.reshape(bh * bw, 8, 8)
    pix = np.einsum("ji,bjk,kl->bil", _T, coefs, _T) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    full = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return full[:h, :w, None]
