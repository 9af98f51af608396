"""Generate the class-level expected-output lookup for the
``mm_decode_features`` contract query.

Every media payload that query synthesizes is a pure function of a
small residue class of ``doc_id``:

* grp 0 — 8x8 gray PNG, pixels ``(s*(did+7)) % 256`` → class ``did % 256``
* grp 1 — 16x16 baseline JPEG, pixels ``(s+did) % 256`` → class ``did % 256``
* grp 2 — 64-sample PCM16 WAV, ``(s*(did%500+1)) % 20000`` → class ``did % 500``
* grp 3 — 97 raw bytes ``0x00 || (s*(did%256+11)) % 256`` → class ``did % 256``

so the decode output has only 64 + 64 + 125 + 64 = 317 distinct rows,
independent of scale factor. This tool synthesizes each class payload
once, runs the decode kernel on it, and emits the lookup as
``aiports_data_warehouse_etl_spark/functions/mm_expected.py``; the
contract query's DuckDB oracle joins ``documents`` against that
VALUES table on the residue keys — valid at ANY sf.

Honesty: for the PNG / WAV / raw groups the expected statistics are
re-derived here with plain-Python integer math (no numpy, no codec)
and ASSERTED equal to the kernel's output — an independent check of
mean / population-std / histogram / byte-fold logic. The JPEG group
is a codec roundtrip pin (there is no independent T.81 decoder in
this environment); its *encode* fidelity is separately bounded by the
PSNR tests in tests/test_mediacodec.py.

Run: python tools/gen_mm_expected.py   (idempotent, writes the module)
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from aiports_data_warehouse_etl_spark.functions import mediacodec as mc  # noqa: E402
from aiports_data_warehouse_etl_spark.functions.jpegcodec import (  # noqa: E402
    encode_jpeg,
)
from aiports_data_warehouse_etl_spark.operators.multimodal import (  # noqa: E402
    FEATURE_DIM,
    _decode_one,
)

OUT = "aiports_data_warehouse_etl_spark/functions/mm_expected.py"


def _indep_stats(values: list[int], lo: float, hi: float):
    """Mean / population std / L1 histogram with plain-Python math."""
    n = len(values)
    mean = sum(values) / n
    var = sum((v - mean) ** 2 for v in values) / n
    hist = [0] * FEATURE_DIM
    width = (hi - lo) / FEATURE_DIM
    for v in values:
        b = min(int((v - lo) / width), FEATURE_DIM - 1)
        hist[b] += 1
    feat = [round(h / n, 6) for h in hist]
    return round(mean, 6), round(math.sqrt(var), 6), feat


def _assert_close(tag, got, exp):
    if got != exp:
        raise AssertionError(f"{tag}: kernel={got!r} independent={exp!r}")


def synth_payload(grp: int, cls: int) -> bytes:
    if grp == 0:
        px = ((np.arange(64, dtype=np.int64) * (cls + 7)) % 256).astype(
            np.uint8
        ).reshape(8, 8, 1)
        return mc.encode_png(px)
    if grp == 1:
        px = ((np.arange(256, dtype=np.int64) + cls) % 256).astype(
            np.uint8
        ).reshape(16, 16)
        return encode_jpeg(px, quality=90)
    if grp == 2:
        sig = ((np.arange(64, dtype=np.int64) * (cls + 1)) % 20000).astype(
            np.int16
        )
        return mc.encode_wav(sig, 8000)
    return b"\x00" + bytes(
        ((np.arange(96, dtype=np.int64) * (cls + 11)) % 256)
        .astype(np.uint8)
        .tolist()
    )


def main() -> None:
    rows = []
    classes = (
        [(0, c, "image") for c in range(0, 256, 4)]
        + [(1, c, "image") for c in range(1, 256, 4)]
        + [(2, c, "audio") for c in range(2, 500, 4)]
        + [(3, c, "video") for c in range(3, 256, 4)]
    )
    for grp, cls, kind in classes:
        payload = synth_payload(grp, cls)
        d = _decode_one(payload)
        # independent verification (non-JPEG groups)
        if grp == 0:
            vals = [(s * (cls + 7)) % 256 for s in range(64)]
            m, sd, feat = _indep_stats(vals, 0.0, 256.0)
            _assert_close(f"png{cls} mean", d["sig_mean"], m)
            _assert_close(f"png{cls} std", d["sig_std"], sd)
            _assert_close(f"png{cls} feat", d["feature"], feat)
        elif grp == 2:
            vals = [(s * (cls + 1)) % 20000 for s in range(64)]
            m, sd, feat = _indep_stats(vals, -32768.0, 32768.0)
            _assert_close(f"wav{cls} mean", d["sig_mean"], m)
            _assert_close(f"wav{cls} std", d["sig_std"], sd)
            _assert_close(f"wav{cls} feat", d["feature"], feat)
        elif grp == 3:
            byts = [0] + [(s * (cls + 11)) % 256 for s in range(96)]
            hist = [0] * FEATURE_DIM
            for b in byts:
                hist[b % FEATURE_DIM] += 1
            feat = [round(h / len(byts), 6) for h in hist]
            _assert_close(f"raw{cls} fmt", d["fmt"], "raw")
            _assert_close(f"raw{cls} feat", d["feature"], feat)
        feature_csv = (
            ",".join("%.6f" % v for v in d["feature"])
            if d["feature"] is not None
            else None
        )
        rows.append(
            (
                grp,
                cls,
                kind,
                d["fmt"],
                d["n_bytes"],
                d["width"],
                d["height"],
                d["n_samples"],
                d["sample_rate"],
                repr(d["sig_mean"]) if d["sig_mean"] is not None else None,
                repr(d["sig_std"]) if d["sig_std"] is not None else None,
                feature_csv,
            )
        )
    with open(OUT, "w") as f:
        f.write(
            '"""AUTO-GENERATED by tools/gen_mm_expected.py — expected\n'
            "decode output per (doc_id residue) class for the\n"
            "mm_decode_features contract query's cross-engine oracle.\n"
            "Columns: (grp, cls, kind, fmt, n_bytes, width, height,\n"
            "n_samples, sample_rate, sig_mean_repr, sig_std_repr,\n"
            'feature_csv). Regenerate by re-running the tool."""\n\n'
        )
        f.write("ROWS = [\n")
        for r in rows:
            f.write(f"    {r!r},\n")
        f.write("]\n")
    print(f"wrote {OUT}: {len(rows)} class rows")


if __name__ == "__main__":
    main()
