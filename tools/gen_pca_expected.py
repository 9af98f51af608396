"""Generate the cardinality-keyed top-principal-component literal pin
for ``emb_pca_projection`` (r12 — the sketch-pin pattern of
tools/gen_sketch_expected.py applied to the last driver-side
eigensolve): the eigenVECTOR is pinned per corpus cardinality;
the DuckDB oracle then RECOMPUTES the projection and the per-label
aggregate from the raw embeddings, so the distributed parts
(zip_with dot product, groupBy stats) are genuinely re-verified and
only the 64x64 eigensolve — which no SQL engine performs — rides the
pin.

Soundness gates baked into generation (the HLL-pin standard):
- the component is recomputed under shuffle.partitions 4 AND 32 and
  the pin is refused unless the full query output is IDENTICAL after
  rounding (partition-order FP drift must be sub-rounding);
- every rounded output value must sit > 1e-9 from its 6-dp rounding
  boundary, so last-ulp drift in a future session cannot flip a
  committed digit.

Usage: python tools/gen_pca_expected.py
Writes aiports_data_warehouse_etl_spark/functions/pca_expected.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SCALES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aiports_data_warehouse_etl_spark",
    "functions",
    "pca_expected.py",
)


def main() -> None:
    from pyspark.sql import functions as F

    from aiports_data_warehouse_etl_spark.operators.similarity import (
        pca_top_component,
    )
    from aiports_data_warehouse_etl_spark.session import get_spark

    # Pins key on (corpus_n, content_key): cardinality alone COLLIDES
    # (sf0.001 and sf0.01 both hold 500 embeddings with different
    # content — caught at first generation). content_key =
    # sum(floor(first_element × 1e6)) as BIGINT — integer-exact and
    # computed identically by Spark and DuckDB on the same floats.
    pins: dict[tuple[int, int], list[float]] = {}
    for sf_dir in SCALES:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.isdir(path) and not os.path.exists(path):
            print(f"{sf_dir}: missing, skipped", flush=True)
            continue
        outs = {}
        for shuf in (4, 32):
            spark = get_spark(
                app_name=f"pca_pin_{shuf}",
                master="local[8]",
                shuffle_partitions=shuf,
            )
            spark.sparkContext.setLogLevel("ERROR")
            emb = spark.read.parquet(path)
            n = emb.count()
            ck = int(
                emb.select(
                    F.sum(
                        F.floor(
                            F.element_at("embedding", 1).cast("double")
                            * 1e6
                        ).cast("long")
                    )
                ).collect()[0][0]
            )
            e = emb.select(
                "label",
                F.transform(
                    "embedding", lambda x: x.cast("double")
                ).alias("v"),
            )
            w, lam = pca_top_component(e, 64)
            proj = F.aggregate(
                F.zip_with(
                    "v",
                    F.array(*[F.lit(x) for x in w]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            rows = sorted(
                tuple(r)
                for r in e.select("label", proj.alias("p"))
                .groupBy("label")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_vecs"),
                    F.avg("p").alias("mean_raw"),
                    F.var_pop("p").alias("var_raw"),
                )
                .collect()
            )
            outs[shuf] = (n, ck, w, rows)
            spark.stop()
        (n4, ck4, w4, r4), (n32, ck32, w32, r32) = outs[4], outs[32]
        assert n4 == n32 and ck4 == ck32
        rounded4 = [(l, nv, round(m, 6), round(v, 6)) for l, nv, m, v in r4]
        rounded32 = [(l, nv, round(m, 6), round(v, 6)) for l, nv, m, v in r32]
        assert rounded4 == rounded32, (
            f"{sf_dir}: partition-order drift crosses the 6-dp rounding "
            f"boundary — refusing to pin\n{rounded4}\n{rounded32}"
        )
        for _, _, m, v in r4 + r32:
            for x in (m, v):
                # distance of x*1e6's fractional part from the .5
                # round-half boundary; 1e-3 here = 1e-9 in value terms
                frac = abs(x) * 1e6 % 1.0
                margin = abs(frac - 0.5)
                assert margin > 1e-3, (
                    f"{sf_dir}: value {x!r} sits {margin} from its 6-dp "
                    "rounding boundary — refusing to pin"
                )
        pins[(n4, ck4)] = w4
        print(f"{sf_dir}: corpus_n={n4} content_key={ck4} pinned "
              f"(shuffle 4/32 identical)", flush=True)

    with open(OUT, "w") as f:
        f.write(
            '"""Cardinality-keyed top-principal-component pins for the\n'
            "emb_pca_projection oracle — GENERATED by\n"
            "tools/gen_pca_expected.py (do not hand-edit). Keyed by\n"
            "embeddings-corpus cardinality; each vector passed the\n"
            "shuffle-4-vs-32 determinism gate and the rounding-margin\n"
            'gate at generation time."""\n\n'
            "PCA_TOP_COMPONENT: dict[tuple[int, int], list[float]] = {\n"
        )
        for (n, ck), w in sorted(pins.items()):
            f.write(f"    ({n}, {ck}): [\n")
            for x in w:
                f.write(f"        {x!r},\n")
            f.write("    ],\n")
        f.write("}\n")
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
