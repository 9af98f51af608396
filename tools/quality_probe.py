"""Quality ledger for the engine-specific numeric ops (VERDICT r10 #7
— originally the 4 rows-only ops; emb_pca_projection graduated to a
content-keyed oracle in r12 but stays tracked here, its exact-vs-numpy
rows being the eigensolve's own check):
``sim_ivf_topk`` / ``sim_pq_topk`` (k-means quantizers — no SQL
oracle), ``emb_pca_projection`` (driver eigensolve),
``emb_logreg_train`` (iterative IRLS). Their correctness is pinned by
pytests at sf_small; this probe records their QUALITY numerically at
sf0.1 AND the 10× rehearsal corpus, so quality is tracked
round-over-round in a committed artifact the way hash-correctness
already is:

- ANN recall@5 vs exact brute force, with the REGISTRY defaults
  (ivf: √N cells, nprobe=8; pq: m=8 4-bit codes, 8× re-rank).
- PCA: top-eigenvalue relative error and component cosine vs an
  exact numpy eigensolve of the collected corpus, plus the
  variance-captures-eigenvalue identity.
- IRLS: final loss / train accuracy and ITERATIONS-TO-TOLERANCE
  (first Newton step whose loss improvement < 1e-12 — the quadratic-
  convergence claim in operators/ml.py is a cost model: each
  iteration is one full cluster pass at 100 TB).

Usage: python tools/quality_probe.py [out.json]
Writes QUALITY_r<round>.json (or the given path) at the repo root;
``tests/test_ml.py::test_quality_ledger_no_regression`` then gates
each tracked metric against the PRIOR round's committed artifact, so
a quality regression fails CI the way a hash regression already does
(VERDICT r11 #6).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aiports_data_warehouse_etl_spark.operators import ml as ML  # noqa: E402
from aiports_data_warehouse_etl_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    lsh_bucket_topk,
    lsh_multiprobe_topk,
    pca_top_component,
    pq_topk,
)
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

SCALES = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/sf1"}

OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "QUALITY_r12.json",
)


def _pairs(df) -> set:
    return {(r.qid, r.cand_id) for r in df.collect()}


def probe(spark, sf_dir: str) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    exact = _pairs(brute_force_topk(emb, k=5, max_query_id=50))

    # -- ANN recall (registry defaults, wider 50-query panel) --------
    ivf = _pairs(ivf_topk(emb, k=5, nprobe=8, max_query_id=50))
    pq = _pairs(pq_topk(emb, k=5, m=8, n_codes=64, rerank=8, max_query_id=50))
    # r12 (VERDICT r11 #6): the sign-LSH pair too — single-bucket and
    # multiprobe, registry defaults (fixed DEFAULT_PLANES so the
    # numbers are comparable round-over-round), same 50-query panel.
    lsh = _pairs(lsh_bucket_topk(emb, k=5, max_query_id=50))
    multi = _pairs(lsh_multiprobe_topk(emb, k=5, max_query_id=50))
    out = {
        "corpus_rows": n,
        "queries": 50,
        "sim_ivf_topk": {"recall_at_5": round(len(exact & ivf) / len(exact), 4)},
        "sim_pq_topk": {"recall_at_5": round(len(exact & pq) / len(exact), 4)},
        "sim_lsh_topk": {"recall_at_5": round(len(exact & lsh) / len(exact), 4)},
        "sim_multiprobe_topk": {
            "recall_at_5": round(len(exact & multi) / len(exact), 4)
        },
    }

    # -- PCA vs exact numpy eigensolve --------------------------------
    e = emb.select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    w, lam = pca_top_component(e, 64)
    X = np.vstack([r.v for r in e.collect()])
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    wl = vecs[:, -1]
    w = np.asarray(w)
    cos = float(abs(np.dot(w, wl)) / (np.linalg.norm(w) * np.linalg.norm(wl)))
    proj = X @ w
    out["emb_pca_projection"] = {
        "top_eigenvalue": round(float(lam), 8),
        "eig_rel_err_vs_numpy": round(
            abs(float(lam) - float(vals[-1])) / max(1.0, abs(float(vals[-1]))), 12
        ),
        "component_cos_vs_numpy": round(cos, 12),
        "proj_var_over_eigenvalue": round(float(proj.var()) / float(lam), 12),
    }

    # -- IRLS convergence ---------------------------------------------
    sign_proj = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.array(*[F.lit(1.0 if i % 2 == 0 else -1.0) for i in range(64)]),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, vv: acc + vv,
    )
    df = emb.select(
        F.col("embedding").alias("features"),
        (sign_proj >= 0.0).cast("double").alias("y"),
    ).repartition(8)
    fit = ML.logreg_train_irls(df, iters=10, l2=1e-3)
    losses = [float(x) for x in fit["loss"]]
    iters_to_tol = next(
        (
            i + 1
            for i in range(1, len(losses))
            if abs(losses[i - 1] - losses[i]) < 1e-12
        ),
        len(losses),
    )
    scored = ML.logreg_predict(df, fit["w"], fit["b"])
    acc = scored.agg(
        F.avg(
            ((F.col("score") >= 0.5).cast("double") == F.col("y")).cast(
                "double"
            )
        )
    ).collect()[0][0]
    out["emb_logreg_train"] = {
        "train_acc": round(float(acc), 4),
        "final_loss": round(losses[-1], 10),
        "newton_iters_to_1e-12": iters_to_tol,
        "loss_trajectory": [round(x, 8) for x in losses],
    }
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else OUT_DEFAULT
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for scale, sf_dir in SCALES.items():
        if not os.path.isdir(sf_dir):
            print(f"{scale}: {sf_dir} missing, skipped", flush=True)
            continue
        out[scale] = probe(spark, sf_dir)
        print(scale, json.dumps(out[scale]), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"-> {out_path}", flush=True)


if __name__ == "__main__":
    main()
