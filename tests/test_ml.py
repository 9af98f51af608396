"""Distributed logistic-regression trainer: converges on a linearly
realizable target and matches a single-node numpy reference
implementation bit-for-bit (same fold order, same arithmetic)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.operators import ml as ML


@pytest.fixture()
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def _target_expr():
    return (
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(1.0 if i % 2 == 0 else -1.0) for i in range(64)]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        >= 0.0
    ).cast("double")


def test_logreg_learns_realizable_target(spark, emb):
    df = emb.select(
        F.col("embedding").alias("features"), _target_expr().alias("y")
    ).repartition(4)
    fit = ML.logreg_train_gd(df, lr=5.0, iters=15, l2=1e-3)
    scored = ML.logreg_predict(df, fit["w"], fit["b"])
    acc = scored.agg(
        F.avg(((F.col("score") >= 0.5).cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.85
    # loss decreases monotonically-ish: final well below ln(2) start
    assert fit["loss"][-1] < 0.69
    assert fit["loss"][-1] < fit["loss"][0]


def test_logreg_matches_numpy_reference(spark, emb):
    rows = emb.select("embedding").collect()
    X = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    v = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(64)])
    y = (X @ v >= 0).astype(np.float64)

    lr, iters, l2 = 5.0, 10, 1e-3
    w = np.zeros(64)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w = w - lr * (X.T @ (p - y) / len(y) + l2 * w)
        b = b - lr * float((p - y).mean())

    df = emb.select(
        F.col("embedding").alias("features"), _target_expr().alias("y")
    )
    fit = ML.logreg_train_gd(df, lr=lr, iters=iters, l2=l2)
    # same arithmetic either way up to partial-fold rounding: the
    # distributed fold sums per-partition partials, the reference sums
    # rows directly — agreement to 1e-9 relative is the deterministic-
    # reduction guarantee, bitwise equality is not expected
    np.testing.assert_allclose(fit["w"], w, rtol=1e-9, atol=1e-12)
    assert abs(fit["b"] - b) < 1e-12


def test_irls_matches_numpy_newton_and_beats_gd(spark, emb):
    """6 Newton passes reach a LOWER loss than 15 GD passes (quadratic
    vs linear convergence — the reason the registry trainer is IRLS:
    every saved pass is a full cluster scan at 100 TB), and the
    distributed moment fold matches a single-node numpy Newton solver
    to 1e-9 relative."""
    rows = emb.select("embedding").collect()
    X = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    v = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(64)])
    y = (X @ v >= 0).astype(np.float64)

    iters, l2 = 6, 1e-3
    Xa = np.hstack([X, np.ones((len(X), 1))])
    beta = np.zeros(65)
    reg = l2 * np.eye(65)
    reg[-1, -1] = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xa @ beta)))
        g = Xa.T @ (p - y) / len(y) + reg @ beta
        H = (Xa * (p * (1 - p))[:, None]).T @ Xa / len(y) + reg
        beta = beta - np.linalg.solve(H, g)

    df = emb.select(
        F.col("embedding").alias("features"), _target_expr().alias("y")
    ).repartition(4)
    fit = ML.logreg_train_irls(df, iters=iters, l2=l2)
    np.testing.assert_allclose(fit["w"], beta[:-1], rtol=1e-9, atol=1e-10)
    assert abs(fit["b"] - beta[-1]) < 1e-9

    gd = ML.logreg_train_gd(df, lr=5.0, iters=15, l2=l2)
    assert fit["loss"][-1] < gd["loss"][-1]

    scored = ML.logreg_predict(df, fit["w"], fit["b"])
    acc = scored.agg(
        F.avg(((F.col("score") >= 0.5).cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.95


def test_logreg_predict_is_native(spark, emb):
    df = emb.select(F.col("embedding").alias("features"))
    scored = ML.logreg_predict(df, np.zeros(64), 0.0)
    p = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    for banned in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonRDD"):
        assert banned not in p
    # zero weights → every score is exactly 0.5
    assert scored.filter(F.col("score") != 0.5).count() == 0


def test_quality_ledger_no_regression():
    """VERDICT r11 #6: turn the quality ledger into a TREND GATE. For
    each metric tracked across the two most recent committed
    QUALITY_r*.json artifacts, assert the new round does not degrade
    past tolerance — so a recall/convergence regression fails CI the
    way a hash regression already does. Tolerances: recall@5 may dip
    0.05 (50-query panel granularity is 0.004/pair, but ANN seeds
    shift with corpus layout), train_acc 0.02, Newton
    iterations-to-tolerance +1; the PCA exactness identities are
    absolute (they held at 1e-12 since r11)."""
    import glob
    import json
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    arts = {}
    for p in glob.glob(os.path.join(root, "QUALITY_r*.json")):
        m = re.search(r"QUALITY_r(\d+)\.json$", p)
        if m:
            arts[int(m.group(1))] = p
    if len(arts) < 2:
        pytest.skip("need two quality artifacts to gate a trend")
    prev_r, cur_r = sorted(arts)[-2:]
    with open(arts[prev_r]) as f:
        prev = json.load(f)
    with open(arts[cur_r]) as f:
        cur = json.load(f)
    problems = []
    for scale in sorted(set(prev) & set(cur)):
        p, c = prev[scale], cur[scale]
        for op in ("sim_ivf_topk", "sim_pq_topk", "sim_lsh_topk",
                   "sim_multiprobe_topk"):
            if op in p and op in c:
                lo = p[op]["recall_at_5"] - 0.05
                if c[op]["recall_at_5"] < lo:
                    problems.append(
                        f"{scale}/{op}: recall {c[op]['recall_at_5']}"
                        f" < r{prev_r}'s {p[op]['recall_at_5']} - 0.05"
                    )
        # multiprobe must dominate the single-bucket probe (the r8
        # recall-dominance pin, restated on the committed ledger)
        if "sim_lsh_topk" in c and "sim_multiprobe_topk" in c:
            if (c["sim_multiprobe_topk"]["recall_at_5"]
                    < c["sim_lsh_topk"]["recall_at_5"]):
                problems.append(f"{scale}: multiprobe recall below lsh")
        if "emb_pca_projection" in c:
            pca = c["emb_pca_projection"]
            if pca["component_cos_vs_numpy"] < 1 - 1e-9:
                problems.append(f"{scale}: PCA component cos degraded")
            if pca["eig_rel_err_vs_numpy"] > 1e-9:
                problems.append(f"{scale}: PCA eigenvalue error degraded")
            if abs(pca["proj_var_over_eigenvalue"] - 1) > 1e-6:
                problems.append(f"{scale}: PCA variance identity broken")
        if "emb_logreg_train" in p and "emb_logreg_train" in c:
            if (c["emb_logreg_train"]["newton_iters_to_1e-12"]
                    > p["emb_logreg_train"]["newton_iters_to_1e-12"] + 1):
                problems.append(f"{scale}: IRLS convergence degraded")
            if (c["emb_logreg_train"]["train_acc"]
                    < p["emb_logreg_train"]["train_acc"] - 0.02):
                problems.append(f"{scale}: train_acc degraded")
    assert not problems, problems
