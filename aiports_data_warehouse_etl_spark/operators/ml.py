"""Distributed model training primitives.

Everything here follows the moment-reduction rule from SCALE.md: an
iteration never moves training rows — each partition reduces to a
constant-size gradient/moment partial inside an Arrow-batched kernel,
the driver folds the partials (dim-sized, partition-count many) and
broadcasts the updated parameters into the next pass. At 100 TB the
per-iteration network cost is partitions × (dim+2) doubles, and the
training rows are scanned from the persisted input each epoch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train_gd(
    df: DataFrame,
    feature_col: str = "features",
    label_col: str = "y",
    lr: float = 0.5,
    iters: int = 25,
    l2: float = 1e-3,
) -> dict:
    """Full-batch gradient-descent logistic regression, distributed.

    Per iteration: ONE mapInPandas pass emits per-partition partials
    ``(grad[dim], grad_b, loss_sum, n)`` computed by numpy (the current
    weights ride in the task closure — broadcast semantics without a
    shuffle); the driver folds partials in deterministic order and
    steps. The input is persisted once; iterations reuse the cached
    rows. Returns {"w": ndarray, "b": float, "loss": [per-iter mean
    loss], "n": rows}.

    Deterministic: fixed iteration count, zero init, partials sorted by
    partition id before the fold — same bits every run.
    """
    from pyspark import StorageLevel

    base = df.select(
        F.col(feature_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
        F.spark_partition_id().alias("pid"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    dim = len(base.select("x").first()["x"])
    w = np.zeros(dim)
    b = 0.0
    losses: list[float] = []
    n_total = 0

    out_schema = (
        "pid int, grad string, grad_b double, loss_sum double, n long"
    )

    for _ in range(iters):
        w_cur, b_cur = w.copy(), b

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["x"].to_numpy())
                y = pdf["y"].to_numpy(dtype=np.float64)
                z = X @ w_cur + b_cur
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - y
                eps = 1e-12
                loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
                yield pd.DataFrame(
                    {
                        "pid": [int(pdf["pid"].iloc[0])],
                        # partials travel as a json list: tiny (dim
                        # doubles per partition), schema stays flat
                        "grad": [
                            "[" + ",".join(repr(v) for v in (X.T @ err)) + "]"
                        ],
                        "grad_b": [float(err.sum())],
                        "loss_sum": [float(loss.sum())],
                        "n": [len(y)],
                    }
                )

        rows = base.mapInPandas(partials, out_schema).collect()
        rows.sort(key=lambda r: r["pid"])
        import json as _json

        grad = np.zeros(dim)
        grad_b = 0.0
        loss_sum = 0.0
        n_total = 0
        for r in rows:
            grad += np.array(_json.loads(r["grad"]))
            grad_b += r["grad_b"]
            loss_sum += r["loss_sum"]
            n_total += r["n"]
        grad = grad / n_total + l2 * w
        grad_b = grad_b / n_total
        w = w - lr * grad
        b = b - lr * grad_b
        losses.append(loss_sum / n_total)

    base.unpersist()
    return {"w": w, "b": b, "loss": losses, "n": n_total}


def logreg_train_irls(
    df: DataFrame,
    feature_col: str = "features",
    label_col: str = "y",
    iters: int = 6,
    l2: float = 1e-3,
) -> dict:
    """Newton / IRLS logistic regression — the scale-efficient trainer.

    Gradient descent pays one cluster-wide pass per small step; IRLS
    pays one pass per NEWTON step and converges quadratically (~5-8
    iterations to machine-precision loss vs hundreds of GD steps for
    the same accuracy — the classical iteratively-reweighted
    least-squares result). Per iteration ONE mapInPandas pass emits
    per-partition moment partials for the AUGMENTED design [X|1]:
    gradient g = Xᵃᵀ(p-y) (dim+1 doubles) and Hessian H = XᵃᵀRXᵃ with
    R = diag(p(1-p)) ((dim+1)² doubles ≈ 33 KB at dim=64). The driver
    folds partials in deterministic partition order and solves
    (H/n + λI)Δ = g/n — a (dim+1)-sized dense solve, trivially
    driver-side. Network cost per iteration: partitions × (dim+1)²
    doubles; training rows NEVER move (SCALE.md moment-reduction rule).

    Same determinism contract as ``logreg_train_gd``: fixed iteration
    count, zero init, sorted fold, so the same bits every run.
    """
    from pyspark import StorageLevel

    base = df.select(
        F.col(feature_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
        F.spark_partition_id().alias("pid"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    dim = len(base.select("x").first()["x"])
    d1 = dim + 1  # augmented with the intercept column
    beta = np.zeros(d1)
    losses: list[float] = []
    n_total = 0

    out_schema = "pid int, grad string, hess string, loss_sum double, n long"

    for _ in range(iters):
        beta_cur = beta.copy()

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["x"].to_numpy())
                Xa = np.hstack([X, np.ones((len(X), 1))])
                y = pdf["y"].to_numpy(dtype=np.float64)
                z = Xa @ beta_cur
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - y
                R = p * (1.0 - p)
                eps = 1e-12
                loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
                g = Xa.T @ err
                H = (Xa * R[:, None]).T @ Xa
                yield pd.DataFrame(
                    {
                        "pid": [int(pdf["pid"].iloc[0])],
                        "grad": ["[" + ",".join(repr(v) for v in g) + "]"],
                        "hess": [
                            "[" + ",".join(repr(v) for v in H.ravel()) + "]"
                        ],
                        "loss_sum": [float(loss.sum())],
                        "n": [len(y)],
                    }
                )

        rows = base.mapInPandas(partials, out_schema).collect()
        rows.sort(key=lambda r: r["pid"])
        import json as _json

        grad = np.zeros(d1)
        hess = np.zeros((d1, d1))
        loss_sum = 0.0
        n_total = 0
        for r in rows:
            grad += np.array(_json.loads(r["grad"]))
            hess += np.array(_json.loads(r["hess"])).reshape(d1, d1)
            loss_sum += r["loss_sum"]
            n_total += r["n"]
        reg = l2 * np.eye(d1)
        reg[-1, -1] = 0.0  # never regularize the intercept
        grad_n = grad / n_total + reg @ beta
        step = np.linalg.solve(hess / n_total + reg, grad_n)
        beta = beta - step
        losses.append(loss_sum / n_total)

    base.unpersist()
    return {"w": beta[:-1], "b": float(beta[-1]), "loss": losses, "n": n_total}


def logreg_predict(
    df: DataFrame,
    w: np.ndarray,
    b: float,
    feature_col: str = "features",
    out_col: str = "score",
) -> DataFrame:
    """Apply trained weights as a NATIVE column expression (no Python):
    z = Σ w_i·x_i + b via zip_with against a literal weight array —
    inference rides the scan inside codegen, the same free-rider shape
    as quality_classifier_score."""
    w_arr = F.array(*[F.lit(float(v)) for v in w])
    z = F.aggregate(
        F.zip_with(F.col(feature_col).cast("array<double>"), w_arr,
                   lambda x, wi: x * wi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + F.lit(float(b))
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
