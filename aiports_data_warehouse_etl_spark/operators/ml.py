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
