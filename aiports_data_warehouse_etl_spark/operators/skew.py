"""Skew-handling aggregation: explicit two-phase salted groupBy.

AQE's skew-join splitting covers joins; a *groupBy* on a pathological
key distribution (a handful of giant keys) still funnels each key into
one reducer. Salting splits each key across ``salt_buckets`` partial
groups, then recombines — two small shuffles instead of one skewed one.

Results are IDENTICAL to the plain groupBy for decomposable aggregates
(count/sum/min/max); the salt is derived deterministically from a
secondary column so plans stay reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial aggregate, final recombine) per supported aggregate kind
_DECOMPOSABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: output_name -> (kind, column), kind in count/sum/min/max.
    ``salt_from``: any column with per-row variation; its hash mod
    ``salt_buckets`` spreads each key over that many partial groups.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets)).alias("__salt")
    partial_exprs, final_exprs = [], []
    for name, (kind, col) in aggs.items():
        partial_fn, final_fn = _DECOMPOSABLE[kind]
        arg = None if kind == "count" else F.col(col)
        partial_exprs.append(partial_fn(arg).alias(f"__p_{name}"))
        final_exprs.append(final_fn(F.col(f"__p_{name}")).alias(name))
    partial = df.groupBy(*keys, salt).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, REPLICATE the
    small side across all ``salt_buckets`` salt values, join on
    (key, salt). A single pathological key spreads over
    ``salt_buckets`` reducers instead of one straggler.

    Use when AQE's runtime skew split can't help: the skewed side
    feeds a co-partitioned downstream op, the join is shuffled-hash,
    or one key exceeds what partition-splitting can rebalance.
    Result is IDENTICAL to ``big.join(small, on, how)`` — the salt
    column never escapes. Cost: small side × salt_buckets (keep the
    replicated side broadcast-sized or buckets modest).

    ``salt_from``: big-side column with per-row variation (same
    convention as ``salted_groupby_agg``) — deterministic, so plans
    stay reproducible across runs and task retries.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
