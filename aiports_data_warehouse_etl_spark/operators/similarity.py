"""Similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk`` — exact cosine top-k: query-set × corpus join
  with a window rank. The dot product is a JVM-side ``zip_with`` +
  ``aggregate`` fold — vectorizes in codegen, no Python. Exact but
  O(|Q|·N); the baseline and the verifier for the approximate path.
- ``lsh_bucket_topk`` — approximate: deterministic sign-LSH buckets
  (coordinate-difference hyperplanes, reproducible in any engine),
  candidates only meet within their bucket (equi-join), then exact
  cosine + rank inside the bucket. At 100 TB this is the path: the
  corpus is hash-partitioned by bucket, each executor ranks only its
  buckets, and recall is tuned by the number of hyperplanes /
  multi-probe.

An IVF variant (k-means coarse quantizer via pyspark.ml, nprobe search)
is the planned third path; sign-LSH already exercises the same
bucket-join plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Fixed coordinate pairs defining deterministic "hyperplanes"
#: sign(v[i] - v[j]) — portable to any engine, no RNG state.
#: 4 planes → 16 buckets: sized so buckets stay populated at the test
#: corpus scale; at real scale ADD planes (buckets shrink as the corpus
#: grows — target ~1k-10k vectors/bucket) and multi-probe for recall.
DEFAULT_PLANES: list[tuple[int, int]] = [(0, 32), (1, 33), (2, 34), (3, 35)]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(df: DataFrame, vec_col: str, id_col: str, extra: list[str] = ()) -> DataFrame:
    # float32 → double BEFORE any arithmetic: keeps Spark and the
    # DuckDB oracle numerically identical (both fold in list order).
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *[F.col(c) for c in extra],
    )


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_query_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Query side is broadcast (it's small by construction); corpus side
    streams — one broadcast-nested-loop join, no shuffle of the corpus.
    """
    base = _as_double(df, vec_col, id_col)
    q = base
    if query_ids is not None:
        q = q.filter(F.col("id").isin(query_ids))
    if max_query_id is not None:
        q = q.filter(F.col("id") < max_query_id)
    q = F.broadcast(q.select(F.col("id").alias("qid"), F.col("v").alias("qv")))

    scored = base.join(q, F.col("id") != F.col("qid")).select(
        "qid",
        F.col("id").alias("cand_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cand_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


def lsh_bucket(v: Column, planes: list[tuple[int, int]] = DEFAULT_PLANES) -> Column:
    """Deterministic sign-LSH bucket key: one bit per plane,
    bit = (v[i] > v[j]). element_at is 1-based.
    """
    bits = [
        F.when(F.element_at(v, i + 1) > F.element_at(v, j + 1), F.lit("1")).otherwise(
            F.lit("0")
        )
        for i, j in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: list[tuple[int, int]] = DEFAULT_PLANES,
    max_query_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    The candidate join is an equi-join on the bucket key — shuffle
    partitioned by bucket, skew bounded by bucket population (add
    planes to split hot buckets at scale).
    """
    base = _as_double(df, vec_col, id_col).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    q = base
    if max_query_id is not None:
        q = q.filter(F.col("id") < max_query_id)
    q = q.select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    scored = base.join(
        q, (F.col("bucket") == F.col("qb")) & (F.col("id") != F.col("qid"))
    ).select(
        "qid",
        F.col("id").alias("cand_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cand_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


def norm_stats_by_label(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label embedding norm statistics (sanity metrics for a
    training-data pipeline)."""
    base = df.select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return (
        base.select("label", l2_norm(F.col("v")).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_query_id: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer (pyspark.ml),
    then search only the query's ``nprobe`` nearest cells.

    Plan shape at scale: assignment is a narrow map (distance to
    n_clusters centroids, all broadcast as literals); the search is an
    equi-join on cell id — the corpus is hash-partitioned by cell, each
    executor ranks only its cells. Recall is tuned by nprobe; training
    runs on a sample, not the full corpus.

    Deterministic for a fixed seed; the oracle check is rows-only
    (k-means has no SQL twin).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = _as_double(df, vec_col, id_col)
    ml_df = base.withColumn("features", array_to_vector(F.col("v")))
    # A coarse quantizer doesn't need tight convergence — cells only
    # bucket the corpus; recall comes from nprobe. Default maxIter=20
    # spends most of the query's wall-clock in fit() jobs.
    model = KMeans(k=n_clusters, seed=seed, maxIter=6, featuresCol="features").fit(ml_df)
    centers = [c.tolist() for c in model.clusterCenters()]

    def dist2(v, center):  # squared L2 to a literal centroid
        return F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in center]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # cell ranking per row: array of (dist, cell) structs, sorted
    def cells_by_distance(v, n):
        arr = F.array(
            *[
                F.struct(dist2(v, centers[c]).alias("d"), F.lit(c).alias("cell"))
                for c in range(len(centers))
            ]
        )
        return F.slice(F.array_sort(arr), 1, n)

    corpus = base.withColumn(
        "cell", cells_by_distance(F.col("v"), 1)[0]["cell"]
    )
    q = base
    if max_query_id is not None:
        q = q.filter(F.col("id") < max_query_id)
    q = q.select(
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        F.explode(
            F.transform(
                cells_by_distance(F.col("v"), nprobe), lambda s: s["cell"]
            )
        ).alias("cell"),
    )

    scored = corpus.join(q, ["cell"]).filter(F.col("id") != F.col("qid")).select(
        "qid",
        F.col("id").alias("cand_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cand_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )
