"""Behavioral tests for the dedup family and similarity search on
synthetic corpora with KNOWN duplicate structure (the driver testdata
has no true dups, so these prove detection actually works)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    exact_dedup_stats,
    minhash_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from aiports_data_warehouse_etl_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "behind distant mountains and rivers flow quietly through green valleys"
)
NEAR = BASE.replace("quietly", "loudly")  # one-token change
FAR = (
    "completely different content about database engines and query "
    "optimization with columnar storage vectorized execution and "
    "adaptive partitioning strategies for modern analytics workloads"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact dup of 0
        (2, NEAR),          # near dup of 0
        (3, FAR),
        (4, FAR + " indeed"),  # near dup of 3
        (5, "tiny"),        # < k tokens → no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(corpus):
    stats = exact_dedup_stats(corpus).collect()
    by_id = {r.canonical_id: r.n_copies for r in stats}
    assert by_id[0] == 2  # docs 0 and 1 collapse
    kept = {r.doc_id for r in exact_dedup(corpus).collect()}
    assert kept == {0, 2, 3, 4, 5}


def test_minhash_finds_near_dups(corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_dedup_pairs(corpus, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (3, 4) in pairs
    assert not any(5 in p for p in pairs)  # shingle-less doc excluded
    assert not any({a, b} == {0, 3} for a, b in pairs)  # unrelated docs stay apart

    kept = {r.doc_id for r in minhash_dedup(corpus, threshold=0.5).collect()}
    assert kept == {0, 3, 5}  # min-id representative per near-dup cluster


def test_ngram_jaccard_pairs(corpus):
    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_simhash_hamming(corpus):
    sigs = {r.id: r.sig for r in simhash_signatures(corpus).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    ham = bin(sigs[0] ^ sigs[2]).count("1")
    far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham < far  # near-dup closer than unrelated
    # 4 blocks guarantee candidates only up to Hamming 3; identical docs
    # are always found
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(corpus, max_hamming=3).collect()}
    assert (0, 1) in pairs
    # with enough blocks (width 2 → guarantee ≤ 29) the near-dup appears
    wide = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(corpus, max_hamming=ham, blocks=30).collect()
    }
    assert (0, 2) in wide


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.98, 0.2, 0.0], 1),   # near 2
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_brute_force_topk(vectors):
    res = brute_force_topk(vectors, k=1)
    top = {r.qid: r.cand_id for r in res.collect()}
    assert top[0] == 1 and top[1] == 0
    assert top[2] == 3 and top[3] == 2


def test_lsh_recall_vs_bruteforce(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    exact = {(r.qid, r.cand_id) for r in brute_force_topk(emb, k=5, max_query_id=20).collect()}
    approx = {(r.qid, r.cand_id) for r in lsh_bucket_topk(emb, k=5, max_query_id=20).collect()}
    # random embeddings are a worst case for LSH (near-neighbors barely
    # nearer than average) — require recall to be non-degenerate, not high
    recall = len(exact & approx) / len(exact)
    assert recall > 0.05, f"LSH recall collapsed: {recall}"


def test_multiprobe_recall_dominates_single_probe(spark, sf_small):
    """Hamming-1 probing must produce a candidate SUPERSET of the
    single-probe bucket ranking, so recall vs brute force can only go
    up — and per-query similarity at each rank never drops."""
    from aiports_data_warehouse_etl_spark.operators.similarity import (
        lsh_multiprobe_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    exact = {
        (r.qid, r.cand_id)
        for r in brute_force_topk(emb, k=5, max_query_id=20).collect()
    }
    single_rows = lsh_bucket_topk(emb, k=5, max_query_id=20).collect()
    multi_rows = lsh_multiprobe_topk(emb, k=5, max_query_id=20).collect()
    single = {(r.qid, r.cand_id) for r in single_rows}
    multi = {(r.qid, r.cand_id) for r in multi_rows}
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)
    # rank-wise: the multiprobe top-k at each (qid, rnk) is at least as
    # similar as single-probe's (candidate superset ⇒ pointwise ≥)
    s_best = {(r.qid, r.rnk): r.cos_sim for r in single_rows}
    m_best = {(r.qid, r.rnk): r.cos_sim for r in multi_rows}
    for key, sv in s_best.items():
        assert m_best.get(key, float("-inf")) >= sv - 1e-9, key


def test_embedding_neardup(vectors):
    pairs = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(vectors, threshold=0.95).collect()}
    assert (0, 1) in pairs and (2, 3) in pairs and (0, 2) not in pairs
    blocked = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(vectors, threshold=0.95, block_col="label").collect()
    }
    assert blocked == pairs  # same-label blocking loses nothing here


def test_ivf_topk_recall(spark, sf_small):
    from aiports_data_warehouse_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    exact = {(r.qid, r.cand_id) for r in brute_force_topk(emb, k=5, max_query_id=20).collect()}
    # registry defaults: corpus-derived ~√N cells (22 at N=500), nprobe=8
    approx_rows = ivf_topk(emb, k=5, nprobe=8, max_query_id=20).collect()
    approx = {(r.qid, r.cand_id) for r in approx_rows}
    assert all(r.rnk <= 5 for r in approx_rows)
    recall = len(exact & approx) / len(exact)
    assert recall > 0.5, f"IVF recall collapsed: {recall}"  # 0.75 measured
    # determinism: same seed → same result
    again = {(r.qid, r.cand_id) for r in ivf_topk(emb, k=5, nprobe=8, max_query_id=20).collect()}
    assert again == approx
    # explicit n_clusters still honored (legacy shape)
    legacy = ivf_topk(emb, k=5, n_clusters=8, nprobe=3, max_query_id=20).collect()
    lrecall = len(exact & {(r.qid, r.cand_id) for r in legacy}) / len(exact)
    assert lrecall > 0.2, f"legacy IVF recall collapsed: {lrecall}"


def test_lloyd_assign_matches_naive():
    """The matmul identity kernel must agree with the (n, c, d)
    broadcast-cube argmin it replaced, ties to lowest index."""
    import numpy as np

    from aiports_data_warehouse_etl_spark.operators.similarity import _lloyd_assign

    rng = np.random.RandomState(7)
    X = rng.randn(1000, 16)
    C = rng.randn(33, 16)
    naive = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    assert (_lloyd_assign(X, C, chunk=128) == naive).all()


def test_approx_sketches_accuracy(spark, sf_oracle):
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    approx = {r.o_orderstatus: r for r in QUERIES["approx_sketches"].fn(spark, sf_oracle).collect()}
    o = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    exact = {
        r.o_orderstatus: r
        for r in o.groupBy("o_orderstatus").agg(
            F.count_distinct("o_custkey").alias("nd"),
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("med"),
        ).collect()
    }
    for k in exact:
        assert abs(approx[k].approx_customers - exact[k].nd) / exact[k].nd < 0.05
        assert abs(approx[k].approx_median - exact[k].med) / exact[k].med < 0.05


def test_stratified_sample_proportions(spark, sf_oracle):
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    got = {r.l_returnflag: r.n for r in QUERIES["stratified_sample"].fn(spark, sf_oracle).collect()}
    totals = {
        r.l_returnflag: r.n
        for r in spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for flag, frac in {"A": 0.1, "N": 0.02, "R": 0.1}.items():
        ratio = got[flag] / totals[flag]
        assert abs(ratio - frac) < frac * 0.5, f"{flag}: {ratio} vs {frac}"
    # deterministic under fixed seed
    again = {r.l_returnflag: r.n for r in QUERIES["stratified_sample"].fn(spark, sf_oracle).collect()}
    assert again == got


def test_connected_components_chain(spark):
    """A~B, B~C but NOT A~C: star collapse under-merges, CC does not."""
    from aiports_data_warehouse_etl_spark.operators.dedup import (
        connected_components,
        minhash_dedup_cc,
    )

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 6)], ["id_a", "id_b"]
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 8: 5}

    # text chain: B shares half with A and half with C; A and C share nothing
    half1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    half2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    half3 = "phi chi psi omega aleph bet gimel dalet he vav"
    docs = spark.createDataFrame(
        [(0, f"{half1} {half1}"), (1, f"{half1} {half2}"),
         (2, f"{half2} {half2}"), (3, f"{half2} {half3}"),
         (4, f"{half3} {half3}"), (9, "unrelated words entirely different content here")],
        ["doc_id", "text"],
    )
    kept = {r.doc_id for r in minhash_dedup_cc(docs, threshold=0.3).collect()}
    # the whole 0-4 chain collapses to doc 0; 9 survives alone
    assert kept == {0, 9}


def test_scrub_pii_behavior(spark):
    from aiports_data_warehouse_etl_spark.operators.textops import scrub_pii

    rows = [
        (0, "mail me at jane.doe+x@corp.io please"),
        (1, "ssn is 123-45-6789 ok"),
        (2, "call (555) 123-4567 or 555.123.4567"),
        (3, "card 4111111111111111 expires soon"),
        (4, "clean text with number 42 and year 2024"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: r.s for r in df.select("i", scrub_pii(F.col("t")).alias("s")).collect()}
    assert got[0] == "mail me at <EMAIL> please"
    assert got[1] == "ssn is <SSN> ok"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "card <CARDNUM> expires soon"
    assert got[4] == "clean text with number 42 and year 2024"  # untouched


def test_repetition_ratio_behavior(spark):
    from aiports_data_warehouse_etl_spark.operators.textops import repetition_ratio

    rows = [
        (0, "a b c a b c a b c a b c"),       # heavy looping
        (1, "one two three four five six"),   # no repetition
        (2, "xy"),                            # < k tokens
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: r.rr for r in df.select("i", repetition_ratio(F.col("t")).alias("rr")).collect()}
    assert got[0] > 0.5 and got[1] == 0.0 and got[2] == 0.0


def test_decontaminate_flags(spark):
    from aiports_data_warehouse_etl_spark.operators.dedup import decontaminate_flags

    evalset = spark.createDataFrame(
        [(0, "the secret benchmark question about rivers flowing home")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (10, "the secret benchmark question about rivers flowing home exactly"),  # contaminated
            (11, "rivers flowing home is a phrase that appears here"),                # partial overlap
            (12, "entirely unrelated training content with fresh words"),             # clean
        ],
        ["doc_id", "text"],
    )
    got = {r.train_id: (r.n_shared_shingles, r.contaminated)
           for r in decontaminate_flags(train, evalset, min_shared=2).collect()}
    assert got[10][1] is True and got[10][0] >= 5
    assert got[11][0] >= 1
    assert got[12] == (0, False)


def test_cc_keep_best_picks_quality_representative(spark):
    """cc_keep_best keeps the highest-score doc per component — NOT the
    min id — and passes singletons through untouched."""
    from aiports_data_warehouse_etl_spark.operators.dedup import cc_keep_best

    half1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    half2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    docs = spark.createDataFrame(
        [
            (0, f"{half1} {half1}", 0.2),   # cluster {0,1,2}: chain via 1
            (1, f"{half1} {half2}", 0.9),   # best quality → the keeper
            (2, f"{half2} {half2}", 0.9),   # ties 1 on score; higher id loses
            (9, "unrelated singleton content entirely different words", 0.1),
        ],
        ["doc_id", "text", "score"],
    )
    kept = cc_keep_best(docs, "score", threshold=0.3).collect()
    assert {(r.doc_id, r.component) for r in kept} == {(1, 0), (9, 9)}
    # every original column survives the collapse
    assert {r.doc_id: r.score for r in kept} == {1: 0.9, 9: 0.1}


def test_pq_topk_recall_and_determinism(spark, sf_small):
    from aiports_data_warehouse_etl_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    exact = {(r.qid, r.cand_id) for r in brute_force_topk(emb, k=5, max_query_id=20).collect()}
    approx_rows = pq_topk(emb, k=5, max_query_id=20).collect()
    approx = {(r.qid, r.cand_id) for r in approx_rows}
    assert all(r.rnk <= 5 for r in approx_rows)
    assert not any(r.qid == r.cand_id for r in approx_rows)
    # 4-bit codes + 4x exact re-rank: recall well above the LUT-only floor
    recall = len(exact & approx) / len(exact)
    assert recall > 0.5, f"PQ recall collapsed: {recall}"
    # deterministic: seeded training, stable argsorts, id tiebreaks
    again = {
        (r.qid, r.cand_id)
        for r in pq_topk(emb, k=5, max_query_id=20).collect()
    }
    assert again == approx


def test_hll_mergeable_sketch_accuracy(spark, sf_oracle):
    """Per-source HLL estimates and the union-of-sketches global
    estimate both land within 5% of exact distinct counts — the
    re-aggregation must not lose accuracy vs a fresh global sketch."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    rows = {r.source: r for r in QUERIES["hll_mergeable_distinct"].fn(spark, sf_oracle).collect()}
    d = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    exact_per = {
        r.source: r.nd
        for r in d.groupBy("source").agg(F.count_distinct("doc_id").alias("nd")).collect()
    }
    exact_all = d.select("doc_id").distinct().count()
    for src, nd in exact_per.items():
        assert abs(rows[src].approx_distinct - nd) / nd < 0.05, (src, rows[src], nd)
    assert abs(rows["__all__"].approx_distinct - exact_all) / exact_all < 0.05
    assert rows["__all__"].n_rows == d.count()


def test_pca_projection_variance_matches_eigenvalue(spark, sf_small):
    """The population variance of the top-PC projections must equal
    the top eigenvalue of the covariance matrix (definition of PCA),
    and the distributed gram_moments path must agree with a local
    numpy computation on the collected corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    from aiports_data_warehouse_etl_spark.operators.similarity import (
        pca_top_component,
    )

    e = spark.read.parquet(f"{sf_small}/embeddings.parquet").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    w, lam = pca_top_component(e, 64)

    X = np.vstack([r.v for r in e.collect()])
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    assert abs(lam - vals[-1]) < 1e-8 * max(1.0, abs(vals[-1]))
    wl = vecs[:, -1]
    if np.dot(wl, np.array(w)) < 0:
        wl = -wl
    assert np.allclose(np.array(w), wl, atol=1e-8)

    proj = X @ np.array(w)
    assert abs(proj.var() - lam) < 1e-8 * max(1.0, lam)


def test_simhash_vote_lane_overflow_is_loud(spark):
    """A document with >= 2^15 distinct tokens would overflow the
    packed 15-bit vote lanes and silently corrupt its signature — the
    guard must raise instead (ADVICE r4)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    n = 1 << 15
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    with pytest.raises(SparkRuntimeException, match="vote-lane overflow"):
        simhash_signatures(df).collect()


def test_leakage_safe_split_invariant(spark, corpus):
    """The whole point: no near-dup cluster ever spans train and eval,
    and every doc gets exactly one split. Exact duplicates (same
    shingle set -> same cluster) must co-locate."""
    from aiports_data_warehouse_etl_spark.operators.dedup import (
        leakage_safe_split,
    )
    from pyspark.sql import functions as F

    out = leakage_safe_split(corpus, threshold=0.5).persist()
    assert out.count() == corpus.count()
    spans = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert spans == 0, "a cluster crossed the split boundary"
    sizes = {r["split"]: r["n"] for r in
             out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) <= {"train", "eval"} and sizes
    out.unpersist()
    # ratio sanity needs a real corpus: sf0.001 documents (the tiny
    # fixture corpus has too few clusters for the 16-bit bucket's
    # expectation to concentrate)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    big = leakage_safe_split(docs, threshold=0.5)
    sizes = {r["split"]: r["n"] for r in
             big.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    frac = sizes.get("train", 0) / max(sum(sizes.values()), 1)
    assert 0.8 < frac < 0.97, f"train share {frac} far from 90%"


def test_repersist_warning_path(spark):
    """VERDICT r7 #3: an introspection failure in _repersist_if_cleared
    warns (once) instead of silently risking the LSH recompute cliff."""
    import warnings

    from aiports_data_warehouse_etl_spark.operators import dedup as D

    class Boom:
        @property
        def storageLevel(self):
            raise RuntimeError("no JVM")

    D._REPERSIST_WARNED = False
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = D._repersist_if_cleared(Boom())
            assert isinstance(out, Boom)
            assert any("recompute" in str(x.message) for x in w), w
            # second failure: silent (warn-once)
            n = len(w)
            D._repersist_if_cleared(Boom())
            assert len(w) == n
    finally:
        D._REPERSIST_WARNED = False


def test_auto_planes_bounds_bucket_population(spark, sf_small):
    """planes='auto' sizes the sign-LSH index to the corpus (the same
    scale fix as the IVF sqrt(N) cell count): plane count grows with
    N, expected bucket population stays near the target, and the
    auto-sized multiprobe search still returns k-deep rankings."""
    from aiports_data_warehouse_etl_spark.operators.similarity import (
        auto_planes,
        lsh_multiprobe_topk,
    )

    # monotone plane growth, bounded expected bucket size
    for n, lo in [(500, 2), (2_000, 4), (2_000_000, 14), (10**9, 23)]:
        planes = auto_planes(n, dim=64)
        assert len(planes) >= lo
        assert n / (2 ** len(planes)) <= 256, (n, len(planes))
        assert len({p for p in planes}) == len(planes)  # distinct
        assert all(0 <= i < 64 and 0 <= j < 64 and i != j for i, j in planes)
    # dim clamp: never more planes than dim/2
    assert len(auto_planes(10**12, dim=8)) == 4

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    rows = lsh_multiprobe_topk(emb, k=5, planes="auto", max_query_id=10).collect()
    assert rows and all(r.rnk <= 5 for r in rows)
    again = lsh_multiprobe_topk(emb, k=5, planes="auto", max_query_id=10).collect()
    assert {(r.qid, r.cand_id) for r in rows} == {(r.qid, r.cand_id) for r in again}


def test_auto_planes_null_and_empty_guards(spark, sf_small):
    """ADVICE r8 #1: planes='auto' must survive a NULL vector in the
    first row (F.max(size) ignores NULLs), size the planes in ONE
    aggregate job, and fail LOUDLY (not TypeError deep in lsh_bucket)
    on an empty or all-NULL corpus."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from aiports_data_warehouse_etl_spark.operators.similarity import (
        _auto_planes_from,
        lsh_bucket_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    # NULL vector sorted FIRST: the old df.first()[0] path raised
    # TypeError; the aggregate path must ignore it.
    nulled = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(F.col("embedding")),
    )
    planes = _auto_planes_from(nulled.orderBy("vec_id"), "embedding")
    assert planes == _auto_planes_from(emb, "embedding")
    rows = lsh_bucket_topk(nulled, k=3, planes="auto", max_query_id=5).collect()
    assert rows and all(r.rnk <= 3 for r in rows)

    empty = emb.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="non-empty corpus"):
        _auto_planes_from(empty, "embedding")
    all_null = emb.withColumn("embedding", F.lit(None).cast("array<float>"))
    with _pytest.raises(ValueError, match="non-NULL"):
        _auto_planes_from(all_null, "embedding")


def test_ivf_explicit_clusters_skips_count_and_empty_is_loud(spark, sf_small):
    """ADVICE r8 #4: with an explicit n_clusters the corpus-count job
    is skipped entirely (plan construction runs exactly one collect —
    the limit(want) training sample), and an empty corpus raises a
    clear error instead of an opaque np.stack ValueError."""
    import pytest as _pytest
    from aiports_data_warehouse_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")

    counted = {"n": 0}
    orig_count = type(emb).count

    def spy_count(self):
        counted["n"] += 1
        return orig_count(self)

    import unittest.mock as mock

    with mock.patch.object(type(emb), "count", spy_count):
        df = ivf_topk(emb, k=3, n_clusters=4, max_query_id=5)
    assert counted["n"] == 0, "explicit n_clusters must not run a count job"
    assert df.count() > 0

    empty = emb.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="empty corpus"):
        ivf_topk(empty, k=3, n_clusters=4)
    with _pytest.raises(ValueError, match="empty corpus"):
        ivf_topk(empty, k=3)  # auto path hits the same guard


def test_hll_union_is_partition_order_independent(spark, sf_oracle):
    """VERDICT r8 #5: the Datasketches rollup's HIP estimate replays
    sparse-mode coupons in merge order (491 vs 493 for the same 500
    ids under shuffle=4 vs 32, measured r4). The canonical union —
    one sorted partition of the kilobyte per-source sketch rows —
    must return the identical result under different shuffle
    partitionings, which is what makes the literal oracle pin sound."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    fn = QUERIES["hll_mergeable_distinct"].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for shuf in ("4", "32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", shuf)
            outs.append(sorted(tuple(r) for r in fn(spark, sf_oracle).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0] == outs[1] == outs[2]
    # and the pinned VALUES rows are exactly what the engine computes
    from aiports_data_warehouse_etl_spark.functions.sketch_expected import (
        HLL_MERGEABLE_ROWS,
    )

    n = spark.read.parquet(f"{sf_oracle}/documents.parquet").count()
    pinned = sorted(
        (src, nr, ad) for cn, src, nr, ad in HLL_MERGEABLE_ROWS if cn == n
    )
    assert pinned == outs[0], "pins stale — rerun tools/gen_sketch_expected.py"


def test_hll_canonical_union_survives_wide_layouts(spark, sf_oracle):
    """VERDICT r9 #6: the canonical-union invariant must stay
    load-bearing when the per-source sketch frame exceeds one
    partition's worth of rows — not just in the ≤4-source documents
    table. Synthesize 64 sources (doc_id % 64), land the sketch frame
    in pathological layouts (16 hash partitions, 64 key partitions,
    a reverse-sorted single partition), and require the identical
    rollup from every layout and shuffle width: the result must be a
    pure function of the sketch-row SET so a layout change can never
    silently reintroduce the 491-vs-493 HIP merge-order drift."""
    from pyspark.sql import functions as F

    from aiports_data_warehouse_etl_spark.queries import hll_canonical_overall

    d = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    sk = (
        d.withColumn("source", (F.col("doc_id") % 64).cast("string"))
        .groupBy("source")
        .agg(
            F.hll_sketch_agg(F.col("doc_id")).alias("sk"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    layouts = [
        sk,
        sk.repartition(16),
        sk.repartition(64, "source"),
        sk.coalesce(1).sortWithinPartitions(F.desc("source")),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for shuf in ("4", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", shuf)
            for lay in layouts:
                outs.append(tuple(hll_canonical_overall(lay).collect()[0]))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(set(outs)) == 1, outs
    # non-vacuous: the frame really was multi-partition going in
    assert sk.repartition(16).rdd.getNumPartitions() == 16
