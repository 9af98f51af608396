"""Distributed BPE vocabulary learning matches the single-node
reference implementation merge-for-merge (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.operators import bpe


def test_merge_fold_handles_overlaps(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), ([],), (["x"],)],
        "s array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            bpe._merge_pair_expr(F.col("s"), "a", "a").alias("m")
        ).collect()
    ]
    # greedy left-to-right, merged token compared as a whole
    assert out[0] == ["aa", "a"]
    assert out[1] == ["a", "b", "a", "b"]
    assert out[2] == []
    assert out[3] == ["x"]


def test_bpe_apply_matches_trainer_totals(spark, sf_small):
    """Applying the learned merges (priority-loop apply) reproduces the
    trainer's corpus token totals exactly — the canonical train/apply
    equivalence of BPE — and fewer merges mean more tokens."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges = bpe.bpe_learn(docs, n_merges=6, min_count=2)
    counts = bpe.bpe_token_counts(docs, merges)
    total = counts.agg(F.sum("n_bpe_tokens").alias("t")).collect()[0]["t"]
    assert total == merges[-1]["corpus_tokens"]
    fewer = bpe.bpe_token_counts(docs, merges[:2])
    total_fewer = fewer.agg(F.sum("n_bpe_tokens").alias("t")).collect()[0]["t"]
    assert total_fewer > total


def test_bpe_matches_reference_implementation(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]

    got = bpe.bpe_learn(docs, n_merges=8, min_count=2)
    want = bpe.bpe_learn_reference(texts, n_merges=8, min_count=2)

    assert got == want, (
        "distributed merge sequence diverged from the single-node "
        f"reference: {got[:3]} vs {want[:3]}"
    )
    # compression trajectory is monotone: every merge shrinks the corpus
    toks = [m["corpus_tokens"] for m in got]
    assert all(a > b for a, b in zip(toks, toks[1:])) or len(toks) <= 1
    # ranks are dense from 0
    assert [m["rank"] for m in got] == list(range(len(got)))
