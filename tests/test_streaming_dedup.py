"""Streaming incremental dedup: new docs stream in, each micro-batch
is checked against the static corpus band index, and the admission log
matches the batch operator's answer exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.operators.dedup import (
    incremental_minhash_matches,
)
from aiports_data_warehouse_etl_spark.streaming.events import (
    stream_incremental_dedup,
)


@pytest.fixture()
def corpus(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def test_stream_matches_batch_operator(spark, corpus, tmp_path):
    base = corpus.filter(F.col("doc_id") % 5 != 0)
    delta = corpus.filter(F.col("doc_id") % 5 == 0)

    ingest = str(tmp_path / "ingest")
    out = str(tmp_path / "admission_log")
    ckpt = str(tmp_path / "ckpt")
    # two separate arrival files → at least one multi-file availableNow run
    delta.filter(F.col("doc_id") % 10 == 0).write.parquet(ingest)
    delta.filter(F.col("doc_id") % 10 == 5).write.mode("append").parquet(ingest)

    q = stream_incremental_dedup(spark, base, ingest, out, ckpt, threshold=0.35)
    q.awaitTermination(120)

    log = spark.read.parquet(out)
    # complete admission log: one row per delta doc
    assert log.count() == delta.count()
    assert log.select("delta_id").distinct().count() == delta.count()

    expected = {
        (r.delta_id, r.n_matches, r.best_base_id, round(r.best_jaccard, 6))
        for r in incremental_minhash_matches(base, delta, threshold=0.35).collect()
    }
    got = {
        (r.delta_id, r.n_matches, r.best_base_id, round(r.best_jaccard, 6))
        for r in log.filter(F.col("n_matches") > 0).collect()
    }
    assert got == expected
    # admitted docs carry the null-match sentinel shape
    admitted = log.filter(F.col("n_matches") == 0)
    assert admitted.filter(F.col("best_base_id").isNotNull()).count() == 0


def test_stream_restart_is_exactly_once(spark, corpus, tmp_path):
    base = corpus.filter(F.col("doc_id") % 5 != 0)
    delta = corpus.filter(F.col("doc_id") % 5 == 0)

    ingest = str(tmp_path / "ingest")
    out = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    delta.limit(20).write.parquet(ingest)

    q = stream_incremental_dedup(spark, base, ingest, out, ckpt)
    q.awaitTermination(120)
    n_first = spark.read.parquet(out).count()
    assert n_first == 20

    # restart with NO new files: checkpoint must prevent reprocessing
    q2 = stream_incremental_dedup(spark, base, ingest, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_first
