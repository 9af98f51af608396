"""Scale rehearsal (VERDICT r3 #5): run the dedup / ANN / graph
families at sf0.1 and at the synthesized /tmp/sf1 (10x — see
tools/gen_sf1.py), recording wall-clock, output cardinality, and
candidate-pair telemetry for the bucketed dedup operators. The check:
near-linear scaling — no query should exceed ~10x its sf0.1 time
(quadratic candidate blowup is exactly what the band/bucket tunables
are supposed to prevent).

Usage: python tools/gen_sf1.py && python tools/scale_rehearsal.py
Writes /tmp/BENCH_sf1.json; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

FAMILIES = [
    "dedup_exact", "dedup_canonical_text", "dedup_minhash_lsh",
    "decontaminate_fuzzy",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_embedding",
    "dedup_connected_components", "dedup_cc_keep_best", "dedup_passages",
    "decontaminate", "dedup_incremental_index", "dedup_exact_substring",
    "sim_bruteforce_topk", "sim_lsh_topk", "sim_lsh_multiprobe",
    "sim_ivf_topk", "sim_pq_topk",
    "graph_pagerank_parts", "graph_bfs_hops",
    # r5: the three fixed-overhead singles from VERDICT r4's perf-weak
    # list — correct cluster-shaped plans that lose to DuckDB's
    # constant factors at 600k rows; the rehearsal documents that
    # their wall-clock stays ~flat-to-linear at 10x, i.e. the loss is
    # overhead, not a scaling defect
    "text_keyphrase_rake", "market_basket_lift", "text_bigram_logprob",
    # r5b: every remaining >2x engine-comparable single with a 10x
    # input available (gen_sf1 now also synthesizes orders + events);
    # includes the two queries moved onto the two-pass window
    # decompositions this round
    "rfm_segmentation", "sql_scripting_batch", "cms_event_counts",
    "abc_pareto_parts", "skyline_price_frontier",
    # r5c (VERDICT r4 #5): the txlog / streaming / matview families —
    # IO-bound profiles with the least prior scale evidence. Each
    # query builds its own temp txlog table from the given sf_dir, so
    # the rehearsal measures the full write+read+feed path at 10x.
    "tlog_acid_table", "tlog_clustered_prune", "tlog_delete_dv",
    "tlog_change_feed", "tlog_merge_upsert", "tlog_bloom_prune",
    "tlog_cdc_updates", "tlog_zorder_prune", "tlog_time_travel_asof",
    # r6: the DML completions — conditional MERGE, UPDATE in both
    # cost shapes (COW and MoR/deletion-vector), replace_where
    "tlog_merge_conditional", "tlog_update_where", "tlog_update_mor",
    "tlog_replace_where", "stream_txlog_native_sink",
    "tlog_sql_dml", "tlog_generated_columns", "split_leakage_safe",
    "tlog_rename_column", "tlog_drop_column", "tlog_identity_column",
    "stream_txlog_cdf_source", "stream_foreachbatch_txlog",
    "matview_incremental_refresh", "matview_minmax_refresh",
    "matview_streaming_maintenance", "matview_distinct_refresh",
    # r7 (VERDICT r6 #4): the heavy event-analytics windows — the one
    # family in the never-swept backlog with no scale row yet
    "evt_peak_concurrency", "evt_funnel_conversion",
    "evt_rolling_zscore", "evt_transition_matrix",
    # r7b: rewritten onto the fused Arrow cosine kernel this round —
    # scale row proves the kernel path holds at 10x corpus
    "emb_matryoshka_truncate",
    # r8: the heaviest BENCH_FULL queries that still had no scale row
    # and whose tables gen_sf1 synthesizes (documents / embeddings /
    # events / orders / lineitem / nation)
    "emb_logreg_train", "tlog_restore", "mm_decode_features",
    "tlog_shallow_clone", "pipeline_pretraining_full",
    "graph_triangle_count", "text_feature_hashing",
    "text_tfidf_top_terms", "text_bm25_search", "cluster_top_terms",
    "pipeline_training_corpus",
    # r9 (VERDICT r8 #4): extend beyond 70/249 — the next-heaviest
    # BENCH_FULL queries without a scale row. gen_sf1 now also ships
    # customer (10x, shared custkey shift) and supplier/part/region
    # (verbatim dims), so the TPC-H multi-table shapes run at 10x:
    # joins through o_custkey resolve against the shifted dim, and
    # part/supplier-side joins see 10x fan-in per dimension row — the
    # fact-side-shuffle growth shape.
    "file_provenance", "recursive_cte_bom", "orc_roundtrip_agg",
    "tpch_q21_waiting_supplier", "id_gaps_islands",
    "stratified_sample_hash", "hierarchy_rollup_bom", "sim_recall_eval",
    "win_ntile_percent_rank", "mm_video_frame_sample",
    "tpch_q3_shipping_priority", "pandas_cogroup_profile",
    "text_ngram_novelty", "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier", "tpch_q12_priority_by_year",
    "udtf_installments", "argmin_join_cheapest_per_part",
    "quality_quantile_filter", "tpch_q8_market_share",
    "tpch_q4_priority_exists", "hist_equidepth_bins", "bpe_token_count",
    "emb_covariance_matrix", "text_top_bigrams",
    "tpch_q10_returned_items", "emb_pca_projection",
    "tpch_q18_large_orders", "tpch_q11_important_stock",
    "win_trailing_median",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"


def main() -> None:
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    spark.sparkContext.setLogLevel("ERROR")

    # CLI filter: `python tools/scale_rehearsal.py name1 name2 ...`
    # runs only those families (merging into an existing partial
    # /tmp/BENCH_sf1.json) and skips the telemetry/matview sections —
    # the incremental path for adding rows without re-timing the rest.
    # `--rest` (r9) runs every registry query NOT already in the
    # merged /tmp/BENCH_sf1.json results: with gen_sf1 now shipping
    # all ten tables, the whole 249-query registry can carry a 10x
    # scale row, not just the curated heavy families.
    only = set(a for a in sys.argv[1:] if a != "--rest")
    rest = "--rest" in sys.argv[1:]
    out: dict = {"results": {}, "telemetry": {}}
    if (only or rest) and os.path.exists("/tmp/BENCH_sf1.json"):
        with open("/tmp/BENCH_sf1.json") as f:
            out = json.load(f)
        out.setdefault("results", {})
        out.setdefault("telemetry", {})

    def flush() -> None:  # crash-safe: partial results survive
        with open("/tmp/BENCH_sf1.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    names = list(FAMILIES)
    if rest:
        # a prior {"err": ...} row is NOT a scale row — retry it (a
        # query that errored once, e.g. before gen_sf1 shipped its
        # table, must not be permanently skipped by later sweeps).
        # EXCEPT (ADVICE r9 #1): a row whose sf0.1 leg ALSO errored
        # failed for a non-scale reason (the query itself is broken
        # at any SF) — re-running it twice per scale on every sweep
        # just burns time; leave it for an explicit-name retry.
        def _needs_row(n: str) -> bool:
            row = out["results"].get(n)
            if row is None:
                return True
            if "ratio" in row:
                return False
            return "err" not in row.get("sf0.1", {})

        names = [n for n in QUERIES if _needs_row(n)]
        if only:
            # ADVICE r9 #1: --rest plus explicit names used to ignore
            # the names silently; honor the intersection.
            names = [n for n in names if n in only]
        print(f"--rest: {len(names)} registry queries without a scale row",
              flush=True)
    elif only:
        # any registry query is probe-able, not just the curated list
        names = [n for n in QUERIES if n in only]
    for name in names:
        row: dict = {}
        for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
            spark.catalog.clearCache()
            try:
                # best-of-2, same protocol as bench.py: the first rep
                # pays session/cache warmup, the second measures the
                # engine — single-shot rows conflated the two (the
                # 9.4s-cold vs 1.1s-warm matryoshka artifact)
                best, n = float("inf"), 0
                for _ in range(2):
                    t0 = time.time()
                    n = QUERIES[name].fn(spark, sf).count()
                    best = min(best, time.time() - t0)
                row[label] = {"sec": round(best, 2), "rows": n}
            except Exception as ex:  # missing table etc.
                row[label] = {"err": str(ex).split("\n")[0][:120]}
        if "sec" in row.get("sf0.1", {}) and "sec" in row.get("sf1", {}):
            row["ratio"] = round(
                row["sf1"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 1
            )
        out["results"][name] = row
        flush()
        print(name, json.dumps(row), flush=True)

    if only or rest:  # incremental: keep prior telemetry/matview sections
        return

    # candidate-pair telemetry for the bucketed dedup operators
    from aiports_data_warehouse_etl_spark.operators import dedup as D

    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n_docs = docs.count()
        minhash_cand = D.lsh_candidate_pairs(docs).count()
        simhash_out = D.simhash_pairs(docs, max_hamming=3).count()
        shingles = D.shingle_rows(docs)
        out["telemetry"][label] = {
            "n_docs": n_docs,
            "distinct_shingles": shingles.select("s").distinct().count(),
            "minhash_candidate_pairs": minhash_cand,
            "minhash_pairs_per_doc": round(minhash_cand / n_docs, 2),
            "simhash_verified_pairs": simhash_out,
            "simhash_pairs_per_doc": round(simhash_out / n_docs, 2),
        }
        flush()
        print(label, json.dumps(out["telemetry"][label]), flush=True)

    # ---- matview incrementality: IDENTICAL delta, 10x source ----------
    # The delta-apply claim is O(changed rows + view cardinality),
    # never O(source): apply the same 1000-row append and the same
    # 90-key DV delete to a sf0.1-sized and a sf1-sized source table
    # and time ONLY the refreshes. Flat times across 10x source = the
    # incrementality contract, measured.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable
    from aiports_data_warehouse_etl_spark.streaming.matview import (
        IncrementalAggView,
    )

    inc: dict = {}
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        root = tempfile.mkdtemp(prefix="mvscale_")
        try:
            t = TxLogTable(spark, root + "/t")
            o = spark.read.parquet(f"{sf}/orders.parquet").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            t.append(o.repartition(16))
            mv = IncrementalAggView(
                spark, t, root + "/v",
                group_cols=["o_orderstatus"], sum_cols=["o_totalprice"],
            )
            t0 = time.time()
            mv.refresh()
            t_initial = time.time() - t0
            delta = (
                o.limit(1000)
                .withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(10**12)
                )
            )
            t.append(delta.coalesce(1))
            t0 = time.time()
            mv.refresh()
            t_append = time.time() - t0
            t.delete_where_dv(
                f"o_orderkey >= {10**12} AND o_orderkey % 11 = 0"
            )
            t0 = time.time()
            mv.refresh()
            t_dv = time.time() - t0
            inc[label] = {
                "source_rows": t.count_rows(),
                "initial_build_sec": round(t_initial, 2),
                "append_refresh_sec": round(t_append, 2),
                "dv_refresh_sec": round(t_dv, 2),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(label, json.dumps(inc[label]), flush=True)
    a, b = inc.get("sf0.1", {}), inc.get("sf1", {})
    if a and b:
        inc["refresh_ratio_at_10x_source"] = {
            "initial_build": round(
                b["initial_build_sec"] / max(a["initial_build_sec"], 1e-9), 1
            ),
            "append_refresh": round(
                b["append_refresh_sec"] / max(a["append_refresh_sec"], 1e-9),
                1,
            ),
            "dv_refresh": round(
                b["dv_refresh_sec"] / max(a["dv_refresh_sec"], 1e-9), 1
            ),
        }
    out["matview_incrementality"] = inc
    flush()
    print("wrote /tmp/BENCH_sf1.json")


if __name__ == "__main__":
    main()
