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

    out: dict = {"results": {}, "telemetry": {}}

    def flush() -> None:  # crash-safe: partial results survive
        with open("/tmp/BENCH_sf1.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    for name in FAMILIES:
        row: dict = {}
        for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                n = QUERIES[name].fn(spark, sf).count()
                row[label] = {"sec": round(time.time() - t0, 2), "rows": n}
            except Exception as ex:  # missing table etc.
                row[label] = {"err": str(ex).split("\n")[0][:120]}
        if "sec" in row.get("sf0.1", {}) and "sec" in row.get("sf1", {}):
            row["ratio"] = round(
                row["sf1"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 1
            )
        out["results"][name] = row
        flush()
        print(name, json.dumps(row), flush=True)

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
    print("wrote /tmp/BENCH_sf1.json")


if __name__ == "__main__":
    main()
