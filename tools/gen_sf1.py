"""Generate a deterministic ~10x (sf1) rehearsal dataset in /tmp/sf1
for the dedup / ANN / graph scale rehearsal (VERDICT r3 #5).

/root/testdata is read-only and tops out at sf0.1, so the rehearsal
tables are synthesized here — distribution-matched to sf0.1, not naive
10x replication, because replication would be adversarial for dedup
(every doc near-dups its 9 clones → quadratic candidate blowup that no
real corpus exhibits):

- documents (50k): word-salad with the sf0.1 length distribution
  (10..100 tokens, mean ~54) over a 10x-ENLARGED vocabulary (310
  words — real corpora grow vocab with size, which keeps per-shingle
  bucket sizes roughly scale-invariant), same lang/source mixes, and
  exact duplicates planted at the sf0.1 rate (~1 in 600). All
  deterministic Lehmer-hash arithmetic, no RNG.
- embeddings (20k): 10 copies of each sf0.1 vector with a per-copy
  deterministic perturbation (copies are near- but not exact
  neighbors — the ANN probe structure stays realistic).
- lineitem (6M): 10 key-shifted copies of sf0.1 — for the graph
  family this is 10 disjoint copies of the co-order graph: node and
  edge counts scale 10x, which is exactly what the shuffle
  measurement needs.
- nation: copied verbatim (dimension).

Run: python tools/gen_sf1.py   (writes /tmp/sf1/*.parquet, ~1 min)
     python tools/gen_sf1.py --sf10   (100x: /tmp/sf10/*.parquet —
     VERDICT r9 #5's one-decade-beyond probe; same distribution-matched
     construction, COPIES=100, vocabulary 100x, ~2 GB, a few min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf1"
M = 2147483647

N_DOCS = 50_000
N_VECS = 20_000
COPIES = 10

if "--sf10" in sys.argv[1:]:
    OUT = "/tmp/sf10"
    N_DOCS = 500_000
    COPIES = 100


def h64(expr: str) -> str:
    """Non-linear 64-bit hash of a SQL expression. NOT the Lehmer
    multiply — that is linear (h(x+d) = h(x)+h(d) mod M), so hashing
    consecutive positions j, j+1 produced an arithmetic progression
    and the first cut of this generator emitted only ~930 distinct
    3-shingles across the whole corpus (every doc near-dup'd every
    other). xxhash64 mixes properly; the generator only needs
    within-Spark determinism, not cross-engine arithmetic."""
    return f"abs(xxhash64({expr}))"


def _gen_embeddings(spark) -> None:
    """Copy perturbation is hash-mixed per (vec_id, copy, dim) and
    BOUNDED (r10): the first cut used ``copy * 0.001 * ((i%7)-3)`` —
    the SAME offset direction for every vector, with magnitude
    growing linearly in the copy index. At COPIES=100 that common
    offset (norm ~1.6) dominated every unit vector and the whole
    corpus collapsed toward one direction: 885M pairs sat above
    cosine 0.95 (42% of all possible base pairs), which is
    adversarial for every cosine-based op the rehearsal exists to
    measure — the same replication trap the documents section
    documents. Now each copy sits in a small fixed-radius ball
    (per-dim ±0.009, offset norm ~0.05) around its base vector in a
    pseudo-random direction: intra-base copies stay planted
    near-dups, inter-base geometry is untouched at any COPIES.
    copy 0 stays the exact base vector."""
    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb = (
        base.crossJoin(
            spark.range(COPIES).withColumnRenamed("id", "copy")
        )
        .selectExpr(
            "vec_id + copy * 2000 AS vec_id",
            "transform(embedding, (x, i) -> CAST(x + "
            "(CASE WHEN copy = 0 THEN 0.0 ELSE 0.003 * "
            "((abs(xxhash64(vec_id, copy, i)) % 7) - 3) END) "
            "AS FLOAT)) AS embedding",
            "label",
        )
    )
    emb.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )
    if "--only-embeddings" in sys.argv[1:]:
        print("embeddings", spark.read.parquet(
            f"{OUT}/embeddings.parquet").count())


def main() -> None:
    spark = get_spark(
        extra_conf={"spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "32g")}
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    # ---- documents ----------------------------------------------------
    if "--only-embeddings" in sys.argv[1:]:
        _gen_embeddings(spark)
        return
    base_vocab = [
        r[0]
        for r in spark.read.parquet(f"{SRC}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .distinct()
        .orderBy("w")
        .collect()
    ]
    vocab = [f"{w}{sfx}" if sfx else w
             for w in base_vocab for sfx in ["", *map(str, range(1, COPIES))]]
    vocab_lit = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    langs = "array('en','en','en','en','zh','de','fr','es','en','fr')"
    # planting: ~1/600 docs is an EXACT dup of its predecessor; ~1/200
    # is a NEAR dup of doc_id-2 (same length/word stream with ~10% of
    # positions mutated) so the near-dup operators have real structure
    # to find at a realistic, scale-invariant rate
    base_id = (
        "(doc_id - (CASE WHEN doc_id % 600 = 1 THEN 1 "
        "WHEN doc_id % 200 = 2 THEN 2 ELSE 0 END))"
    )
    n_tok = f"(10 + {h64(base_id + ' * 7 + 13')} % 91)"
    mutate = f"(doc_id % 200 = 2 AND {h64('doc_id * 13 + j')} % 10 = 0)"
    word = (
        f"(CASE WHEN {mutate} THEN {h64('doc_id * 999983 + j')} "
        f"ELSE {h64(base_id + ' * 100003 + j')} END)"
    )
    docs = (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .selectExpr(
            "doc_id",
            f"array_join(transform(sequence(1, {n_tok}), "
            f"j -> element_at({vocab_lit}, "
            f"CAST(1 + {word} % {len(vocab)} AS INT))), ' ') AS text",
            f"element_at({langs}, "
            f"CAST(1 + {h64('doc_id * 31 + 5')} % 10 AS INT)) AS lang",
            f"concat('src', CAST(doc_id % 20 AS STRING)) AS source",
        )
        .selectExpr("doc_id", "text", "lang", "source",
                    "CAST(length(text) AS BIGINT) AS n_chars")
    )
    docs.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/documents.parquet"
    )

    # ---- embeddings ---------------------------------------------------
    _gen_embeddings(spark)

    # ---- lineitem + nation -------------------------------------------
    # the orderkey shift is SHARED with the orders copies below: the
    # TPC-H rehearsal joins lineitem↔orders across copies, so the two
    # key spaces must shift by the same constant that clears BOTH
    # maxima — today max(l_orderkey) == max(o_orderkey), but relying
    # on that equality is exactly the aliasing bug class the shared
    # custkey shift exists to prevent
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    o = spark.read.parquet(f"{SRC}/orders.parquet")
    shift = (
        max(
            li.agg(F.max("l_orderkey")).collect()[0][0],
            o.agg(F.max("o_orderkey")).collect()[0][0],
        )
        + 1
    )
    li10 = (
        li.crossJoin(spark.range(COPIES).withColumnRenamed("id", "copy"))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(shift)
        )
        .drop("copy")
    )
    li10.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/lineitem.parquet"
    )
    spark.read.parquet(f"{SRC}/nation.parquet").write.mode(
        "overwrite"
    ).parquet(f"{OUT}/nation.parquet")

    # ---- orders + events (r5: scale evidence for the remaining
    # fixed-overhead singles — rfm/skyline/sql_scripting need orders,
    # cms needs events). Key-shifted copies like lineitem; customer
    # and user ids shift too, so entity cardinality scales 10x the
    # way a real corpus grows (rfm quartiles over 10x customers).
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    o_shift = shift  # shared with lineitem (see above)
    # r9: customer now ships 10x key-shifted copies too (the TPC-H
    # multi-table shapes joined through o_custkey need the dim to
    # cover every shifted FK), so the custkey shift must be SHARED
    # between fact and dim and clear BOTH key ranges — else copy k's
    # customers would collide with copy k+1's orders.
    c_shift = (
        max(
            o.agg(F.max("o_custkey")).collect()[0][0],
            cust.agg(F.max("c_custkey")).collect()[0][0],
        )
        + 1
    )
    o10 = (
        o.crossJoin(spark.range(COPIES).withColumnRenamed("id", "copy"))
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(o_shift)
        )
        .withColumn(
            "o_custkey", F.col("o_custkey") + F.col("copy") * F.lit(c_shift)
        )
        .drop("copy")
    )
    o10.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/orders.parquet"
    )
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    e_shift = ev.agg(F.max("event_id")).collect()[0][0] + 1
    u_shift = ev.agg(F.max("user_id")).collect()[0][0] + 1
    ev10 = (
        ev.crossJoin(spark.range(COPIES).withColumnRenamed("id", "copy"))
        .withColumn(
            "event_id", F.col("event_id") + F.col("copy") * F.lit(e_shift)
        )
        .withColumn(
            "user_id", F.col("user_id") + F.col("copy") * F.lit(u_shift)
        )
        .drop("copy")
    )
    ev10.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/events.parquet"
    )

    # ---- customer + pure dimensions (r9: VERDICT r8 #4 — extend the
    # rehearsal to the TPC-H multi-table shapes). customer scales 10x
    # with the shared c_shift so every shifted o_custkey resolves;
    # supplier / part / region are copied VERBATIM: lineitem keeps its
    # original l_partkey / l_suppkey, so each part/supplier simply
    # gains 10x fan-in — the "more facts per dimension row" growth a
    # real warehouse exhibits, and exactly the shape that stresses the
    # fact-side shuffle without breaking FK integrity.
    c10 = (
        cust.crossJoin(spark.range(COPIES).withColumnRenamed("id", "copy"))
        .withColumn(
            "c_custkey", F.col("c_custkey") + F.col("copy") * F.lit(c_shift)
        )
        .drop("copy")
    )
    c10.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/customer.parquet"
    )
    for dim in ("supplier", "part", "region"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{dim}.parquet")

    for t in ("documents", "embeddings", "lineitem", "orders", "events",
              "customer", "supplier", "part", "nation", "region"):
        print(t, spark.read.parquet(f"{OUT}/{t}.parquet").count())


if __name__ == "__main__":
    main()
