"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The classical subword-NMT algorithm (Sennrich et al. 2016, public):
count adjacent symbol pairs over a word-frequency table, merge the
most frequent pair everywhere, repeat. The tokenizer itself is the one
LLM-pipeline primitive the registry's token counters approximate with
regexes — this learns the merges from the corpus, distributed.

Scale shape: the corpus collapses to a (word, freq) table in ONE
shuffle — every later pass runs on the vocabulary, not the corpus
(100 TB of text is ~10⁷-10⁸ distinct words, a graceful distributed
table). Each merge round is one pair-count aggregation (map-side
combined) + a driver argmax of ONE row, and the merge application is a
native higher-order fold (`aggregate`) — no Python touches row data.
Rounds localCheckpoint the symbol table: iterative plans otherwise
nest exponentially (the BENCH_NOTES graph-loop lesson).

Determinism: pair argmax breaks ties by (count DESC, left, right) —
the same total order every run, so the learned vocabulary is
reproducible bit-for-bit (required for the DuckDB-free parity test
against a single-node reference implementation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair_expr(col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbols via
    a native array fold — the exact semantics of the reference regex
    replace: after a merge the new symbol is compared as a whole, so
    'aaa' under (a,a) becomes ['aa','a'], never ['a','aa'] or ['aaa']."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        # try_element_at: NULL (never an ANSI throw) on the empty
        # accumulator — `&` has no short-circuit guarantee in a plan
        can_merge = (
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(col, F.array().cast("array<string>"), step)


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_count: int = 2,
    lowercase: bool = True,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns one dict per learned merge: {"rank", "left", "right",
    "merged", "pair_count", "corpus_tokens"} where corpus_tokens is the
    total token count of the corpus AFTER applying the merge — the
    compression trajectory the vocabulary buys.
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = (
        docs.select(F.explode(F.split(txt, r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # The vocabulary is orders of magnitude smaller than the corpus —
    # size the iteration's partitioning to IT (same rule as the
    # connected-components loop): at the demo SFs a handful of
    # partitions, growing ~1 per 250k distinct words at scale.
    n_words = words.count()
    parts = int(max(2, min(64, n_words // 250_000 + 2)))
    syms = (
        words.select("freq", F.split("w", "").alias("s"))
        .repartition(parts)
        .localCheckpoint()
    )

    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            syms.select(
                "freq",
                F.expr(
                    "transform(slice(s, 1, size(s) - 1),"
                    " (x, i) -> struct(x AS l, element_at(s, i + 2) AS r))"
                ).alias("ps"),
            )
            .select(F.explode("ps").alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        syms = syms.withColumn(
            "s", _merge_pair_expr(F.col("s"), a, b)
        ).localCheckpoint()
        tokens = syms.agg(
            F.sum(F.col("freq") * F.size("s")).alias("t")
        ).collect()[0]["t"]
        merges.append(
            {
                "rank": rank,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": cnt,
                "corpus_tokens": int(tokens),
            }
        )
    return merges


def bpe_apply_reference(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Tokenize ONE word with learned merges: repeatedly merge the
    lowest-rank adjacent pair (the canonical BPE apply loop)."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_token_counts(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document token counts under the learned BPE vocabulary.

    The merge table (a few thousand entries at production vocab sizes)
    rides to executors in the task closure — broadcast semantics, no
    shuffle — and the apply loop runs per WORD inside an Arrow-batched
    mapInPandas kernel with a per-batch word cache (Zipf makes the
    cache hit rate high: each distinct word tokenizes once per batch).
    Output: (id, n_words, n_chars, n_bpe_tokens).
    """
    import pandas as pd

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}

    def kernel(batches):
        for pdf in batches:
            cache: dict[str, int] = {}
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = text.lower() if lowercase else text
                words = [w for w in t.split() if w]
                n_tok = 0
                for w in words:
                    hit = cache.get(w)
                    if hit is None:
                        hit = len(bpe_apply_reference(w, ranks))
                        cache[w] = hit
                    n_tok += hit
                rows.append((int(did), len(words), len(text), n_tok))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_chars", "n_bpe_tokens"]
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        f"{id_col} long, n_words long, n_chars long, n_bpe_tokens long",
    )


def bpe_learn_reference(
    texts: list[str],
    n_merges: int = 16,
    min_count: int = 2,
    lowercase: bool = True,
) -> list[dict]:
    """Single-node reference implementation (same tie-break), for the
    parity test — never called from a Spark plan."""
    import re
    from collections import Counter

    freqs: Counter = Counter()
    for t in texts:
        if lowercase:
            t = t.lower()
        for w in re.split(r"\s+", t):
            if w:
                freqs[w] += 1
    vocab = {w: list(w) for w in freqs}

    merges: list[dict] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = a + b
        for w in vocab:
            s = vocab[w]
            out: list[str] = []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = merged
                else:
                    out.append(sym)
            vocab[w] = out
        tokens = sum(f * len(vocab[w]) for w, f in freqs.items())
        merges.append(
            {
                "rank": rank,
                "left": a,
                "right": b,
                "merged": merged,
                "pair_count": cnt,
                "corpus_tokens": tokens,
            }
        )
    return merges
