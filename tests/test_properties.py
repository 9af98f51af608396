"""Property-based tests (hypothesis): the column expressions must agree
with straight-Python reference semantics on arbitrary inputs — not just
the fixtures we thought of."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.functions.text_extract import (
    airport_city,
    airport_country,
    airport_name,
    carrier_name,
    carrier_shortcut,
)
from aiports_data_warehouse_etl_spark.functions.timecodec import (
    hhmm_add_minutes,
    hhmm_to_minute_of_day,
)

# -- pure-Python twins of the reference UDFs (ref extract_and_tranform.py:66-116)


def py_airport_name(row):
    if not row or ":" not in row:
        return "Not specified"
    return row.split(":")[-1].strip()


def py_airport_city(row):
    if not row or "," not in row:
        return "Not specified"
    return row.split(",")[0].strip()


def py_airport_country(row):
    if not row or ":" not in row:
        return "Not specified"
    parts = row.split(":")[0].split(",")
    country = parts[1].strip() if len(parts) > 1 else None  # ref would IndexError
    if country is not None and len(country) > 2:
        return country
    return "United States"


def py_carrier_name(row):
    if not row or "," not in row:
        return "Not specified"
    return row.split(",")[0]


def py_carrier_shortcut(row):
    if not row or ":" not in row:
        return "Not specified"
    return row.split(":")[1]


TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ,:.#-"),
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_extractors_match_python_semantics(spark, descs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(descs)], ["i", "d"])
    col = F.col("d")
    got = {
        r.i: (r.n, r.c, r.co, r.cn, r.cs)
        for r in df.select(
            "i",
            airport_name(col).alias("n"),
            airport_city(col).alias("c"),
            airport_country(col).alias("co"),
            carrier_name(col).alias("cn"),
            carrier_shortcut(col).alias("cs"),
        ).collect()
    }
    for i, d in enumerate(descs):
        expected = (
            py_airport_name(d),
            py_airport_city(d),
            py_airport_country(d),
            py_carrier_name(d),
            py_carrier_shortcut(d),
        )
        assert got[i] == expected, f"input {d!r}: {got[i]} != {expected}"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2359), st.integers(min_value=-300, max_value=300)),
        min_size=1,
        max_size=30,
    )
)
def test_hhmm_codecs_match_python_floordiv(spark, pairs):
    df = spark.createDataFrame(
        [(i, t, d) for i, (t, d) in enumerate(pairs)], ["i", "t", "d"]
    )
    got = {
        r.i: (r.m, r.s)
        for r in df.select(
            "i",
            hhmm_to_minute_of_day(F.col("t")).alias("m"),
            hhmm_add_minutes(F.col("t"), F.col("d")).alias("s"),
        ).collect()
    }
    for i, (t, d) in enumerate(pairs):
        # the reference's literal formulas with Python floor-div semantics
        expected = (t % 60 + (t // 100) * 60, t + (d // 60) * 100 + d % 60)
        assert got[i] == expected, f"(t={t}, d={d}): {got[i]} != {expected}"


def test_scd2_merge_idempotent(spark):
    """Applying the same update batch twice is a no-op: after the first
    merge the current rows already carry the update values, so the
    second merge's change-detection must fire zero expirations."""
    from aiports_data_warehouse_etl_spark.operators.merge import scd2_merge

    current = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)],
        "key int, name string, bal double",
    ).selectExpr(
        "key", "name", "bal",
        "CAST('2020-01-01' AS DATE) AS valid_from",
        "CAST(NULL AS DATE) AS valid_to",
        "TRUE AS is_current",
    )
    updates = spark.createDataFrame(
        [(i, f"n{i}", float(i) + 5) for i in range(0, 20, 3)],
        "key int, name string, bal double",
    )
    once = scd2_merge(current, updates, keys=["key"], as_of="2024-06-01")
    twice = scd2_merge(once, updates, keys=["key"], as_of="2024-07-01")
    key = lambda r: (r.key, str(r.valid_from), str(r.valid_to), r.is_current, r.bal)
    assert sorted(map(key, once.collect())) == sorted(map(key, twice.collect()))


def test_ngram_threshold_monotone(spark):
    """Raising the Jaccard threshold can only shrink the pair set, and
    every reported pair carries jaccard ≥ its threshold."""
    from aiports_data_warehouse_etl_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d e f g x"),
            (2, "a b c d e f y x"),
            (3, "p q r s t u v w"),
            (4, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    lo = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    hi = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()}
    assert set(hi) <= set(lo)
    assert all(j >= 0.6 for j in hi.values())
    assert (3, 4) in hi  # identical docs → jaccard 1.0
    assert all(lo[p] == hi[p] for p in hi)  # same scores at any threshold


def test_minhash_pairs_subset_of_candidates(spark):
    """Verified near-dup pairs are always a subset of the LSH candidate
    pairs, and verification never manufactures a pair."""
    from aiports_data_warehouse_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_dedup_pairs,
    )

    docs = spark.createDataFrame(
        [
            # 0/1 at J≈0.86: comfortably above the 4-band/2-row LSH
            # S-curve knee (a J≈0.78 pair deterministically missed all
            # 4 bands with this md5 hash family — recall at the knee is
            # probabilistic by design, not a bug)
            (0, "the quick brown fox jumps over the lazy dog every single morning in the park"),
            (1, "the quick brown fox jumps over the lazy dog every single morning in the yard"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "pack my box with five dozen liquor jugs right here"),
            (4, "completely unrelated text about spark query planning"),
        ],
        "doc_id long, text string",
    )
    cand = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(docs).collect()}
    verified = {(r.id_a, r.id_b) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert verified <= cand
    assert (0, 1) in verified and (2, 3) in verified


def test_passage_dedup_invariants(spark, monkeypatch, tmp_path):
    """Passage-level dedup: (1) every passage in the output corpus is
    globally unique; (2) output token count never exceeds input; (3) a
    doc made entirely of another doc's passages vanishes."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    p10_a = " ".join(f"a{i}" for i in range(10))
    p10_b = " ".join(f"b{i}" for i in range(10))
    p10_c = " ".join(f"c{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{p10_a} {p10_b}", "en", "s1", 0),
            (2, f"{p10_b} {p10_c}", "en", "s1", 0),  # b-passage is a dup
            (3, f"{p10_a} {p10_b}", "en", "s1", 0),  # vanishes entirely
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in QUERIES["dedup_passages"].fn(spark, path).collect()}

    assert set(out) == {1, 2}               # doc 3 fully deduplicated away
    assert out[1].dedup_text == f"{p10_a} {p10_b}"
    assert out[2].dedup_text == p10_c       # only its novel passage survives
    all_passages = []
    for r in out.values():
        toks = r.dedup_text.split(" ")
        all_passages += [" ".join(toks[i:i+10]) for i in range(0, len(toks), 10)]
    assert len(all_passages) == len(set(all_passages))  # global uniqueness


def test_domain_balance_bounds_and_determinism(spark, sf_small):
    """Domain-mix rebalancing: kept ≤ total per source, the smallest
    source keeps everything (rate 256/256), and two runs agree row for
    row (hash-rate sampling has no RNG)."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    fn = QUERIES["domain_balance_sample"].fn
    a = {r.source: (r.n_total, r.n_kept) for r in fn(spark, sf_small).collect()}
    b = {r.source: (r.n_total, r.n_kept) for r in fn(spark, sf_small).collect()}
    assert a == b  # deterministic
    min_total = min(t for t, _ in a.values())
    for total, kept in a.values():
        assert 0 <= kept <= total
    assert dict(a)[
        next(s for s, (t, _) in a.items() if t == min_total)
    ][1] == min_total  # smallest source fully kept


def test_weighted_sample_biases_toward_weight(spark, sf_oracle):
    """Priority sampling with n_chars weights must overrepresent long
    documents (sample mean length > corpus mean) while staying
    deterministic across runs."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    fn = QUERIES["weighted_sample_priority"].fn
    sample = fn(spark, sf_oracle).collect()
    assert len(sample) == 100
    corpus_mean = (
        spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean * 1.1, (sample_mean, corpus_mean)
    again = fn(spark, sf_oracle).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in sample}


def test_chunking_invariants(spark, sf_small):
    """doc_chunk_overlap invariants on the real corpus: chunk starts
    stride by 24 so consecutive chunks overlap by 8 tokens; every
    token position is covered by at least one chunk; chunk sizes are
    32 except possibly the last; boundary tokens equal direct array
    indexing."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    chunks = QUERIES["doc_chunk_overlap"].fn(spark, sf_small).collect()
    docs = {
        r.doc_id: r.tk
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("tk"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        tk = docs[doc_id]
        n = len(tk)
        cs = sorted(cs, key=lambda c: c.chunk_idx)
        # stride/coverage: starts are 0,24,48..., last start < n
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        assert (len(cs) - 1) * 24 < n
        covered = set()
        for c in cs:
            start = c.chunk_idx * 24
            size = min(32, n - start)
            assert c.chunk_tokens == size
            assert c.first_tok == tk[start]
            assert c.last_tok == tk[start + size - 1]
            covered.update(range(start, start + size))
        assert covered == set(range(n))


def test_rake_phrase_invariants(spark, sf_small):
    """RAKE invariants: no returned phrase contains a stopword; every
    phrase occurs verbatim (as a stopword-bounded token run) in at
    least one document; scores are positive; output is exactly the
    top-20 by (score, phrase) ordering."""
    from aiports_data_warehouse_etl_spark.queries import QUERIES, _RAKE_STOP

    rows = QUERIES["text_keyphrase_rake"].fn(spark, sf_small).collect()
    assert len(rows) == 20
    stop = set(_RAKE_STOP)
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    ]

    def doc_phrases(text):
        run, out = [], []
        for t in text.strip().split():
            if t in stop:
                if run:
                    out.append(" ".join(run))
                run = []
            else:
                run.append(t)
        if run:
            out.append(" ".join(run))
        return out

    all_phrases = set()
    for t in texts:
        all_phrases.update(doc_phrases(t))
    scores = [(r.rake_score, r.phrase) for r in rows]
    assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))
    for r in rows:
        assert r.rake_score > 0
        assert not (set(r.phrase.split()) & stop)
        assert r.phrase in all_phrases


def test_cusum_prefix_min_identity_matches_recurrence(spark, sf_small):
    """evt_cusum_drift computes s_i = max(0, s_{i-1} + d_i) via the
    prefix-min identity using only window functions; the literal
    python recurrence over each user's time-ordered series must
    agree exactly."""
    import duckdb
    from collections import defaultdict

    from aiports_data_warehouse_etl_spark.queries import QUERIES

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, value FROM '{sf_small}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for u, v in rows:
        series[u].append(v)

    def recurrence(vals, k=55.0, h=500.0):
        s = mx = 0.0
        n = 0
        for v in vals:
            s = max(0.0, s + (v - k))
            mx = max(mx, s)
            n += int(s > h)
        return n, round(mx, 6)

    got = {
        r.user_id: (r.n_alarms, r.max_cusum)
        for r in QUERIES["evt_cusum_drift"].fn(spark, sf_small).collect()
    }
    assert got == {u: recurrence(vals) for u, vals in series.items()}


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.randoms())
def test_jpeg_decoder_total_on_garbage(payload, rnd):
    """The JPEG decoder is TOTAL over byte strings: any input either
    decodes or raises ValueError — never a crash, hang, or a foreign
    exception leaking out of the mapInPandas kernel. Half the examples
    get a valid SOI prefix so the marker parser (not just the magic
    check) is exercised; some get a corrupted REAL jpeg, hitting the
    entropy decoder."""
    import numpy as np

    from aiports_data_warehouse_etl_spark.functions import jpegcodec as J

    variants = [
        payload,
        b"\xff\xd8\xff" + payload,
    ]
    good = J.encode_jpeg(
        (np.arange(64, dtype=np.uint8)).reshape(8, 8), quality=80
    )
    if payload:
        cut = rnd.randrange(2, len(good))
        variants.append(good[:cut] + payload)
    for data in variants:
        try:
            out = J.decode_jpeg(data)
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass  # the one allowed failure mode
