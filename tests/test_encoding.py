"""Token dictionary encoding and approx-percentile gate tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.encoding import (
    build_vocab,
    encode_docs,
)
from blockchain_postgres_sync_spark.operators.packing import (
    quality_approx_gate,
    quality_percentile_gate,
)

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog sat", "en"),
    (3, "a rare token", "en"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_build_vocab_rank_order(spark):
    v = {
        r["token"]: (r["token_id"], r["count"])
        for r in build_vocab(_docs(spark)).collect()
    }
    # 'the' appears 3x -> id 0; 'sat' 2x -> id 1; singletons ranked by token asc
    assert v["the"] == (0, 3)
    assert v["sat"] == (1, 2)
    singles = sorted(t for t, (i, c) in v.items() if c == 1)
    ids = [v[t][0] for t in singles]
    assert ids == sorted(ids)  # alphabetical among equal counts


def test_encode_roundtrip_and_oov(spark):
    docs = _docs(spark)
    vocab = build_vocab(docs, min_count=2)  # only 'the' and 'sat' survive
    v = {r.token: r.token_id for r in vocab.collect()}
    enc = {r.doc_id: (r.n_tokens, r.token_ids) for r in encode_docs(docs, vocab).collect()}
    assert enc[2][0] == 3
    assert enc[2][1] == [v["the"], -1, v["sat"]]
    # doc order preserved: first and fifth token of doc 1 are 'the'
    assert enc[1][1][0] == v["the"] and enc[1][1][4] == v["the"]
    # every doc encoded, every position present
    for doc_id, text, _ in DOCS:
        assert enc[doc_id][0] == len(text.split(" ")) == len(enc[doc_id][1])


def test_encode_repartition_invariant(spark):
    docs = _docs(spark)
    vocab = build_vocab(docs)
    a = {r.doc_id: r.token_ids for r in encode_docs(docs, vocab).collect()}
    b = {
        r.doc_id: r.token_ids
        for r in encode_docs(docs.repartition(7), vocab).collect()
    }
    assert a == b


def test_approx_gate_tracks_exact_gate(spark):
    """The sketch-threshold gate must keep ~the same fraction as the exact
    percent_rank gate on a real table (boundary raggedness only)."""
    from blockchain_postgres_sync_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
    )
    exact = quality_percentile_gate(docs, keep_frac=0.5).count()
    approx = quality_approx_gate(docs, keep_frac=0.5).count()
    total = docs.count()
    assert abs(approx - exact) / total < 0.05


def test_approx_cardinality_tracks_exact(spark):
    """SCALE.md's 100 TB posture claim for corpus_cardinality — swap exact
    multi-distinct for approx_count_distinct (mergeable HLL partials), same
    query shape — verified: the sketch stays within its documented rsd of
    the exact counts on the real table."""
    from blockchain_postgres_sync_spark.functions import text as T
    from blockchain_postgres_sync_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "lang", F.md5("text").alias("digest"), "doc_id",
        F.explode(T.tokens(F.col("text"))).alias("tok"),
    )
    exact = {
        r.lang: r
        for r in toks.groupBy("lang").agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("tok").alias("n_distinct_tokens"),
        ).collect()
    }
    approx = {
        r.lang: r
        for r in toks.groupBy("lang").agg(
            F.approx_count_distinct("doc_id", rsd=0.02).alias("n_docs"),
            F.approx_count_distinct("tok", rsd=0.02).alias("n_distinct_tokens"),
        ).collect()
    }
    for lang, e in exact.items():
        a = approx[lang]
        assert abs(a.n_docs - e.n_docs) <= max(0.06 * e.n_docs, 2)
        assert abs(a.n_distinct_tokens - e.n_distinct_tokens) <= max(
            0.06 * e.n_distinct_tokens, 2
        )


def test_build_vocab_two_phase_distributed(spark):
    """Round-3 verdict item 2: the id rank must not serialize the vocabulary
    into one partition.  Pins (a) exact parity with a driver-side
    (count desc, token asc) dense rank on a multi-partition vocabulary, and
    (b) that no Window in the executed plan runs over token rows — the only
    permitted Window is the offsets prefix-sum over the per-partition sizes
    frame (≤ rank_partitions rows, bounded by config, never by data)."""
    # 500 distinct tokens with many count ties (count = i // 7) to stress
    # the tie-break ordering across range-partition boundaries
    rows = [(i, " ".join(f"tok{j:03d}" for j in range(i % 37, 500, 37)))
            for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    vocab = build_vocab(docs, rank_partitions=4)
    got = [(r["token"], r["token_id"], r["count"]) for r in vocab.collect()]
    by_rank = sorted(got, key=lambda t: (-t[2], t[0]))
    assert [t[1] for t in by_rank] == list(range(len(got)))  # dense, exact
    assert len(got) == len({t[0] for t in got})
    # the token rank itself is window-free: any Window node may only touch
    # the sizes-frame columns (_pid/_n/_off), never the token/count rows
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "token" not in line and "_lix" not in line, line
    # the ranked/numbered stage really is spread over >1 partition
    counts = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token").count()
    )
    n_used = (
        counts.repartitionByRange(4, F.col("count").desc(), F.col("token"))
        .select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_used > 1


def test_encode_shuffle_join_matches_broadcast(spark):
    """broadcast_vocab=False (the past-broadcast-size vocabulary path) must
    produce identical encodings through the shuffle join."""
    docs = _docs(spark)
    vocab = build_vocab(docs)
    a = {r.doc_id: r.token_ids for r in encode_docs(docs, vocab).collect()}
    b = {
        r.doc_id: r.token_ids
        for r in encode_docs(docs, vocab, broadcast_vocab=False).collect()
    }
    assert a == b


def test_tfidf_vectorize_exact(spark):
    """Weights recomputed in pure python over a hand corpus: tf*1e6//df,
    ids from the (count desc, token) vocab rank, arrays ordered by id,
    sub-min_count tokens dropped."""
    from blockchain_postgres_sync_spark.operators.encoding import (
        build_vocab,
        tfidf_vectorize,
    )

    docs = [(1, "a a b c"), (2, "a b b"), (3, "c rare")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    outs = [
        {
            r.doc_id: (list(r.token_ids), list(r.weights_x1m), r.n_terms)
            for r in tfidf_vectorize(
                df, min_count=2, broadcast_model=bcast
            ).collect()
        }
        for bcast in (True, False)
    ]
    assert outs[0] == outs[1]  # shuffle-join model path agrees
    out = outs[0]
    vocab = {
        r.token: r.token_id for r in build_vocab(df, min_count=2).collect()
    }
    # corpus counts: a=3, b=3, c=2, rare=1(dropped) -> ids a=0, b=1, c=2
    assert vocab == {"a": 0, "b": 1, "c": 2}
    # df: a in docs {1,2}=2, b in {1,2}=2, c in {1,3}=2
    assert out[1] == ([0, 1, 2], [2 * 10**6 // 2, 10**6 // 2, 10**6 // 2], 3)
    assert out[2] == ([0, 1], [10**6 // 2, 2 * 10**6 // 2], 2)
    assert out[3] == ([2], [10**6 // 2], 1)  # 'rare' dropped (min_count)


def test_tfidf_rerank_exact_dot(spark):
    """Dot/cosine recomputed in pure python; OOV-only pairs drop; map
    lookup only counts shared tokens."""
    from blockchain_postgres_sync_spark.operators.encoding import (
        tfidf_rerank,
        tfidf_vectorize,
    )

    docs = [(1, "a a b c"), (2, "a b b"), (3, "c rare"), (4, "rare only")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vectors = tfidf_vectorize(df, min_count=2)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    # vocab (cnt>=2): a=3, b=3, c=2, rare=2 -> weights w = tf*1e6//df
    # df: a {1,2}, b {1,2}, c {1,3}, rare {3,4}
    w = {
        1: {"a": 2 * 10**6 // 2, "b": 10**6 // 2, "c": 10**6 // 2},
        2: {"a": 10**6 // 2, "b": 2 * 10**6 // 2},
        3: {"c": 10**6 // 2, "rare": 10**6 // 2},
        4: {"rare": 10**6 // 2},
    }
    import math

    def expect(a, b):
        dot = sum(w[a][t] * w[b][t] for t in set(w[a]) & set(w[b]))
        na = math.sqrt(float(sum(x * x for x in w[a].values())))
        nb = math.sqrt(float(sum(x * x for x in w[b].values())))
        return dot, math.floor(float(dot) * 1e6 / (na * nb))

    out = {
        (r.id_a, r.id_b): (r.dot_w2, r.cos_x1m)
        for r in tfidf_rerank(pairs, vectors).collect()
    }
    assert out == {(1, 2): expect(1, 2), (1, 3): expect(1, 3),
                   (3, 4): expect(3, 4)}


# ------------------------------------------------------------------ bm25


def _bm25_py(docs, terms, k1_x10=12, b_x100=75):
    """Plain-python replay of the bm25_topk integer spec (independent of
    both the Spark and the DuckDB implementations)."""
    import math

    toks = {d: t.split(" ") for d, t in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs, n_toks = len(toks), sum(dl.values())
    out = {}
    idf = {}
    for t in terms:
        df = sum(1 for ts in toks.values() if t in ts)
        idf[t] = math.floor(
            1000.0 * math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        )
    q, r = divmod(1000 * n_docs, n_toks)
    for d, ts in toks.items():
        ratio = dl[d] * q + (dl[d] * r) // n_toks
        k1term = (k1_x10 * ((1000 - 10 * b_x100) + (b_x100 * ratio) // 100)) // 10
        score, matched = 0, 0
        for t in terms:
            tf = ts.count(t)
            if tf:
                matched += 1
                score += idf[t] * (
                    (tf * (k1_x10 + 10) * 100000) // (1000 * tf + k1term)
                )
        if matched:
            out[d] = (dl[d], matched, score // 1000)
    return out


BM25_DOCS = [
    (1, "cat cat cat cat dog"),          # high tf, short doc
    (2, "cat dog bird fish mouse horse cow sheep goat pig hen duck"),
    (3, "bird bird bird"),               # matches one rare-ish term only
    (4, "fish mouse horse cow sheep"),   # no query term
    (5, "cat dog cat dog cat dog cat dog cat dog cat dog cat dog"),
    (6, "dog"),                          # minimal doc
]


def test_bm25_topk_matches_python_replay(spark):
    from blockchain_postgres_sync_spark.operators.encoding import bm25_topk

    terms = ["cat", "dog", "bird"]
    docs = spark.createDataFrame(BM25_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dl"], r["n_matched_terms"], r["score_x1000"])
        for r in bm25_topk(docs, terms, k=10).collect()
    }
    assert got == _bm25_py(BM25_DOCS, terms)


def test_bm25_topk_k_and_tiebreak(spark):
    """k cuts the frontier after the (score desc, doc_id asc) total order,
    and docs with zero matched terms never appear."""
    from blockchain_postgres_sync_spark.operators.encoding import bm25_topk

    terms = ["cat", "dog", "bird"]
    docs = spark.createDataFrame(BM25_DOCS, ["doc_id", "text"])
    rows = bm25_topk(docs, terms, k=3).collect()
    ref = _bm25_py(BM25_DOCS, terms)
    order = sorted(ref, key=lambda d: (-ref[d][2], d))[:3]
    assert [r["doc_id"] for r in rows] == order
    assert 4 not in {r["doc_id"] for r in rows}


def test_bm25_topk_all_docs_term_scores_zero_but_matches(spark):
    """A term present in EVERY document floors to idf 0 (ln(1+eps)) once the
    corpus is large enough; the doc still counts as matched."""
    from blockchain_postgres_sync_spark.operators.encoding import bm25_topk

    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 600)], ["doc_id", "text"]
    )
    rows = bm25_topk(docs, ["common"], k=5).collect()
    assert len(rows) == 5
    assert all(r["n_matched_terms"] == 1 for r in rows)
    assert all(r["score_x1000"] == 0 for r in rows)
    # ties broken by ascending doc_id
    assert [r["doc_id"] for r in rows] == [1, 2, 3, 4, 5]


def test_rank_vocab_driver_path_matches_distributed(spark):
    """Round-10 fast path: the driver-side rank (bounded vocab collected
    once) assigns exactly the ids of the distributed two-phase rank, with
    extras carried through identically."""
    from blockchain_postgres_sync_spark.operators.encoding import rank_vocab

    counts = spark.createDataFrame(
        [(f"t{i % 37:02d}x{i}", (i * 7) % 11 + 1, i % 5) for i in range(200)],
        "token string, count long, _df long",
    )
    fast = {
        r["token"]: (r["token_id"], r["count"], r["_df"])
        for r in rank_vocab(counts).collect()
    }
    dist = {
        r["token"]: (r["token_id"], r["count"], r["_df"])
        for r in rank_vocab(counts, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) == 200


def test_rerank_kernel_hof_parity(spark):
    """tfidf_rerank's Arrow merge-intersection kernel (round-10) must be
    row- and value-identical to the map_from_arrays expression form it
    replaced (tfidf_rerank_hof) — same int64 dot, same float64 cosine
    expression — including no-overlap pairs (dropped by both) and pairs
    where one side has a single term."""
    from blockchain_postgres_sync_spark.operators.encoding import (
        tfidf_rerank,
        tfidf_rerank_hof,
        tfidf_vectorize,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vectors = tfidf_vectorize(docs, min_count=2)
    ids = [r.doc_id for r in docs.select("doc_id").limit(30).collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a in ids[:15] for b in ids[15:]],
        "id_a long, id_b long",
    )
    kern = {
        (r.id_a, r.id_b): (r.dot_w2, r.cos_x1m)
        for r in tfidf_rerank(pairs, vectors).collect()
    }
    hof = {
        (r.id_a, r.id_b): (r.dot_w2, r.cos_x1m)
        for r in tfidf_rerank_hof(pairs, vectors).collect()
    }
    assert kern == hof and len(kern) > 0


def test_rerank_kernel_wide_id_guard(spark):
    """Token ids outside [0, 2^32) must raise loudly in the kernel path
    (the row-offset key packing would silently corrupt matches) and the
    error must point at tfidf_rerank_hof."""
    import pytest

    from blockchain_postgres_sync_spark.operators.encoding import (
        tfidf_rerank,
    )

    vectors = spark.createDataFrame(
        [(1, [1 << 33], [10]), (2, [1 << 33], [10])],
        "doc_id long, token_ids array<long>, weights_x1m array<long>",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(Exception, match="tfidf_rerank_hof"):
        tfidf_rerank(pairs, vectors).collect()
