"""Unit tests for operators/sampling.py: deterministic sampling + curation."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import sampling


def _docs(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
    )


def test_hash_sample_deterministic_and_bounded(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sampling.hash_sample(df, 0.5).collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(df.repartition(7), 0.5).collect()}
    assert a == b  # stable under repartitioning
    assert sampling.hash_sample(df, 1.0).count() == 100
    assert sampling.hash_sample(df, 0.0).count() == 0
    assert 20 <= len(a) <= 80  # ~50% of a uniform hash


def test_stratified_quota_per_stratum(spark):
    df = _docs(spark)  # 4 strata x 25 rows
    out = sampling.stratified_quota(df, "source", 10)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    # deterministic: same members every run
    again = sampling.stratified_quota(df.repartition(5), "source", 10)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # quota larger than stratum keeps the whole stratum
    assert sampling.stratified_quota(df, "source", 100).count() == 100


def test_weighted_sample_matches_python_reference(spark):
    """Priority sampling is a pure integer function of (key, weight):
    replay w * 2^31 // (h31(key) + 1) in Python and compare the top-n
    membership exactly; repartitioning must not change the draw."""
    import hashlib

    def h31(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 2147483647

    n_rows, top = 100, 15
    weights = {i: (i * 37) % 50 + 1 for i in range(n_rows)}
    df = spark.createDataFrame(
        [(i, weights[i]) for i in range(n_rows)], "doc_id long, w long"
    )
    want = sorted(
        range(n_rows),
        key=lambda i: (-(weights[i] * 2147483648 // (h31(i) + 1)), i),
    )[:top]
    got = {
        r.doc_id for r in sampling.weighted_sample(df, "w", top).collect()
    }
    assert got == set(want)
    again = {
        r.doc_id
        for r in sampling.weighted_sample(df.repartition(7), "w", top).collect()
    }
    assert again == set(want)


def test_weighted_sample_weight_bias_and_strata(spark):
    # weight 1000 vs weight 1: the heavy half must dominate the sample
    df = spark.createDataFrame(
        [(i, 1000 if i < 50 else 1) for i in range(100)],
        "doc_id long, w long",
    )
    heavy = sum(
        1
        for r in sampling.weighted_sample(df, "w", 20).collect()
        if r.doc_id < 50
    )
    assert heavy >= 18  # ~1000x priority scale, ties essentially impossible
    # stratified: exact quota per stratum, deterministic membership
    sdf = df.withColumn("src", (F.col("doc_id") % 2).cast("string"))
    out = sampling.weighted_sample(sdf, "w", 5, stratum_col="src")
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 5, "1": 5}


def test_curate_thresholds(spark):
    rows = [
        (1, "one two three four five"),          # 5 tokens < min -> dropped
        (2, " ".join(["word"] * 30)),            # repetition 3% -> dropped
        (3, " ".join(f"tok{i}" for i in range(30))),  # healthy -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sampling.curate(
        df, min_tokens=10, max_tokens=100,
        min_mean_token_len_x100=100, max_mean_token_len_x100=1000,
        min_repetition_x100=30,
    )
    assert [r["doc_id"] for r in kept.collect()] == [3]


def test_order_statistics_exact_ranks(spark):
    from blockchain_postgres_sync_spark.operators import stats

    # one group, values 0..99: p25 -> rank 24, p50 -> 49, p75 -> 74, p95 -> 94
    df = spark.range(100).select(
        F.lit("g").alias("source"),
        F.col("id").alias("n_chars"),
        F.col("id").alias("doc_id"),
    )
    row = stats.order_statistics(
        df, group_col="source", value_col="n_chars", order_tiebreak="doc_id"
    ).collect()[0]
    assert (row["n_docs"], row["min_n_chars"], row["max_n_chars"]) == (100, 0, 99)
    assert (row["p25_n_chars"], row["p50_n_chars"],
            row["p75_n_chars"], row["p95_n_chars"]) == (24, 49, 74, 94)


def test_order_statistics_singleton_group(spark):
    from blockchain_postgres_sync_spark.operators import stats

    df = spark.createDataFrame(
        [("g", 7, 1)], "source string, n_chars long, doc_id long"
    )
    row = stats.order_statistics(
        df, group_col="source", value_col="n_chars", order_tiebreak="doc_id"
    ).collect()[0]
    # every percentile of a singleton group is the single value
    assert (row["p25_n_chars"], row["p50_n_chars"],
            row["p75_n_chars"], row["p95_n_chars"]) == (7, 7, 7, 7)


def test_ivf_fit_trained_codebook_path(spark):
    import random

    from blockchain_postgres_sync_spark.operators import similarity

    # three well-separated 4-d blobs; k-means must recover them and the
    # fitted-codebook IVF with full probing must agree with brute force
    rng = random.Random(7)
    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [v + rng.uniform(-0.5, 0.5) for v in c]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = similarity.ivf_fit(corpus, n_centroids=3, seed=11)
    assert cents.count() == 3
    got = similarity.ivf_topk(
        corpus, queries, k=5, n_probe=3, centroids=cents
    ).select("query_id", "rank", "neighbor_id")
    want = similarity.brute_force_topk(corpus, queries, k=5).select(
        "query_id", "rank", "neighbor_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ngram_topk_count_floor_preserves_topk(spark):
    """The min_count pre-prune (the documented 100 TB vocabulary remedy)
    must not change the top-k as long as the floor sits at/below the k-th
    count — and must drop tail grams from consideration when above it."""
    from blockchain_postgres_sync_spark.operators import stats

    rows = (
        [(i, "en", "a b " * 10) for i in range(5)]          # 'a b' x50
        + [(10 + i, "en", "c d " * 3) for i in range(4)]    # 'c d' x12
        + [(20 + i, "en", f"rare{i} tail") for i in range(6)]  # singletons
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    base = [
        (r["gram"], r["n_occurrences"], r["rank"])
        for r in stats.ngram_topk(df, n=2, k=2).orderBy("rank").collect()
    ]
    floored = [
        (r["gram"], r["n_occurrences"], r["rank"])
        for r in stats.ngram_topk(df, n=2, k=2, min_count=2)
        .orderBy("rank").collect()
    ]
    assert floored == base and len(base) == 2
    # floor above the k-th count: the pruned tail can no longer fill k slots
    high = stats.ngram_topk(df, n=2, k=5, min_count=10).collect()
    assert all(r["n_occurrences"] >= 10 for r in high)


def test_salient_terms_semantics(spark):
    """Pins the salience contract: df counts documents (not occurrences),
    score = tf*1e6 // df, ranks break ties (score desc, term asc), rarer
    terms beat common ones at equal tf."""
    from blockchain_postgres_sync_spark.operators import stats

    rows = [
        (1, "common rare common unique"),
        (2, "common filler filler"),
        (3, "common rare"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score_x1m"])
        for r in stats.salient_terms(df, top=2).collect()
    }
    # doc 1: 'unique' df=1 tf=1 -> 1e6; 'common' tf=2 df=3 -> 666666;
    # 'rare' tf=1 df=2 -> 500000: top-2 = unique, common
    assert out[(1, 1)] == ("unique", 1, 1, 1_000_000)
    assert out[(1, 2)] == ("common", 2, 3, 666_666)
    # doc 2: 'filler' tf=2 df=1 -> 2e6 beats 'common' tf=1 df=3
    assert out[(2, 1)][0] == "filler" and out[(2, 1)][3] == 2_000_000
    # doc 3: equal score tie ('common' tf1/df3=333333 vs 'rare' tf1/df2=500000)
    assert out[(3, 1)][0] == "rare"


def test_dataset_split_deterministic_and_stable(spark):
    """Split assignment is a pure function of the key: identical across
    repartitioning, and adding rows never reassigns existing ones."""
    from blockchain_postgres_sync_spark.operators.sampling import dataset_split

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs.repartition(13)).collect()
    }
    assert a == b
    # growth stability: the first 250 keys keep their assignment
    small = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs.filter("doc_id < 250")).collect()
    }
    assert small == {k: v for k, v in a.items() if k < 250}
    # all three bands hit at this size, fractions in the right ballpark
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dataset_split(docs, val_frac=0.6, test_frac=0.5)


def test_unigram_logprob_exact_costs(spark):
    """Per-token integer surprisal and per-doc sums recomputed in pure
    python; also pins that rarer tokens cost more and a uniform doc's mean
    equals its tokens' shared cost."""
    import math

    from blockchain_postgres_sync_spark.operators.stats import unigram_logprob

    docs = [(1, "a a b"), (2, "b c"), (3, "a c c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts: dict[str, int] = {}
    for _, t in docs:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    n = float(sum(counts.values()))
    cost = {t: math.floor(math.log(n / c) * 1000.0) for t, c in counts.items()}
    expected = {}
    for i, t in docs:
        toks = t.split(" ")
        s = sum(cost[x] for x in toks)
        expected[i] = (len(toks), s, s // len(toks))

    for bcast in (True, False):
        out = {
            r.doc_id: (r.n_tokens, r.cost_x1000, r.avg_cost_x1000)
            for r in unigram_logprob(df, broadcast_model=bcast).collect()
        }
        assert out == expected
    # rarer token costs strictly more: b (count 2) vs a/c (count 3)
    assert cost["b"] > cost["a"] == cost["c"]


def test_bigram_logprob_exact_costs(spark):
    """Bigram costs recomputed in pure python: cost = floor(1000 *
    ln(c(w1)/c(w1 w2))); word-salad scores above natural ordering; a
    single-token doc is absent."""
    import math

    from blockchain_postgres_sync_spark.operators.stats import bigram_logprob

    docs = [(1, "a b a b a b"), (2, "b a"), (3, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uni: dict[str, int] = {}
    bg: dict[tuple, int] = {}
    for _, t in docs:
        toks = t.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(toks, toks[1:]):
            bg[(x, y)] = bg.get((x, y), 0) + 1
    cost = {
        p: math.floor(math.log(uni[p[0]] / c) * 1000.0) for p, c in bg.items()
    }
    expected = {}
    for i, t in docs:
        toks = t.split(" ")
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        s = sum(cost[p] for p in pairs)
        expected[i] = (len(pairs), s, s // len(pairs))

    for bcast in (True, False):
        out = {
            r.doc_id: (r.n_bigrams, r.cost_x1000, r.avg_cost_x1000)
            for r in bigram_logprob(df, broadcast_model=bcast).collect()
        }
        assert out == expected
    assert 3 not in expected  # single token: no transition evidence


def test_mixture_plan_caps_and_epochs(spark):
    # budget 120 over 2 sources -> 60 planned each; "big" holds 100 tokens
    # (rate 60%), "small" holds 10 (needs 6 epochs, rate capped at 100%)
    rows = [("big", "w " * 99 + "w")] * 1 + [("small", "w " * 9 + "w")]
    df = spark.createDataFrame(
        [(s, t.strip()) for s, t in rows], "source string, text string"
    )
    from blockchain_postgres_sync_spark.operators.sampling import mixture_plan

    out = {r.source: r for r in mixture_plan(df, token_budget=120).collect()}
    assert out["big"].n_tokens == 100 and out["big"].planned_tokens == 60
    assert out["big"].sample_rate_x1m == 600000
    assert out["big"].epochs_x100 == 60
    assert out["small"].n_tokens == 10
    assert out["small"].sample_rate_x1m == 1000000  # capped at 1.0
    assert out["small"].epochs_x100 == 600  # must repeat 6x to fill quota


def test_leakage_safe_split_colocates_clusters(spark):
    from blockchain_postgres_sync_spark.operators.sampling import (
        dataset_split, leakage_safe_split,
    )

    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    # clusters: {0..9} -> 0, {100..104} -> 100; everything else unclustered
    members = list(range(10)) + list(range(100, 105))
    clusters = spark.createDataFrame(
        [(m, 0 if m < 10 else 100) for m in members],
        "doc_id long, cluster_id long",
    )
    out = leakage_safe_split(docs, clusters).collect()
    by_doc = {r.doc_id: r.split for r in out}
    assert len({by_doc[m] for m in range(10)}) == 1
    assert len({by_doc[m] for m in range(100, 105)}) == 1
    # cluster members inherit the split of their min-member id
    base = {r.doc_id: r.split for r in dataset_split(docs).collect()}
    assert by_doc[5] == base[0] and by_doc[104] == base[100]
    # unclustered docs keep exactly their dataset_split assignment
    for d in (50, 250, 399):
        assert by_doc[d] == base[d]


def test_dsir_weights_separates_domains(spark):
    """DSIR importance: docs from the target vocabulary must outscore docs
    from the raw vocabulary, with a mixed doc in between; scores are
    deterministic (re-run identical)."""
    from blockchain_postgres_sync_spark.operators.sampling import dsir_weights

    target_text = "alpha beta gamma delta alpha beta gamma delta"
    raw_text = "one two three four one two three four"
    rows = (
        [(i, target_text, True) for i in range(5)]
        + [(10 + i, raw_text, False) for i in range(5)]
        # unlabeled docs to score: pure-target-, pure-raw-, mixed-vocab
        + [(20, target_text, False), (21, raw_text, True),
           (22, "alpha beta one two alpha beta one two", False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r["doc_id"]: r["importance_x1000"]
        for r in dsir_weights(df, "is_t", n_buckets=1000).collect()
    }
    # doc 20 (target vocab) must outrank doc 22 (mixed) which outranks
    # doc 21 (raw vocab) — the resampling order DSIR needs
    assert out[20] > out[22] > out[21]
    out2 = {
        r["doc_id"]: r["importance_x1000"]
        for r in dsir_weights(df, "is_t", n_buckets=1000).collect()
    }
    assert out == out2


def test_difficulty_buckets_point_mass_exact_and_banded(spark):
    """difficulty_buckets_from_scores under a POINT-MASS score (every doc
    in a language shares one score — the distribution that collapsed the
    round-8 (lang, score) window partition to a single sorting task):
    buckets must still be EXACT ntile(3)-over-(score, doc_id), and the
    rank window must key on the monotone _band so the run splits across
    ~`bands` partitions.  Also covers sparse/non-dense doc_ids and a
    straddling multi-score group."""
    from blockchain_postgres_sync_spark.operators.stats import (
        difficulty_buckets_from_scores,
    )

    rows = []
    # lang A: point mass — 100 docs, all score 50, sparse ids
    ids_a = [i * 37 + 5 for i in range(100)]
    rows += [(i, "A", 50) for i in ids_a]
    # lang B: two runs straddling both cuts (7 docs: 4 at 10, 3 at 20)
    ids_b = [1000 + i for i in range(7)]
    rows += [(i, "B", 10) for i in ids_b[:4]]
    rows += [(i, "B", 20) for i in ids_b[4:]]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality_x100 int")
    out = difficulty_buckets_from_scores(df, bands=8)
    got = {(r.lang, r.doc_id): r.bucket for r in out.collect()}

    def ntile3(ids):
        n = len(ids)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if b < extra else 0) for b in range(3)]
        want, i = {}, 0
        for b, sz in enumerate(sizes, start=1):
            for _ in range(sz):
                want[ids[i]] = b
                i += 1
        return want

    for lang, ids in (("A", sorted(ids_a)), ("B", sorted(ids_b))):
        # order within a lang is (score, doc_id); B's ids are already
        # score-ordered by construction
        want = ntile3(ids)
        for did, b in want.items():
            assert got[(lang, did)] == b, (lang, did, got[(lang, did)], b)

    # the rank window partitions by (lang, score, _band), never by
    # (lang, score) alone over corpus rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(
        r"row_number\(\) windowspecdefinition\(lang#\d+\w*, quality_x100#\d+\w*, _band",
        plan,
    ), plan
