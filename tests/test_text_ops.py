"""Unit tests for language-ID, rolling fingerprints, simhash, and
embedding near-dup pairs (the operator-level contracts behind the
lang_id / doc_fingerprint / dedup_simhash / dedup_embedding catalog
entries)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.functions import text as T
from blockchain_postgres_sync_spark.operators import dedup


def _fp_expected(text: str) -> int:
    acc = 0
    for tok in text.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        acc = (acc * T.FP_BASE + h) % T.FP_MOD
    return acc


def test_rolling_fingerprint_known_value(spark):
    df = spark.createDataFrame([("a b c",), ("hello world",)], ["text"])
    rows = df.select(T.rolling_fingerprint(F.col("text")).alias("fp")).collect()
    assert [r.fp for r in rows] == [_fp_expected("a b c"), _fp_expected("hello world")]


def test_language_id_votes_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "the der der und x"),   # de=3 beats en=1
            (2, "the und"),             # tie en=1/de=1 -> lexicographically-last lang wins
            (3, "xyzzy plugh"),         # no hits -> unknown
        ],
        ["doc_id", "text"],
    )
    pred, score = T.language_id(F.col("text"))
    out = {r.doc_id: (r.p, r.s) for r in
           df.select("doc_id", pred.alias("p"), score.alias("s")).collect()}
    assert out[1] == ("de", 3)
    assert out[2] == ("en", 1)  # max on (score, lang): 'en' > 'de'
    assert out[3] == ("unknown", 0)


def test_simhash_single_token_equals_hash_bits(spark):
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    got = dedup.simhash64(df).collect()[0].simhash60
    assert got == int(hashlib.md5(b"solo").hexdigest()[:15], 16)


def test_embedding_neardup_pairs_threshold(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),   # identical to 1 -> cosine 1.0
        (3, [0.0, 1.0]),   # orthogonal -> cosine 0.0, filtered
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.embedding_neardup_pairs(df, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.cos_x1000) for r in out] == [(1, 2, 1000)]


def test_duplicate_clusters_path_and_island(spark):
    # path 1-2-3-4 (forces multi-round contraction) + island 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_duplicate_clusters_driver_path_releases_persist(spark):
    """The driver union-find path must unpersist its candidate-pair frame
    BEFORE returning: its result is driver-built and never reads the
    persist, while a lingering InMemoryRelation substitutes into every
    later same-session plan containing the pair subtree (cache-manager
    match is by logical plan), breaking exchange reuse there — the
    round-10 tfidf_rerank double-minhash regression."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    dedup.duplicate_clusters(pairs).collect()
    assert not dedup._CLUSTER_CACHE
    # the pair subtree must NOT resolve to a cached relation afterwards
    plan = pairs.select("id_a", "id_b")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" not in plan
    # distributed path keeps its (documented) lazy release: the returned
    # frame reads the persisted node set
    dedup.duplicate_clusters(pairs, collect_threshold=0).collect()
    assert dedup._CLUSTER_CACHE


def test_duplicate_clusters_distributed_path(spark):
    # collect_threshold=0 forces the iterative min-label contraction loop;
    # must agree with the union-find fast path on a multi-round graph
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(pairs, collect_threshold=0).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_duplicate_clusters_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.duplicate_clusters(pairs).count() == 0


def test_ngram_jaccard_max_postings_cap(spark):
    # docs share the stop-shingle "a b c" (all 3) plus a pair-specific one;
    # capping postings at 2 drops the stop-shingle, lowering (never raising)
    # scores.
    rows = [
        (1, "a b c x y z"),
        (2, "a b c x y z"),
        (3, "a b c q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r.id_a, r.id_b): r.jaccard_x100
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard_x100
        for r in dedup.ngram_jaccard_pairs(
            df, threshold=0.0, max_postings=2
        ).collect()
    }
    assert set(capped) <= set(full)
    for pair, score in capped.items():
        assert score <= full[pair]
    # the identical pair keeps its pair-specific shingles
    assert (1, 2) in capped and capped[(1, 2)] < full[(1, 2)] == 100


def test_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, source string"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "doc_id long, cluster_id long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup.keep_representatives(docs, clusters).collect()
    )
    # 0 unclustered; 1 and 4 are representatives; 2,3,5 dropped
    assert kept == [0, 1, 4]


def test_embedding_neardup_grid_matches_exact(spark):
    """Block-grid distributed kernel == exact all-pairs baseline, pair for
    pair and score for score (bit-identical fold order), on real vectors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos_x1000
        for r in dedup.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    grid = {
        (r.id_a, r.id_b): r.cos_x1000
        for r in dedup.embedding_neardup_pairs_grid(
            emb, threshold=0.4, n_blocks=5
        ).collect()
    }
    assert grid == exact and len(grid) > 0


def test_pii_redaction_and_counts(spark):
    """Real-PII fixture strings: counts find every planted item and the
    redacted text masks them all (the corpus oracle only proves the
    zero-match case, so the positive path is pinned here)."""
    from blockchain_postgres_sync_spark.functions import pii

    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or call +14155552671"),
        (2, "server at 192.168.0.1 logged bob@corp.io twice 10.0.0.255"),
        (3, "phones: 415-555-2671 and +442071838750 end"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = pii.pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            pii.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 0)
    assert (out[2].n_emails, out[2].n_ips) == (1, 2)
    assert (out[3].n_phones, out[3].n_emails) == (2, 0)
    assert (out[4].n_emails, out[4].n_phones, out[4].n_ips) == (0, 0, 0)
    assert out[1].red == "contact me at <EMAIL> or call <PHONE>"
    assert out[2].red == "server at <IP> logged <EMAIL> twice <IP>"
    assert out[3].red == "phones: <PHONE> and <PHONE> end"
    assert out[4].red == "no pii here at all"


def test_contamination_direct(spark):
    """A corpus doc that quotes a benchmark doc verbatim scores 100;
    a disjoint doc does not appear."""
    from blockchain_postgres_sync_spark.operators import contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "bench_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),       # verbatim: 100
            (2, "alpha beta gamma zeta eta theta iota"), # partial overlap
            (3, "one two three four five six"),          # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination.benchmark_contamination(
            corpus, bench, shingle_size=3
        ).collect()
    }
    assert out[1].containment_x100 == 100 and out[1].bench_id == 100
    # doc 2: shingles = 5, shared = 1 ("alpha beta gamma") -> 20
    assert out[2].containment_x100 == 20
    assert 3 not in out


def test_embedding_neardup_blocked_delegates_above_threshold(spark):
    """Round-3 verdict item 4: the broadcast kernel must never collect a
    corpus larger than its threshold — above it the call delegates to the
    distributed grid kernel, producing the same pairs and scores."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    small = {
        (r.id_a, r.id_b): r.cos_x1000
        for r in dedup.embedding_neardup_pairs_blocked(
            emb, threshold=0.4
        ).collect()
    }
    # force delegation: threshold below the table size
    n = emb.count()
    delegated = dedup.embedding_neardup_pairs_blocked(
        emb, threshold=0.4, broadcast_threshold=n - 1
    )
    got = {(r.id_a, r.id_b): r.cos_x1000 for r in delegated.collect()}
    assert got == small and len(got) > 0
    # the delegated plan is the grid kernel's (per-cell applyInPandas), not
    # the broadcast mapInPandas kernel
    plan = delegated._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_split_decontamination_counts_holdout_overlap(spark):
    """Train docs sharing shingles with val/test docs (under the SAME
    hash-band split as dataset_split) are flagged with exact counts;
    fully-novel train docs are absent.  Expected values are recomputed in
    pure python from the operator's own split assignment, so the test pins
    the overlap arithmetic, not the hash bands (those are pinned by
    test_sampling.py)."""
    from blockchain_postgres_sync_spark.operators import contamination, sampling

    texts = {
        i: f"w{i} x{i} y{i} z{i} shared alpha beta gamma t{i}"
        if i % 2 == 0
        else f"a{i} b{i} c{i} d{i} e{i} f{i} g{i}"
        for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    split = {
        r.doc_id: r.split
        for r in sampling.dataset_split(df, val_frac=0.3, test_frac=0.3).collect()
    }
    assert {"train", "val", "test"} <= set(split.values())

    def shingles(t):
        toks = t.split(" ")
        if len(toks) < 3:
            return {t}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    holdout = set().union(
        *(shingles(texts[i]) for i in texts if split[i] != "train")
    )
    expected = {}
    for i in texts:
        if split[i] != "train":
            continue
        sh = shingles(texts[i])
        shared = len(sh & holdout)
        if shared:
            expected[i] = (len(sh), shared, shared * 100 // len(sh))

    out = {
        r.doc_id: (r.n_shingles, r.n_holdout_shared, r.overlap_x100)
        for r in contamination.split_decontamination(
            df, val_frac=0.3, test_frac=0.3
        ).collect()
    }
    assert out == expected


def test_quality_score_tiers_and_components(spark):
    """A natural-language doc tiers high; repeated-char junk tiers low with
    the entropy/repetition components explaining why."""
    good = (
        "the quick brown fox jumps over the lazy dog and then runs to the "
        "river where it drinks water and rests in the shade of a tall tree "
        "before walking home in the evening light"
    )
    junk = "z " * 30
    df = spark.createDataFrame([(1, good), (2, junk.strip())], "doc_id long, text string")
    qs = T.quality_score(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[c.alias(n) for n, c in qs.items()]).collect()
    }
    g, j = out[1], out[2]
    assert g.tier == "high" and g.s_tokens == 100 and g.s_stopword == 100
    assert j.tier == "low"
    assert j.s_repetition <= 5           # 1 distinct / 30 tokens
    assert j.s_mtl == 0                  # 1.0 chars/token: out of band
    assert j.s_entropy <= 25             # near-zero char entropy
    assert g.quality_x100 > j.quality_x100


def test_normalize_text_messy_inputs_match_duckdb(spark):
    """Control chars strip, whitespace runs collapse, trim + lowercase —
    verified against the DuckDB oracle expression on inputs the clean
    testdata never exercises."""
    import duckdb

    messy = [
        (1, "  Hello\t\tWORLD \x00\x1f!  "),
        (2, "a\nb\r\nc"),
        (3, "\x7fMiXeD   Case\x0b"),
        (4, ""),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(messy, "doc_id long, text string")
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", T.normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", messy)
    want = dict(con.execute(r"""
        SELECT doc_id, lower(trim(regexp_replace(
            regexp_replace(text, '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
            '[ \t\n\r]+', ' ', 'g'))) FROM t""").fetchall())
    assert got == want
    assert got[1] == "hello world !"
    assert got[3] == "mixed case"


def test_source_overlap_unordered_and_normalized(spark):
    """Source pairs are unordered (least/greatest), the diagonal is
    intra-source, and the rate normalizes by the SMALLER source."""
    from blockchain_postgres_sync_spark.operators.contamination import (
        source_overlap,
    )

    docs = spark.createDataFrame(
        [(1, "big"), (2, "big"), (3, "big"), (4, "small"), (5, "small")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(4, 1), (2, 5), (1, 2)], "id_a long, id_b long"
    )
    out = {
        (r.source_a, r.source_b): (r.n_pairs, r.n_docs_a, r.n_docs_b, r.rate_x1m)
        for r in source_overlap(pairs, docs).collect()
    }
    # (4,1) and (2,5) both collapse to (big, small); (1,2) is intra-big
    assert out[("big", "small")] == (2, 3, 2, 1_000_000)  # 2 pairs / min=2
    assert out[("big", "big")] == (1, 3, 3, 333_333)


def test_boilerplate_scrub_drops_hot_spans_keeps_tail(spark):
    # "a b c" occurs in docs 1+2; "q r s" occurs 3x (once in 2, twice in 3
    # — within-doc repeats count toward the global threshold).
    rows = [
        (1, "a b c d e f x"),
        (2, "a b c q r s"),
        (3, "q r s q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.boilerplate_scrub(df, span_tokens=3, min_count=2).collect()
    }
    assert out[1].clean_text == "d e f x"  # tail token survives
    assert (out[1].n_spans, out[1].n_dropped) == (2, 1)
    assert out[2].clean_text == ""
    assert (out[2].n_spans, out[2].n_dropped) == (2, 2)
    assert out[3].clean_text == ""
    assert (out[3].n_spans, out[3].n_dropped) == (2, 2)
    # a threshold nothing reaches leaves every document intact
    intact = {
        r.doc_id: r.clean_text
        for r in dedup.boilerplate_scrub(df, span_tokens=3, min_count=4).collect()
    }
    assert intact == {1: "a b c d e f x", 2: "a b c q r s", 3: "q r s q r s"}


def test_incremental_lsh_matches_tiebreak_and_miss(spark):
    index = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta eta theta"),
            (12, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (20, "alpha beta gamma delta epsilon zeta eta theta"),
            (21, "red orange yellow green blue indigo violet ultraviolet"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.incremental_lsh_matches(incoming, index).collect()
    }
    # identical text -> full signature agreement; tie between index docs
    # 10 and 11 resolves to the smaller id
    assert out[20].index_id == 10 and out[20].agree_x100 == 100
    # nothing in the index shares a band bucket with doc 21
    assert 21 not in out


def test_incremental_lsh_matches_string_ids(spark):
    """The id column is generic: a STRING doc_id corpus must work and
    tie-break to the lexicographically smallest index id (the round-6
    advice flagged the old unary-negation tie-break as numeric-only)."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    index = spark.createDataFrame(
        [("idx-b", text), ("idx-a", text), ("other", "one two three four")],
        "doc_id string, text string",
    )
    incoming = spark.createDataFrame(
        [("new-1", text)], "doc_id string, text string"
    )
    out = {
        r.doc_id: r
        for r in dedup.incremental_lsh_matches(incoming, index).collect()
    }
    assert out["new-1"].index_id == "idx-a"
    assert out["new-1"].agree_x100 == 100


def test_bigram_lift_hand_computed(spark):
    """Known corpus: 'a b' occurs 5x adjacent, c_a = c_b = 6 (one extra
    occurrence each away from the pair), filler tokens keep other pairs
    under the min_pair floor.  lift = 5 * 1e9 // 36."""
    from blockchain_postgres_sync_spark.operators.stats import bigram_lift

    docs = spark.createDataFrame(
        [
            (1, "a b f1 a b"),
            (2, "a b f2 a b"),
            (3, "a b f3 b a"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.tok_x, r.tok_y): (r.n_pair, r.lift_x1e9)
        for r in bigram_lift(docs, min_pair=5, top=10).collect()
    }
    # c_a = c_b = 6; 'a b' adjacent 5x ('b a' in doc 3 breaks the 6th)
    assert out == {("a", "b"): (5, 5 * 10**9 // 36)}


def test_repeated_spans_hand_computed(spark):
    """Docs 1 and 2 share the run 'a b c d' (two overlapping 3-grams);
    doc 3 is disjoint.  The maximal merged span is reported once per doc
    with 1-based start; short docs (< k tokens) are silent."""
    docs = spark.createDataFrame(
        [
            (1, "x a b c d y"),
            (2, "a b c d z w"),
            (3, "one two three four five"),
            (4, "a b"),  # shorter than k: no positions
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.span_start, r.span_tokens)
        for r in dedup.repeated_spans(docs, k=3, min_docs=2).collect()
    }
    # doc 1: grams at pos 2 ('a b c') and 3 ('b c d') covered -> run
    # [2, 3] -> span_start 2, span_tokens 3 - 2 + 3 = 4
    assert out == {(1, 2, 4), (2, 1, 4)}


def test_scrub_repeated_spans_hand_computed(spark):
    """The applied scrub cuts exactly the covered tokens and passes
    through span-free and short docs unchanged."""
    docs = spark.createDataFrame(
        [
            (1, "x a b c d y"),
            (2, "a b c d z w"),
            (3, "one two three four five"),
            (4, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in dedup.scrub_repeated_spans(docs, k=3, min_docs=2).collect()
    }
    # docs 1/2 share 'a b c d' (covered tokens: 1-4 of the run)
    assert out[1] == (6, 4, "x y")
    assert out[2] == (6, 4, "z w")
    assert out[3] == (5, 0, "one two three four five")
    assert out[4] == (2, 0, "a b")


def test_token_shingles_udf_matches_hof_form(spark):
    """The Arrow-batched shingle builder (shipped since round 9; 2.1x the
    interpreted-HOF zip chain at sf1) must emit bit-identical shingle
    STRINGS to the Catalyst form — every downstream md5/minhash digest
    the DuckDB oracles mirror depends on it.  Covers the edge cases:
    empty text, single/short docs, consecutive and trailing spaces
    (Spark's split keeps empty fields; so does Python's split(' '))."""
    from pyspark.sql import functions as F

    from blockchain_postgres_sync_spark.functions.text import (
        token_shingles, token_shingles_hof,
    )

    texts = [
        None, "", "one", "one two", "one two three", "a b c d e f g",
        "double  space", "trailing space ", " leading", "   ", "a  b  c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    for n in (2, 3, 5):
        rows = df.select(
            "doc_id",
            token_shingles(F.col("text"), n).alias("udf"),
            token_shingles_hof(F.col("text"), n).alias("hof"),
        ).collect()
        for r in rows:
            assert r.udf == r.hof, (n, r.doc_id, r.udf, r.hof)


def test_minhash_kernel_agg_parity(spark):
    """The map-only minhash Arrow kernel (round-10 optimization: zero
    shuffle, fused shingle+md5+affine-min) must emit bit-identical
    signatures to the explode+groupBy expression form it replaced — the
    DuckDB oracles of 8+ catalog queries recompute these exact values.
    Covers NULL text (dropped by both forms), empty text, short docs
    (whole-text shingle), multi-space token edge cases, and several
    num_hashes/shingle_size combinations."""
    from blockchain_postgres_sync_spark.operators.dedup import (
        minhash_signatures, minhash_signatures_agg,
    )

    texts = [
        None, "", "one", "one two", "one two three", "a b c d e f g",
        "double  space", "trailing space ", " leading", "   ", "a  b  c",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # dup content
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    for num_hashes, n in ((12, 3), (4, 2), (6, 5)):
        kern = {
            r.doc_id: tuple(r[1:])
            for r in minhash_signatures(
                df, num_hashes=num_hashes, shingle_size=n
            ).collect()
        }
        agg = {
            r.doc_id: tuple(r[1:])
            for r in minhash_signatures_agg(
                df, num_hashes=num_hashes, shingle_size=n
            ).collect()
        }
        assert kern == agg, (num_hashes, n)
        assert 0 not in kern  # NULL text absent from both


def test_simhash_kernel_agg_parity(spark):
    """The map-only simhash Arrow kernel (round-10: zero shuffle, fused
    tokenize+md5+bit-votes) must emit bit-identical fingerprints to the
    explode+groupBy expression form it replaced — the DuckDB oracle
    recomputes these exact values.  Covers NULL text (dropped by both
    forms), empty text, multi-space/edge-whitespace tokens, duplicate
    tokens (votes weigh repeats), and single-token docs."""
    from blockchain_postgres_sync_spark.operators.dedup import (
        simhash64, simhash64_agg,
    )

    texts = [
        None, "", "one", "one two", "one one one two",
        "double  space", "trailing space ", " leading", "   ", "a  b  c",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # dup content
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    kern = {r.doc_id: r.simhash60 for r in simhash64(df).collect()}
    agg = {r.doc_id: r.simhash60 for r in simhash64_agg(df).collect()}
    assert kern == agg
    assert 0 not in kern  # NULL text absent from both
