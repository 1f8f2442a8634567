"""BPE tokenizer-training primitives (operators/bpe.py) pinned against a
pure-Python reference implementation (Sennrich et al. 2016 semantics:
frequency-weighted pair counts over the word table; one left-to-right
non-overlapping pass per merge), plus score_auc (operators/stats.py)
checked against scikit-style rank-sum AUC computed in Python."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import bpe, stats

TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer low wide lowest",
    "aaa aa aaaa a",  # overlapping-run merges: non-overlap pass matters
    "",  # empty doc: no words
]


# ---------------------------------------------------------- py reference
def _py_word_freq(texts):
    c: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return c


def _py_merge(sym: tuple, left: str, right: str) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _py_pair_counts(word_syms: dict) -> Counter:
    pc: Counter = Counter()
    for syms, f in word_syms.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
    return pc


def _py_train(texts, n_merges):
    wf: dict = {}
    for w, f in _py_word_freq(texts).items():
        wf[tuple(w)] = wf.get(tuple(w), 0) + f
    merges = []
    for step in range(n_merges):
        pc = _py_pair_counts(wf)
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, cnt))
        nxt: dict = {}
        for syms, f in wf.items():
            m = _py_merge(syms, left, right)
            nxt[m] = nxt.get(m, 0) + f
        wf = nxt
    return merges


def _py_encode(text, merges):
    pieces = []
    for w in text.split(" "):
        if not w:
            continue
        s = tuple(w)
        for left, right in merges:
            s = _py_merge(s, left, right)
        pieces.extend(s)
    return pieces


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_pair_counts_match_python(spark, docs):
    words = bpe.word_frequencies(docs).withColumn(
        "symbols", F.split(F.col("word"), "")
    )
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in bpe.adjacent_pair_counts(words).collect()
    }
    wf = {tuple(w): f for w, f in _py_word_freq(TEXTS).items()}
    assert got == dict(_py_pair_counts(wf))


def test_bpe_train_matches_python_reference(spark, docs):
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=8).collect()
    ]
    assert got == _py_train(TEXTS, 8)


def test_bpe_train_stops_when_no_pairs_left(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    merges = bpe.bpe_train(df, n_merges=5).collect()
    assert merges == []  # all words are single chars: nothing to merge


def test_bpe_encode_roundtrips_train_pass(spark, docs):
    ref = _py_train(TEXTS, 8)
    table = [(left, right) for _, left, right, _ in ref]
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe.bpe_encode(docs, table).collect()
    }
    for i, t in enumerate(TEXTS):
        assert enc[i] == _py_encode(t, table), f"doc {i}"


def test_merge_symbols_nonoverlapping_pass(spark):
    # "aaaa" with merge (a,a) -> [aa, aa]; "aaa" -> [aa, a]
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("a",)], "w string")
    out = df.select(
        bpe.merge_symbols(F.split(F.col("w"), ""), "a", "a").alias("m")
    ).collect()
    assert [list(r["m"]) for r in out] == [["aa", "aa"], ["aa", "a"], ["a"]]


# ---------------------------------------------------------------- AUC
def _py_auc(pairs):
    """Tie-aware rank-sum AUC over (score, label) pairs."""
    pos = sorted(s for s, y in pairs if y)
    neg = sorted(s for s, y in pairs if not y)
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    return (wins + ties / 2) / (len(pos) * len(neg))


@pytest.mark.parametrize(
    "rows",
    [
        [(i, i >= 50) for i in range(100)],  # perfect: AUC 1.0
        [(1, i % 2 == 0) for i in range(10)],  # all tied: AUC 0.5
        [(i % 7, (i * 13 % 5) < 2) for i in range(60)],  # messy ties
    ],
)
def test_score_auc_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(int(s), bool(y)) for s, y in rows], "s long, y boolean"
    )
    got = stats.score_auc(df, "s", "y").collect()[0]
    import math

    expect = math.floor(_py_auc(rows) * 1_000_000)
    assert got["auc_x1000000"] == expect
    assert got["n_pos"] == sum(1 for _, y in rows if y)
    assert got["n_neg"] == sum(1 for _, y in rows if not y)


def test_score_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(1, True), (2, True)], "s long, y boolean")
    row = stats.score_auc(df, "s", "y").collect()[0]
    assert row["n_neg"] == 0 and row["auc_x1000000"] is None


def test_threshold_sweep_confusion_counts(spark):
    """Every row's confusion quadrant must match a brute-force recount at
    that threshold; precision/recall are exact floors."""
    rows = [(i % 7, (i * 13 % 5) < 2) for i in range(60)]
    df = spark.createDataFrame(
        [(int(s), bool(y)) for s, y in rows], "s long, y boolean"
    )
    out = stats.threshold_sweep(df, "s", "y").collect()
    assert len(out) == len({s for s, _ in rows})
    for r in out:
        thr = r["score"]
        tp = sum(1 for s, y in rows if s >= thr and y)
        fp = sum(1 for s, y in rows if s >= thr and not y)
        fn = sum(1 for s, y in rows if s < thr and y)
        tn = sum(1 for s, y in rows if s < thr and not y)
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn), thr
        assert r["precision_x1000000"] == tp * 1_000_000 // (tp + fp)
        assert r["recall_x1000000"] == tp * 1_000_000 // (tp + fn)


# ------------------------------------------------- property-based pinning
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)

_word = st.text(alphabet="abcde", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@given(_corpus, st.integers(min_value=1, max_value=6))
@_slow
def test_bpe_train_property(spark, texts, n_merges):
    """bpe_train == the Python reference on arbitrary small-alphabet
    corpora — pins the rows-only catalog query bpe_train_merges."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train(df, n_merges=n_merges).collect()
    ]
    assert got == _py_train(texts, n_merges)


@given(_corpus)
@_slow
def test_bpe_encode_property(spark, texts):
    """encode(train(corpus)) matches the Python reference end-to-end —
    every word's pieces concatenate back to the word."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    table = [(l, r) for _, l, r, _ in _py_train(texts, 4)]
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe.bpe_encode(df, table).collect()
    }
    for i, t in enumerate(texts):
        assert enc[i] == _py_encode(t, table), f"doc {i}"
        assert "".join(enc[i]) == t.replace(" ", "")


def test_bpe_encode_dict_matches_rowwise(spark, docs):
    """The dictionary (per-distinct-word) segmentation is row-identical to
    the per-occurrence fold form — BPE segmentation is a pure function of
    the word, so the two forms must agree on every document, including
    empty-piece edge cases."""
    table = bpe.bpe_train(docs, n_merges=6)
    merges = [
        (r["left"], r["right"])
        for r in sorted(table.collect(), key=lambda r: r["step"])
    ]
    a = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    b = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_encode_dict(docs, merges).collect()
    }
    assert a == b


def test_bpe_train_driver_path_matches_distributed(spark, docs):
    """Round-10 fast path: the driver-side merge loop (vocab collected
    once) is bit-identical to the distributed per-round loop — same merge
    table, same tie-breaks, same early stop."""
    fast = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train(docs, n_merges=8).collect()
    ]
    dist = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe.bpe_train(
            docs, n_merges=8, driver_vocab_threshold=0
        ).collect()
    ]
    assert fast == dist == _py_train(TEXTS, 8)


def test_bpe_encode_dict_driver_path_matches_distributed(spark, docs):
    """Round-10 fast path: driver-side dictionary segmentation ==
    the distributed fold-chain dictionary, doc for doc."""
    table = [(l, r) for _, l, r, _ in _py_train(TEXTS, 6)]
    fast = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_encode_dict(docs, table).collect()
    }
    dist = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_encode_dict(
            docs, table, driver_vocab_threshold=0
        ).collect()
    }
    assert fast == dist


def test_driver_path_guard_rejects_astral_and_oversize(spark):
    """The fast-path guard must refuse (a) vocabularies containing non-BMP
    words (F.split("") yields UTF-16 code units; Python iterates code
    points — the two loops would diverge) and (b) vocabularies over the
    threshold — both route to the distributed loop."""
    astral = spark.createDataFrame(
        [("a\U0001F600b",), ("ok",)], "word string"
    )
    assert bpe._collect_if_bounded(astral, "word", 10) is None
    big = spark.createDataFrame([(f"w{i}",) for i in range(5)], "word string")
    assert bpe._collect_if_bounded(big, "word", 4) is None
    ok = bpe._collect_if_bounded(big, "word", 5)
    assert ok is not None and {r["word"] for r in ok} == {
        f"w{i}" for i in range(5)
    }


def test_bpe_train_encode_dict_fused(spark, docs):
    """The fused train+encode (one vocab collect) is row-identical to the
    two-step composition, on both the driver path and the forced
    distributed path."""
    table = [(l, r) for _, l, r, _ in _py_train(TEXTS, 10)]
    two_step = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_encode_dict(docs, table).collect()
    }
    fused = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_train_encode_dict(docs, n_merges=10).collect()
    }
    fused_dist = {
        r.doc_id: list(r.pieces)
        for r in bpe.bpe_train_encode_dict(
            docs, n_merges=10, driver_vocab_threshold=0
        ).collect()
    }
    assert fused == two_step
    assert fused_dist == two_step
