"""winnow_fingerprints (right-anchored window-min sampling) and
vocab_coverage (OOV rate) semantics against brute-force references."""

from __future__ import annotations

import hashlib

from blockchain_postgres_sync_spark.operators.dedup import (
    WINNOW_SUM_MOD,
    winnow_fingerprints,
)
from blockchain_postgres_sync_spark.operators.stats import vocab_coverage


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_winnow(text: str, k: int, w: int):
    toks = text.split(" ")
    m = len(toks) - k + 1
    sh = (
        [" ".join(toks)]
        if m < 1
        else [" ".join(toks[i:i + k]) for i in range(m)]
    )
    hs = [_h60(s) for s in sh]
    sel = {min(hs)}  # global min, unconditionally
    for p in range(w - 1, len(hs)):
        if hs[p] == min(hs[p - w + 1 : p + 1]):
            sel.add(hs[p])
    return (
        len(sel),
        min(sel),
        sum(h % WINNOW_SUM_MOD for h in sel),
    )


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "a b"),                       # fewer tokens than k
    (2, "one two three"),             # exactly one shingle
    (3, "x y z w v"),                 # 3 shingles < w
    (4, ""),                          # empty text -> [''] single shingle
    (5, "t t t t t t t t t t"),       # all-equal hashes: every window ties
    (6, " ".join(f"tok{i}" for i in range(50))),
]


def test_winnow_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_fp, r.fp_min, r.fp_sum)
        for r in winnow_fingerprints(df, k=3, w=4).collect()
    }
    assert got == {d: _ref_winnow(t, 3, 4) for d, t in DOCS}


def test_winnow_every_doc_emits(spark):
    # the unconditional global-min arm: even monotone hash runs emit >= 1
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = winnow_fingerprints(df, k=3, w=4).collect()
    assert len(out) == len(DOCS)
    assert all(r.n_fp >= 1 for r in out)


def test_winnow_null_text_dropped(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, None)], "doc_id long, text string"
    )
    assert [r.doc_id for r in winnow_fingerprints(df).collect()] == [0]


def test_winnow_zero_shuffles(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        winnow_fingerprints(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_vocab_coverage_reference(spark):
    # train docs (id % 10 < 8): ids 0-7; val: ids 8, 9, 18
    rows = []
    for i in range(8):
        rows.append((i, "en", "common common common common common rare"))
    rows.append((8, "en", "common rare unseen"))
    rows.append((9, "de", "common unseen unseen"))
    rows.append((18, "de", "common common"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.lang: (r.n_tokens, r.n_oov, r.oov_x10000)
        for r in vocab_coverage(df, min_count=5).collect()
    }
    # vocab = {common} (40 occurrences); 'rare' has 8 < ... wait 8 >= 5
    # train counts: common 5*8=40, rare 1*8=8 -> vocab = {common, rare}
    # en val: 3 tokens, oov = {unseen} x1 -> 3333
    # de val: 5 tokens, oov = unseen x2 -> 4000
    assert got == {"en": (3, 1, 3333), "de": (5, 2, 4000)}
