"""Chunking / packing / percentile-gate operator tests.

pack_greedy has no SQL oracle (reset-on-overflow recurrence); its semantics
are pinned here against a pure-Python reference implementation instead.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.functions.text import char_entropy_x1000
from blockchain_postgres_sync_spark.operators.packing import (
    doc_chunks,
    pack_concat,
    pack_greedy,
    quality_percentile_gate,
)

from .conftest import SF_SMOKE

DOCS = [
    (1, "a b c d e", "en"),
    (2, "f g", "en"),
    (3, "h i j k l m n o p q r s t u v w x y z aa bb", "en"),
    (4, "uno dos tres", "es"),
    (5, "cuatro", "es"),
    (6, "", "es"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_doc_chunks_reconstructs_text(spark):
    out = doc_chunks(_docs(spark), chunk_tokens=3).orderBy("doc_id", "chunk_idx")
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text, _ in DOCS:
        parts = by_doc[doc_id]
        # chunk indexes are dense from 0
        assert [p.chunk_idx for p in parts] == list(range(len(parts)))
        # concatenating chunks reproduces the document exactly
        assert " ".join(p.chunk_text for p in parts) == text
        # every chunk is full except possibly the last
        for p in parts[:-1]:
            assert p.n_chunk_tokens == 3
        n_tok = len(text.split(" "))
        assert len(parts) == max(math.ceil(n_tok / 3), 1)


def test_pack_concat_invariants(spark):
    out = pack_concat(_docs(spark), budget=8).orderBy("lang", "doc_id").collect()
    for lang in ("en", "es"):
        run = [r for r in out if r.lang == lang]
        pre = 0
        for r in run:
            assert r.bin_id == pre // 8
            assert r.bin_offset == pre % 8
            pre += r.n_tokens


def _greedy_reference(rows, budget):
    """Pure-Python next-fit packing, the executable spec."""
    expected = {}
    cur_bin, fill = 0, 0
    for doc_id, n in rows:
        if fill > 0 and fill + n > budget:
            cur_bin, fill = cur_bin + 1, 0
        fill += n
        expected[doc_id] = (cur_bin, fill)
    return expected


def test_pack_greedy_matches_reference(spark):
    out = pack_greedy(_docs(spark), budget=8).collect()
    for lang in ("en", "es"):
        seq = sorted(
            [(d, len(t.split(" "))) for d, t, lg in DOCS if lg == lang],
        )
        expected = _greedy_reference(seq, 8)
        got = {r.doc_id: (r.bin_id, r.bin_fill) for r in out if r.lang == lang}
        assert got == expected


def test_pack_greedy_oversized_doc_gets_own_bin(spark):
    out = {
        r.doc_id: r.bin_id
        for r in pack_greedy(_docs(spark), budget=3).collect()
        if r.lang == "en"
    }
    # doc 3 (21 tokens > budget 3) must still land alone in its own bin
    assert out[1] != out[3] and out[2] != out[3]


def test_pack_greedy_matches_reference_at_sf(spark):
    """Full-table cross-check at sf0.001 — the applyInPandas path against
    the Python spec over every language stream."""
    from blockchain_postgres_sync_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    out = pack_greedy(docs, budget=64).collect()
    src = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n")
    ).collect()
    langs = {r.lang for r in src}
    for lang in langs:
        seq = sorted((r.doc_id, r.n) for r in src if r.lang == lang)
        expected = _greedy_reference(seq, 64)
        got = {r.doc_id: (r.bin_id, r.bin_fill) for r in out if r.lang == lang}
        assert got == expected


def test_quality_percentile_gate_keeps_top_half(spark):
    docs = _docs(spark).withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long")
    )
    kept = quality_percentile_gate(
        docs, keep_frac=0.5, stream_col="lang", score_col="n_tokens"
    ).collect()
    kept_en = sorted(r.doc_id for r in kept if r.lang == "en")
    # en scores: doc3=21, doc1=5, doc2=2 -> percent_rank 0, .5, 1 -> keep 3,1
    assert kept_en == [1, 3]
    kept_es = sorted(r.doc_id for r in kept if r.lang == "es")
    # es scores: doc4=3, doc5=1, doc6=1 -> ranks 0, .5, 1 (tie broken by id)
    assert kept_es == [4, 5]


def test_char_entropy_matches_python(spark):
    out = {
        r.doc_id: r.e
        for r in _docs(spark)
        .select("doc_id", char_entropy_x1000(F.col("text")).alias("e"))
        .collect()
    }
    for doc_id, text, _ in DOCS:
        if not text:
            assert out[doc_id] == 0
            continue
        n = len(text)
        counts = [text.count(c) for c in sorted(set(text))]
        h = (math.log(n) - sum(c * math.log(c) for c in counts) / n) / math.log(2)
        assert out[doc_id] == math.floor(h * 1000)


def test_char_entropy_udf_matches_hof_form(spark):
    """The Arrow-batched entropy (the shipped form since round 9; 5.6x the
    interpreted-HOF expression at sf1) must stay value-identical to the
    pure-Catalyst form on BMP text — same sorted-char fold, same floats."""
    from blockchain_postgres_sync_spark.functions.text import (
        char_entropy_x1000_hof,
    )

    texts = [
        "", None, "a", "aaaa", "the quick brown fox jumps over the lazy dog",
        "aabbbcccc 1234 !!", "áccénted tëxt with ünïcode", "日本語のテキスト",
        "x" * 500, ("lorem ipsum dolor sit amet " * 40).strip(),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = df.select(
        "doc_id",
        char_entropy_x1000(F.col("text")).alias("udf"),
        char_entropy_x1000_hof(F.col("text")).alias("hof"),
    ).collect()
    for r in rows:
        assert r.udf == r.hof, (r.doc_id, r.udf, r.hof)


def test_char_entropy_astral_parity(spark):
    """The UDF/HOF pin holds for astral (non-BMP) text too: Spark's
    ``length``/``split``/``replace`` operate on UTF8String CODE POINTS
    (probed: length('a😀b😀c🎉') = 6, not the 9 UTF-16 code units), and
    UTF-8 binary sort order equals code-point order, so the Arrow
    kernel's Python semantics match the JVM expression form exactly —
    the docstring's earlier BMP-only caveat was unnecessary.  This test
    makes the astral scope executable: kernel == HOF == a Python
    code-point reference on surrogate-pair input."""
    import math

    from blockchain_postgres_sync_spark.functions.text import (
        char_entropy_x1000_hof,
    )

    astral = "a😀b😀c🎉"  # 6 code points, 9 UTF-16 code units
    df = spark.createDataFrame([(0, astral)], "doc_id int, text string")
    r = df.select(
        char_entropy_x1000(F.col("text")).alias("udf"),
        char_entropy_x1000_hof(F.col("text")).alias("hof"),
    ).collect()[0]
    n = len(astral)
    counts = [astral.count(c) for c in sorted(set(astral))]
    h = (math.log(n) - sum(c * math.log(c) for c in counts) / n) / math.log(2)
    assert r.udf == math.floor(h * 1000)
    assert r.hof == r.udf, (r.udf, r.hof)


def test_cascade_onepass_calendar_boundaries(spark):
    """Pin the pandas cascade's calendar floors (day/ISO-week/month) against
    the Catalyst cascade across month, year, and week-over-year boundaries —
    the hypothesis trade strategy never leaves January, so this is the only
    cross-boundary coverage."""
    from pyspark.sql import functions as F

    from blockchain_postgres_sync_spark.operators.candles import (
        full_cascade_fixedpoint,
        full_cascade_fixedpoint_onepass,
    )

    rows = []
    stamps = [
        "2023-12-31 23:59:30",  # Sunday, last minute of year
        "2024-01-01 00:00:30",  # Monday, new year/week/month
        "2024-01-31 23:30:00",
        "2024-02-01 00:15:00",  # month boundary
        "2024-02-29 12:00:00",  # leap day
        "2024-03-03 09:00:00",  # Sunday (week of Feb 26)
        "2024-03-04 09:00:00",  # Monday (new ISO week)
    ]
    for i, ts in enumerate(stamps):
        rows.append((i, ts, "A", "USD", "M0", 1, 10 + i, 1.5 + i))
    df = spark.createDataFrame(
        rows,
        ["uid", "time_stamp", "amount_asset_id", "price_asset_id",
         "sender", "height", "amount", "price"],
    ).withColumn("time_stamp", F.col("time_stamp").cast("timestamp")).withColumn(
        "price", F.col("price").cast("decimal(18,2)")
    )
    a = full_cascade_fixedpoint(df, f=2)
    b = full_cascade_fixedpoint_onepass(df, f=2)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # sanity: the two ISO weeks around 2024-01-01 anchor to Dec 25 / Jan 1
    weeks = sorted(
        str(r.time_start) for r in b.filter(F.col("interval") == "1w").collect()
    )
    assert weeks[0].startswith("2023-12-25")


def test_packing_property_invariants(spark):
    """Property check over random corpora/budgets: greedy bins never
    overflow (except single oversized docs), bin ids are dense and
    monotone in doc order, and concat-and-split offsets advance exactly
    by token count."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def corpora(draw):
        n = draw(st.integers(1, 25))
        docs = []
        for i in range(n):
            n_tok = draw(st.integers(1, 12))
            docs.append((i, " ".join(f"t{draw(st.integers(0, 5))}" for _ in range(n_tok)),
                         draw(st.sampled_from(["en", "es"]))))
        budget = draw(st.integers(1, 20))
        return docs, budget

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(corpora())
    def check(case):
        docs, budget = case
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        greedy = sorted(
            pack_greedy(df, budget=budget).collect(),
            key=lambda r: (r.lang, r.doc_id),
        )
        by_lang: dict[str, list] = {}
        for r in greedy:
            by_lang.setdefault(r.lang, []).append(r)
        for rows in by_lang.values():
            prev_bin = 0
            for r in rows:
                # overflow only allowed when the bin holds that one doc
                assert r.bin_fill <= budget or r.bin_fill == r.n_tokens
                assert r.bin_id in (prev_bin, prev_bin + 1)
                prev_bin = r.bin_id
        concat = sorted(
            pack_concat(df, budget=budget).collect(),
            key=lambda r: (r.lang, r.doc_id),
        )
        for lang in {r.lang for r in concat}:
            pre = 0
            for r in [x for x in concat if x.lang == lang]:
                assert r.bin_id == pre // budget and r.bin_offset == pre % budget
                pre += r.n_tokens

    check()


def test_doc_chunks_overlapping_stride(spark):
    """stride < chunk_tokens -> sliding windows: every consecutive pair of
    chunks overlaps by chunk_tokens - stride tokens, and the default
    (stride = chunk_tokens) output is unchanged by the stride machinery."""
    out = (
        doc_chunks(_docs(spark), chunk_tokens=4, stride=2)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    d3 = [r.chunk_text.split(" ") for r in out if r.doc_id == 3]
    toks = DOCS[2][1].split(" ")
    for i, chunk in enumerate(d3):
        assert chunk == toks[i * 2 : i * 2 + 4]
    # overlap: last 2 tokens of chunk i == first 2 of chunk i+1
    for a, b in zip(d3, d3[1:]):
        assert a[2:] == b[:2]
    # every token covered
    assert d3[-1][-1] == toks[-1]
    # default stride reproduces the non-overlapping layout
    plain = doc_chunks(_docs(spark), chunk_tokens=4).orderBy(
        "doc_id", "chunk_idx"
    ).collect()
    strided = doc_chunks(_docs(spark), chunk_tokens=4, stride=4).orderBy(
        "doc_id", "chunk_idx"
    ).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in strided]


def test_pack_greedy_sharded_skewed_stream_invariants(spark):
    """Round-3 verdict item 6: automatic hash-sharding of a giant stream.
    Property: for a heavily skewed corpus (one stream with ~50x the rows of
    the others), sharded packing must (a) keep every document exactly once,
    (b) never overflow a bin except for single oversized docs, (c) emit
    dense per-stream bin ids, and (d) actually split the giant stream into
    ceil(n / max_stream_rows) shards' worth of parallel groups."""
    from blockchain_postgres_sync_spark.operators.packing import (
        pack_greedy_sharded, shard_streams,
    )

    rows = (
        # giant skewed stream: 1000 docs, token counts cycling 1..40
        [(i, "giant", "t " * (i % 40 + 1)) for i in range(1000)]
        # small streams stay single-shard
        + [(10_000 + i, "small_a", "t " * 5) for i in range(20)]
        + [(20_000 + i, "small_b", "t " * 600) for i in range(3)]  # oversized
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    budget = 64
    out = pack_greedy_sharded(
        df, budget=budget, max_stream_rows=100
    ).collect()

    # (a) every doc exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(r[0] for r in rows)

    # (b) no-overflow: per (stream, bin) the token sum fits the budget
    # unless the bin holds a single oversized doc
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r["lang"], r["bin_id"]), []).append(r["n_tokens"])
    for (lang, _bin), toks in by_bin.items():
        if sum(toks) > budget:
            assert len(toks) == 1 and toks[0] > budget, (lang, _bin, toks)

    # (c) dense, 0-based bin ids per stream
    for lang in ("giant", "small_a", "small_b"):
        bins = sorted({r["bin_id"] for r in out if r["lang"] == lang})
        assert bins == list(range(len(bins))), lang

    # (d) the giant stream really sharded: 1000 rows / 100 per shard = 10
    sharded = shard_streams(df, max_stream_rows=100)
    n_groups = (
        sharded.filter(F.col("lang") == "giant")
        .select("_shard").distinct().count()
    )
    assert n_groups == 10
    assert sharded.filter(F.col("lang") == "small_a") \
        .select("_shard").distinct().count() == 1
