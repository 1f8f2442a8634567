"""Text-analysis function surface for the training-data pipeline.

The reference's only text workload is a `to_tsvector('simple', name)` GIN
index over current assets (migrations/.../up.sql:703-705) — i.e. tokenized
search over names.  We generalize to the standard LLM-pipeline set: token
stats, fingerprints, quality ratios, n-gram shingles.  Everything here is
Catalyst built-ins (JVM-side, codegen) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches `to_tsvector('simple')`'s word split
    closely enough for stats; exact parity is not required by the reference).
    """
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


#: BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct/space runs),
#: restricted to syntax both Java regex (Spark) and RE2 (DuckDB) agree on.
BPE_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def bpe_token_count(text: Column) -> Column:
    """Approximate LLM token count: number of BPE-style pre-token matches.
    Pure Catalyst (regexp_extract_all), no UDF."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def char_count_no_spaces(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit("")))


def tokenset_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set.  Collapses shuffled/duplicated-token near-dups (Jaccard = 1).
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def token_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-token shingles (space-joined), for minhash/Jaccard dedup.
    Documents shorter than n tokens produce a single whole-text shingle;
    NULL text stays NULL.

    Implementation is an Arrow-batched pandas UDF (round 9): shingle
    strings are built by C-level ``str.split``/``" ".join`` — A/B at sf1
    (50k docs, 2.5M shingles): 2.0 s vs 4.2 s for the zip-of-shifted-
    copies Catalyst form, whose per-element ``concat_ws`` lambdas run in
    the INTERPRETED higher-order-function path (the char_entropy lesson).
    Python's ``split(" ")`` keeps empty fields exactly like Spark's
    ``split(text, ' ')`` (Java split with limit -1), so the strings — and
    therefore every downstream md5/minhash digest the DuckDB oracles
    mirror — are bit-identical; pinned against the expression form
    (kept as :func:`token_shingles_hof`) by tests/test_text_ops.py.
    """
    global _SHINGLE_UDFS
    if n not in _SHINGLE_UDFS:
        from pyspark.sql.types import ArrayType, StringType

        _SHINGLE_UDFS[n] = F.pandas_udf(
            _shingle_batch(n), ArrayType(StringType())
        )
    return _SHINGLE_UDFS[n](text)


#: per-n UDF cache (created lazily: pandas_udf wants an active session's
#: conf for Arrow settings at definition time in some versions)
_SHINGLE_UDFS: dict = {}


def _shingle_batch(n: int):
    """Vectorized kernel for :func:`token_shingles` (one Arrow batch)."""

    def fn(s):
        import pandas as pd

        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            toks = t.split(" ")
            m = len(toks) - n + 1
            if m < 1:
                out.append([" ".join(toks)])
            else:
                out.append([" ".join(toks[i:i + n]) for i in range(m)])
        return pd.Series(out)

    return fn


def token_shingles_hof(text: Column, n: int = 3) -> Column:
    """Pure-Catalyst expression form of :func:`token_shingles` (zip of
    n-1 left-shifted copies; concat_ws skips zip_with's null tail padding,
    which also yields the whole-text shingle for short documents).  Kept
    as the cross-implementation parity pin and for sessions where Python
    workers are unavailable."""
    t = tokens(text)
    out_len = F.greatest(F.size(t) - (n - 1), F.lit(1))
    z = t
    for k in range(1, n):
        shifted = F.slice(t, k + 1, F.greatest(F.size(t) - k, F.lit(1)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(z, 1, out_len)


def hashed_token_shingles(text: Column, n: int = 3) -> Column:
    """64-bit shingle KEYS without ever materializing shingle strings:
    tokens hash once (xxhash64), then the same zip-of-shifted-copies pass
    as :func:`token_shingles` combines n consecutive token hashes with
    xxhash64(long, long) — fixed 16-byte hashing per position instead of
    an O(shingle-length) string build + string hash.

    The result is a CONSISTENT identity function of the token sequence
    (equal shingles ⇒ equal keys; unequal ⇒ equal only with the usual
    ~2^-64 collision odds — the accepted MinHash/SimHash approximation
    family), NOT equal to ``xxhash64(token_shingles(...))`` values: use it
    where shingles only matter for grouping/joining identity, never where
    the shingle text itself is output (ngram_topk, salient_terms) or where
    an external oracle must reproduce the digest (minhash md5 family).

    Tail note: for documents shorter than n tokens the null zip padding
    re-hashes instead of no-op'ing (xxhash64 skips nulls), which changes
    the VALUE versus the string form but not identity consistency.
    """
    th = F.transform(tokens(text), lambda x: F.xxhash64(x))
    out_len = F.greatest(F.size(th) - (n - 1), F.lit(1))
    z = th
    for k in range(1, n):
        shifted = F.slice(th, k + 1, F.greatest(F.size(th) - k, F.lit(1)))
        z = F.zip_with(z, shifted, lambda a, b: F.xxhash64(a, b))
    return F.slice(z, 1, out_len)


def quality_ratios(text: Column) -> dict[str, Column]:
    """Cheap quality-score signals (length, mean token length, repetition).

    All integer-exact (scaled x100 via integral division) so results are
    bit-identical across engines — no float ratios in hash-compared output.
    """
    n_tok = token_count(text)
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "n_bpe_tokens": bpe_token_count(text).cast("long"),
        "n_distinct_tokens": distinct_token_count(text).cast("long"),
        "sum_token_len": char_count_no_spaces(text).cast("long"),
        "mean_token_len_x100": _idiv(
            char_count_no_spaces(text).cast("long") * 100, n_tok.cast("long")
        ),
        "repetition_x100": _idiv(
            distinct_token_count(text).cast("long") * 100, n_tok.cast("long")
        ),
    }


def _idiv(a: Column, b: Column) -> Column:
    """Integral floor-division, exact for values < 2^53 (single IEEE divide
    over exact integers -> identical across engines)."""
    return F.floor(a.cast("double") / b.cast("double")).cast("long")


#: stopword profiles for the n-gram/stopword language-ID heuristic.  Small by
#: design: language ID at pipeline scale is a cheap vote, not a model.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "ne"],
    "es": ["el", "los", "las", "y", "es", "no"],
}


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (token occurrences, not distinct)."""
    t = tokens(text)
    out = {}
    for lang, words in sorted(LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def language_id(text: Column) -> tuple[Column, Column]:
    """Argmax language vote -> (lang_pred, lang_score).

    Deterministic tie-break: struct max on (score, lang) — highest score,
    then lexicographically-last language.  Zero hits -> 'unknown'.
    Pure Catalyst (array_max over structs); no UDF.
    """
    scores = language_scores(text)
    best = F.array_max(
        F.array(
            *[
                F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
                for lang, s in scores.items()
            ]
        )
    )
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    return pred, best["score"]


def char_entropy_x1000(text: Column) -> Column:
    """Character-distribution Shannon entropy in bits, floored to integer
    thousandths — the classic gibberish/boilerplate detector (natural prose
    sits ~4.0-4.5 bits; repeated padding or base64 blobs fall outside).

    ``H = (ln N - sum(n_c * ln n_c) / N) / ln 2`` with the per-character
    counts folded in SORTED character order, so the float summation order
    (and therefore the floor(x1000) result) is identical in any engine
    that evaluates left-to-right.  Empty/NULL text yields 0.

    Implementation is an Arrow-batched pandas UDF — the deliberate
    exception to the module's Catalyst-only rule: the expression form
    (kept as :func:`char_entropy_x1000_hof` and pinned value-equal by
    ``tests/test_text_functions.py``) needs one ``replace``-scan per
    distinct character per row inside interpreted higher-order functions,
    and the interpreter overhead dominates — A/B at sf1 (50k docs):
    8.3 s HOF vs 1.5 s UDF for identical results (0 mismatches).  The
    C-level ``Counter`` pass is O(chars); Python iterates code points and
    ``len`` matches Spark's ``length`` (UTF8String counts CODE POINTS,
    probed on surrogate-pair input — not UTF-16 code units), and
    code-point sort order equals UTF-8 binary order, so the fold sequence
    is the HOF form's for ALL text including astral chars
    (tests/test_packing.py::test_char_entropy_astral_parity makes the
    astral case executable).
    """
    return _char_entropy_x1000_udf(text)


def char_entropy_x1000_hof(text: Column) -> Column:
    """Pure-Catalyst expression form of :func:`char_entropy_x1000` (per
    distinct character ``c`` the count is ``len(text) - len(replace(text,
    c, ''))``).  Kept as the cross-implementation parity pin and for
    sessions where Python workers are unavailable."""
    n = F.length(text).cast("double")
    chars = F.array_sort(F.array_distinct(F.split(text, "")))
    counts = F.transform(
        chars,
        lambda c: (F.length(text) - F.length(F.replace(text, c, F.lit("")))).cast(
            "double"
        ),
    )
    sum_nlogn = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, cnt: acc + cnt * F.log(cnt),
    )
    h_bits = (F.log(n) - sum_nlogn / n) / F.log(F.lit(2.0))
    return F.when(F.length(text) > 0, F.floor(h_bits * 1000.0).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


def _entropy_batch(s):
    """Vectorized kernel for :func:`char_entropy_x1000` (one Arrow batch)."""
    import math
    from collections import Counter

    import pandas as pd

    out = []
    for t in s:
        if not t:
            out.append(0)
            continue
        n = float(len(t))
        cnt = Counter(t)
        acc = 0.0
        for ch in sorted(cnt):
            c = float(cnt[ch])
            acc = acc + c * math.log(c)
        h = (math.log(n) - acc / n) / math.log(2.0)
        out.append(int(math.floor(h * 1000.0)))
    return pd.Series(out, dtype="int64")


#: created lazily — pandas_udf with a DDL-string return type parses the
#: string through the ACTIVE session at definition time, which breaks
#: importing this module before a SparkSession exists (pytest collection)
_ENTROPY_UDF = None


def _char_entropy_x1000_udf(text: Column) -> Column:
    global _ENTROPY_UDF
    if _ENTROPY_UDF is None:
        from pyspark.sql.types import LongType

        # asNondeterministic is a LIE about the function (the kernel is
        # bit-deterministic, parity-pinned against the HOF form) told to
        # stop the optimizer duplicating it (guide §4.4): score_auc /
        # threshold_sweep filter on isnotnull(score), and pushing that
        # predicate below the corpus fan-out exchange re-evaluated the
        # whole quality expression INCLUDING this kernel on the
        # single-task scan stage — two ArrowEvalPython nodes, one of
        # them upstream of the fan-out (round-10 session 7; same
        # treatment as the rerank scoring kernel).
        _ENTROPY_UDF = F.pandas_udf(
            _entropy_batch, LongType()
        ).asNondeterministic()
    return _ENTROPY_UDF(text)


#: rolling-hash fingerprint constants (polynomial hash, exact in int64:
#: acc <= MOD*31 + 2^32 < 2^63)
FP_BASE = 31
FP_MOD = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    token stream, ``acc = (acc*31 + md5_32(tok)) mod 1e9+7``.

    Unlike :func:`tokenset_fingerprint` this is order-sensitive (detects
    re-ordered near-dups as different) and streams as a sequential fold —
    O(tokens), no shuffle, exact integer math identical across engines.
    """
    tok_hashes = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_BASE + h) % FP_MOD,
    )


def quality_score(text: Column) -> dict[str, Column]:
    """Composite document-quality score — the model-free quality classifier
    a curation pipeline runs before any learned filter: five integer
    sub-scores (0..100 each) combined by fixed weights into
    ``quality_x100`` and a ``tier`` label.  Exposing the components keeps
    the score EXPLAINABLE (why did this doc land in 'low'?) — the property
    learned quality filters lose.

    Sub-scores (each 0..100, integer-exact):
    - ``s_tokens``: in the Gopher-style length band [20, 5000] tokens;
    - ``s_mtl``: mean token length in the natural-text band
      [2.50, 12.00] chars;
    - ``s_repetition``: distinct/total token ratio ×100 (low = boilerplate);
    - ``s_entropy``: char-distribution entropy, 100 at >= 4.0 bits
      (gibberish and repeated-char junk score near 0);
    - ``s_stopword``: stopword-vote evidence (10 pts per hit, capped) —
      natural language in a known language carries stopwords.

    ``quality_x100 = (2*s_tokens + s_mtl + 2*s_repetition + 2*s_entropy
    + s_stopword) div 8``; tiers: high >= 70, medium >= 40, else low.
    Entirely in-row Catalyst — zero shuffle, scan-bound at any scale; the
    one float op per sub-score is the shared ``_idiv``/entropy ln pattern
    already hash-proven cross-engine.
    """
    r = quality_ratios(text)
    n_tok, mtl, rep = r["n_tokens"], r["mean_token_len_x100"], r["repetition_x100"]
    _, lang_hits = language_id(text)
    s_tokens = F.when((n_tok >= 20) & (n_tok <= 5000), F.lit(100)).otherwise(0)
    s_mtl = F.when((mtl >= 250) & (mtl <= 1200), F.lit(100)).otherwise(0)
    s_repetition = F.least(rep, F.lit(100))
    s_entropy = F.least(
        F.floor(char_entropy_x1000(text).cast("double") / 40.0).cast("long"),
        F.lit(100),
    )
    s_stopword = F.least(lang_hits * 10, F.lit(100))
    total = (
        s_tokens.cast("long") * 2
        + s_mtl.cast("long")
        + s_repetition.cast("long") * 2
        + s_entropy * 2
        + s_stopword.cast("long")
    )
    quality = F.floor(total.cast("double") / 8.0).cast("long")
    tier = (
        F.when(quality >= 70, F.lit("high"))
        .when(quality >= 40, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return {
        "s_tokens": s_tokens.cast("long"),
        "s_mtl": s_mtl.cast("long"),
        "s_repetition": s_repetition.cast("long"),
        "s_entropy": s_entropy.cast("long"),
        "s_stopword": s_stopword.cast("long"),
        "quality_x100": quality,
        "tier": tier,
    }


def normalize_text(text: Column) -> Column:
    """Canonical text normalization — the step every dedup/fingerprint
    pipeline runs FIRST so cosmetic variants hash identically: strip
    control characters, collapse whitespace runs to single spaces, trim,
    lowercase.  Pure Catalyst (two regexp_replace + lower + trim), in-row,
    zero shuffle.

    Character classes are spelled explicitly ([ \\t\\n\\r] and the control
    ranges) rather than via ``\\s``/``\\p{Cntrl}``: Java regex and RE2
    (DuckDB) disagree on shorthand-class membership (e.g. \\x0b), and the
    explicit classes are the cross-engine-stable subset.
    """
    cleaned = F.regexp_replace(text, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    collapsed = F.regexp_replace(cleaned, "[ \\t\\n\\r]+", " ")
    return F.lower(F.trim(collapsed))


#: content-defined chunking: rolling window width (tokens) and boundary
#: modulus — a boundary closes a chunk when the window hash % CDC_MOD == 0,
#: giving ~CDC_MOD-token expected chunks
CDC_WINDOW = 3
CDC_MOD = 16


def cdc_token_hashes(t: Column) -> Column:
    """Per-token md5-int hashes (the :func:`rolling_fingerprint`
    convention) for CDC.  EXPENSIVE (one md5 per token): callers composing
    further CDC stages must stage the result as a named column so the
    downstream multi-reference stages read the materialized array instead
    of re-running the hashing (HOFs don't CSE; see ``q_cdc_chunks``)."""
    return F.transform(
        t, lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    )


def cdc_window_hashes(th: Column) -> Column:
    """Rolling 3-token window hashes from STAGED token hashes: entry j
    (1-based) covers tokens j..j+2, value ``((h_j*31 + h_{j+1}) % FP_MOD
    * 31 + h_{j+2}) % FP_MOD``.  References ``th`` three times — pass a
    materialized column, never the raw :func:`cdc_token_hashes` tree."""
    n = F.size(th)
    z1 = F.zip_with(
        th,
        F.slice(th, 2, F.greatest(n - 1, F.lit(1))),
        lambda a, b: (a * FP_BASE + b) % FP_MOD,
    )
    return F.zip_with(
        z1,
        F.slice(th, 3, F.greatest(n - 2, F.lit(1))),
        lambda a, b: (a * FP_BASE + b) % FP_MOD,
    )


def cdc_ends(z2: Column, n: Column, mod: int = CDC_MOD) -> Column:
    """Chunk END positions (1-based, ascending, always terminated by
    ``n``): boundary after token j+2 when window hash j divides; the
    final position never opens a new (empty) chunk, and zip_with's null
    tail (the slice shorter than z1) is filtered by the boundary
    predicate itself."""
    bounds = F.filter(
        F.transform(
            z2,
            lambda w, j: F.when(
                (w % mod == 0) & ((j + F.lit(3)) < n), j + F.lit(3)
            ),
        ),
        lambda v: v.isNotNull(),
    )
    return F.concat(bounds, F.array(n))


def cdc_spans_from_ends(ends: Column) -> Column:
    """(start, len) spans from STAGED end positions (referenced three
    times — pass a materialized column)."""
    starts = F.zip_with(
        F.concat(F.array(F.lit(0)), ends),
        ends,
        lambda prev, e: F.when(e.isNotNull(), prev + 1),
    )
    return F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(
                s.cast("int").alias("start"),
                (e - s + 1).cast("int").alias("len"),
            ),
        ),
        lambda sp: sp["start"].isNotNull(),
    )


def cdc_chunk_spans(text: Column, mod: int = CDC_MOD) -> Column:
    """Content-defined chunk spans: ``array<struct<start:int,len:int>>``
    (1-based token positions) cut where a rolling 3-token polynomial hash
    hits ``0 (mod mod)`` — the FastCDC/rsync idea at token granularity.

    Unlike fixed-stride chunking (``doc_chunks``), CDC boundaries are a
    function of CONTENT: inserting one token early in a document shifts
    every fixed-stride chunk but only the one CDC chunk containing the
    edit, so chunk-digest dedup keeps matching everything downstream —
    the property that makes CDC the standard for large-corpus substring
    dedup and delta storage.

    Integer-exact and engine-reproducible: token hash = first 8 md5 hex
    chars as int (the :func:`rolling_fingerprint` convention).  The final
    token always closes the last chunk; docs shorter than the window are
    one chunk.  In-row, zero shuffle.

    SINGLE-EXPRESSION convenience form: the stages reference each other
    multiple times and HOFs don't CSE, so this tree re-evaluates the
    md5 hashing ~8x per row — fine for tests and small frames.  The hot
    path (``q_cdc_chunks``) stages :func:`cdc_token_hashes` →
    :func:`cdc_window_hashes` → :func:`cdc_ends` →
    :func:`cdc_spans_from_ends` as named columns across projections
    instead (sf1 A/B: 22.4 s for this form's spans vs ~2.5 s staged).
    """
    t = tokens(text)
    th = cdc_token_hashes(t)
    return cdc_spans_from_ends(cdc_ends(cdc_window_hashes(th), F.size(t), mod))
