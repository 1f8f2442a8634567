"""Byte-pair-encoding tokenizer-training primitives.

Training-data pipeline extension (BASELINE.json north star): the
map-reduce formulation of BPE training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") over the corpus
word-frequency table.  No reference-repo analog — this is LLM-pipeline
surface, like operators/encoding.py's vocab/encode family.

Scale shape (100 TB): the corpus is scanned ONCE to build the word
frequency table (one shuffle, |vocab| rows ≪ corpus); every BPE iteration
after that operates on the vocab-sized frame only — one pair-count hash
aggregation (map-side partial) plus an in-row merge rewrite.  The driver
holds exactly one (left, right) pair per iteration (the argmax merge);
word/symbol state never leaves the executors.  Per-iteration lineage is
truncated with an eager localCheckpoint (house pattern — the frame is
vocab-sized, NOT corpus-sized, so executor-local storage is bounded and
the lost-executor recompute concern of corpus-scale checkpoints does not
apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .smallstate import DRIVER_STATE_THRESHOLD, collect_if_bounded

__all__ = [
    "word_frequencies",
    "adjacent_pair_counts",
    "top_merges",
    "merge_symbols",
    "bpe_train",
    "bpe_encode",
    "bpe_encode_dict",
]

#: Vocab-size cutoff for the driver-side merge loop (round-10 optimization).
#: BPE state after word_frequencies is VOCAB-sized (|distinct words|), not
#: corpus-sized — the same bounded-state situation as dedup.duplicate_clusters'
#: driver union-find; the shared guard (operators/smallstate.py) makes the
#: contract executable.  At or below the threshold the whole (word, freq)
#: table is collected ONCE and the merge recurrence runs in plain Python
#: (zero per-round Spark jobs); above it, the distributed per-round loop
#: runs unchanged.
DRIVER_VOCAB_THRESHOLD = DRIVER_STATE_THRESHOLD


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace token stream — the input table of
    BPE training.  One explode + ONE shuffle; output is vocab-sized.
    Empty-string tokens (consecutive separators) carry no pair signal and
    are dropped."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _symbol_pairs(symbols: F.Column) -> F.Column:
    """Adjacent (left, right) struct pairs of a symbol array, in-row —
    the zip-of-shifted-copies house pattern (functions/text.py
    token_shingles); zip_with's null tail padding marks the end and is
    filtered."""
    shifted = F.slice(symbols, 2, F.greatest(F.size(symbols) - 1, F.lit(1)))
    zipped = F.zip_with(
        symbols,
        shifted,
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return F.filter(zipped, lambda p: p["r"].isNotNull())


def adjacent_pair_counts(
    words: DataFrame,
    symbols_col: str = "symbols",
    freq_col: str = "freq",
) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts over the word table:
    the quantity BPE maximizes each merge step.  Pairs expand IN-ROW from
    each word's symbol array (no self-join), then ONE hash aggregation on
    (left, right) — map-side partial agg, vocab-sized input."""
    return (
        words.select(
            F.explode(_symbol_pairs(F.col(symbols_col))).alias("_pr"),
            F.col(freq_col).alias("_f"),
        )
        .groupBy(
            F.col("_pr.l").alias("left"), F.col("_pr.r").alias("right")
        )
        .agg(F.sum("_f").cast("long").alias("pair_count"))
    )


def top_merges(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Top-k first-iteration merge candidates (character pairs) straight
    from a document table — word frequencies, initial character symbols,
    pair counts, deterministic (count desc, left, right) order.  One
    corpus scan + two vocab-sized shuffles + TakeOrdered top-k."""
    words = word_frequencies(df, text_col).withColumn(
        "symbols", F.split(F.col("word"), "")
    )
    return (
        adjacent_pair_counts(words)
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(k)
    )


def merge_symbols(symbols: F.Column, left: str, right: str) -> F.Column:
    """Apply ONE merge to a symbol array in-row: single left-to-right
    non-overlapping pass (the classic scan: on match emit left||right and
    consume both, else emit and advance one).  A fold carrying
    (pending_symbol, output) — O(n) per word, no captured re-evaluated
    subexpressions (the HOF no-CSE gotcha)."""
    merged = left + right
    fold = F.aggregate(
        symbols,
        F.struct(
            F.lit(None).cast("string").alias("pend"),
            F.array().cast("array<string>").alias("out"),
        ),
        lambda s, c: F.struct(
            F.when(
                (s["pend"] == F.lit(left)) & (c == F.lit(right)),
                F.lit(None).cast("string"),
            )
            .otherwise(c)
            .alias("pend"),
            F.when(
                (s["pend"] == F.lit(left)) & (c == F.lit(right)),
                F.concat(s["out"], F.array(F.lit(merged))),
            )
            .when(s["pend"].isNull(), s["out"])
            .otherwise(F.concat(s["out"], F.array(s["pend"])))
            .alias("out"),
        ),
        lambda s: F.when(
            s["pend"].isNull(), s["out"]
        ).otherwise(F.concat(s["out"], F.array(s["pend"]))),
    )
    return fold


def _merge_tuple(syms: tuple, left: str, right: str) -> tuple:
    """Plain-Python twin of :func:`merge_symbols`: one left-to-right
    non-overlapping pass (on match emit left+right and consume both)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_train_driver(
    freqs: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The exact bpe_train recurrence over a collected (word, freq) table:
    frequency-weighted adjacent pair counts, argmax on
    (count desc, left asc, right asc), one non-overlapping merge pass per
    round.  Pure integer/string arithmetic — bit-identical to the
    distributed loop (pinned by tests/test_bpe.py)."""
    wf: dict[tuple, int] = {}
    for w, f in freqs.items():
        t = tuple(w)
        wf[t] = wf.get(t, 0) + f
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in wf.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, int(cnt)))
        nxt: dict[tuple, int] = {}
        for syms, f in wf.items():
            m = _merge_tuple(syms, left, right)
            nxt[m] = nxt.get(m, 0) + f
        wf = nxt
    return merges


#: shared guard (operators/smallstate.py); kept under the old private name
#: for the module's tests
_collect_if_bounded = collect_if_bounded


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    driver_vocab_threshold: int = DRIVER_VOCAB_THRESHOLD,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a document table; returns the
    merge table (step, left, right, pair_count) as a DataFrame.

    Inherently iterative (each merge depends on the previous rewrite), so
    the loop runs on the driver — but per iteration only the ONE argmax
    row is collected; the vocab-sized symbol table stays distributed and
    is checkpointed each round (lineage truncation, house pattern).  Ties
    break deterministically on (count desc, left asc, right asc), so the
    learned table is engine- and partitioning-independent.  Stops early
    when no adjacent pair remains.

    Small-vocab fast path (round-10): when the corpus reduces to at most
    ``driver_vocab_threshold`` distinct BMP-only words, the (word, freq)
    table is collected once and the identical recurrence runs in plain
    Python — n_merges Spark jobs (each a full pair-count shuffle plus an
    argmax TakeOrdered) collapse to one bounded collect.  Pass 0 to force
    the distributed loop.
    """
    spark = df.sparkSession
    wf = word_frequencies(df, text_col)
    if driver_vocab_threshold:
        rows = _collect_if_bounded(wf, "word", driver_vocab_threshold)
        if rows is not None:
            merges = _bpe_train_driver(
                {r["word"]: int(r["freq"]) for r in rows}, n_merges
            )
            return spark.createDataFrame(
                merges, "step long, left string, right string, pair_count long"
            )
    words = (
        wf
        .withColumn("symbols", F.split(F.col("word"), ""))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        best = (
            adjacent_pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((step, left, right, int(cnt)))
        words = words.withColumn(
            "symbols", merge_symbols(F.col("symbols"), left, right)
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step long, left string, right string, pair_count long"
    )


def bpe_train_encode_dict(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_vocab_threshold: int = DRIVER_VOCAB_THRESHOLD,
) -> DataFrame:
    """``bpe_encode_dict(df, collect(bpe_train(df)))`` with ONE vocab
    materialization (round-10): train and dictionary segmentation both
    operate on the same vocab-sized state, so on the small-vocab driver
    path the single (word, freq) collect feeds the merge loop AND the
    per-distinct-word segmentation — the separate distinct-token scan
    bpe_encode_dict would run disappears.  Output is row-identical to the
    two-step composition (pinned by test_bpe_train_encode_dict_fused);
    above the threshold it simply runs the two-step form.
    """
    wf = word_frequencies(df, text_col)
    rows = (
        _collect_if_bounded(wf, "word", driver_vocab_threshold)
        if driver_vocab_threshold
        else None
    )
    if rows is None:
        table = bpe_train(df, n_merges=n_merges, text_col=text_col)
        merges = [
            (r["left"], r["right"])
            for r in sorted(table.collect(), key=lambda r: r["step"])
        ]
        return bpe_encode_dict(df, merges, text_col=text_col, id_col=id_col)
    merge_rows = _bpe_train_driver(
        {r["word"]: int(r["freq"]) for r in rows}, n_merges
    )
    merges = [(left, right) for _, left, right, _ in merge_rows]
    seg_rows = []
    for r in rows:
        s = tuple(r["word"])
        for left, right in merges:
            s = _merge_tuple(s, left, right)
        seg_rows.append((r["word"], list(s)))
    dictionary = df.sparkSession.createDataFrame(
        seg_rows, "word string, _pieces array<string>"
    )
    return _assemble_pieces(df, dictionary, text_col, id_col)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a learned merge table: per word, apply the
    merges IN ORDER, one full left-to-right pass each (the same pass
    :func:`bpe_train` used to learn them, so train→encode round-trips).

    Map-only — zero shuffle: tokenize, split to characters, chain
    ``len(merges)`` in-row folds.  The expression chain grows linearly
    with the merge table; for production-size tables (10k+) encode via a
    broadcast merge list in an Arrow-batched pandas UDF instead — this
    Catalyst form is for the bounded tables bpe_train produces.
    """
    sym = F.transform(
        # empty-string words (consecutive separators / empty docs) match
        # word_frequencies' drop — they contribute no pieces
        F.filter(tokens(F.col(text_col)), lambda w: w != ""),
        lambda w: F.split(w, ""),
    )

    def _apply_one(col_expr: F.Column, lf: str, rt: str) -> F.Column:
        # closure (not lambda defaults): pyspark counts default params as
        # HOF lambda arity, and late binding would capture the loop vars
        return F.transform(col_expr, lambda s: merge_symbols(s, lf, rt))

    out = F.col("_syms")
    for left, right in merges:
        out = _apply_one(out, left, right)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), sym.alias("_syms"))
        .select(
            F.col(id_col),
            F.flatten(out).alias("pieces"),
        )
    )


def bpe_encode_dict(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_vocab_threshold: int = DRIVER_VOCAB_THRESHOLD,
) -> DataFrame:
    """Dictionary-form corpus segmentation: identical output to
    :func:`bpe_encode`, but the merge-fold chain runs ONCE PER DISTINCT
    WORD (vocabulary-sized) instead of once per token occurrence, and
    documents reassemble by joining their token streams to the segmented
    dictionary — the corpus-scale shape (BPE segmentation is a pure
    function of the word, so fold work should be |vocab|, not |tokens|;
    the bpe_encode_pieces query dropped 17.4 s -> 6.3 s at sf0.1, of
    which ~2.5 s is the 10-round training itself).

    Plan: one corpus scan builds the distinct-word dictionary (one
    vocab-sized shuffle), the fold chain maps over it, a second scan
    posexplodes the token stream and equi-joins the dictionary (vocab
    side broadcasts when small; at open-web scale it shuffle-joins), and
    one doc-keyed aggregation reassembles pieces in token order
    (array_sort(collect_list(struct(pos, pieces))) — the encode_docs
    idiom).  Empty-string tokens are dropped on BOTH sides, matching
    :func:`bpe_encode`; documents whose every token is empty still emit
    a row with zero pieces (left join back to the doc frame).
    """
    docs = df.filter(F.col(text_col).isNotNull())
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    dictionary = None
    if driver_vocab_threshold:
        # small-vocab fast path (round-10, same guard as bpe_train): the
        # dictionary is VOCAB-sized, so segment it driver-side in one
        # bounded collect instead of executing len(merges) chained
        # in-row folds (a deep Catalyst expression tree whose planning +
        # codegen dominate at bounded vocab).  Distributed fold chain
        # stays for open-web vocabularies.
        rows = _collect_if_bounded(vocab, "word", driver_vocab_threshold)
        if rows is not None:
            seg_rows = []
            for r in rows:
                s = tuple(r["word"])
                for left, right in merges:
                    s = _merge_tuple(s, left, right)
                seg_rows.append((r["word"], list(s)))
            dictionary = df.sparkSession.createDataFrame(
                seg_rows, "word string, _pieces array<string>"
            )
    if dictionary is None:
        seg = F.split(F.col("word"), "")
        for left, right in merges:
            # closure capture per iteration (pyspark HOF lambda-arity gotcha)
            def _one(col_expr: F.Column, lf: str = left, rt: str = right):
                return merge_symbols(col_expr, lf, rt)

            seg = _one(seg)
        dictionary = vocab.select("word", seg.alias("_pieces"))
    return _assemble_pieces(df, dictionary, text_col, id_col)


def _assemble_pieces(
    df: DataFrame, dictionary: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Reassemble per-document pieces from a (word, _pieces) dictionary:
    posexplode the token stream, equi-join the dictionary, re-sort by
    position in-row, left-join back so all-empty documents keep a row."""
    docs = df.filter(F.col(text_col).isNotNull())
    stream = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(F.col(text_col)), lambda w: w != "")
        ).alias("_pos", "word"),
    )
    assembled = (
        stream.join(dictionary, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_pieces"))
                    ),
                    lambda s: s["_pieces"],
                )
            ).alias("pieces")
        )
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("pieces"), F.array().cast("array<string>")
            ).alias("pieces"),
        )
    )
