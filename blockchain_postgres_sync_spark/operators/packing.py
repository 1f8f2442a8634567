"""Sequence chunking & packing for training-data pipelines.

A tokenized corpus is consumed by trainers in fixed-size context windows.
Two standard layouts, both implemented shuffle-minimally:

- :func:`doc_chunks` — split each document into consecutive windows of
  ``chunk_tokens`` tokens (the "chunking" layout: no document crosses a
  window, short tails kept).  Pure per-row explode — no shuffle at all; at
  100 TB this is a map-only stage that preserves the input partitioning.
- :func:`pack_concat` — the "concat-and-split" layout (GPT-style packing):
  documents are concatenated in a deterministic order inside each stream
  (e.g. language) and the stream is cut every ``budget`` tokens; a document
  is labeled with the bin its first token lands in and its offset there.
  One window (running sum per stream) — a single shuffle on the stream key.
- :func:`pack_greedy` — next-fit bin packing: walk documents in order,
  open a new bin whenever the next document would overflow ``budget``
  (documents never split).  Inherently sequential per stream, so it runs
  as an ``applyInPandas`` scan per stream group — the loop is O(|stream|)
  driver-free and each stream packs independently in parallel.  At 100 TB
  streams are the parallel unit; :func:`pack_greedy_sharded` is the
  skew-hardened form — :func:`shard_streams` auto-splits any stream over a
  row budget into hash shards (packing a shard is still valid packing) and
  shard-local bin ids get cumulative offsets so per-stream ids stay dense.

All token counts are whitespace-token counts (``functions.text.token_count``)
— integer-exact and engine-independent, so bin assignment is reproducible
bit-for-bit by any engine (the DuckDB oracles mirror the same window
algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def doc_chunks(
    df: DataFrame,
    chunk_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int | None = None,
) -> DataFrame:
    """Split each document into ``chunk_tokens``-token windows whose starts
    advance by ``stride`` tokens (default = chunk_tokens: consecutive,
    non-overlapping; stride < chunk_tokens gives the overlapping sliding
    windows used for long-context training and retrieval chunking).

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text) — one row per
    window, tail window possibly short, empty/short docs yield exactly one
    window.  In-row ``sequence`` + ``slice`` explode: no shuffle, no UDF;
    the plan is scan → generate → project, so at 100 TB it streams map-side
    and inherits the scan's partitioning.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    step = chunk_tokens if stride is None else stride
    if not 1 <= step <= chunk_tokens:
        raise ValueError(f"stride must be in [1, chunk_tokens], got {step}")
    toks = tokens(F.col(text_col))
    # windows start at 0, step, 2*step, ... while start < n_tokens — the
    # last window begins before the end, so every token lands in >= 1 window
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - chunk_tokens) / F.lit(float(step))).cast("long") + 1,
        F.lit(1).cast("long"),
    )
    e = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("_toks"), (F.col("chunk_idx") * step + 1).cast("int"), chunk_tokens
    )
    return e.select(
        id_col,
        "chunk_idx",
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_concat(
    df: DataFrame,
    budget: int = 512,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split packing: per stream, concatenate documents in
    ``id_col`` order and cut every ``budget`` tokens.

    Output per document: (id, stream, n_tokens, bin_id, bin_offset) where
    ``bin_id = floor(tokens_before / budget)`` (the bin holding the doc's
    first token) and ``bin_offset = tokens_before % budget``.  Documents may
    straddle bins — that is the point of this layout (zero padding waste).

    One running-sum window per stream: a single shuffle on ``stream_col``,
    partial-aggregation-free but sort-limited to each stream.  Skewed
    streams at 100 TB: shard them first (packing a shard is still valid
    packing) — see module docstring.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    n_tok = token_count(F.col(text_col)).cast("long")
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        df.select(F.col(id_col), F.col(stream_col), n_tok.alias("n_tokens"))
        .withColumn("_before", before)
        .select(
            id_col,
            stream_col,
            "n_tokens",
            F.expr(f"_before div {budget}L").alias("bin_id"),
            F.pmod(F.col("_before"), F.lit(budget)).cast("long").alias("bin_offset"),
        )
    )


def pack_greedy(
    df: DataFrame,
    budget: int = 512,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit packing: per stream (in ``id_col`` order), keep filling the
    current bin until the next document would overflow ``budget``, then open
    a new bin.  Documents never split; documents larger than ``budget`` get
    a bin of their own.

    Output per document: (id, stream, n_tokens, bin_id, bin_fill) with
    ``bin_fill`` the bin's running token count AFTER this document.

    The reset-on-overflow running sum is not a windowable recurrence
    (each prefix sum depends on every previous reset), so this is the one
    packing layout that needs imperative per-group code: ``applyInPandas``
    over the stream key — one shuffle, then an O(|stream|) numpy-backed scan
    per group, no driver participation.  Parallelism = number of streams;
    shard giant streams upstream (module docstring).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    import pandas as pd

    n_tok = token_count(F.col(text_col)).cast("long")
    slim = df.select(F.col(id_col), F.col(stream_col), n_tok.alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        counts = pdf["n_tokens"].to_numpy()
        bin_ids = [0] * len(counts)
        fills = [0] * len(counts)
        cur_bin, cur_fill = 0, 0
        for i, c in enumerate(counts):
            c = int(c)
            if cur_fill > 0 and cur_fill + c > budget:
                cur_bin += 1
                cur_fill = 0
            cur_fill += c
            bin_ids[i] = cur_bin
            fills[i] = cur_fill
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out_schema = (
        f"{id_col} long, {stream_col} string, n_tokens long, "
        "bin_id long, bin_fill long"
    )
    return slim.groupBy(stream_col).applyInPandas(pack, out_schema)


def shard_streams(
    df: DataFrame,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    max_stream_rows: int = 1_000_000,
) -> DataFrame:
    """Automatic skew-sharding for per-stream operators: add a ``_shard``
    column that splits any stream whose row count exceeds
    ``max_stream_rows`` into ``ceil(n / max_stream_rows)`` hash shards
    (streams under the budget keep one shard).

    The shard of a row is ``h31(id) % n_shards`` (the house md5-derived
    31-bit hash, :func:`..operators.sampling._hash31`) — deterministic,
    uniform, independent of row order, AND cross-engine exact (any engine
    that can md5 reproduces the shard split bit-for-bit, which is what
    lets ``pack_greedy_sharded`` carry a full DuckDB hash-check oracle
    instead of a rows-only check), so a shard is a fixed subset of
    its stream and any per-stream computation that is valid on a stream is
    valid on a shard (packing a shard is still valid packing).  The
    per-stream counts are a one-aggregate dimension (|streams| rows) that
    broadcasts; the corpus itself takes no extra shuffle here — the
    downstream groupBy((stream, _shard)) shuffles exactly once, same as the
    unsharded form, but with parallelism = total shard count instead of
    stream count and per-task memory bounded by ``max_stream_rows``.
    """
    if max_stream_rows < 1:
        raise ValueError(f"max_stream_rows must be >= 1, got {max_stream_rows}")
    from .sampling import _hash31

    counts = df.groupBy(stream_col).agg(F.count("*").alias("_n"))
    n_shards = F.ceil(F.col("_n") / F.lit(float(max_stream_rows))).cast("int")
    shards = counts.select(stream_col, n_shards.alias("_n_shards"))
    return df.join(F.broadcast(shards), stream_col).withColumn(
        "_shard",
        F.pmod(_hash31(F.col(id_col)), F.col("_n_shards")).cast("int"),
    ).drop("_n_shards")


def pack_greedy_sharded(
    df: DataFrame,
    budget: int = 512,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_stream_rows: int = 1_000_000,
) -> DataFrame:
    """:func:`pack_greedy` with automatic skew sharding (the module
    docstring's "shard giant streams upstream" advice as code).

    Each (stream, shard) packs independently with the same next-fit kernel;
    shard-local bin ids are then offset by the cumulative bin counts of the
    stream's lower-numbered shards, so ``bin_id`` stays dense and unique
    PER STREAM (0..total_bins-1) exactly like the unsharded output.  The
    offset table is one row per shard — a broadcast dimension — and the
    offset window runs over shards, not rows, so nothing here serializes.

    The no-overflow invariant (a bin's fill exceeds ``budget`` only when a
    single oversized document owns the bin) holds per shard and is
    preserved by the disjoint offsets.  Bin ASSIGNMENT differs from the
    unsharded form (shards interleave documents), which is fine for the
    training-data use: bins are a partition of the corpus either way.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    import pandas as pd

    n_tok = token_count(F.col(text_col)).cast("long")
    slim = shard_streams(
        df.select(F.col(id_col), F.col(stream_col), n_tok.alias("n_tokens")),
        stream_col=stream_col, id_col=id_col, max_stream_rows=max_stream_rows,
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        counts = pdf["n_tokens"].to_numpy()
        bin_ids = [0] * len(counts)
        fills = [0] * len(counts)
        cur_bin, cur_fill = 0, 0
        for i, c in enumerate(counts):
            c = int(c)
            if cur_fill > 0 and cur_fill + c > budget:
                cur_bin += 1
                cur_fill = 0
            cur_fill += c
            bin_ids[i] = cur_bin
            fills[i] = cur_fill
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out_schema = (
        f"{id_col} long, {stream_col} string, _shard int, n_tokens long, "
        "bin_id long, bin_fill long"
    )
    packed = slim.groupBy(stream_col, "_shard").applyInPandas(pack, out_schema)
    packed = packed.persist()
    _SHARD_CACHE.append(packed)
    while len(_SHARD_CACHE) > 1:
        _SHARD_CACHE.pop(0).unpersist()

    # per-shard bin counts -> cumulative offsets over lower shards of the
    # same stream (shard-count-sized dimension; window over shards is
    # partitioned by stream and tiny)
    bins_per_shard = packed.groupBy(stream_col, "_shard").agg(
        (F.max("bin_id") + 1).alias("_nbins")
    )
    w = (
        Window.partitionBy(stream_col)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bins_per_shard.withColumn(
        "_off", F.coalesce(F.sum("_nbins").over(w), F.lit(0).cast("long"))
    ).select(stream_col, "_shard", "_off")
    return (
        packed.join(F.broadcast(offsets), [stream_col, "_shard"])
        .select(
            id_col,
            stream_col,
            "n_tokens",
            (F.col("bin_id") + F.col("_off")).alias("bin_id"),
            "bin_fill",
        )
    )


#: previous pack_greedy_sharded call's persisted packed frame (released on
#: the next call; the returned frame reads from it lazily)
_SHARD_CACHE: list[DataFrame] = []


def quality_percentile_gate(
    df: DataFrame,
    keep_frac: float = 0.5,
    stream_col: str = "lang",
    score_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of each stream by a quality score:
    percentile-gated curation (each language keeps its own best half, so a
    verbose language can't crowd out a terse one — the standard per-stream
    quality cut in corpus curation).

    ``percent_rank`` over (score desc, id asc) — the tie-break makes the
    ordering total, so the rank (and the kept set) is deterministic and
    engine-independent: percent_rank = (rank-1)/(n-1) is a single IEEE
    divide over exact integers.  Rows with percent_rank <= keep_frac stay.

    One window per stream (single shuffle).  At 100 TB the exact window sort
    is the cost; when an approximate cut suffices, compute per-stream
    ``approx_percentile(score, 1-keep_frac)`` in one partial agg, broadcast
    the thresholds, and filter — no sort, same shuffle count, slightly
    ragged boundary.  The exact form is canonical here because the kept set
    must be reproducible across engines.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    w = Window.partitionBy(stream_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .drop("_pr")
    )


def quality_approx_gate(
    df: DataFrame,
    keep_frac: float = 0.5,
    stream_col: str = "lang",
    score_col: str = "n_tokens",
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB form of :func:`quality_percentile_gate`: per-stream
    ``approx_percentile`` threshold + broadcast filter — NO sort anywhere.

    One partial aggregation computes each stream's (1 - keep_frac)
    quantile (mergeable KLL-style sketch, map-side combined), the tiny
    threshold table broadcasts, and the corpus streams through a filter.
    The boundary is ragged by the sketch's rank error (~1/accuracy); use
    the exact window form when the kept set must be reproducible
    bit-for-bit across engines."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    thresholds = df.groupBy(stream_col).agg(
        F.percentile_approx(score_col, 1.0 - keep_frac, accuracy).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), stream_col)
        .filter(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )
