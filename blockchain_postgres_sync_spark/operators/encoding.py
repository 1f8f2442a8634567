"""Token dictionary encoding: vocabulary build + document-to-ids encode.

The last step before a text corpus becomes trainer input: map each token to
a dense integer id.  Two operators, both deterministic and engine-exact:

- :func:`build_vocab` — (token, token_id, count) with ids assigned by
  (count desc, token asc) rank.  The heavy part (per-token counts) is a
  map-side-combined aggregation over the exploded corpus — one shuffle
  whose reduce side is VOCABULARY-sized, not corpus-sized.  The id
  assignment is a distributed TWO-PHASE rank (no single-partition window):
  range-partition the vocabulary by the rank order, number rows locally
  inside each sorted partition (map-only cumcount), then add broadcast
  per-partition offsets.  Global id = offset[pid] + local index, exact
  because range partitioning gives a strict cross-partition order on the
  unique (count desc, token asc) key.  A URL/code-heavy 100 TB corpus can
  push the vocabulary past memory-of-one-task; this form never
  concentrates it.
- :func:`encode_docs` — (doc_id, n_tokens, token_ids array) with ids in
  document order.  posexplode → broadcast-join the vocab → re-assemble with
  ``array_sort(collect_list(struct(pos, id)))``.  One shuffle on doc_id;
  the vocab side broadcasts (it is the small dimension by definition).
  Unknown tokens (below ``min_count``) encode as ``oov_id``.

Reference analog: the engine generalizes the reference's `to_tsvector`
search-token surface (up.sql:703-705) to the trainer-facing encode.

Storage lifetimes: the small frames these operators ``localCheckpoint``
(the numbered rank frame in :func:`rank_vocab`, the vector frame in
:func:`tfidf_rerank`) live in executor local storage until the Python/JVM
references are GC'd (Spark's ContextCleaner) — there is no deterministic
release hook for checkpointed RDDs.  All of them are vocabulary- or
result-sized, never corpus-sized; long-lived sessions that loop over
many builds should drop their references (or call
:func:`release_caches` for the persisted frames, which DO have a
deterministic release path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens
from .smallstate import DRIVER_STATE_THRESHOLD, collect_if_bounded

#: holds the previous build_vocab / tfidf_vectorize call's persisted frames
#: until the next call.  Cost-only: each is a deterministic aggregation, so
#: an early eviction merely recomputes it — correctness never depends on
#: this cache (rank frames are localCheckpoint-ed instead, see build_vocab).
_VOCAB_CACHE: list[DataFrame] = []


def release_caches() -> None:
    """Deterministically unpersist the module's cost-only persisted frames
    (the checkpointed frames are released by GC via ContextCleaner)."""
    while _VOCAB_CACHE:
        _VOCAB_CACHE.pop().unpersist()


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    rank_partitions: int | None = None,
) -> DataFrame:
    """(token, token_id, count), ids dense from 0 by (count desc, token asc).

    The (count, token) ordering is total, so ids are reproducible on any
    engine; ``min_count`` drops the long tail before ranking.

    Id assignment is a distributed two-phase rank:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on
       (count desc, token asc) — partition *i*'s rows all sort-precede
       partition *i+1*'s (tokens are unique, so no boundary-tie ambiguity),
       and each partition is internally sorted.
    2. a map-only JVM-side cumcount (the ``monotonically_increasing_id``
       idiom over the sorted partitions) stamps the local index — no
       window, no second exchange, no python workers.
    3. per-partition offsets are a running-sum window over the
       per-partition row counts — a frame of ≤ ``rank_partitions`` rows,
       so its single-partition exchange is bounded by config, never by
       data (NOT a corpus serialization point); ``token_id =
       offset[pid] + local index``.

    The numbered frame is ``localCheckpoint``-ed (lazy): range boundaries
    come from SAMPLING, so the offsets branch and the output branch must
    read ONE materialization, never recompute the exchange with
    potentially re-drawn boundaries.  The checkpoint freezes the sampled
    partitioner inside one RDD lineage, so the returned DataFrame stays
    self-consistent for its whole lifetime — independent of the module
    cache (interleaved build_vocab calls cannot invalidate an earlier
    result).  ``counts`` is persisted for cost only (the partitioner's
    sampling pass and the shuffle pass read the aggregation once);
    the cache is vocabulary-bounded and released on the next
    build_vocab call, and early eviction is harmless (deterministic
    recompute).  Constructing the checkpoint runs the partitioner's
    small sampling job eagerly; the vocabulary itself still
    materializes on first consumption.
    """
    release_caches()
    counts = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
        .persist()
    )
    _VOCAB_CACHE.append(counts)
    return rank_vocab(counts, rank_partitions=rank_partitions)


def rank_vocab(
    counts: DataFrame,
    rank_partitions: int | None = None,
    driver_threshold: int = DRIVER_STATE_THRESHOLD,
) -> DataFrame:
    """Assign dense ids 0..n-1 to a (token, count) frame by
    (count desc, token asc) — the distributed two-phase rank behind
    :func:`build_vocab`, reusable when the counts already exist (e.g.
    derived from a (doc, token, tf) pair stream, see
    :func:`tfidf_vectorize`).

    PRECONDITION: ``token`` values must be UNIQUE — the strict
    cross-partition order (and hence the exact dense ids) relies on the
    (count desc, token asc) key being total.  Duplicate tokens make the
    range-boundary ordering ambiguous and the assigned ids
    nondeterministic; internal callers guarantee uniqueness because
    counts come from a groupBy("token").

    Columns beyond (token, count) are carried through unchanged to the
    output (after token_id), so a caller can rank a counts frame that
    already aggregates other per-token statistics (e.g. document
    frequency) without a re-join.

    Small-vocab fast path (round-10): the (token, count) frame is MODEL
    state — the tokenizer's vocabulary — so at or below
    ``driver_threshold`` BMP-only rows it is collected once and ranked in
    plain Python (same total (count desc, token asc) order; BMP-only
    strings sort identically in UTF-16 code units and code points).  The
    4-job distributed rank chain (range-partitioner sampling,
    localCheckpoint materialization, per-partition sizes, offset join)
    collapses to one bounded collect.  Pass 0 to force the distributed
    rank; open-web vocabularies over the threshold take it automatically
    (operators/smallstate.py)."""
    spark = counts.sparkSession
    if driver_threshold:
        rows = collect_if_bounded(counts, "token", driver_threshold)
        if rows is not None:
            extras = [c for c in counts.columns if c not in ("token", "count")]
            ordered = sorted(rows, key=lambda r: (-r["count"], r["token"]))
            fields = {f.name: f for f in counts.schema.fields}
            out_schema = T.StructType(
                [fields["token"], T.StructField("token_id", T.LongType(), False),
                 fields["count"]]
                + [fields[e] for e in extras]
            )
            data = [
                tuple([r["token"], i, r["count"]] + [r[e] for e in extras])
                for i, r in enumerate(ordered)
            ]
            return spark.createDataFrame(data, out_schema)
    nparts = rank_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    order = [F.col("count").desc(), F.col("token").asc()]
    # local index via the monotonic-id idiom: after the range exchange +
    # in-partition sort, monotonically_increasing_id() is (pid << 33) +
    # row-position-in-partition — the cumcount, computed entirely JVM-side
    # (no Arrow round-trip, no python workers in the rank path)
    mid = F.monotonically_increasing_id()
    extras = [c for c in counts.columns if c not in ("token", "count")]
    numbered = (
        counts.repartitionByRange(nparts, *order)
        .sortWithinPartitions(*order)
        .select(
            "token",
            "count",
            *extras,
            F.spark_partition_id().alias("_pid"),
            mid.bitwiseAND(F.lit((1 << 33) - 1)).alias("_lix"),
        )
        .localCheckpoint(eager=False)
    )

    sizes = numbered.groupBy("_pid").agg(F.count("*").alias("_n"))
    # exclusive prefix sum over the ≤rank_partitions-row sizes frame; the
    # no-partition window is bounded by config, not data
    prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_n").over(prefix), F.lit(0))
        .cast("long")
        .alias("_off"),
    )
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .select(
            "token",
            (F.col("_off") + F.col("_lix")).alias("token_id"),
            "count",
            *extras,
        )
    )


def encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, n_tokens, token_ids) — each document as its token-id sequence.

    The struct sort key is (pos, id): pos is unique per document, so the
    re-assembly order is total and the output arrays are deterministic
    under any partitioning.

    ``broadcast_vocab=True`` (default) pins the map-side hash join — right
    for any vocabulary that fits an executor (up to a few tens of millions
    of tokens).  Pass ``False`` for a URL/code-scale vocabulary past
    broadcast size: the join becomes a shuffle join on ``token`` and both
    sides scale out; the rest of the plan is unchanged."""
    exploded = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    vocab_side = vocab.select("token", "token_id")
    if broadcast_vocab:
        vocab_side = F.broadcast(vocab_side)
    joined = exploded.join(vocab_side, "token", "left")
    assembled = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos").alias("pos"),
                        F.coalesce(
                            F.col("token_id"), F.lit(oov_id).cast("long")
                        ).alias("tid"),
                    )
                )
            ),
            lambda s: s["tid"],
        ).alias("token_ids"),
    )
    return assembled


def tfidf_vectorize(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    broadcast_model: bool = True,
) -> DataFrame:
    """Sparse tf-idf document vectors — the text→vector bridge between the
    token pipeline (vocab/encode) and the embedding operators.

    Per document: ``token_ids`` ascending and the parallel ``weights_x1m``
    where ``weight = tf * 1e6 // df`` — the integer-exact df-normalized
    term frequency (same engine-reproducible scoring family as
    ``stats.salient_terms``: no logarithm, so no cross-engine libm
    dependence; rarer terms still up-weight).  ``df`` counts DOCUMENTS
    containing the term.  Out-of-vocabulary tokens (below ``min_count``)
    are dropped from the vector.

    Plan shape: a single explode feeds the (doc, token) tf hash-agg
    (map-side combined).  The self-built-vocab path tokenizes the corpus
    in up to THREE runtime stages (rank_vocab's range-partitioner
    sampling job, its localCheckpoint materialization job — which cuts
    the model subtree into its own job, defeating cross-job exchange
    reuse — and the final tf-side scan); each re-run is the map-only
    tokenize+partial-agg.  Deliberately NOT re-materialized: the A/B at
    sf0.1 (fresh sessions, noop sink, min of 3) measured
    no-materialization 1.55 s == localCheckpoint 1.57 s < MEMORY_AND_DISK
    persist 1.98 s — the round-6 persist paid ~25% to materialize a
    corpus-scale frame, costing more than the repeated map-only scans it
    saved, and persisting also traded away lineage-only recovery.  A
    100 TB caller for whom scans dominate should pass a prebuilt
    ``vocab=`` (the vocab path tokenizes twice) or persist ``docs``
    upstream.  The final plan is pinned to exactly one scan + one explode
    (tests/test_plans.py::test_tfidf_vectorize_single_tokenize) so a NEW
    in-plan consumer cannot silently add a fourth pass.  When no vocab is
    passed, total counts AND document frequencies come from ONE
    aggregation on the token key and ride through :func:`rank_vocab`'s
    extra-column passthrough — no separate dfreq aggregation, no
    vocab-to-dfreq join.  The (token_id, df) model is vocab-sized and
    joins broadcast by default (``broadcast_model=False`` shuffle-joins
    past broadcast size); the final per-doc array assembly groups on the
    id.  Array order is a total (token_id) sort in-row —
    partitioning-independent.
    """
    release_caches()
    pairs = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    if vocab is None:
        # one aggregation yields both the ranking count (sum of tf) and the
        # document frequency (row count per token); rank_vocab carries _df
        # through, so the model needs no second aggregation and no join
        stats = (
            pairs.groupBy("token")
            .agg(
                F.sum("_tf").cast("long").alias("count"),
                F.count(F.lit(1)).alias("_df"),
            )
            .filter(F.col("count") >= min_count)
        )
        model = rank_vocab(stats).select("token", "token_id", "_df")
    else:
        dfreq = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
        model = vocab.select("token", "token_id").join(dfreq, "token")
    model = F.broadcast(model) if broadcast_model else model
    scored = pairs.join(model, "token").select(
        F.col(id_col),
        F.col("token_id"),
        F.expr("(_tf * 1000000) div _df").cast("long").alias("_w"),
    )
    assembled = scored.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("token_id", "_w"))).alias("_tw")
    )
    return assembled.select(
        id_col,
        F.transform(F.col("_tw"), lambda s: s["token_id"]).alias("token_ids"),
        F.transform(F.col("_tw"), lambda s: s["_w"]).alias("weights_x1m"),
        F.size(F.col("_tw")).cast("int").alias("n_terms"),
    )


def _pair_score_batch(ta, wa, tb, wb):
    """Arrow kernel for :func:`tfidf_rerank`'s pair scoring (one batch):
    flatten both sides' (token_ids, weights) arrays, lift each row's ids
    into a disjoint ``row * 2^32`` key range, argsort the b-side once,
    then ONE ``searchsorted`` resolves every a-token's match in every
    pair — C-level merge-intersection across the whole batch instead of
    a per-row ``map_from_arrays`` build + interpreted ``aggregate`` fold
    (~50M boxed lambda evals/s, the round-9/10 HOF ceiling).  All dot /
    norm accumulation is int64 (exact, order-free — token_ids are
    distinct per vector); the cosine floors the identical float64
    expression the HOF form evaluates, so scores are bit-identical
    (pinned by tests/test_encoding.py::test_rerank_kernel_hof_parity).
    Shares the HOF path's int64 domain (sum of w_a*w_b < 2^63)."""
    import numpy as np
    import pandas as pd

    n = len(ta)
    dots = np.zeros(n, dtype=np.int64)
    n2a = np.zeros(n, dtype=np.int64)
    n2b = np.zeros(n, dtype=np.int64)
    if n:
        def flat(col):
            lens = np.fromiter(
                (0 if x is None else len(x) for x in col),
                dtype=np.int64,
                count=n,
            )
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            vals = (
                np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in col
                     if x is not None and len(x)]
                )
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            return rows, vals

        ra, A = flat(ta)
        _, WA = flat(wa)
        rb, B = flat(tb)
        _, WB = flat(wb)
        for ids in (A, B):
            if ids.size and (ids.min() < 0 or ids.max() >= 1 << 32):
                # the row-offset key packing needs ids in [0, 2^32);
                # dense-rank vocab ids always are — hashed 64-bit ids
                # must go through tfidf_rerank_hof's map lookup instead
                raise ValueError(
                    "tfidf_rerank kernel requires token ids in [0, 2^32) "
                    "(dense vocabulary ranks); use tfidf_rerank_hof for "
                    "wider id domains"
                )
        np.add.at(n2a, ra, WA * WA)
        np.add.at(n2b, rb, WB * WB)
        KB = (rb << np.int64(32)) + B
        order = np.argsort(KB, kind="stable")  # already sorted when the
        KB, WBs = KB[order], WB[order]         # vectors came id-sorted
        if len(KB) and len(A):
            KA = (ra << np.int64(32)) + A
            idx = np.searchsorted(KB, KA)
            safe = np.minimum(idx, len(KB) - 1)
            match = (idx < len(KB)) & (KB[safe] == KA)
            np.add.at(dots, ra[match], WA[match] * WBs[safe[match]])
    denom = np.sqrt(n2a.astype(np.float64)) * np.sqrt(n2b.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(
            denom > 0.0,
            np.floor(dots.astype(np.float64) * 1000000.0 / denom),
            0.0,
        ).astype(np.int64)
    return pd.DataFrame({"dot_w2": dots, "cos_x1m": cos})


def tfidf_rerank(
    pairs: DataFrame,
    vectors: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    vec_id: str = "doc_id",
    materialize_vectors: bool = True,
) -> DataFrame:
    """Second-stage reranking: score candidate pairs (from MinHash-LSH,
    SimHash, or any blocking stage) by EXACT tf-idf similarity — the
    standard two-phase retrieval shape (cheap recall stage -> exact
    precision stage over the small candidate set).

    ``vectors`` is :func:`tfidf_vectorize` output; the dot product is
    exact integer arithmetic (sum of w_a * w_b over shared token_ids — no
    float order sensitivity), and ``cos_x1m`` floors one float expression
    mirrored verbatim in the oracle.  Pairs sharing no in-vocabulary token
    score dot 0 and are dropped (they carry no lexical evidence).

    Plan shape (100 TB): two joins of the (small) pair frame against the
    vector table — each a plain hash join keyed on a doc id, no fan-out —
    then the dot resolves IN-ROW by a batch-flattened Arrow
    merge-intersection kernel (:func:`_pair_score_batch`; no explode, no
    (pair, token) shuffle — the per-row ``map_from_arrays`` + interpreted
    fold form is kept as :func:`tfidf_rerank_hof`, round-10).  Work is
    O(|pairs| * avg_terms), independent of corpus size.

    ``vectors`` is consumed TWICE (a-side and b-side).  The divergent join
    keys break Catalyst exchange canonicalization, so without
    materialization the whole vectorization subplan — tokenize + two
    corpus aggregations — plans and RUNS twice.  A lazy ``localCheckpoint``
    pins one materialization for both branches (house pattern, see
    ``stats.unigram_logprob``); measured ~1.6x on the registered
    rerank query.  Pass ``materialize_vectors=False`` when the frame is
    ALREADY materialized (a table read from disk, or checkpointed
    upstream) — the unconditional checkpoint would store a redundant full
    copy in executor local storage for no reuse benefit.
    """
    j = _rerank_joined(pairs, vectors, id_a, id_b, vec_id, materialize_vectors)
    # non-deterministic marking stops the optimizer from pushing the
    # dot_w2 > 0 filter BELOW the projection with a duplicated kernel
    # node (guide §4.4) — the kernel is pure, the mark is plan-shaping
    score = F.pandas_udf(
        _pair_score_batch, "dot_w2 long, cos_x1m long"
    ).asNondeterministic()(
        F.col("_ta"), F.col("_wa"), F.col("_tb"), F.col("_wb")
    )
    out = j.withColumn("_s", score).select(
        id_a,
        id_b,
        F.col("_s.dot_w2").alias("dot_w2"),
        F.col("_s.cos_x1m").alias("cos_x1m"),
    )
    return out.filter(F.col("dot_w2") > 0)


def _rerank_joined(
    pairs: DataFrame,
    vectors: DataFrame,
    id_a: str,
    id_b: str,
    vec_id: str,
    materialize_vectors: bool,
) -> DataFrame:
    """The shared attach stage of :func:`tfidf_rerank` / the ``_hof``
    form: both sides' (token_ids, weights) arrays joined onto the pair
    frame."""
    if materialize_vectors:
        vectors = vectors.localCheckpoint(eager=False)
    va = vectors.select(
        F.col(vec_id).alias(id_a),
        F.col("token_ids").alias("_ta"),
        F.col("weights_x1m").alias("_wa"),
    )
    vb = vectors.select(
        F.col(vec_id).alias(id_b),
        F.col("token_ids").alias("_tb"),
        F.col("weights_x1m").alias("_wb"),
    )
    return pairs.select(id_a, id_b).join(va, id_a).join(vb, id_b)


def tfidf_rerank_hof(
    pairs: DataFrame,
    vectors: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    vec_id: str = "doc_id",
    materialize_vectors: bool = True,
) -> DataFrame:
    """Pure-Catalyst expression form of :func:`tfidf_rerank` (per-row
    ``map_from_arrays`` lookup + in-row ``aggregate`` dot fold) — kept as
    the cross-implementation parity pin, for sessions where Python
    workers are unavailable, and for token-id domains outside the
    kernel's [0, 2^32) packing range."""
    j = _rerank_joined(pairs, vectors, id_a, id_b, vec_id, materialize_vectors)
    mb = F.map_from_arrays(F.col("_tb"), F.col("_wb"))
    za = F.arrays_zip(F.col("_ta"), F.col("_wa"))
    dot = F.aggregate(
        za,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.coalesce(F.element_at(mb, s["_ta"]), F.lit(0).cast("long"))
        * s["_wa"],
    )

    def n2(col: str) -> Column:
        return F.aggregate(
            F.col(col), F.lit(0).cast("long"), lambda acc, w: acc + w * w
        )

    out = j.select(
        id_a,
        id_b,
        dot.alias("dot_w2"),
        F.floor(
            dot.cast("double")
            * 1000000.0
            / (F.sqrt(n2("_wa").cast("double")) * F.sqrt(n2("_wb").cast("double")))
        ).cast("long").alias("cos_x1m"),
    )
    return out.filter(F.col("dot_w2") > 0)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1_x10: int = 12,
    b_x100: int = 75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval for ONE query (Robertson/Spärck Jones Okapi
    BM25, the public formula) — the lexical-retrieval counterpart of
    :func:`tfidf_rerank`, and the standard first stage of a
    retrieve-then-rerank stack over a training corpus.

    Integer-exact scoring (the ``unigram_logprob`` quantization recipe):
    the ONLY float op is one ``ln`` per query term on the 1-row stats
    frame — ``idf_x1000 = floor(1000 * ln((D - df + 0.5)/(df + 0.5) + 1))``
    — quantized immediately; everything per-document is integer
    arithmetic on BM25's rational terms, so scores are associative,
    partitioning-independent, and engine-comparable:

    - ``ratio_x1000 = floor(1000 * dl * D / T)`` (dl/avgdl with
      avgdl = T/D) computed overflow-safe as ``dl*q + (dl*r) div T``
      where ``q, r = divmod(1000*D, T)`` — exact because
      ``floor(a*b/c) = b*(a div c) + (b*(a mod c)) div c`` for
      non-negative integers; every intermediate stays under 2^63 since
      ``dl * (1000*D mod T) < dl * T`` ≈ doc_len × corpus_tokens, i.e.
      ~10^6 × ~10^12 at the 100 TB design point.
    - ``k1term_x1000  = (k1_x10 * ((1000 - 10*b_x100)
      + (b_x100 * ratio_x1000) div 100)) div 10`` — BM25's
      ``k1 * (1 - b + b*dl/avgdl)`` length normalizer, x1000.
    - ``tfnorm_x1000  = (tf * (k1_x10+10) * 100000)
      div (1000*tf + k1term_x1000)`` — the saturating
      ``tf*(k1+1) / (tf + k1*(...))`` term, x1000.
    - ``score_x1000   = (sum_i idf_x1000_i * tfnorm_x1000_i) div 1000``
      (terms with tf = 0 contribute exactly 0; one final floor).

    Plan shape — ZERO corpus shuffle: per-document ``dl`` and per-term
    ``tf`` are map-only via ``size(tokens)`` and
    ``size(toks) - size(array_remove(toks, term))`` (``array_remove`` is
    a codegen'd Catalyst builtin, not a lambda HOF — no interpreted-HOF
    path in the hot per-row expression).  Corpus totals (D, T) and the
    per-term document frequencies come from ONE 1-row aggregation whose
    result rides a broadcast crossJoin back onto the map-only frame
    (house rule: never a driver collect), and the final top-k is an
    ``orderBy(...).limit(k)`` TakeOrdered — no global sort.  Two
    column-pruned map-only corpus scans total (stats pass + scoring
    pass); at 100 TB the scans dominate and nothing shuffles.

    Only documents matching >= 1 query term are candidates; ties break
    on ascending ``id_col`` so the top-k frontier is total-ordered.
    Returns ``(id_col, dl, n_matched_terms, score_x1000)``.

    Reference analog: generalizes the reference's `to_tsvector('simple')`
    asset-name search surface (up.sql:703-705) from boolean match to
    ranked retrieval.
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    n = len(terms)
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    per_doc = base.select(
        id_col,
        F.size("_toks").cast("long").alias("dl"),
        *[
            (F.size("_toks") - F.size(F.array_remove("_toks", t)))
            .cast("long")
            .alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("_D"),
        F.sum("dl").cast("long").alias("_T"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(n)
        ],
    )
    idf_cols = [
        F.floor(
            F.log(
                ((F.col("_D") - F.col(f"_df{i}")).cast("double") + 0.5)
                / (F.col(f"_df{i}").cast("double") + 0.5)
                + 1.0
            )
            * 1000.0
        ).cast("long").alias(f"_idf{i}")
        for i in range(n)
    ]
    stats = stats.select(
        "_D",
        "_T",
        F.expr("(1000 * _D) div _T").alias("_q"),
        F.expr("(1000 * _D) % _T").alias("_r"),
        *idf_cols,
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    # the shared BM25 pieces as SQL text (every column below is integer)
    ratio = "(dl * _q + (dl * _r) div _T)"
    k1term = (
        f"(({k1_x10} * ({1000 - 10 * b_x100}"
        f" + ({b_x100} * {ratio}) div 100)) div 10)"
    )

    def tfnorm(i: int) -> str:
        return (
            f"((_tf{i} * {(k1_x10 + 10) * 100000})"
            f" div (1000 * _tf{i} + {k1term}))"
        )

    score = (
        "("
        + " + ".join(f"_idf{i} * {tfnorm(i)}" for i in range(n))
        + ") div 1000"
    )
    matched = " + ".join(f"IF(_tf{i} > 0, 1, 0)" for i in range(n))
    out = scored.select(
        id_col,
        F.col("dl"),
        F.expr(matched).cast("int").alias("n_matched_terms"),
        F.expr(score).cast("long").alias("score_x1000"),
    ).filter(F.col("n_matched_terms") > 0)
    return out.orderBy(
        F.col("score_x1000").desc(), F.col(id_col).asc()
    ).limit(k)
