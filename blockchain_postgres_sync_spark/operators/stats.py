"""Exact distribution summaries: per-group order statistics.

Percentiles for corpus analysis (document-length / token-count
distributions per source) as EXACT order statistics — the p-th percentile
is the value at zero-based rank floor(p * (n-1)), always an actual member
of the group.  No interpolation, no sketch: results are integer-exact and
engine-independent, unlike approx_percentile (t-digest/G-K sketches differ
per engine) or interpolating quantiles (float arithmetic order differs).

Plan shape: one shuffle (the per-group rank window); the group count rides
the same window partition, and the final aggregate groups on the window's
partition key so Catalyst reuses the exchange — rank-pick percentiles cost
ONE exchange total.

Scale (100 TB): a window sort per group — groups (corpus sources) are the
natural partition key; a single giant group degrades to a one-partition
sort, in which case pre-aggregate (value, count) pairs first (value domains
like char counts are small) and rank over the compressed histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, token_shingles, tokens


def order_statistics(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_tiebreak: str,
    percentiles: tuple[tuple[str, int, int], ...] = (
        ("p25", 1, 4),
        ("p50", 1, 2),
        ("p75", 3, 4),
        ("p95", 19, 20),
    ),
) -> DataFrame:
    """Per-``group_col`` summary of ``value_col``: count, min, max, and the
    exact order statistics at rank floor(num * (n-1) / den) for each
    (name, num, den) percentile spec.  ``order_tiebreak`` totalizes the
    order among equal values so the picked rank is deterministic.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(order_tiebreak).asc()
    )
    d = (
        df.select(group_col, value_col, order_tiebreak)
        .withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    aggs = [
        F.max("_n").alias("n_docs"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    ]
    for name, num, den in percentiles:
        rank = F.expr(f"({num} * (_n - 1)) div {den}")
        aggs.append(
            F.max(F.when(F.col("_rn") == rank, F.col(value_col))).alias(
                f"{name}_{value_col}"
            )
        )
    return d.groupBy(group_col).agg(*aggs)


def difficulty_buckets_from_scores(
    scored: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    score_col: str = "quality_x100",
    bands: int = 32,
) -> DataFrame:
    """Exact per-``group_col`` ``ntile(3)`` over ``(score, id)`` — the
    curriculum easy/medium/hard split — with NO corpus-keyed skew even
    under a POINT-MASS score distribution.

    ``scored`` carries (id, group, integer-bounded score); callers
    materialize it once (localCheckpoint) since this reads it three
    times.  Shape:

    1. One hash-agg to per-(group, score) counts + min/max id — a
       BOUNDED frame (#groups x score domain).  Tercile cut RANKS and
       exclusive cumulative counts derive on that frame (windows over
       distinct scores, never corpus rows) and broadcast back; every
       score run that sits inside one tercile resolves its bucket from
       the broadcast columns alone.
    2. Only runs that STRADDLE a cut rank (<= 2 per group) need the
       within-run id order.  The rank window partitions by (group,
       score, _band) where ``_band = (id - min_id) * bands DIV
       (max_id - min_id + 1)`` — MONOTONE in id, so ordering by (band,
       id) equals ordering by id, and each band's exclusive base count
       comes from one more bounded hash-agg + a window over the band
       counts (<= groups x domain x bands rows).  rank = run base +
       band base + row_number-within-band: exact, while the widest
       window partition shrinks ``bands``-fold.  This is the round-10
       hardening of the round-8 rewrite: with a point-mass score (one
       (group, score) run = a whole language) the old (group, score)
       partition collapsed back to ONE sorting task — the banding keeps
       the skew bound ~n/bands with zero semantic change (pinned exact
       vs a Python ntile in tests/test_stats_ops.py).  Requires
       ``(max_id - min_id) * bands < 2^63`` — any dense/snowflake id
       qualifies.

    Net: one wide scan upstream (the caller's scoring pass), three
    narrow reads of the checkpointed score frame, one narrow-row
    exchange for the rank window.  Oracle-identical to ntile(3): first
    n%3 buckets get the extra row."""
    counts = scored.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(id_col).alias("_mn"),
        F.max(id_col).alias("_mx"),
    )
    wl = Window.partitionBy(group_col).orderBy(score_col)
    bounds = counts.select(
        group_col,
        score_col,
        "_c",
        "_mn",
        "_mx",
        (F.sum("_c").over(wl) - F.col("_c")).alias("_lo"),
        F.sum("_c").over(Window.partitionBy(group_col)).alias("_n"),
    )
    # ntile(3) cut ranks: bucket b holds floor(n/3) rows plus one extra
    # for the first n%3 buckets -> cuts at c1 and c2 (1-based ranks).
    bounds = bounds.withColumn(
        "_c1", F.expr("_n DIV 3 + CASE WHEN _n % 3 >= 1 THEN 1 ELSE 0 END")
    ).withColumn(
        "_c2",
        F.expr("_c1 + _n DIV 3 + CASE WHEN _n % 3 >= 2 THEN 1 ELSE 0 END"),
    )
    grp = bounds.select(
        group_col,
        score_col,
        "_lo",
        "_c1",
        "_c2",
        "_mn",
        "_mx",
        # whole-run bucket when the (group, score) run sits inside one
        # tercile; NULL marks the <=2 straddling runs per group
        F.when(F.col("_lo") + F.col("_c") <= F.col("_c1"), F.lit(1))
        .when(
            (F.col("_lo") >= F.col("_c1"))
            & (F.col("_lo") + F.col("_c") <= F.col("_c2")),
            F.lit(2),
        )
        .when(F.col("_lo") >= F.col("_c2"), F.lit(3))
        .alias("_gb"),
    )
    # grp is broadcast into TWO consumers (band counts + assignment);
    # without materialization each would recompute the counts agg — a
    # full narrow pass over the corpus — so checkpoint the bounded
    # (#groups x domain)-row frame once (house diamond pattern)
    grp = grp.localCheckpoint(eager=False)
    band = F.expr(
        f"CAST(((({id_col}) - _mn) * {int(bands)}) DIV (_mx - _mn + 1) AS INT)"
    )
    banded = (
        scored.join(F.broadcast(grp), [group_col, score_col])
        .withColumn("_band", band)
    )
    # exclusive per-band base counts: bounded frame, window over bands
    bandc = banded.groupBy(group_col, score_col, "_band").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    wb = Window.partitionBy(group_col, score_col).orderBy("_band")
    bandlo = bandc.select(
        group_col,
        score_col,
        "_band",
        (F.sum("_bc").over(wb) - F.col("_bc")).alias("_blo"),
    )
    # shuffle the narrow columns on the WINDOW key before the broadcast
    # join so the rank window rides this exchange (broadcast joins
    # preserve partitioning)
    assigned = banded.repartition(group_col, score_col, "_band").join(
        F.broadcast(bandlo), [group_col, score_col, "_band"]
    )
    wg = Window.partitionBy(group_col, score_col, "_band").orderBy(id_col)
    rank = F.col("_lo") + F.col("_blo") + F.row_number().over(wg)
    return assigned.select(
        id_col,
        group_col,
        score_col,
        F.coalesce(
            F.col("_gb"),
            F.when(rank <= F.col("_c1"), F.lit(1))
            .when(rank <= F.col("_c2"), F.lit(2))
            .otherwise(F.lit(3)),
        )
        .cast("int")
        .alias("bucket"),
    )


def salient_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 5,
) -> DataFrame:
    """Per-document salient terms: the ``top`` tokens by df-normalized term
    frequency — the exact-arithmetic cousin of tf-idf (score =
    tf * 1e6 // df, an integer: no logarithm, so the ranking is
    bit-reproducible on any engine; ln-idf and tf/df agree that rarer
    terms with equal tf rank higher, which is the salience signal a
    curation pipeline uses to tag or cluster documents).

    Plan shape: one explode → (doc, token) hash-agg (map-side combined on
    the exploded stream) → token-keyed df agg over the compressed
    (doc, token) pairs → join score → per-document top-``top`` window.
    The per-doc window partitions on the id — document-sized groups, never
    a serialization point.  The df side is vocabulary-sized; Spark/AQE
    broadcasts it when small and shuffle-joins past broadcast size (no
    hint pinned, deliberately).

    Determinism: ties break (score desc, token asc); df counts DOCUMENTS
    (each (doc, token) pair once), not occurrences.
    """
    pairs = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = pairs.join(dfreq, "term").withColumn(
        "score_x1m", F.expr("(tf * 1000000) div df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_x1m").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            id_col, "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score_x1m").cast("long").alias("score_x1m"),
            "rank",
        )
    )


def length_histogram(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Token-length distribution in power-of-two buckets per group — the
    standard "what context lengths does this corpus need" planning summary.

    Bucket = floor(log2(n_tokens)), computed INTEGER-exactly as
    ``length(bin(n)) - 1`` (binary digit count; both Spark and DuckDB ship
    ``bin``), never through float log2 — float log2 at exact powers of two
    is implementation-defined in the last ulp and can mis-bucket.  Output
    per (group, bucket): doc count, token sum, min/max length.  One
    aggregation, map-side combined — scan-bound at any scale.
    """
    n = token_count(F.col(text_col)).cast("long")
    src = df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col), n.alias("_n")
    ).filter(F.col("_n") > 0)
    bucket = (F.length(F.bin(F.col("_n"))) - 1).cast("int")
    return (
        src.withColumn("len_bucket", bucket)
        .groupBy(group_col, "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
        )
    )


def ngram_topk(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    n: int = 2,
    k: int = 15,
    min_count: int | None = None,
) -> DataFrame:
    """Top-``k`` most frequent token n-grams per ``group_col`` — the corpus
    vocabulary/frequency pass of an LM data pipeline.  Deterministic: ranks
    break count ties on the gram string ascending.

    Plan shape: explode shingles → hash-aggregate counts keyed on
    (group, gram) → per-group row_number window, rank <= k.  The exploded
    stream never shuffles raw: Spark's partial hash aggregation collapses
    repeated grams map-side, so the one big exchange carries only the
    per-partition distinct (group, gram) counts — a uniform high-cardinality
    key, no skew.  The window then sorts only the globally-distinct grams.

    Scale (100 TB): the heavy stage is linear in corpus tokens with map-side
    combine; the window stage is linear in VOCABULARY size per group (far
    smaller, but for an open-vocab web corpus still billions) — pass
    ``min_count`` to pre-prune with a count floor before the window: any
    gram in the true top-k of a trillion-token group passes any sane floor
    (choose it below the expected k-th count), and the filter is free (it
    rides the aggregation, no extra pass).
    """
    # explicit NULL-text contract (not fixture-dependent): rows with NULL
    # text contribute no grams — stated here and mirrored in the oracle's
    # WHERE, instead of relying on explode(NULL) dropping rows
    grams = df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col),
        F.explode(token_shingles(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy(group_col, "gram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    if min_count is not None:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    w = Window.partitionBy(group_col).orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "gram", "n_occurrences", "rank")
    )


def bigram_lift(
    df: DataFrame,
    text_col: str = "text",
    min_pair: int = 5,
    top: int = 100,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Collocation extraction: the ``top`` adjacent token bigrams ranked
    by association strength — the PMI-style phrase detector a tokenizer /
    vocab pipeline runs to promote multiword units ("new york", "machine
    learning") before training.

    Integer-exact score: ``lift_x1e9 = c_xy * 1e9 // (c_x * c_y)`` where
    ``c_xy`` counts the adjacent pair and ``c_x``/``c_y`` the unigrams.
    True PMI is ``log(p(xy) / (p(x) p(y))) = log(c_xy N^2 / (B c_x c_y))``
    — the ``N^2 / B`` factor is a corpus CONSTANT and log is monotone, so
    ranking by ``c_xy / (c_x c_y)`` is rank-equivalent to PMI with no
    libm and no bigint promotion.  The division runs as TWO chained floor
    divisions (``// c_x // c_y`` — value-identical to dividing by the
    product, since ``floor(floor(x/a)/b) == floor(x/(ab))`` for positive
    integers) so the unbounded ``c_x * c_y`` product never materializes:
    two 3e9-occurrence stopwords would overflow it in int64 at corpus
    scale.  Remaining int64 bound: ``c_xy * 1e9 < 2^63`` i.e. pair count
    < 9.2e9 — a pair more frequent than that is a stop-pair any pipeline
    pre-filters (and ANSI mode errors loudly rather than mis-scoring).
    ``min_pair`` floors the pair count first (PMI's classic rare-pair
    pathology: a 1-occurrence typo pair scores arbitrarily high).

    Plan shape: ONE map-only corpus scan — the token array zips against
    its own tail in-row (adjacent pairs, no positional self-join or
    window shuffle) with arrays_zip's null padding marking each doc's
    LAST token occurrence, so the single map-side-combined (x, y)
    aggregation carries both the bigram counts (y non-null) and, via a
    vocabulary-bounded re-aggregation over ALL y, the exact unigram
    counts.  The (x, y) count frame materializes ONCE (localCheckpoint —
    it feeds the pair filter and the unigram re-agg; the house diamond
    pattern) and the unigram side broadcast-joins onto the pair counts
    for x and y; final global top-k plans as TakeOrdered (per-partition
    heap, no sort shuffle).  Ties break (lift desc, tok_x asc, tok_y asc)
    — total order.  Pinned: exactly 1 scan + 1 TakeOrdered
    (tests/test_plans.py::test_bigram_lift_one_scan_takeordered).

    ``broadcast_vocab``: the unigram frame is VOCABULARY-sized, not
    corpus-sized, but an open-web vocabulary (URLs, code tokens) can
    still exceed broadcastable size — pass ``broadcast_vocab=False`` to
    let the x/y lookups run as shuffle hash joins instead of pinning a
    driver-side broadcast (the same knob as ``bpe_encode_dict`` /
    ``unigram_logprob``'s ``broadcast_model``; see SCALE.md).
    """
    toks = tokens(F.col(text_col))
    # ONE corpus scan for BOTH counts (the round-9 bigram_lift tuning;
    # previously two scans and a zip_with(λ struct) pair builder, 3.25 s
    # -> 1.6 s at sf1):
    # - arrays_zip, NOT zip_with(λ struct): the native zip builds pair
    #   structs in one specialized codegen pass while the lambda form
    #   evaluates a HOF per element (A/B: 2.4x on the pair agg alone);
    #   fields of a zip over unnamed expressions are "0"/"1".
    # - zip toks (length n) against its TAIL (length n-1): arrays_zip
    #   null-pads the shorter side, so each token occurrence emits exactly
    #   one row — (tok, next) mid-doc, (tok, NULL) for the doc's last
    #   token — and the unigram count is a vocabulary-sized re-aggregation
    #   of the (x, y) counts INCLUDING the null rows.  The second
    #   tokenize+explode scan of the corpus disappears.
    occ = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.arrays_zip(
                    toks,
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                )
            ).alias("p")
        )
        .select(F.col("p")["0"].alias("tok_x"), F.col("p")["1"].alias("tok_y"))
    )
    # (x, y) counts with y=NULL marking last-token occurrences: bounded by
    # bigram vocabulary + unigram vocabulary, checkpointed ONCE for its
    # two consumers (pair filter + unigram re-agg; the house diamond
    # pattern — without it the corpus scans twice anyway)
    occ_counts = (
        occ.groupBy("tok_x", "tok_y")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .localCheckpoint(eager=False)
    )
    pair_counts = occ_counts.filter(
        F.col("tok_y").isNotNull() & (F.col("n_pair") >= min_pair)
    )
    # exact unigram counts: every occurrence of t appears exactly once as
    # tok_x (followed by its successor or by NULL at doc end)
    uni = (
        occ_counts.groupBy(F.col("tok_x").alias("token"))
        .agg(F.sum("n_pair").cast("long").alias("c"))
    )
    _bx = F.broadcast if broadcast_vocab else (lambda f: f)
    scored = (
        pair_counts.join(
            _bx(uni.select(F.col("token").alias("tok_x"),
                           F.col("c").alias("_cx"))),
            "tok_x",
        )
        .join(
            _bx(uni.select(F.col("token").alias("tok_y"),
                           F.col("c").alias("_cy"))),
            "tok_y",
        )
        .withColumn("_num", F.col("n_pair") * F.lit(1_000_000_000).cast("long"))
        .withColumn("lift_x1e9", F.expr("_num DIV _cx DIV _cy"))
    )
    return (
        scored.orderBy(
            F.desc("lift_x1e9"), F.asc("tok_x"), F.asc("tok_y")
        )
        .limit(top)
        .select("tok_x", "tok_y", "n_pair", "lift_x1e9")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Unigram language-model score per document — the classic
    perplexity-style quality filter (docs whose tokens are improbable under
    the corpus's own unigram model are gibberish/noise candidates).

    Per-token surprisal is quantized to an INTEGER immediately:
    ``cost_x1000 = floor(1000 * ln(N / cnt(token)))`` where N is the corpus
    token total.  The ONLY float op per token is one ln of a double ratio
    (the char_entropy precedent: IEEE-deterministic at this granularity);
    everything after — the per-document sum and the floor-divided mean —
    is exact integer arithmetic, so document scores are associative,
    partitioning-independent, and engine-comparable.

    Returns (id_col, n_tokens, cost_x1000 total, avg_cost_x1000).

    Plan shape: ONE corpus pass builds the model — ``rollup(term)`` emits
    per-term counts AND the grand-total row from a single map-side-combined
    aggregation, and the vocab-sized result is ``localCheckpoint``-ed so
    the two consumers (term rows, total row) read it once.  The checkpoint
    is load-bearing: expressed as two lazy branches, Catalyst pushes the
    opposite IS NULL / IS NOT NULL filters BELOW the exchange, the
    branches stop canonicalizing equal, exchange reuse never fires, and
    the corpus is scanned and aggregated twice (measured: 3 scans → 2).
    The corpus total therefore rides a broadcast 1-row crossJoin — never a
    driver collect.  Scoring then joins the model into the (doc, token)
    stream (broadcast by default — a unigram vocab is ~millions of rows;
    ``broadcast_model=False`` for URL/code-token vocabularies past
    broadcast size) and folds per document with map-side combine.  Two
    corpus scans, one vocab exchange, one doc exchange at any scale; the
    checkpoint is vocab-sized and, like the candle tail's
    (streaming/pipeline.py), not executor-loss-resilient — a lost batch
    recomputes.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    agg = (
        toks.select("term")
        .rollup("term")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=False)
    )
    counts = agg.filter(F.col("term").isNotNull())
    total = agg.filter(F.col("term").isNull()).select(
        F.col("_cnt").cast("double").alias("_n")
    )
    model = counts.crossJoin(F.broadcast(total)).select(
        "term",
        F.floor(
            F.log(F.col("_n") / F.col("_cnt").cast("double")) * 1000.0
        ).cast("long").alias("_cost"),
    )
    model = F.broadcast(model) if broadcast_model else model
    return (
        toks.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_cost").alias("cost_x1000"),
        )
        .select(
            id_col,
            "n_tokens",
            "cost_x1000",
            F.expr("cost_x1000 div n_tokens").cast("long").alias(
                "avg_cost_x1000"
            ),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Conditional bigram-LM score per document — the higher-order
    companion to :func:`unigram_logprob`: per-bigram surprisal is
    ``cost_x1000 = floor(1000 * ln(cnt(w1) / cnt(w1 w2)))`` (the exact
    integer quantization of -ln p(w2|w1)), summed exactly per document.
    Documents full of unseen-in-context transitions (shuffled text, word
    salad) score high even when every individual token is common — the
    signal unigram scoring cannot see.

    Single-token documents have no bigram and are absent from the output
    (they carry no transition evidence either way).

    Plan shape (100 TB): bigrams come from the existing in-row shingle
    machinery (no second tokenizer); the model build is one bigram-keyed
    count shuffle plus one unigram-keyed count shuffle joined on the
    context token ``w1`` — both model-sized, never corpus-sized, and the
    w1 join is a plain hash join immune to fan-out (each bigram row meets
    exactly one context row).  Scoring joins the (bigram -> cost) model
    into the per-doc bigram stream (broadcast by default,
    ``broadcast_model=False`` past broadcast size) and folds per doc.
    """
    bigrams = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(token_shingles(F.col(text_col), 2)).alias("bg"),
    ).filter(F.instr(F.col("bg"), " ") > 0)  # docs of 1 token: no bigram
    bg_counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("_cbg"))
    uni_counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("_w1"))
        .groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("_cw1"))
    )
    model = (
        bg_counts.withColumn(
            "_w1", F.substring_index(F.col("bg"), " ", 1)
        )
        .join(uni_counts, "_w1")
        .select(
            "bg",
            F.floor(
                F.log(F.col("_cw1").cast("double") / F.col("_cbg").cast("double"))
                * 1000.0
            ).cast("long").alias("_cost"),
        )
    )
    model = F.broadcast(model) if broadcast_model else model
    return (
        bigrams.join(model, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_cost").alias("cost_x1000"),
        )
        .select(
            id_col,
            "n_bigrams",
            "cost_x1000",
            F.expr("cost_x1000 div n_bigrams").cast("long").alias(
                "avg_cost_x1000"
            ),
        )
    )


def daily_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    k_x100: int = 300,
) -> DataFrame:
    """Robust daily-volume anomaly detection per event type: flag days
    whose count deviates from the type's EXACT median daily count by more
    than ``k_x100/100`` times the exact MAD — the generic
    :func:`robust_outliers` rule applied to the (type, day) count frame.
    All integer arithmetic; MAD = 0 (a perfectly regular type) flags any
    deviating day.  Returns flagged (type, day, n_events, median_n, mad).

    Plan shape: one (type, day) count agg, then the helper's two windows
    sharing one type-keyed exchange over day-cardinality rows.
    """
    daily = (
        events.select(
            F.col(type_col).alias("_t"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .groupBy("_t", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = robust_outliers(
        daily, group_col="_t", value_col="n_events",
        tiebreak_col="day", k_x100=k_x100,
    )
    return out.select(
        F.col("_t").alias(type_col),
        F.col("day").cast("string").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("_median").cast("long").alias("median_n"),
        F.col("_mad").cast("long").alias("mad"),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    k_x100: int = 300,
) -> DataFrame:
    """Generic exact median/MAD outlier filter — the integer-arithmetic
    core of :func:`daily_anomalies`, reusable over any (group, value)
    frame (daily volumes, vector norms, doc lengths): keep rows where
    ``|value - median(group)| * 100 > k_x100 * MAD(group)``, attaching
    ``_median`` and ``_mad`` columns.  Medians are rank-picked actual
    members (value asc, tiebreak asc); all comparisons cross-multiplied
    integers — float-free, engine- and partitioning-independent.

    Two windows + the final filter share ONE group-keyed exchange; the
    windowed frame is |groups| x |members| rows of three columns.
    """
    w_cnt = Window.partitionBy(group_col)
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    with_med = (
        df.withColumn("_rn", F.row_number().over(w_rank) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(w_cnt))
        .withColumn(
            "_median",
            F.max(
                F.when(F.col("_rn") == F.expr("(_n - 1) div 2"), F.col(value_col))
            ).over(w_cnt),
        )
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("_median")))
    )
    w_rank2 = Window.partitionBy(group_col).orderBy(
        F.col("_dev").asc(), F.col(tiebreak_col).asc()
    )
    with_mad = with_med.withColumn(
        "_rn2", F.row_number().over(w_rank2) - 1
    ).withColumn(
        "_mad",
        F.max(
            F.when(F.col("_rn2") == F.expr("(_n - 1) div 2"), F.col("_dev"))
        ).over(w_cnt),
    )
    return with_mad.filter(
        F.col("_dev") * 100 > F.lit(k_x100) * F.col("_mad")
    ).drop("_rn", "_rn2", "_n", "_dev")


def score_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label — the standard
    quality-classifier / filter-calibration metric for curation pipelines
    (does the score actually rank positives above negatives?).

    Mann-Whitney rank-sum form with average-rank tie handling, all integer
    arithmetic: with ``c_s`` items (``p_s`` positive) at distinct score
    ``s`` and ``cum_s`` items strictly below, twice the tied average rank
    is ``2*cum_s + c_s + 1``, so

        2U = sum_s p_s * (2*cum_s + c_s + 1) - n_pos*(n_pos+1)
        AUC = U / (n_pos * n_neg)

    reported floored as ``auc_x{scale}`` (decimal(38,0) products, integer
    DIV — no float anywhere, bit-identical in any engine).  Rows with a
    NULL score or label are excluded (they carry no ranking evidence).

    Plan shape: ONE hash aggregation on the score (map-side partial agg;
    the corpus is scanned once and only (score, count, pos) crosses the
    shuffle) — the ranked window + final fold run over the DISTINCT-SCORE
    frame, whose cardinality is bounded by the score domain (an integer
    x100 score has <= ~10k distinct values at ANY corpus size), not by the
    corpus.  The unpartitioned window over that dimension-sized frame is
    the same bounded-serialization trade as encoding.rank_vocab.
    """
    per_score = (
        df.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("boolean").alias("_y"),
        )
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_p"),
        )
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "_cum", F.coalesce(F.sum("_c").over(w), F.lit(0))
    )
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.sum(
            F.col("_p").cast(dec)
            * (2 * F.col("_cum") + F.col("_c") + 1).cast(dec)
        ).alias("_r2"),
        F.sum("_p").cast(dec).alias("_np"),
        F.sum(F.col("_c") - F.col("_p")).cast(dec).alias("_nn"),
    )
    return agg.select(
        F.col("_np").cast("long").alias("n_pos"),
        F.col("_nn").cast("long").alias("n_neg"),
        F.when(
            (F.col("_np") > 0) & (F.col("_nn") > 0),
            # decimal `div` is exact integer division straight to bigint —
            # no intermediate float/rounded-decimal quotient to mis-floor
            F.expr(
                f"CAST((_r2 - _np * (_np + 1)) * {scale} AS DECIMAL(38,0)) "
                "div CAST(2 * _np * _nn AS DECIMAL(38,0))"
            ),
        ).alias(f"auc_x{scale}"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Full precision/recall sweep of a score against a binary label: one
    row per DISTINCT score value s with the confusion counts of the
    classifier "predict positive iff score >= s" — the exact
    precision-recall / ROC curve table (operating-point selection for
    curation filters; complements :func:`score_auc`'s single number).

    All integer arithmetic: cumulative-from-top counts, floor-scaled
    ratios via decimal `div`.  Same plan + scale story as score_auc: ONE
    map-side-combined aggregation on the score reduces the corpus to its
    score domain; the descending cumulative window and ratio projection
    run over that dimension-sized frame.
    """
    per_score = (
        df.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("boolean").alias("_y"),
        )
        .filter(F.col("score").isNotNull() & F.col("_y").isNotNull())
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_p"),
        )
    )
    w_top = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_score.select(
        "score",
        F.sum("_p").over(w_top).cast("long").alias("tp"),
        (F.sum("_c").over(w_top) - F.sum("_p").over(w_top))
        .cast("long")
        .alias("fp"),
        F.sum("_p").over(w_all).cast("long").alias("_npos"),
        (F.sum("_c").over(w_all) - F.sum("_p").over(w_all))
        .cast("long")
        .alias("_nneg"),
    )
    return cum.select(
        "score",
        "tp",
        "fp",
        (F.col("_npos") - F.col("tp")).cast("long").alias("fn"),
        (F.col("_nneg") - F.col("fp")).cast("long").alias("tn"),
        F.expr(
            f"(CAST(tp AS DECIMAL(38,0)) * {scale}) "
            "div CAST(tp + fp AS DECIMAL(38,0))"
        ).alias(f"precision_x{scale}"),
        F.when(
            F.col("_npos") > 0,
            F.expr(
                f"(CAST(tp AS DECIMAL(38,0)) * {scale}) "
                "div CAST(_npos AS DECIMAL(38,0))"
            ),
        ).alias(f"recall_x{scale}"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    quantiles: tuple[tuple[str, int, int], ...] = (
        ("p25", 1, 4),
        ("p50", 1, 2),
        ("p75", 3, 4),
        ("p95", 19, 20),
    ),
) -> DataFrame:
    """EXACT per-group percentiles of a bounded-domain integer column —
    ``percentile_disc`` semantics (smallest value whose cumulative count
    reaches ``ceil(q * n)``), all integer arithmetic so the result is
    bit-identical across engines.  ``quantiles`` entries are
    ``(label, num, den)`` fractions; the rank is ``ceil(num*n/den) =
    (num*n + den - 1) div den``.

    This is the scale-safe exact form (the difficulty_buckets /
    score_auc trick): approxQuantile trades accuracy and a per-group
    sort trades a skewed-window single task — instead ONE hash
    aggregation on (group, value) crosses the shuffle, and the cumulative
    window runs over the DISTINCT-VALUE frame, bounded by the value
    domain, not the corpus.  NULL values carry no rank evidence and are
    excluded.

    Returns one row per group: ``group_cols + n_rows + one column per
    quantile label``.
    """
    gcols = list(group_cols or [])
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(*gcols)
        if gcols
        else Window.partitionBy(F.lit(1))
    )
    cum = counts.select(
        *gcols,
        F.col(value_col),
        F.sum("_c").over(w.orderBy(F.asc(value_col))).alias("_cum"),
        F.sum("_c").over(w).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n_rows")]
    for label, num, den in quantiles:
        # integer ceil via (num*n + den - 1) div den, computed exactly
        rank = F.expr(f"(({num} * _n) + {den - 1}) div {den}")
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= rank, F.col(value_col))
            ).cast("long").alias(label)
        )
    return cum.groupBy(*gcols).agg(*aggs)


#: count-min sketch geometry: CMS_DEPTH independent hash rows of CMS_WIDTH
#: counters.  Width 512 keeps the whole sketch at 3*512 longs (~12 KB) —
#: broadcastable forever, like the bloom bitmap.
CMS_DEPTH = 3
CMS_WIDTH = 512


def _cms_col_from_md5(md5_col: Column, row: int) -> Column:
    """Counter column derived from a PRE-STAGED md5 hex column: an 8-hex
    slice (offset 1/9/17 for rows 0/1/2) mod width.  Callers stage
    ``F.md5(token)`` ONCE per row and slice it three times — md5 is not
    ``isCheap`` so CollapseProject keeps the staging projection intact
    (the cdc_chunks staging lesson applied to the sketch)."""
    return (
        F.conv(F.substring(md5_col, 1 + 8 * row, 8), 16, 10)
        .cast("long") % CMS_WIDTH
    )


def _cms_col(token: Column, row: int) -> Column:
    """Counter column for ``token`` in sketch row ``row`` — the
    one-expression form (mirrored by the DuckDB oracle); hot paths use
    :func:`_cms_col_from_md5` over a staged hash instead."""
    return _cms_col_from_md5(F.md5(token), row)


def cms_build(
    df: DataFrame, token_col: str = "token", weight_col: str | None = None
) -> DataFrame:
    """Count-min sketch of a token stream: ``(row, col, cnt)`` — at most
    ``CMS_DEPTH * CMS_WIDTH`` rows REGARDLESS of vocabulary size.  The
    streaming-friendly heavy-hitter summary: cells merge by addition, so
    partial sketches from any partitioning/micro-batching combine exactly.

    Plan shape: one in-row expansion to CMS_DEPTH cells per token and ONE
    bounded hash aggregation (<= depth*width distinct keys — everything
    combines map-side); the corpus never shuffles.
    """
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    # md5 evaluated ONCE per token row; the three sketch rows slice it.
    # explode_OUTER: InferFiltersFromGenerate would add size(arr) > 0 for
    # an inner explode and predicate pushdown would inline the staged md5
    # into the scan predicate (the cdc_chunks trap); the array is a
    # literal 3-struct, never empty, so outer == inner row-for-row.
    staged = df.select(F.md5(F.col(token_col)).alias("_h"), w.alias("_w"))
    cells = staged.select(
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col_from_md5(F.col("_h"), r).alias("col"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("_c"),
        F.col("_w"),
    )
    return cells.groupBy(
        F.col("_c.row").alias("row"), F.col("_c.col").alias("col")
    ).agg(F.sum("_w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Point-estimate each query token against a built sketch:
    ``min`` over the token's CMS_DEPTH cells — the classic upper-bound
    estimator (never under-counts; over-counts only by hash collisions,
    deterministically reproducible here).

    Plan shape: queries expand in-row to their depth cells, one broadcast
    equi-join against the <= depth*width-row sketch, one per-token min —
    all bounded by the QUERY list, not the corpus.
    """
    probes = queries.select(
        F.col(token_col), F.md5(F.col(token_col)).alias("_h")
    ).select(
        F.col(token_col),
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col_from_md5(F.col("_h"), r).alias("col"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("_c"),
    ).select(token_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage (OOV rate) across a train/validation split


def vocab_coverage(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    split_mod: int = 10,
    train_lt: int = 8,
) -> DataFrame:
    """Out-of-vocabulary rate of the validation split against the training
    split's vocabulary — the tokenizer-coverage probe run before committing
    a vocab: ``vocab`` = tokens seen at least ``min_count`` times in the
    train split (``doc_id % split_mod < train_lt``); for every language in
    the val split report

    ``(lang, n_tokens, n_oov, oov_x10000)``

    with ``oov_x10000 = floor(10000 * n_oov / n_tokens)`` (integer-exact —
    no float ratio in hash-compared output).

    Plan: both splits aggregate BEFORE the vocab join — train tokens reduce
    to (token, count) and val tokens to (lang, token, count) — so the join
    carries one row per distinct (lang, token), not one per occurrence
    (map-side partial aggregation does the heavy lifting in the scan
    stage).  The vocab side is a shuffle join on ``token``, NOT a
    broadcast: at 100 TB a >=min_count vocabulary is tens of millions of
    rows and must stay distributed; the final per-lang rollup groups a
    languages-sized set.  Three exchanges total, all on bounded keys.
    """
    tok = F.explode(tokens(F.col(text_col))).alias("token")
    is_train = (F.col(id_col) % split_mod) < train_lt
    vocab = (
        docs.filter(is_train)
        .select(tok)
        .groupBy("token")
        .count()
        .filter(F.col("count") >= min_count)
        .select("token")
    )
    val_counts = (
        docs.filter(~is_train)
        .select(F.col(lang_col).alias("lang"), tok)
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    return (
        val_counts.join(vocab.withColumn("_in_v", F.lit(1)), "token", "left")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in_v").isNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            # integer division (not float-floor): bit-identical across
            # engines at any corpus size
            F.expr("(10000 * n_oov) div n_tokens")
            .cast("long")
            .alias("oov_x10000"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog cardinality sketch — the third mergeable sketch next to the
# Bloom bitmap (membership, operators/contamination.py) and the count-min
# sketch (frequency, above): COUNT(DISTINCT …) in a fixed HLL_M-register
# summary whose registers merge by MAX across partitions / micro-batches.
# At 100 TB this replaces the Expand-based exact multi-distinct
# (q_corpus_cardinality) wherever ±~5% suffices: the corpus reduces
# map-side to <= groups * HLL_M rows and the shuffle carries registers,
# never keys.  Flajolet et al. 2007 (the classic estimator, not the ++
# bias-table variant); every step below is integer arithmetic on a shared
# md5-slice convention so the DuckDB oracle lands on the IDENTICAL count.

import math  # noqa: E402  (kept with its sole consumer, the LC table)

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers, ~relative error 1.04/sqrt(m) = 4.6%
HLL_BODY_BITS = 32 - HLL_P  # rank bits left of a 32-bit md5-slice hash
HLL_RHO_MAX = HLL_BODY_BITS + 1  # rho when the body is all zeros
HLL_SCALE = 30  # fixed-point shift for sum(2^-reg): reg <= 24 < SCALE

#: linear-counting table for the small-range regime: lc[V-1] =
#: round(m * ln(m / V)) for V zero registers, computed ONCE here and
#: embedded as the same integer literals in the Spark plan and the DuckDB
#: oracle — the only ln() in the sketch never runs inside either engine.
HLL_LC_TABLE: tuple[int, ...] = tuple(
    round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
)

#: alpha_m = 0.7213 / (1 + 1.079/m) kept exact-rational:
#:   E_raw = alpha_m * m^2 / sum(2^-reg)
#:         = (7213000 * m^3 * 2^SCALE) / (10000*(1000*m + 1079) * sum_inv)
#: with sum_inv = sum(2^(SCALE-reg)) — numerator ~1.0e24 and denominator
#: <= ~2.9e21 both sit comfortably inside decimal(38,0).
_HLL_EST_NUM = 7213000 * HLL_M**3 * (1 << HLL_SCALE)
_HLL_EST_DEN = 10000 * (1000 * HLL_M + 1079)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register frame ``group_cols + (bucket, reg)`` — at
    most ``HLL_M`` rows per group regardless of key cardinality.

    Hash convention (mirrored verbatim by the DuckDB oracle): the first
    8 md5 hex chars as a 32-bit integer; the low ``HLL_P`` bits (mod)
    pick the bucket, and the geometric rank rho is trailing-zeros(body)+1
    of the remaining ``HLL_BODY_BITS`` (``HLL_RHO_MAX`` for body == 0) —
    trailing zeros are the same geometric variable as the textbook's
    leading zeros and need only ``bit_count((b-1) - ((b-1) & b))``,
    portable integer ops in both engines.

    Plan shape: ONE hash aggregation on (group, bucket) — max(rho)
    combines map-side, so only <= groups * HLL_M register rows cross the
    shuffle.  Registers merge by MAX: partial frames from any
    partitioning / micro-batch / day-partition union-and-max to exactly
    the registers of the combined corpus (test-pinned).
    """
    gcols = list(group_cols or [])
    staged = df.select(
        *gcols,
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    body = f"(_h div {HLL_M})"
    cells = staged.select(
        *gcols,
        F.expr(f"_h % {HLL_M}").alias("bucket"),
        F.expr(
            f"CASE WHEN {body} = 0 THEN {HLL_RHO_MAX} "
            f"ELSE bit_count(({body} - 1) - (({body} - 1) & {body})) + 1 "
            "END"
        ).alias("_rho"),
    )
    return cells.groupBy(*gcols, "bucket").agg(F.max("_rho").alias("reg"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold a register frame into per-group cardinality estimates:
    ``group_cols + n_registers_set + hll_est`` (both bigint).

    Raw estimator in exact integer arithmetic (see ``_HLL_EST_NUM``);
    absent buckets contribute ``2^SCALE`` (reg = 0) via the
    ``(m - n_set) << SCALE`` term instead of materializing empty rows.
    Small-range regime (``E_raw <= 5m/2`` with zero registers present)
    switches to linear counting through the precomputed integer
    ``HLL_LC_TABLE`` — the classic two-regime estimator, deterministic in
    both engines because the table is shared literals, not runtime ln().
    """
    gcols = list(group_cols or [])
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers_set"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE} - reg)")
        )
        .cast("long")
        .alias("_sp"),
    )
    sinv = (
        F.col("_sp")
        + (F.lit(HLL_M) - F.col("n_registers_set"))
        * F.lit(1 << HLL_SCALE)
    ).alias("_sinv")
    staged = agg.select(*gcols, "n_registers_set", sinv)
    raw = F.expr(
        f"CAST({_HLL_EST_NUM} AS DECIMAL(38,0)) div "
        f"(CAST({_HLL_EST_DEN} AS DECIMAL(38,0)) * _sinv)"
    ).cast("long")
    v = F.lit(HLL_M) - F.col("n_registers_set")
    lc = F.element_at(
        F.array(*[F.lit(x) for x in HLL_LC_TABLE]), v.cast("int")
    ).cast("long")
    return staged.select(
        *gcols,
        "n_registers_set",
        F.when((F.lit(2) * raw <= F.lit(5 * HLL_M)) & (v > 0), lc)
        .otherwise(raw)
        .alias("hll_est"),
    )


def hll_cardinality(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Estimate COUNT(DISTINCT key_col) per group through the HLL sketch
    (:func:`hll_registers` → :func:`hll_estimate`)."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)
