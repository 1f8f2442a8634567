"""Deterministic sampling & corpus curation for training-data pipelines.

Large-corpus curation needs samples that are (a) reproducible across runs
and engines — no RNG state, no partition-order dependence — and (b) cheap at
100 TB — no global sort, no shuffle beyond what the quota requires.  Both
operators key randomness off a content hash, the standard trick (e.g. web
crawl dedup + subsampling pipelines): h = md5(id) is uniform, so a
hash-threshold cut IS a uniform sample and a hash-order rank IS a uniform
shuffle order.

- :func:`hash_sample` — stateless Bernoulli-style sample: keep rows whose
  64-bit content-hash bucket falls below rate * 2^31.  Filter-only (no
  shuffle, fully pushdown-friendly); sampling decision is per-row and
  reproducible on any engine with md5.
- :func:`stratified_quota` — per-stratum top-N by hash order (uniform
  without replacement within each stratum).  One window shuffle on the
  stratum key; at 100 TB strata are the natural partition key and skewed
  strata can pre-filter with :func:`hash_sample` at ~(N / |stratum|) before
  ranking.
- :func:`curate` — the canonical quality gate chain (token-count bounds,
  mean-token-length bounds, repetition floor) composed from
  ``functions.text.quality_ratios`` — integer-exact, so the kept set is
  engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import quality_ratios, token_count, token_shingles

#: same 31-bit space as the minhash family: md5 → 60-bit int → mod p keeps
#: every intermediate in exact BIGINT range in any engine.
HASH_SPACE = 2147483647


def _hash31(col: Column) -> Column:
    """Uniform 31-bit integer from a value's md5 (cross-engine exact)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        % HASH_SPACE
    )


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id") -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows with h31(key) < rate * 2^31.

    A pure filter — no shuffle, no RNG, stable under repartitioning and
    re-runs, and the same rows are kept by any engine that can md5.  At
    100 TB this pushes down to the scan like any other predicate.
    """
    threshold = int(rate * HASH_SPACE)
    return df.filter(_hash31(F.col(key_col)) < threshold)


def stratified_quota(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Uniform without-replacement sample of ``n_per_stratum`` rows per
    stratum: rank rows inside each stratum by (hash, key) and keep the top
    N.  Hash order is uniform, so the quota is an unbiased within-stratum
    sample; the (hash, key) tie-break makes it total and deterministic.

    One shuffle (window on the stratum key).  Skew note: a giant stratum
    sorts |stratum| rows to keep N — pre-thin it with :func:`hash_sample`
    at a few times N/|stratum| first, which keeps the quota unbiased
    (hash-threshold and hash-order agree on which rows rank first).
    """
    w = Window.partitionBy(stratum_col).orderBy(
        _hash31(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted without-replacement sample of ``n`` rows
    (priority sampling, Duffield/Lund/Thorup): each row gets priority
    ``w * 2^31 // (h31(key) + 1)`` — a weight-scaled inverse of its
    uniform hash draw — and the top ``n`` priorities win.  A row's
    inclusion probability scales with its weight (the classic
    ``u^(1/w)`` reservoir key, integerized as ``w / u``), yet the draw is
    a pure function of (key, weight): reproducible across runs, engines,
    and repartitioning, exactly like :func:`hash_sample`.

    Integer-exact: ``w`` is read as a BIGINT (callers with fractional
    weights pre-scale, house x1000 convention), ``h31 + 1`` is in
    [1, 2^31 - 1], and ``w * 2^31`` stays in int64 for ``w < 2^32``.
    That bound is ENFORCED in-row via ``raise_error`` (not left to the
    session's ANSI flag: a non-ANSI session would silently wrap the
    priority negative and corrupt the sample with no signal).
    Ties (equal priority) break by key ascending — total order, no RNG.

    Plan shape: without ``stratum_col`` this is a global top-n —
    Spark plans ``orderBy(...).limit(n)`` as TakeOrdered (per-partition
    heap of n + single-reduce merge, NO global sort shuffle), the right
    100 TB shape for n ≪ corpus.  With ``stratum_col`` it is one window
    shuffle on the stratum key (same shape as :func:`stratified_quota`).
    """
    # exact integer division (SQL DIV; pyspark Column has no floordiv and
    # float division would lose precision above 2^53)
    _w = F.col(weight_col).cast("long")
    _w_checked = F.when(
        (_w >= 0) & (_w < F.lit(1 << 32).cast("long")), _w
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample: {weight_col}="),
                _w.cast("string"),
                F.lit(" outside [0, 2^32) — priority w * 2^31 would "
                      "overflow int64; pre-scale the weight column"),
            )
        )
    )
    with_p = (
        df.withColumn(
            "_wnum",
            _w_checked * F.lit(int(HASH_SPACE) + 1).cast("long"),
        )
        .withColumn(
            "_hden", _hash31(F.col(key_col)) + F.lit(1).cast("long")
        )
        .withColumn("_prio", F.expr("_wnum DIV _hden"))
        .drop("_wnum", "_hden")
    )
    if stratum_col is None:
        return (
            with_p.orderBy(F.desc("_prio"), F.asc(key_col))
            .limit(n)
            .drop("_prio")
        )
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc("_prio"), F.asc(key_col)
    )
    return (
        with_p.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk", "_prio")
    )


def dataset_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Deterministic train/val/test assignment — the last step before a
    corpus ships to a trainer.  Split = pure function of the row KEY
    (hash-threshold bands over h31(key)): reproducible across runs,
    engines, and repartitioning; adding rows later never reassigns
    existing ones (the property random splits lose).  Map-only — no
    shuffle, no RNG; the added ``split`` column pushes down like any
    projection.

    Bands: h < val_frac*2^31 → val; next test_frac band → test; rest →
    train.  Fractions are approximate at corpus scale exactly like
    :func:`hash_sample` (binomial deviation only).
    """
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError(
            f"need val_frac, test_frac >= 0 with sum < 1, got "
            f"{val_frac}, {test_frac}"
        )
    h = _hash31(F.col(key_col))
    t_val = int(val_frac * HASH_SPACE)
    t_test = t_val + int(test_frac * HASH_SPACE)
    return df.withColumn(
        "split",
        F.when(h < t_val, F.lit("val"))
        .when(h < t_test, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def curate(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_mean_token_len_x100: int = 250,
    max_mean_token_len_x100: int = 1200,
    min_repetition_x100: int = 30,
) -> DataFrame:
    """Quality-gate filter chain over the standard integer-exact ratios:
    token-count bounds, mean-token-length bounds (x100 fixed-point), and a
    distinct-token floor (low repetition_x100 = heavy repetition).  Returns
    the surviving rows with the diagnostic columns attached — a pure
    filter+project, no shuffle.
    """
    r = quality_ratios(F.col(text_col))
    out = df.withColumns(
        {
            "n_tokens": r["n_tokens"],
            "mean_token_len_x100": r["mean_token_len_x100"],
            "repetition_x100": r["repetition_x100"],
        }
    )
    return out.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_token_len_x100") >= min_mean_token_len_x100)
        & (F.col("mean_token_len_x100") <= max_mean_token_len_x100)
        & (F.col("repetition_x100") >= min_repetition_x100)
    )


def mixture_plan(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Data-mixture planning: how to sample each source to fill a training
    token budget at uniform per-source proportions — the static mixture
    table every large-scale pretraining run starts from (per-source
    inventory -> planned tokens -> sampling rate, with over-subscribed
    sources exposed as epoch counts rather than silently clipped).

    Per source: ``n_docs``, ``n_tokens`` (whitespace tokens),
    ``planned_tokens = floor(token_budget / n_sources)``,
    ``sample_rate_x1m = floor(1e6 * min(1, planned/n_tokens))`` (the
    hash_sample rate that realizes the plan when the source over-fills
    its quota) and ``epochs_x100 = floor(100 * planned/n_tokens)``
    (>100 means the source must repeat to fill its share).

    Plan shape (100 TB): ONE map-side-combined groupBy(source) over the
    corpus — token counting is in-row; the source-count total is a
    one-row broadcast attach (the ``unigram_logprob`` house pattern,
    never a driver collect), and everything after the agg operates on
    source-cardinality rows.
    """
    per_source = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long")
            .alias("n_tokens"),
        )
        # feeds BOTH the plan rows and the source-count total: without
        # materialization each consumer re-runs the corpus aggregation
        # (house diamond pattern; source-cardinality rows, so the pinned
        # copy is tiny)
        .localCheckpoint(eager=False)
    )
    n_sources = per_source.agg(
        F.count(F.lit(1)).cast("long").alias("_n_sources")
    )
    planned = F.floor(
        F.lit(float(token_budget)) / F.col("_n_sources").cast("double")
    ).cast("long")
    out = per_source.join(F.broadcast(n_sources)).select(
        "source",
        "n_docs",
        "n_tokens",
        planned.alias("planned_tokens"),
    )
    frac = F.col("planned_tokens").cast("double") / F.col("n_tokens").cast("double")
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        "planned_tokens",
        F.floor(F.least(F.lit(1.0), frac) * 1000000.0).cast("long")
        .alias("sample_rate_x1m"),
        F.floor(frac * 100.0).cast("long").alias("epochs_x100"),
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """:func:`dataset_split` with the near-dup leak closed: random-by-key
    splits put near-duplicate documents in DIFFERENT splits, so the model
    trains on (a copy of) its own eval set.  Here the split is a pure
    function of the duplicate CLUSTER id (``operators.dedup.
    duplicate_clusters`` output; unclustered docs fall back to their own
    key, which IS their cluster id under min-member labeling), so every
    member of a cluster lands in one split and unclustered docs keep
    exactly their :func:`dataset_split` assignment.

    Plan shape: one hash join of the corpus against the cluster relation
    (bounded by the near-dup subset — orders of magnitude smaller than
    the corpus, but it SCALES with duplication, so no forced broadcast;
    AQE decides) + the same map-only hash banding as
    :func:`dataset_split`.
    """
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError(
            f"need val_frac, test_frac >= 0 with sum < 1, got "
            f"{val_frac}, {test_frac}"
        )
    cl = clusters.select(
        F.col("doc_id").alias(key_col), F.col("cluster_id")
    )
    skey = F.coalesce(F.col("cluster_id"), F.col(key_col))
    h = _hash31(skey)
    t_val = int(val_frac * HASH_SPACE)
    t_test = t_val + int(test_frac * HASH_SPACE)
    return df.join(cl, key_col, "left").withColumn(
        "split",
        F.when(h < t_val, F.lit("val"))
        .when(h < t_test, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def dsir_weights(
    df: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    shingle_size: int = 2,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio of a TARGET hashed-n-gram model over the
    RAW (non-target) model — the standard way to upsample domain-relevant
    data from a web-scale crawl given a small in-domain seed set.

    ``target_col`` is a boolean column marking the in-domain seed docs;
    both models are add-one-smoothed multinomials over ``n_buckets``
    hashed token-``shingle_size``-gram features.  Per-bucket log ratio is
    quantized immediately (x1000 floor — the unigram_logprob precedent:
    ONE ln of one exact-integer double ratio per bucket, everything after
    is integer), so document scores are associative and
    partitioning-independent.  Returns (id, n_feats, importance_x1000):
    positive = target-like.

    Plan shape (100 TB): the feature stream is scanned twice (model
    build, scoring) like unigram_logprob; ``rollup(bucket)`` emits the
    per-bucket counts AND the two grand totals from one map-side-combined
    aggregation, localCheckpoint-ed so both consumers read it once.  The
    model is ≤ ``n_buckets`` rows by CONSTRUCTION — a true dimension at
    any corpus size (unlike a raw vocab) — so the scoring join always
    broadcasts; the only corpus-sized exchange is the final per-doc fold.
    """
    feats = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(target_col).cast("boolean").alias("_is_t"),
            F.explode(
                token_shingles(F.col(text_col), shingle_size)
            ).alias("_sh"),
        )
        .select(
            F.col(id_col),
            "_is_t",
            (
                F.conv(F.substring(F.md5("_sh"), 1, 15), 16, 10).cast("long")
                % n_buckets
            ).alias("_bucket"),
        )
    )
    agg = (
        feats.select("_bucket", "_is_t")
        .rollup("_bucket")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_ct"),
            F.sum(F.when(F.col("_is_t"), 0).otherwise(1)).alias("_cr"),
        )
        .localCheckpoint(eager=False)
    )
    counts = agg.filter(F.col("_bucket").isNotNull())
    totals = agg.filter(F.col("_bucket").isNull()).select(
        F.col("_ct").alias("_nt"), F.col("_cr").alias("_nr")
    )
    b = F.lit(n_buckets)
    model = counts.crossJoin(F.broadcast(totals)).select(
        "_bucket",
        F.floor(
            F.log(
                ((F.col("_ct") + 1) * (F.col("_nr") + b)).cast("double")
                / ((F.col("_cr") + 1) * (F.col("_nt") + b)).cast("double")
            )
            * 1000.0
        ).cast("long").alias("_lr"),
    )
    return (
        feats.join(F.broadcast(model), "_bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("_lr").cast("long").alias("importance_x1000"),
        )
    )
