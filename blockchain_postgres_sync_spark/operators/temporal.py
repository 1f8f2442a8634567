"""Temporal operators: as-of join, gap sessionization, time-weighted average.

The reference's data-service family answers point-in-time questions against
the candles/pairs tables (matcher rates "at or before T"; the pairs view is
itself a last-24h rollup — migrations/…/up.sql:387-402), and its consumers
sessionize user/trade activity downstream.  Spark has no ASOF JOIN operator,
so these express the same semantics with shuffle-minimal primitives:

- :func:`asof_join` — the trades-vs-quotes point-in-time lookup as ONE
  union + ONE window pass (single shuffle on the key), not a per-row
  correlated subquery and not an O(|L|·|R|) inequality join.
- :func:`sessionize` — gap-based sessions via Spark's native
  ``session_window`` aggregation (the same operator Structured Streaming
  uses for stateful session aggs, so the batch and streaming plans agree).
- :func:`twap` — time-weighted average price over last-known intervals
  (lead window + integer-exact weighted mean).

Scale notes (100 TB): all three shuffle once on the entity key; within a
partition they are a sort + linear pass (window / session merge).  A hot key
(one instrument with billions of quotes) is the skew risk — for asof_join,
pre-bucket time into coarse buckets carrying forward the last value per
bucket (two passes) if a single key's history exceeds one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ inputs alike.  NTZ
    cannot cast straight to BIGINT; routing through TIMESTAMP is the
    identity ONLY under a UTC session timezone (any other zone would shift
    NTZ epochs — skewing as-of tolerances, range buckets and TWAP
    durations), so the session zone is checked once per plan build here
    rather than silently mis-bucketing.  Use ``session.get_spark()`` or
    re-pin ``spark.sql.session.timeZone=UTC`` before calling the temporal
    operators."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise ValueError(
                f"temporal operators require a UTC session timezone for "
                f"exact NTZ epoch math; session has {tz!r} — build the "
                f"session via session.get_spark() or set "
                f"spark.sql.session.timeZone=UTC first"
            )
    return c.cast("timestamp").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` for the same ``on`` key (``direction=
    "backward"``, the default) or the earliest right row with ``right.ts >=
    left.ts`` (``direction="forward"``).  Left outer: no matching right row
    -> NULL values.  Both directions are inclusive at equal timestamps,
    matching pandas.merge_asof.

    Plan shape: tag both sides, union, ONE window over
    (partitionBy=key, orderBy=(ts, tag, order within ties)) taking
    ``last(value, ignorenulls=True)`` over the preceding frame, then filter
    back to left rows.  One shuffle on the key; within a partition the
    window is a sort + linear scan — the standard distributed as-of shape
    (same trick as pandas.merge_asof, but expressed in Catalyst so it
    whole-stage-codegens and AQE handles key skew).

    Right-side ties on (key, ts) resolve to the LAST row in right's
    projection order of ``value_cols[0]``'s ordering column — pass distinct
    (key, ts) rows for fully engine-independent results.

    ``tolerance_seconds`` drops matches older than the tolerance (NULL
    instead), mirroring pandas' ``tolerance=``.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    lft = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in value_cols]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    rgt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_r"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    if direction == "backward":
        # at equal ts the right row must sort BEFORE the left row so the
        # left row's preceding frame includes it (inclusive <=)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_r", ignorenulls=True).over(w)
        carried_t = F.last(
            F.when(F.col("_is_r") == 1, F.col("_t")), ignorenulls=True
        ).over(w)
        age = _epoch(F.col("_t")) - _epoch(F.col("_rt"))
    elif direction == "forward":
        # at equal ts the right row must sort AFTER the left row so the
        # left row's following frame includes it (inclusive >=)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_r").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_r", ignorenulls=True).over(w)
        carried_t = F.first(
            F.when(F.col("_is_r") == 1, F.col("_t")), ignorenulls=True
        ).over(w)
        age = _epoch(F.col("_rt")) - _epoch(F.col("_t"))
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out = (
        lft.unionByName(rgt)
        .withColumn("_rv", carried)
        .withColumn("_rt", carried_t)
        .filter(F.col("_is_r") == 0)
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_rv", F.when(age <= tolerance_seconds, F.col("_rv"))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv.{c}").alias(c) for c in value_cols],
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap: str = "6 hours",
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions: consecutive events of one key belong to the same
    session while the gap between them is <= ``gap`` (Spark's session_window
    merges sessions whose ranges touch, so the boundary is inclusive).

    Uses Spark's native ``session_window`` aggregation — the SAME operator a
    ``readStream`` pipeline uses for stateful session aggs (with a watermark
    for state eviction), so batch backfill and live streaming produce
    identical sessions.  ``session_end`` is last-event-time + gap (Spark's
    window.end convention).  One shuffle on (key, merged session).
    """
    return (
        events.groupBy(F.col(key), F.session_window(F.col(time_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(order_col).alias("first_event_id"),
            F.max(order_col).alias("last_event_id"),
        )
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_event_id",
            "last_event_id",
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None,
    point_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86400,
    how: str = "inner",
    end_exclusive: bool = False,
    max_buckets_per_interval: int | None = None,
) -> DataFrame:
    """Point-in-interval join: each ``points`` row matches every
    ``intervals`` row of the same ``on`` key with
    ``start <= point_time <= end`` (inclusive; ``end_exclusive=True``
    tightens the upper bound to ``<`` — the half-open convention of
    validity windows).

    Spark's native plan for this predicate is a nested-loop join — O(P x I)
    per key.  Here the time axis is bucketized: every interval is exploded
    to the coarse buckets it covers (bounded by interval length /
    ``bucket_seconds``), points map to exactly one bucket, and the match
    becomes an EQUI-join on (key, bucket) + an exact range filter.  One
    shuffle on a uniform composite key, work O(P + I x buckets_per_interval
    + candidates).  Pick ``bucket_seconds`` ≈ the typical interval length:
    larger buckets = fewer interval replicas but more false candidates;
    smaller = the reverse.

    ``on=None`` joins with NO entity key — the bucket alone is the join
    key (global interval tables: maintenance windows, campaign windows).
    That makes the bucket the whole shuffle key, so keyless joins want a
    ``bucket_seconds`` small enough to spread the time axis across the
    cluster (AQE splits the residual skew).

    ``max_buckets_per_interval`` makes the fanout bound ENFORCED rather
    than hoped-for: an interval spanning more buckets raises at runtime,
    per-row inside the scan (Catalyst ``assert_true`` folded into the
    explode input — a standalone asserted column would be pruned away
    unevaluated).  Workloads with a few genuinely-long intervals should
    split them into a broadcast side (the classic long/short interval
    split) instead of raising the cap.

    ``how='left'`` keeps unmatched points with NULL interval columns.
    Intervals of one key may overlap; a point then matches each of them
    (standard join semantics).
    """
    pt_bucket = F.floor(_epoch(F.col(point_time)) / bucket_seconds)
    end_epoch = _epoch(F.col(end_col)) - (1 if end_exclusive else 0)
    iv_buckets = F.sequence(
        F.floor(_epoch(F.col(start_col)) / bucket_seconds),
        F.floor(end_epoch / bucket_seconds),
    )
    if max_buckets_per_interval is not None:
        n_buckets = (
            F.floor(end_epoch / bucket_seconds)
            - F.floor(_epoch(F.col(start_col)) / bucket_seconds)
            + 1
        )
        iv_buckets = F.when(
            F.assert_true(
                n_buckets <= F.lit(max_buckets_per_interval),
                F.lit(
                    f"interval spans more than {max_buckets_per_interval}"
                    f" buckets of {bucket_seconds}s — split long intervals"
                    f" or widen bucket_seconds"
                ),
            ).isNull(),
            iv_buckets,
        )
    if end_exclusive:
        # empty intervals (end <= start) match nothing under the half-open
        # predicate; drop them BEFORE the explode — sequence() would
        # otherwise yield a DESCENDING bucket range for them
        intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    p = points.withColumn("_b", pt_bucket)
    iv = intervals.withColumn("_b", F.explode(iv_buckets))
    joined = p.join(
        iv,
        [on, "_b"] if on is not None else ["_b"],
        "left" if how == "left" else "inner",
    )
    upper = (
        F.col(point_time) < F.col(end_col)
        if end_exclusive
        else F.col(point_time) <= F.col(end_col)
    )
    in_range = (F.col(point_time) >= F.col(start_col)) & upper
    if how == "left":
        # demote out-of-range candidates to non-matches, then keep all
        # matches — or, for a point with none, a single NULL row.  (Points
        # are assumed row-unique, e.g. carry an id column.)
        iv_cols = [c for c in intervals.columns if c != on]
        demoted = joined.select(
            *[F.col(c) for c in points.columns],
            *[F.when(in_range, F.col(c)).alias(c) for c in iv_cols],
            F.when(in_range, F.lit(0)).otherwise(F.lit(1)).alias("_miss"),
        )
        w = Window.partitionBy(*points.columns).orderBy(F.col("_miss").asc())
        return (
            demoted.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_miss") == 0) | (F.col("_rn") == 1))
            .drop("_rn", "_miss")
        )
    return joined.filter(in_range).drop("_b")


def twap(
    quotes: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    value_micros: Column | None = None,
    order_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average of a quote stream per key: each quote holds
    until the next one; the average weights each quote by its holding time
    in seconds (the last quote of a key carries weight 0 and is excluded
    from the weighted sum, but still closes the previous interval).

    Exact-then-one-float math so results hash identically in any engine:
    values enter as integer micros (one float64 floor), every
    ``value_micros * dur_seconds`` product is an exact sub-2^53 BIGINT,
    sums accumulate in DECIMAL(38,0) (exact, associative, overflow-safe),
    and the final mean is ONE float64 division + floor.  One shuffle on the
    key (lead window), then a hash agg on the same key — the agg reuses the
    window's partitioning, so no second exchange.
    """
    if value_micros is None:
        value_micros = F.floor(F.col("value") * 1e6).cast("long")
    w = Window.partitionBy(key).orderBy(F.col(time_col).asc(), F.col(order_col).asc())
    with_dur = quotes.select(
        F.col(key),
        value_micros.alias("_vm"),
        (
            _epoch(F.lead(F.col(time_col)).over(w))
            - _epoch(F.col(time_col))
        ).alias("_dur"),
    )
    wsum = F.sum((F.col("_vm") * F.col("_dur")).cast("decimal(38,0)"))
    dsum = F.sum(F.col("_dur").cast("decimal(38,0)"))
    return (
        with_dur.filter(F.col("_dur").isNotNull())
        .groupBy(key)
        .agg(
            F.when(
                dsum > 0,
                F.floor(wsum.cast("double") / dsum.cast("double")).cast("long"),
            ).alias("twap_micros"),
            dsum.cast("long").alias("total_seconds"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis — the sequential-pattern query (SQL's
    MATCH_RECOGNIZE niche) expressed as ONE conditional aggregation:
    per user, stage *k* is reached at the earliest event of type
    ``stages[k]`` that is STRICTLY AFTER the user's stage *k-1* time
    (first-touch attribution; a purchase before the signup does not
    count).  Returns one row per stage: (stage index, stage name, users
    reaching it, integer median-free mean seconds from the previous
    stage, exact).

    Plan shape (100 TB): NO self-joins — one shuffle on the user, then
    the whole per-user stage chain folds inside a single aggregate over
    the collected (type, ts) pairs of THAT USER's events (events per
    user is bounded; the array never sees another user's data).  The
    k-stage chain is a fold over stages in driver-side Python emitting
    nested Catalyst MIN-filters, so the aggregation stays codegen'd.
    """
    e = events.filter(F.col(type_col).isin(stages)).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    per_user = e.groupBy("_u").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_ts"), F.col("_t")))
        ).alias("_evs")
    )
    # fold the stage chain in-row: t_k = min ts of stage-k events after t_{k-1}
    reach_cols = []
    prev = F.lit(None).cast("timestamp")
    for k, stage in enumerate(stages):
        after = prev if k else F.lit("1900-01-01").cast("timestamp")
        def _pred(st: str, af: Column):
            # closure factory, NOT default-arg capture: PySpark derives the
            # HOF arity from the lambda signature, so extra defaulted
            # parameters would bind as (element, index, ...) and fail
            return lambda s: (s["_t"] == F.lit(st)) & (s["_ts"] > af)

        matches = F.filter(F.col("_evs"), _pred(stage, after))
        t_k = F.when(F.size(matches) > 0, matches[0]["_ts"])
        col = f"_t{k}"
        per_user = per_user.withColumn(col, t_k)
        prev = F.col(col)
        reach_cols.append(col)

    aggs = []
    for k, stage in enumerate(stages):
        aggs.append(F.count(F.col(f"_t{k}")).alias(f"_n{k}"))
        if k:
            delta = F.unix_timestamp(F.col(f"_t{k}")) - F.unix_timestamp(
                F.col(f"_t{k-1}")
            )
            aggs.append(F.sum(delta).alias(f"_d{k}"))
    # ONE-row totals frame, localCheckpoint-ed: each per-stage output row
    # below selects from it, and without the checkpoint every union branch
    # re-runs the whole per-user aggregation (k corpus scans instead of 1
    # — the same diamond the unigram model build hit)
    totals = per_user.agg(*aggs).localCheckpoint(eager=False)

    rows = None
    for k, stage in enumerate(stages):
        mean = (
            F.lit(None).cast("long")
            if k == 0
            else F.when(
                F.col(f"_n{k}") > 0,
                F.expr(f"_d{k} div _n{k}"),
            ).cast("long")
        )
        r = totals.select(
            F.lit(k).cast("int").alias("stage"),
            F.lit(stage).alias("stage_name"),
            F.col(f"_n{k}").cast("long").alias("n_users"),
            mean.alias("mean_secs_from_prev"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows
