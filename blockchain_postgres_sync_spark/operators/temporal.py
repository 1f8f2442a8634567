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
        age = F.col("_t").cast("long") - F.col("_rt").cast("long")
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
        age = F.col("_rt").cast("long") - F.col("_t").cast("long")
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
            F.lead(F.col(time_col)).over(w).cast("long")
            - F.col(time_col).cast("long")
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
