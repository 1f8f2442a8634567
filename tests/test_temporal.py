"""Unit tests for operators/temporal.py: as-of join, sessionize, twap."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "t1"),
            (1, _ts("2024-01-01 12:00:00"), "t2"),
            (2, _ts("2024-01-01 09:00:00"), "t3"),  # no prior quote -> NULL
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 5.0),
            (1, _ts("2024-01-01 10:00:00"), 7.0),  # equal ts: inclusive
            (1, _ts("2024-01-01 11:00:00"), 9.0),
            (2, _ts("2024-01-01 09:30:00"), 1.0),  # after left -> no match
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r["tag"]: r["v"]
        for r in temporal.asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    assert out == {"t1": 7.0, "t2": 9.0, "t3": None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "t1")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 5.0)], "k long, ts timestamp, v double"
    )
    ok = temporal.asof_join(left, right, on="k", value_cols=["v"]).collect()
    assert ok[0]["v"] == 5.0
    stale = temporal.asof_join(
        left, right, on="k", value_cols=["v"], tolerance_seconds=3600
    ).collect()
    assert stale[0]["v"] is None


def test_sessionize_gap_rule(spark):
    # gaps: 1h (merge), exactly 2h (merge — session_window is inclusive at
    # the boundary), 2h + 1s (split)
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1),
            (1, _ts("2024-01-01 01:00:00"), 2),
            (1, _ts("2024-01-01 03:00:00"), 3),
            (1, _ts("2024-01-01 05:00:01"), 4),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = sorted(
        (r["first_event_id"], r["last_event_id"], r["n_events"])
        for r in temporal.sessionize(ev, gap="2 hours").collect()
    )
    assert out == [(1, 3, 3), (4, 4, 1)]


def test_twap_holding_time_weights(spark):
    # value 10 held 30s, value 20 held 10s -> twap = (10*30+20*10)/40 = 12.5
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1, 10.0),
            (1, _ts("2024-01-01 00:00:30"), 2, 20.0),
            (1, _ts("2024-01-01 00:00:40"), 3, 99.0),  # last: closes, weight 0
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    row = temporal.twap(ev).collect()[0]
    assert row["twap_micros"] == 12_500_000
    assert row["total_seconds"] == 40
    assert row["n_intervals"] == 2


def test_twap_single_event_user_excluded(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 1, 10.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    assert temporal.twap(ev).count() == 0


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "t1"),  # next quote at 11:00
            (1, _ts("2024-01-01 11:00:00"), "t2"),  # equal ts: inclusive
            (1, _ts("2024-01-01 13:00:00"), "t3"),  # no later quote -> NULL
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 5.0),
            (1, _ts("2024-01-01 11:00:00"), 7.0),
            (1, _ts("2024-01-01 12:00:00"), 9.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r["tag"]: r["v"]
        for r in temporal.asof_join(
            left, right, on="k", value_cols=["v"], direction="forward"
        ).collect()
    }
    assert out == {"t1": 7.0, "t2": 7.0, "t3": None}
    # forward tolerance: t1's match is 1h away -> dropped at 30min tolerance
    tight = {
        r["tag"]: r["v"]
        for r in temporal.asof_join(
            left, right, on="k", value_cols=["v"], direction="forward",
            tolerance_seconds=1800,
        ).collect()
    }
    assert tight == {"t1": None, "t2": 7.0, "t3": None}


def test_range_join_inner_multibucket_and_overlap(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-02 12:00:00"), 100),  # inside long interval
            (1, _ts("2024-01-05 00:00:00"), 101),  # outside everything
            (2, _ts("2024-01-01 06:00:00"), 102),  # inside BOTH overlapping
        ],
        "k long, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [
            # spans 3 daily buckets
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"), "a"),
            (2, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 03:00:00"), _ts("2024-01-01 09:00:00"), "c"),
        ],
        "k long, start timestamp, end timestamp, tag string",
    )
    out = temporal.range_join(points, intervals, on="k")
    got = sorted((r["pid"], r["tag"]) for r in out.collect())
    assert got == [(100, "a"), (102, "b"), (102, "c")]


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-02 12:00:00"), 100), (1, _ts("2024-03-01 00:00:00"), 101)],
        "k long, ts timestamp, pid long",
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"), _ts("2024-01-03 00:00:00"), "a")],
        "k long, start timestamp, end timestamp, tag string",
    )
    out = temporal.range_join(points, intervals, on="k", how="left")
    got = sorted(
        (r["pid"], r["tag"]) for r in out.collect()
    )
    assert got == [(100, "a"), (101, None)]


def test_epoch_rejects_non_utc_session(spark):
    """ADVICE r2: NTZ epoch math silently shifts under a non-UTC session —
    the operators must refuse loudly instead."""
    import pytest as _pytest

    from blockchain_postgres_sync_spark.operators.temporal import _epoch

    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        with _pytest.raises(ValueError, match="UTC session timezone"):
            _epoch(F.col("ts"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    _epoch(F.col("ts"))  # UTC session: fine


def test_funnel_ordered_stages(spark):
    """Stage k counts only events strictly after the user's stage k-1:
    out-of-order and skipped-stage events do not advance the funnel."""
    from blockchain_postgres_sync_spark.operators.temporal import funnel

    rows = [
        # user 1: full ordered funnel, 60s then 120s apart
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:01:00"),
        (1, "purchase", "2024-01-01 00:03:00"),
        # user 2: signup only
        (2, "signup", "2024-01-01 00:00:00"),
        # user 3: click BEFORE signup -> click never counts
        (3, "click", "2024-01-01 00:00:00"),
        (3, "signup", "2024-01-01 00:01:00"),
        # user 4: signup then purchase but NO click -> stalls at stage 0
        (4, "signup", "2024-01-01 00:00:00"),
        (4, "purchase", "2024-01-01 00:05:00"),
        # user 5: no signup at all -> absent everywhere
        (5, "purchase", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.stage: (r.stage_name, r.n_users, r.mean_secs_from_prev)
        for r in funnel(df, ["signup", "click", "purchase"]).collect()
    }
    assert out[0] == ("signup", 4, None)
    assert out[1] == ("click", 1, 60)
    assert out[2] == ("purchase", 1, 120)


def test_retention_cohorts_multi_cohort(spark, tmp_path):
    """Cohorts key on the Monday week of the FIRST event; week_n is exact
    epoch weeks since that first event."""
    from blockchain_postgres_sync_spark.plans.catalog import CATALOG

    rows = [
        (1, "2024-01-01 10:00:00"),  # Mon wk0 cohort 2024-01-01
        (1, "2024-01-09 10:00:00"),  # 8 days later -> week_n 1
        (2, "2024-01-10 09:00:00"),  # Wed: cohort week 2024-01-08
        (2, "2024-01-16 09:00:00"),  # 6 days later -> week_n 0
        (2, "2024-01-18 09:00:00"),  # 8 days later -> week_n 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/events.parquet")
    out = {
        (r.cohort_week[:10], r.week_n): r.n_users
        for r in CATALOG["retention_cohorts"](spark, d).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_daily_anomalies_median_mad(spark):
    """Exact median/MAD flagging: a spike day flags, regular days do not;
    MAD=0 (constant series) flags any deviation."""
    from blockchain_postgres_sync_spark.operators.stats import daily_anomalies

    rows = []
    # type A: 10 events/day for 6 days, 30 on the 7th (spike)
    for d in range(1, 7):
        rows += [("A", f"2024-01-0{d} 00:00:0{i}") for i in range(10)]
    rows += [("A", f"2024-01-07 00:00:{i:02d}") for i in range(30)]
    # type B: constant 5/day for 3 days -> MAD 0, nothing deviates
    for d in range(1, 4):
        rows += [("B", f"2024-01-0{d} 00:00:0{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = [
        (r.event_type, r.day, r.n_events, r.median_n, r.mad)
        for r in daily_anomalies(df, k_x100=300).collect()
    ]
    assert out == [("A", "2024-01-07", 30, 10, 0)]
