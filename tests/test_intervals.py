"""range_join's round-10 extensions: keyless (on=None) point-in-interval
joins, end-exclusive semantics, the ENFORCED fanout cap, and the plan shape
(equi join on the bucket key — never a nested-loop).  The keyed inclusive
base form is covered in tests/test_temporal.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.temporal import range_join


def _mk(spark, points, intervals):
    pts = spark.createDataFrame(points, "pid long, ts timestamp")
    iv = spark.createDataFrame(
        intervals, "iid long, start_ts timestamp, end_ts timestamp"
    )
    return pts, iv


def _ts(h, m=0, s=0, day=1):
    return dt.datetime(2024, 1, day, h, m, s)


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def _join(pts, iv, **kw):
    kw.setdefault("bucket_seconds", 3600)
    return range_join(
        pts, iv, on=None, point_time="ts",
        start_col="start_ts", end_col="end_ts", end_exclusive=True, **kw
    )


POINTS = [
    (1, _ts(0)),
    (2, _ts(5, 30)),
    (3, _ts(12)),
    (4, _ts(23, 59, 59)),
    (5, _ts(0, day=3)),
]
INTERVALS = [
    (10, _ts(0), _ts(6)),            # covers p1, p2
    (11, _ts(5, 30), _ts(5, 30)),    # empty: matches nothing (half-open)
    (12, _ts(12), _ts(12, 0, 1)),    # 1s interval: covers p3 only
    (13, _ts(20), _ts(1, day=4)),    # multi-day: covers p4, p5
    (14, _ts(0, 0, 1), _ts(0, 0, 2)),  # covers nothing (p1 is 00:00:00)
]
EXPECTED = [(1, 10), (2, 10), (3, 12), (4, 13), (5, 13)]


def test_matches_naive_inequality_join(spark):
    pts, iv = _mk(spark, POINTS, INTERVALS)
    assert _pairs(_join(pts, iv)) == EXPECTED
    naive = pts.join(
        iv, (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts"))
    )
    assert _pairs(naive) == EXPECTED


def test_end_exclusive_vs_inclusive(spark):
    # p3 sits exactly on interval 12's start and one second before its
    # end; a point exactly at an interval END flips with the flag
    pts = spark.createDataFrame([(9, _ts(6))], "pid long, ts timestamp")
    iv = spark.createDataFrame(
        [(10, _ts(0), _ts(6))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    assert _pairs(_join(pts, iv)) == []
    inclusive = range_join(
        pts, iv, on=None, point_time="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=3600,
    )
    assert _pairs(inclusive) == [(9, 10)]


@pytest.mark.parametrize("bucket_seconds", [60, 3600, 86_400])
def test_bucket_width_invariance(spark, bucket_seconds):
    pts, iv = _mk(spark, POINTS, INTERVALS)
    got = _join(pts, iv, bucket_seconds=bucket_seconds)
    assert _pairs(got) == EXPECTED


def test_each_pair_emitted_exactly_once(spark):
    # the bucket rewrite must not duplicate a pair whose interval spans
    # many buckets — the point's single bucket picks exactly one copy
    pairs = _pairs(_join(*_mk(spark, POINTS, INTERVALS)))
    assert pairs == sorted(set(pairs)) == EXPECTED


def test_fanout_cap_raises(spark):
    pts, iv = _mk(spark, POINTS, INTERVALS)
    capped = _join(pts, iv, max_buckets_per_interval=2)
    with pytest.raises(Exception, match="spans more than 2 buckets"):
        capped.collect()


def test_fanout_cap_passes_when_bounded(spark):
    pts, iv = _mk(spark, POINTS, INTERVALS)
    got = _join(pts, iv, max_buckets_per_interval=100)
    assert _pairs(got) == EXPECTED


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, iv = _mk(spark, POINTS, INTERVALS)
    plan = (
        _join(pts, iv)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive = pts.join(
        iv, (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts"))
    )._jdf.queryExecution().executedPlan().toString()
    # the rewrite exists because the naive form really does plan a
    # quadratic join (nested-loop when one side broadcasts, cartesian
    # product otherwise)
    assert "BroadcastNestedLoopJoin" in naive or "CartesianProduct" in naive
