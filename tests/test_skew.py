"""salted_join: row-identical to the plain join (the whole point — only
the partitioning may differ), on skewed inputs, for inner and left."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.skew import salted_join

_slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def _skewed(draw):
    n = draw(st.integers(5, 40))
    # ~half the probe rows land on the hot key 0
    keys = draw(st.lists(st.sampled_from([0, 0, 0, 1, 2, 3]), min_size=n, max_size=n))
    dim = draw(st.lists(st.sampled_from([0, 1, 2, 4]), min_size=1, max_size=4, unique=True))
    return keys, dim


@given(_skewed(), st.sampled_from(["inner", "left"]))
@_slow
def test_salted_join_equals_plain_join(spark, data, how):
    keys, dim = data
    big = spark.createDataFrame(
        [(i, k, i * 10) for i, k in enumerate(keys)], "rid long, k long, v long"
    )
    small = spark.createDataFrame([(k, f"d{k}") for k in dim], "k long, name string")
    got = sorted(
        tuple(r) for r in
        salted_join(big, small, on="k", salt_from="rid", salts=4, how=how)
        .select("rid", "k", "v", "name").collect()
    )
    want = sorted(
        tuple(r) for r in
        big.join(small, "k", how).select("rid", "k", "v", "name").collect()
    )
    assert got == want


def test_salted_join_shuffle_carries_salt(spark):
    """With broadcast disabled the exchange hashes on (key, salt) — the hot
    key really spreads over `salts` reducers."""
    big = spark.createDataFrame([(i, 0) for i in range(100)], "rid long, k long")
    small = spark.createDataFrame([(0, "x")], "k long, name string")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(big, small, on="k", salt_from="rid", salts=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan and "hashpartitioning(k#" in plan
        assert out.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_rejects_reserved_column_and_bad_how(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "k long, _salt long")
    clean = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, clean, on="k", salt_from="k")
    with pytest.raises(ValueError):
        salted_join(clean, clean.drop("v"), on="k", salt_from="k", how="full")
