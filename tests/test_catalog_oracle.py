"""Differential tests: every catalog query vs its DuckDB oracle at sf0.001
(fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from blockchain_postgres_sync_spark.plans.catalog import (
    CATALOG,
    ORACLES,
    ROWS_ONLY_QUERIES,
)

from .conftest import SF_SMOKE
from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(CATALOG.keys()))
def test_query_matches_oracle(spark, name):
    if name in ROWS_ONLY_QUERIES:
        # no SQL-expressible oracle: execute and require a non-degenerate
        # result; the semantics are pinned by a dedicated pytest instead.
        assert CATALOG[name](spark, SF_SMOKE).count() > 0
        return
    assert name in ORACLES, f"{name} has no oracle"
    df = CATALOG[name](spark, SF_SMOKE)
    problems = compare(df, ORACLES[name], SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_catalog_oracle_keys_match():
    assert set(ORACLES).issubset(set(CATALOG))
    assert set(ORACLES) | ROWS_ONLY_QUERIES == set(CATALOG)


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must be a registered catalog query —
    a typo would crash the driver's per-round bench run."""
    import re

    import bench

    assert set(bench.HEADLINE) <= set(CATALOG)
    # and the exclusions are exactly the documented sub-second/streaming set
    excluded = set(CATALOG) - set(bench.HEADLINE)
    assert excluded == {"dedup_tokenset"}
