"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``blockchain_postgres_sync_spark``; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from blockchain_postgres_sync_spark.plans.catalog import CATALOG, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full 13-interval OHLCV candle cascade (the
    reference's analytical heart, pg.rs:660-815) at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return CATALOG["candles_cascade"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
