"""Bucketed-table helpers: the co-located-join storage layout for 100 TB.

SCALE.md's posture for the heavy equi-join families (shingle postings,
tx-id lookups, embedding buckets) is "materialize bucketed on the join key
so repeated joins never re-shuffle".  These helpers are that layout:
``bucketBy(n, key)`` + ``sortBy`` parquet tables registered in the session
catalog.  Two tables bucketed on the same key with the same bucket count
join with NO exchange on either side (SortMergeJoin reads co-located
buckets directly) — asserted structurally in
tests/test_plans.py::test_bucketed_join_skips_exchange.

On a real deployment the catalog is Hive-metastore/Glue-backed and the
bucket count is sized so one bucket ≈ one executor-core's worth of data
(e.g. 100 TB / 2048 buckets ≈ 50 GB per bucket, split further by file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` additionally sorts within each bucket file — joins and
    merge-aggregations on (bucket key, sort prefix) then skip both the
    exchange AND the sort.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its distribution metadata intact
    (a plain ``read.parquet`` of the files would lose the bucket spec)."""
    return spark.table(table)
