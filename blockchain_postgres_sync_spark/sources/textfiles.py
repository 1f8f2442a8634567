"""JSONL / CSV corpus readers and writers.

Web-scale corpora arrive as line-delimited JSON or CSV long before they are
parquet; the reference's ingest likewise consumes a line-oriented feed
(`src/lib/consumer/updates.rs` frames).  These wrappers pin the settings
that matter at 100 TB and that the bare ``spark.read`` defaults get wrong
for pipeline use:

- **Explicit schema, never inference.**  Schema inference is a full extra
  pass over the data (and samples, so it can mis-type rare columns).  All
  readers here REQUIRE a schema.
- **Quarantine, don't drop.**  Malformed lines land in a
  ``_corrupt_record`` column so a bad shard surfaces as rows you can
  count/route, instead of silently vanishing (DROPMALFORMED) or killing
  the job at line 3-billion (FAILFAST).
- **Line-splittable parse.**  Implemented as ``spark.read.text`` (one task
  per file split — a 1 TB shard parallelizes without repartitioning)
  followed by ``from_json`` / ``from_csv``.  Parsing per-line instead of
  via the raw file source sidesteps Spark's
  [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] restriction: the
  corrupt column here is an ordinary computed column, so quarantine-side
  counts and projections need no cache() workaround.
- gzip makes a shard one unsplittable task; the writers default to
  uncompressed parts sized by the caller's partitioning so reads
  parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def _expand(lines: DataFrame, parsed: F.Column, schema: StructType) -> DataFrame:
    """Project the parsed struct to top-level columns; a line whose parse
    produced no data fields (all-null struct) is quarantined verbatim."""
    p = lines.select(F.col("value").alias("_raw"), parsed.alias("_p"))
    data_cols = [f.name for f in schema.fields]
    corrupt = F.col(f"_p.{CORRUPT_COL}").isNotNull() | F.coalesce(
        *[F.col(f"_p.{c}").isNotNull() for c in data_cols], F.lit(False)
    ).__invert__()
    return p.select(
        *[F.col(f"_p.{c}").alias(c) for c in data_cols],
        F.when(corrupt, F.col("_raw")).alias(CORRUPT_COL),
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read line-delimited JSON with an explicit schema; malformed lines are
    quarantined verbatim into ``_corrupt_record`` rather than dropped."""
    full = _with_corrupt(schema)
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _expand(lines, parsed, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with an explicit schema, quarantining malformed rows into
    ``_corrupt_record`` — same contract as :func:`read_jsonl`.

    ``header=True`` drops lines equal to the schema's own header string
    (per-shard headers in distributed CSV have no stable position, so this
    is the only splittable way to skip them)."""
    full = _with_corrupt(schema)
    lines = spark.read.text(path)
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in full.fields)
    parsed = F.from_csv(
        F.col("value"),
        ddl,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
    )
    return _expand(lines, parsed, schema)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) — route bad lines to a dead-letter
    sink instead of interleaving them with data.  The clean side drops the
    corrupt column; the quarantine side keeps the raw line plus whatever
    partially parsed."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write line-delimited JSON, optionally coalesced to ``partitions``
    output parts.  Uncompressed by default (splittable re-read; see module
    docstring)."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, partitions: int | None = None) -> None:
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").option("header", True).csv(path)
