"""End-to-end streaming corpus pipeline: JSONL shards in, curated
deduplicated training documents out.

Composes the engine's corpus operators into the live-ingestion shape a
training-data platform runs continuously (the analog of the reference's
block consumer loop, mod.rs:90-160, for documents instead of blocks):

    readStream(JSONL) -> corrupt-line quarantine -> quality gates
      -> char-entropy gate -> streaming exact dedup -> parquet sink

Every stage is stateless EXCEPT the dedup (streaming state keyed by content
digest, watermark-bounded), so the pipeline scales like its batch
counterparts: gates are pushdown-friendly filters, the one shuffle per
micro-batch is the dedup's digest hash, and the sink appends partitioned
parquet.  Exactly-once across restarts comes from the checkpoint +
idempotent parquet append (same guarantee chain as the block pipeline's
store commit).

The quality gates reuse ``operators.sampling.curate`` and
``functions.text.char_entropy_x1000`` unchanged — streaming and batch run
the SAME plan (Spark's unified semantics), pinned by
tests/test_corpus_stream.py::test_stream_matches_batch_curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.text import char_entropy_x1000
from ..operators.sampling import curate
from ..sources.textfiles import CORRUPT_COL, _with_corrupt
from .dedup_stream import streaming_exact_dedup

#: the stream's document schema (a superset works — extra fields pass through)
DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("ingested_at", TimestampType()),
    ]
)


def curate_stream(
    docs: DataFrame,
    min_entropy_x1000: int = 1500,
    watermark: str | None = "10 minutes",
    ts_col: str = "ingested_at",
    **curate_kwargs,
) -> DataFrame:
    """The transformation core, usable on a streaming OR batch frame:
    quality gates -> entropy gate -> first-seen-wins dedup."""
    kept = curate(docs, **curate_kwargs)
    kept = kept.withColumn(
        "entropy_x1000", char_entropy_x1000(F.col("text"))
    ).filter(F.col("entropy_x1000") >= min_entropy_x1000)
    if docs.isStreaming and watermark is not None:
        return streaming_exact_dedup(kept, ts_col=ts_col, watermark=watermark)
    return streaming_exact_dedup(kept)


def run_corpus_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
    min_entropy_x1000: int = 1500,
    **curate_kwargs,
) -> None:
    """Drain all currently-available JSONL shards through the pipeline
    (availableNow trigger — the batch-drain mode; a live deployment uses
    the same call without the terminating trigger).

    Corrupt lines are quarantined to ``<out_dir>/_quarantine`` instead of
    poisoning the corpus; clean curated docs land partitioned by ``lang``
    under ``<out_dir>/docs``.

    Two streaming queries over the source (each with its own checkpoint):
    the curated path keeps its dedup state ON THE STREAM — state lives in
    the state store and spans micro-batches and restarts (a foreachBatch
    dedup would silently reset per batch) — while the quarantine path is a
    stateless append."""

    def read():
        return (
            spark.readStream.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(src_dir)
        )

    curated = curate_stream(
        read().filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL),
        min_entropy_x1000=min_entropy_x1000,
        **curate_kwargs,
    )
    q_docs = (
        curated.writeStream.partitionBy("lang")
        .format("parquet")
        .option("path", f"{out_dir}/docs")
        .option("checkpointLocation", f"{checkpoint_dir}/docs")
        .trigger(availableNow=True)
        .start()
    )
    # full row kept on the quarantine side: Spark disallows projecting only
    # the corrupt column off a raw file scan, and the partial parse is
    # useful dead-letter context anyway
    q_bad = (
        read()
        .filter(F.col(CORRUPT_COL).isNotNull())
        .writeStream.format("json")
        .option("path", f"{out_dir}/_quarantine")
        .option("checkpointLocation", f"{checkpoint_dir}/quarantine")
        .trigger(availableNow=True)
        .start()
    )
    q_docs.awaitTermination()
    q_bad.awaitTermination()
