"""Batch/streaming parity for sliding (hopping) windows: the same
window(10m, 5m) aggregation shape as q_sliding_window_rate, fed through a
multi-micro-batch file stream WITH a watermark, must reproduce the batch
result — including windows whose members arrive in different micro-batches
(hopping-window state merge across triggers)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

ROWS_B1 = [
    Row(event_type="click", ts="2024-01-01 00:01:00", value=1.5),
    Row(event_type="click", ts="2024-01-01 00:07:00", value=2.5),
    Row(event_type="view", ts="2024-01-01 00:03:00", value=4.0),
]
# second batch: same 00:05 window as batch-1's 00:07 row -> state merge
ROWS_B2 = [
    Row(event_type="click", ts="2024-01-01 00:09:00", value=3.0),
    Row(event_type="view", ts="2024-01-01 00:22:00", value=1.0),
]


def _slide(df: DataFrame) -> DataFrame:
    out = df.groupBy(
        F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_sv"),
    )
    return out.select(
        F.col("w.start").cast("string").alias("window_start"),
        "event_type", "n_events",
        F.col("_sv").cast("double").alias("sum_value"),
    )


def test_streaming_sliding_windows_match_batch(spark):
    d = tempfile.mkdtemp(prefix="slide_stream_")
    try:
        schema = None
        for i, rs in enumerate((ROWS_B1, ROWS_B2)):
            df = spark.createDataFrame(rs).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
            schema = df.schema
            df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")

        batch = sorted(
            tuple(str(v) for v in r)
            for r in _slide(spark.read.parquet(f"{d}/b*")).collect()
        )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            _slide(stream.withWatermark("ts", "1 hour"))
            .writeStream.format("memory")
            .queryName("slide_parity")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(str(v) for v in r)
            for r in spark.sql(
                "SELECT window_start, event_type, n_events, sum_value "
                "FROM slide_parity"
            ).collect()
        )
        assert got == batch
        # every event lands in exactly width/slide = 2 windows
        n_events_total = sum(int(r[2]) for r in got)
        assert n_events_total == 2 * (len(ROWS_B1) + len(ROWS_B2))
    finally:
        shutil.rmtree(d, ignore_errors=True)
