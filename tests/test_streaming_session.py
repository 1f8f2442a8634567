"""Batch/streaming parity for sessionize: the SAME operator (native
session_window aggregation) fed through a multi-micro-batch file stream must
produce the sessions the batch plan produces — including sessions whose
members arrive in DIFFERENT micro-batches (state merge across triggers)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.temporal import sessionize

ROWS_B1 = [
    Row(user_id=1, ts="2024-01-01 00:00:00", event_id=1),
    Row(user_id=1, ts="2024-01-01 00:30:00", event_id=2),
    Row(user_id=2, ts="2024-01-01 00:10:00", event_id=3),
]
# user 1: gap > 2h -> new session; user 2: merges with batch-1 session
ROWS_B2 = [
    Row(user_id=1, ts="2024-01-01 05:00:00", event_id=4),
    Row(user_id=2, ts="2024-01-01 00:40:00", event_id=5),
]

_COLS = ["user_id", "session_start", "session_end", "n_events",
         "first_event_id", "last_event_id"]


def test_streaming_sessions_match_batch(spark):
    d = tempfile.mkdtemp(prefix="sess_stream_")
    try:
        schema = None
        for i, rs in enumerate((ROWS_B1, ROWS_B2)):
            df = spark.createDataFrame(rs).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
            schema = df.schema
            df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # one micro-batch per file
            .parquet(f"{d}/b*")
        )
        q = (
            sessionize(stream, gap="2 hours")
            .writeStream.format("memory")
            .queryName("sess_parity")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = sorted(
            tuple(str(v) for v in r)
            for r in spark.sql(
                f"SELECT {', '.join(_COLS)} FROM sess_parity"
            ).collect()
        )
        batch = spark.createDataFrame(ROWS_B1 + ROWS_B2).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        want = sorted(
            tuple(str(v) for v in r)
            for r in sessionize(batch, gap="2 hours").select(*_COLS).collect()
        )
        assert want, "batch sessionize produced no rows"
        assert got == want
        # the cross-micro-batch merge actually happened: user 2's two events
        # (one per file) form ONE session
        u2 = [r for r in got if r[0] == "2"]
        assert len(u2) == 1 and u2[0][3] == "2"
    finally:
        shutil.rmtree(d, ignore_errors=True)
