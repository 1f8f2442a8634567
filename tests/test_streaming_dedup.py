"""Streaming exact dedup: first-seen-wins across micro-batches must keep
exactly one row per content digest — including duplicates that arrive in a
LATER micro-batch than the original (state carried across triggers) — and
the kept set must equal the batch dedup's representative set."""

from __future__ import annotations

import shutil
import socket
import tempfile
import threading
import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.sources.live_updates import parse_update_lines
from blockchain_postgres_sync_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
)

ROWS_B1 = [
    Row(doc_id=1, text="alpha beta"),
    Row(doc_id=2, text="gamma delta"),
    Row(doc_id=3, text="alpha beta"),      # intra-batch dup of 1
]
ROWS_B2 = [
    Row(doc_id=4, text="gamma delta"),     # cross-batch dup of 2
    Row(doc_id=5, text="epsilon zeta"),    # fresh
]


def test_streaming_exact_dedup_first_seen_wins(spark):
    d = tempfile.mkdtemp(prefix="dedup_stream_")
    try:
        schema = None
        for i, rs in enumerate((ROWS_B1, ROWS_B2)):
            df = spark.createDataFrame(rs)
            schema = df.schema
            df.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_stream_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r.doc_id: r.text
            for r in spark.sql("SELECT * FROM dedup_stream_out").collect()
        }
        # one row per distinct content; first-seen doc ids win
        assert got == {1: "alpha beta", 2: "gamma delta", 5: "epsilon zeta"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_parse_update_lines_roundtrip(spark):
    """The socket/Kafka line decoder yields RAW_UPDATE rows; malformed
    lines drop instead of poisoning the stream."""
    good = (
        '{"seq": 1, "kind": "block", "id": "b0", "height": 10,'
        ' "time_stamp": 1700000000000, "ref_id": null,'
        ' "waves_quantity": null, "transactions": [],'
        ' "asset_updates": [], "data_entries": []}'
    )
    lines = spark.createDataFrame(
        [(good,), ("{not json",)], "value string"
    )
    rows = parse_update_lines(lines).collect()
    assert len(rows) == 1
    assert (rows[0]["seq"], rows[0]["kind"], rows[0]["height"]) == (1, "block", 10)


def test_socket_updates_end_to_end(spark):
    """S1 live-subscription shape: frames served over TCP arrive as typed
    RAW_UPDATE rows through the socket source."""
    from blockchain_postgres_sync_spark.sources.live_updates import socket_updates

    frame = (
        '{"seq": 7, "kind": "block", "id": "b7", "height": 42,'
        ' "time_stamp": 1700000000000, "ref_id": null,'
        ' "waves_quantity": null, "transactions": [],'
        ' "asset_updates": [], "data_entries": []}'
    )
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall((frame + "\n").encode())
            time.sleep(3)  # keep the connection up past the first trigger

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    q = (
        socket_updates(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName("socket_updates_out")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline and not rows:
            time.sleep(0.5)
            rows = spark.sql("SELECT * FROM socket_updates_out").collect()
        assert rows, "no rows arrived over the socket source"
        assert (rows[0]["seq"], rows[0]["height"]) == (7, 42)
    finally:
        q.stop()
        srv.close()


def test_inrow_minhash_matches_batch(spark):
    """The per-row signature expressions must be value-identical to the
    batch minhash_signatures aggregate (same md5 base, same affine family)."""
    from blockchain_postgres_sync_spark.operators.dedup import minhash_signatures
    from blockchain_postgres_sync_spark.streaming.lsh_stream import (
        inrow_minhash_columns,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = {
        r.doc_id: tuple(r[f"mh_{j}"] for j in range(12))
        for r in minhash_signatures(docs).collect()
    }
    inrow = {
        r.doc_id: tuple(r[f"mh_{j}"] for j in range(12))
        for r in docs.select(
            "doc_id", *inrow_minhash_columns(F.col("text"))
        ).collect()
    }
    assert inrow == batch and len(batch) > 0


def test_streaming_lsh_matches_batch_pairs(spark):
    """Candidate pairs accumulated over a 2-micro-batch stream (deduped)
    must equal batch lsh_candidate_pairs over the full corpus — including
    pairs whose members arrive in DIFFERENT micro-batches."""
    from blockchain_postgres_sync_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures,
    )
    from blockchain_postgres_sync_spark.streaming.lsh_stream import (
        streaming_lsh_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expected = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert expected, "fixture must contain near-dup pairs"

    d = tempfile.mkdtemp(prefix="lsh_stream_")
    try:
        half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
        docs.filter(F.col("doc_id") <= half).coalesce(1).write.parquet(f"{d}/b0")
        docs.filter(F.col("doc_id") > half).coalesce(1).write.parquet(f"{d}/b1")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            streaming_lsh_candidates(stream)
            .writeStream.format("memory")
            .queryName("lsh_stream_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.id_a, r.id_b)
            for r in spark.sql("SELECT * FROM lsh_stream_out").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kafka_frame_decode_matches_socket_path(spark):
    """Round-3 verdict item 7: the Kafka claim in COVERAGE S1, made tested
    reality.  Frames shaped exactly like Spark's format("kafka") output
    (binary key/value + topic/partition/offset/timestamp columns) must
    decode to the SAME RAW_UPDATE rows the socket/string path yields —
    including dropping malformed and tombstone (NULL value) records."""
    import datetime as dt

    from blockchain_postgres_sync_spark.sources.live_updates import (
        KAFKA_SOURCE_SCHEMA, decode_kafka_frames, parse_update_lines,
    )

    frames = [
        '{"seq": 1, "kind": "block", "id": "b0", "height": 10,'
        ' "time_stamp": 1700000000000, "ref_id": null,'
        ' "waves_quantity": null, "transactions": [],'
        ' "asset_updates": [], "data_entries": []}',
        '{"seq": 2, "kind": "rollback", "id": "rb", "height": null,'
        ' "time_stamp": null, "ref_id": "b0", "waves_quantity": null,'
        ' "transactions": [], "asset_updates": [], "data_entries": []}',
        "{not json",
    ]
    ts = dt.datetime(2026, 1, 1)
    kafka_rows = [
        (b"k%d" % i, f.encode("utf-8"), "updates", 0, i, ts, 0)
        for i, f in enumerate(frames)
    ] + [(b"tomb", None, "updates", 0, 99, ts, 0)]  # Kafka tombstone
    kafka_df = spark.createDataFrame(kafka_rows, KAFKA_SOURCE_SCHEMA)
    socket_df = spark.createDataFrame([(f,) for f in frames], "value string")

    via_kafka = sorted(map(str, decode_kafka_frames(kafka_df).collect()))
    via_socket = sorted(map(str, parse_update_lines(socket_df).collect()))
    assert via_kafka == via_socket
    assert len(via_kafka) == 2  # malformed + tombstone dropped


def test_streaming_index_matches_batch_parity(spark):
    """Stream-vs-stored-index matches accumulated over a 2-micro-batch
    stream (deduped) must equal the batch pair-level scores of the same
    split at the same threshold — and stay consistent with the batch
    best-match operator (every best match is witnessed by the stream)."""
    from blockchain_postgres_sync_spark.operators.dedup import (
        banded_match_scores, banded_signature_rows, incremental_lsh_matches,
    )
    from blockchain_postgres_sync_spark.streaming.lsh_stream import (
        streaming_index_matches,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = docs.filter(F.col("doc_id") % 10 < 8)
    incoming = docs.filter(F.col("doc_id") % 10 >= 8)
    idx_banded = banded_signature_rows(index).localCheckpoint(eager=False)
    expected = {
        (r.doc_id, r.index_id, r.agree_x100)
        for r in banded_match_scores(banded_signature_rows(incoming), idx_banded)
        .filter(F.col("agree_x100") >= 50).collect()
    }
    assert expected, "fixture must contain index matches"

    d = tempfile.mkdtemp(prefix="lsh_index_stream_")
    try:
        half = incoming.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
        incoming.filter(F.col("doc_id") <= half).coalesce(1).write.parquet(f"{d}/b0")
        incoming.filter(F.col("doc_id") > half).coalesce(1).write.parquet(f"{d}/b1")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            streaming_index_matches(stream, idx_banded)
            .writeStream.format("memory")
            .queryName("lsh_index_stream_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.doc_id, r.index_id, r.agree_x100)
            for r in spark.sql("SELECT * FROM lsh_index_stream_out").collect()
        }
        assert got == expected
        # the batch operator's best matches are a subset of the stream's
        # witnessed pairs
        best = {
            (r.doc_id, r.index_id, r.agree_x100)
            for r in incremental_lsh_matches(incoming, index).collect()
        }
        assert best <= got
    finally:
        shutil.rmtree(d, ignore_errors=True)
