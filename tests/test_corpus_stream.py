"""End-to-end streaming corpus pipeline tests: JSONL shards -> curated,
deduplicated, quarantine-split parquet corpus."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.streaming.corpus_stream import (
    curate_stream,
    run_corpus_stream,
)

GOOD_TEXT = "the quick brown fox jumps over the lazy dog " * 3  # passes gates
LOW_ENTROPY = "aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa"


def _write_shards(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t0 = "2024-05-01T00:00:00"
    rows1 = [
        {"doc_id": 1, "text": GOOD_TEXT + "alpha", "lang": "en",
         "source": "s0", "ingested_at": t0},
        {"doc_id": 2, "text": LOW_ENTROPY, "lang": "en", "source": "s0",
         "ingested_at": t0},
        {"doc_id": 3, "text": "too short", "lang": "en", "source": "s0",
         "ingested_at": t0},
    ]
    rows2 = [
        # exact duplicate of doc 1's content, later shard -> must dedup
        {"doc_id": 4, "text": GOOD_TEXT + "alpha", "lang": "en",
         "source": "s1", "ingested_at": "2024-05-01T00:01:00"},
        {"doc_id": 5, "text": GOOD_TEXT + "beta", "lang": "es",
         "source": "s1", "ingested_at": "2024-05-01T00:01:00"},
    ]
    (src / "shard0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows1) + "\nGARBAGE NOT JSON\n"
    )
    (src / "shard1.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))
    return src


def test_corpus_stream_end_to_end(spark, tmp_path):
    src = _write_shards(tmp_path)
    out = tmp_path / "out"
    run_corpus_stream(
        spark,
        str(src),
        str(out),
        str(tmp_path / "ckpt"),
        min_tokens=10,
        max_tokens=5000,
        min_mean_token_len_x100=100,
        max_mean_token_len_x100=1200,
        min_repetition_x100=20,
        min_entropy_x1000=2000,
    )
    docs = spark.read.parquet(str(out / "docs"))
    kept = {r.doc_id for r in docs.collect()}
    # doc 1 survives; doc 4 (same content, later) deduped; doc 5 survives;
    # doc 2 fails the entropy gate; doc 3 fails min_tokens
    assert 1 in kept and 5 in kept
    assert 2 not in kept and 3 not in kept and 4 not in kept
    # lang partitioning materialized
    assert {r.lang for r in docs.collect()} == {"en", "es"}
    # read the dead-letter shard as text: its field is literally named
    # _corrupt_record, which a JSON read would treat as the meta column
    bad = spark.read.text(str(out / "_quarantine"))
    assert bad.filter(F.col("value").contains("GARBAGE")).count() == 1


def test_corpus_stream_restart_is_idempotent(spark, tmp_path):
    """Re-running with the same checkpoint must not duplicate output (the
    availableNow drain is exactly-once per checkpoint)."""
    src = _write_shards(tmp_path)
    out = tmp_path / "out"
    for _ in range(2):
        run_corpus_stream(
            spark, str(src), str(out), str(tmp_path / "ckpt"),
            min_tokens=10, min_mean_token_len_x100=100,
            min_repetition_x100=20, min_entropy_x1000=2000,
        )
    docs = spark.read.parquet(str(out / "docs"))
    assert docs.count() == docs.dropDuplicates(["doc_id"]).count()


def test_stream_matches_batch_curation(spark, tmp_path):
    """Unified semantics: the streamed corpus equals running curate_stream
    on the same rows as one batch frame (modulo which duplicate survives —
    content-identical by construction)."""
    src = _write_shards(tmp_path)
    out = tmp_path / "out"
    kwargs = dict(
        min_tokens=10, min_mean_token_len_x100=100,
        min_repetition_x100=20, min_entropy_x1000=2000,
    )
    run_corpus_stream(spark, str(src), str(out), str(tmp_path / "ckpt"), **kwargs)
    streamed = spark.read.parquet(str(out / "docs"))

    batch = spark.read.json(
        str(src),
        schema="doc_id long, text string, lang string, source string, "
               "ingested_at timestamp",
    )
    batch_out = curate_stream(batch.filter(F.col("text").isNotNull()), **kwargs)
    assert sorted(r.text for r in streamed.collect()) == sorted(
        r.text for r in batch_out.collect()
    )
