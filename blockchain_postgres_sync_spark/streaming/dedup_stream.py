"""Streaming corpus deduplication: first-seen-wins exact dedup over an
unbounded document stream.

Batch dedup (operators/dedup.py) answers "which docs are duplicates"; a
live ingestion pipeline instead wants "emit each content exactly once" as
documents arrive.  Spark-native: digest the content (same md5 key as
``exact_duplicates``) and let the streaming state store keep the seen-set —
``dropDuplicates`` for global exactness, ``dropDuplicatesWithinWatermark``
when an event-time watermark bounds state (the 100 TB form: state size
follows the dedup horizon, not the corpus).

At scale: state is hash-partitioned by digest (one shuffle per
micro-batch over the batch's rows only); with RocksDB state store the
seen-set spills to disk.  Cross-restart exactness comes from the
checkpoint, the same guarantee the reference gets from its Postgres
PK-on-insert (S6 insert-if-absent, up.sql:92-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Emit only the first document seen for each content digest.

    ``docs`` may be a streaming OR batch DataFrame (the plan is identical —
    Spark's unified semantics; batch ``dropDuplicates`` keeps an arbitrary
    row, streaming keeps the first across micro-batches).  With ``ts_col``
    and ``watermark`` set, state for digests older than the watermark is
    evicted and a duplicate arriving later than the horizon passes through
    — the deliberate trade-off that bounds state on an unbounded corpus.
    """
    keyed = docs.withColumn("_digest", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        return (
            keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_digest"])
            .drop("_digest")
        )
    return keyed.dropDuplicates(["_digest"]).drop("_digest")
