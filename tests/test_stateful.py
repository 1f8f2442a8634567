"""Stateful-streaming candle operator vs the batch aggregate.

Feeds the same trades through (a) applyInPandasWithState over a multi-batch
file stream (maxFilesPerTrigger=1 forces one micro-batch per file, so state
must merge across batches) and (b) the batch minute_candles aggregate —
final per-key candles must agree."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.candles import minute_candles
from blockchain_postgres_sync_spark.streaming.stateful import (
    stateful_minute_candles,
)


def _trade(uid, ts, aa, pa, sender, height, amount, price):
    return Row(
        uid=uid, time_stamp=ts, amount_asset_id=aa, price_asset_id=pa,
        sender=sender, height=height, amount=amount, price=float(price),
    )


@pytest.fixture()
def trade_batches(spark):
    # batch 2 contains an EARLIER uid for pair A (late data) — the stateful
    # open must repair to the late trade's price.
    b1 = [
        _trade(10, "2024-01-01 00:00:05", "A", "USD", "M0", 1, 5, 100.0),
        _trade(11, "2024-01-01 00:00:40", "A", "USD", "M0", 1, 3, 110.0),
        _trade(12, "2024-01-01 00:01:10", "A", "USD", "M0", 1, 2, 120.0),
        _trade(13, "2024-01-01 00:00:20", "B", "EUR", "M1", 1, 7, 50.0),
    ]
    b2 = [
        _trade(9, "2024-01-01 00:00:55", "A", "USD", "M0", 1, 4, 90.0),
        _trade(14, "2024-01-01 00:00:59", "A", "USD", "M0", 2, 1, 130.0),
        _trade(15, "2024-01-01 00:01:30", "B", "EUR", "M1", 2, 2, 55.0),
    ]
    return b1, b2


def test_stateful_candles_match_batch(spark, trade_batches):
    b1, b2 = trade_batches
    d = tempfile.mkdtemp(prefix="stateful_trades_")
    try:
        schema = spark.createDataFrame(b1).withColumn(
            "time_stamp", F.col("time_stamp").cast("timestamp")
        ).schema
        for i, batch in enumerate((b1, b2)):
            (spark.createDataFrame(batch)
             .withColumn("time_stamp", F.col("time_stamp").cast("timestamp"))
             .coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}"))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            stateful_minute_candles(stream)
            .writeStream.format("memory")
            .queryName("cstate")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # memory sink in update mode appends every emission; keep the LAST
        # row per key = final state.
        got = {}
        for r in spark.sql("SELECT * FROM cstate").collect():
            got[(str(r.time_start), r.amount_asset_id, r.price_asset_id,
                 r.matcher_address)] = r

        batch_df = spark.createDataFrame(b1 + b2).withColumn(
            "time_stamp", F.col("time_stamp").cast("timestamp")
        )
        want_rows = minute_candles(batch_df).collect()
        assert want_rows, "batch aggregate produced no rows"
        for w in want_rows:
            g = got[(str(w.time_start), w.amount_asset_id,
                     w.price_asset_id, w.matcher_address)]
            assert g.txs_count == w.txs_count
            assert g.low == pytest.approx(float(w.low))
            assert g.high == pytest.approx(float(w.high))
            assert g.volume == pytest.approx(float(w.volume))
            assert g.quote_volume == pytest.approx(float(w.quote_volume))
            assert g.open == pytest.approx(float(w.open))
            assert g.close == pytest.approx(float(w.close))
            assert g.max_height == w.max_height
            assert int(g.weighted_average_price) == math.floor(
                float(w.quote_volume) / float(w.volume)
            )
        # late-data repair: pair A minute 0 open must be uid 9's price
        a0 = got[("2024-01-01 00:00:00", "A", "USD", "M0")]
        assert a0.open == pytest.approx(90.0)
        assert a0.close == pytest.approx(130.0)
    finally:
        shutil.rmtree(d, ignore_errors=True)
