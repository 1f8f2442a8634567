"""Custom stateful streaming operator: incremental minute candles via
``applyInPandasWithState``.

The reference updates candles incrementally inside each batch transaction
(pg.rs:660-738 — scan trades since the first affected minute, re-aggregate,
upsert).  The foreachBatch pipeline (streaming/pipeline.py) reproduces that
literally; THIS module is the Spark-native alternative: per-key candle
state lives in the streaming state store, each micro-batch folds its trades
into the state, and the operator emits the updated candle rows (output
mode ``update`` ≡ the reference's upsert).

Semantics matched to operators/candles.minute_candles:
- key = (time_start minute, amount_asset_id, price_asset_id, matcher);
- open/close keyed on trade uid (min/max uid seen), never arrival order —
  reorder-safe across batches, same guarantee as the batch aggregate;
- wap = floor(quote_volume / volume) at emit time over the full
  accumulated sums, so late trades repair the candle exactly.

State is float64 (streaming state store roundtrip); the exact-decimal path
is the batch/foreachBatch recompute — the two agree to float precision
(asserted in tests).  At scale: state is partitioned by the group key
(bounded: pairs x minutes with a watermark for eviction); each micro-batch
shuffles only its own trades.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from ..operators.candles import trunc_ts

STATE_SCHEMA = StructType([
    StructField("low", DoubleType()),
    StructField("high", DoubleType()),
    StructField("volume", DoubleType()),
    StructField("quote_volume", DoubleType()),
    StructField("max_height", IntegerType()),
    StructField("txs_count", LongType()),
    StructField("open_uid", LongType()),
    StructField("open", DoubleType()),
    StructField("close_uid", LongType()),
    StructField("close", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("time_start", TimestampType()),
    StructField("amount_asset_id", StringType()),
    StructField("price_asset_id", StringType()),
    StructField("matcher_address", StringType()),
    StructField("low", DoubleType()),
    StructField("high", DoubleType()),
    StructField("volume", DoubleType()),
    StructField("quote_volume", DoubleType()),
    StructField("max_height", IntegerType()),
    StructField("txs_count", LongType()),
    StructField("weighted_average_price", DoubleType()),
    StructField("open", DoubleType()),
    StructField("close", DoubleType()),
])


def _update_candle(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (low, high, vol, qvol, maxh, cnt, ouid, opn, cuid, cls) = state.get
    else:
        low = high = vol = qvol = opn = cls = None
        maxh = 0
        cnt = 0
        ouid = cuid = None

    for pdf in pdfs:
        if pdf.empty:
            continue
        p = pdf["price"].astype(float)
        a = pdf["amount"].astype(float)
        u = pdf["uid"].astype("int64")
        h = pdf["height"].astype("int64")
        b_low, b_high = float(p.min()), float(p.max())
        low = b_low if low is None else min(low, b_low)
        high = b_high if high is None else max(high, b_high)
        vol = (vol or 0.0) + float(a.sum())
        qvol = (qvol or 0.0) + float((a * p).sum())
        maxh = max(maxh, int(h.max()))
        cnt += int(len(pdf))
        i_open, i_close = int(u.idxmin()), int(u.idxmax())
        if ouid is None or int(u.loc[i_open]) < ouid:
            ouid, opn = int(u.loc[i_open]), float(p.loc[i_open])
        if cuid is None or int(u.loc[i_close]) > cuid:
            cuid, cls = int(u.loc[i_close]), float(p.loc[i_close])

    state.update((low, high, vol, qvol, maxh, cnt, ouid, opn, cuid, cls))
    import math

    wap = math.floor(qvol / vol) if vol else None
    ts, aa, pa, ma = key
    yield pd.DataFrame([{
        "time_start": ts,
        "amount_asset_id": aa,
        "price_asset_id": pa,
        "matcher_address": ma,
        "low": low,
        "high": high,
        "volume": vol,
        "quote_volume": qvol,
        "max_height": maxh,
        "txs_count": cnt,
        "weighted_average_price": float(wap) if wap is not None else None,
        "open": opn,
        "close": cls,
    }])


def stateful_minute_candles(trades: DataFrame) -> DataFrame:
    """Streaming trades -> per-minute candle state (update output mode).

    ``trades`` (streaming): uid, time_stamp, amount_asset_id,
    price_asset_id, sender, height, amount, price.
    """
    keyed = trades.select(
        trunc_ts(F.col("time_stamp"), "1m").alias("time_start"),
        F.col("amount_asset_id"),
        F.col("price_asset_id"),
        F.col("sender").alias("matcher_address"),
        F.col("uid").cast("long").alias("uid"),
        F.col("height").cast("long").alias("height"),
        F.col("amount").cast("double").alias("amount"),
        F.col("price").cast("double").alias("price"),
    )
    return keyed.groupBy(
        "time_start", "amount_asset_id", "price_asset_id", "matcher_address"
    ).applyInPandasWithState(
        _update_candle,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
