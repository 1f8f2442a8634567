"""spark.sql surface: register every store table plus the reference's view
layer as temp views, so the engine answers the same SQL the reference's
schema serves (the reference's query surface IS its schema + 3 views,
up.sql:420-485).

Usage::

    register_views(store)
    spark.sql("SELECT * FROM assets WHERE asset_id = '...'")
    spark.sql("SELECT * FROM candles WHERE interval = '1h' AND ...")
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..streaming.pipeline import CANDLE_TABLES, CHILD_NAMES, TX_NAMES, read_all_candles
from ..streaming.store import TableStore
from .views import assets_view, decimals_view, pairs_view, tickers_view

#: common columns every txs_N shares (the Postgres INHERITS parent read)
_TXS_COMMON = (
    "uid, tx_type, sender, sender_public_key, time_stamp, height, id, "
    "signature, proofs, tx_version, fee, status, block_uid"
)


def liveness_age_seconds(store: TableStore) -> float | None:
    """S10 (bin/consumer.rs:9-11): age of the newest key block, the
    freshness probe behind the reference's 300 s liveness alert."""
    blocks = store.read_or_none("blocks_microblocks")
    if blocks is None:
        return None
    from pyspark.sql import functions as F

    r = (
        blocks.filter(F.col("time_stamp").isNotNull())
        .agg(F.max("time_stamp").alias("m"))
        .collect()[0]
    )
    if r["m"] is None:
        return None
    import datetime as _dt

    return (_dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) - r["m"]).total_seconds()


def register_views(store: TableStore) -> None:
    """Create temp views for every store table, the txs parent union, the
    unified candles table, and the reference's dimension views."""
    spark: SparkSession = store.spark
    table_names = (
        ["blocks_microblocks", "waves_data", "asset_origins",
         "asset_updates", "asset_tickers", "asset_updates_log",
         "asset_tickers_log"]
        + TX_NAMES + CHILD_NAMES
    )
    for name in table_names:
        df = store.read_or_none(name)
        if df is not None:
            df.createOrReplaceTempView(name)

    # txs parent = UNION ALL over the typed tables' common prefix (the
    # Postgres INHERITS read, up.sql:45-62)
    present = [n for n in TX_NAMES if store.read_or_none(n) is not None]
    if present:
        union = " UNION ALL ".join(
            f"SELECT {_TXS_COMMON} FROM {n}" for n in present
        )
        spark.sql(f"CREATE OR REPLACE TEMP VIEW txs AS {union}")

    c1m = None
    try:
        candles = read_all_candles(store)
        candles.createOrReplaceTempView("candles")
        # per-interval views kept for the reference's partial-index access
        # pattern (up.sql:368-385): candles_1m, candles_1h, ... are filters
        # over the unified table (interval|month partition pruning applies)
        for name in CANDLE_TABLES:
            ivl = name[len("candles_"):]
            candles.filter(F.col("interval") == ivl).createOrReplaceTempView(name)
        c1m = candles.filter(F.col("interval") == "1m")
    except KeyError:
        pass
    if c1m is not None:
        pairs_view(c1m).createOrReplaceTempView("pairs")

    au = store.read_or_none("asset_updates")
    if au is not None:
        decimals_view(au, spark).createOrReplaceTempView("decimals")
        tickers = store.read_or_none("asset_tickers")
        if tickers is not None:
            tickers_view(tickers).createOrReplaceTempView("tickers")
            origins = store.read_or_none("asset_origins")
            wd = store.read_or_none("waves_data")
            if origins is not None and wd is not None:
                assets_view(au, tickers, origins, wd).createOrReplaceTempView(
                    "assets"
                )
