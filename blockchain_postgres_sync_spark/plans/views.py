"""The reference's query surface: the `decimals`, `tickers`, and `assets`
SQL views (migrations/2022-04-27-111623_initial/up.sql:420-485), built as
DataFrame functions over the canonical tables.

All three are dimension-sized (one row per asset) — every join here is a
broadcast join; nothing shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import MAX_UID, WAVES_ASSET_ID, WAVES_DECIMALS
from ..operators.candles import floor_div_exact
from ..operators.scd import current_snapshot


def decimals_view(asset_updates: DataFrame, spark: SparkSession) -> DataFrame:
    """up.sql:420-430: current asset decimals ∪ the WAVES constant row (J3).

    `current` means superseded_by = MAX_UID; equivalently (and cheaper, one
    partial-aggregatable window instead of needing the chained column) the
    max-uid row per asset.
    """
    current = current_snapshot(asset_updates, key="asset_id", uid="uid").select(
        "asset_id", F.col("decimals").cast("int").alias("decimals")
    )
    waves = spark.range(1).select(
        F.lit(WAVES_ASSET_ID).alias("asset_id"),
        F.lit(WAVES_DECIMALS).cast("int").alias("decimals"),
    )
    return current.unionByName(waves)


def tickers_view(asset_tickers: DataFrame) -> DataFrame:
    """up.sql:432-435: DISTINCT ON (asset_id) ... ORDER BY uid DESC (A8)."""
    return current_snapshot(asset_tickers, key="asset_id", uid="uid").select(
        "asset_id", "ticker"
    )


def assets_view(
    asset_updates: DataFrame,
    asset_tickers: DataFrame,
    asset_origins: DataFrame,
    waves_data: DataFrame,
) -> DataFrame:
    """up.sql:437-485: current asset state LEFT JOIN tickers LEFT JOIN
    origins (J2), UNION ALL a synthetic WAVES row whose quantity is the
    latest waves_data supply (J4 + A9).
    """
    current = asset_updates.filter(F.col("superseded_by") == MAX_UID) \
        if "superseded_by" in asset_updates.columns \
        else current_snapshot(asset_updates, key="asset_id", uid="uid")

    tick = tickers_view(asset_tickers)
    base = (
        current.join(F.broadcast(tick), "asset_id", "left")
        .join(F.broadcast(asset_origins), "asset_id", "left")
        .select(
            "asset_id",
            F.col("ticker"),
            F.col("name").alias("asset_name"),
            F.col("description"),
            F.col("issuer"),
            F.col("issue_height"),
            F.col("issue_time_stamp"),
            F.col("volume").cast("decimal(38,8)").alias("total_quantity"),
            F.col("decimals").cast("int").alias("decimals"),
            F.col("reissuable"),
            F.col("script").isNotNull().alias("has_script"),
            F.col("sponsorship").alias("min_sponsored_asset_fee"),
            F.col("nft"),
        )
    )
    # latest supply: ORDER BY height DESC NULLS LAST LIMIT 1 (up.sql:478-481)
    supply = waves_data.filter(F.col("height").isNotNull()).agg(
        F.max_by("quantity", "height").alias("_q")
    )
    # synthetic WAVES row constants exactly as up.sql:471-485: sender '',
    # issue_height 0, genesis timestamp 2016-04-11 21:00:00+00 (engine tz is
    # pinned UTC, so the tz-naive literal is that instant)
    waves = supply.select(
        F.lit(WAVES_ASSET_ID).alias("asset_id"),
        F.lit("WAVES").alias("ticker"),
        F.lit("Waves").alias("asset_name"),
        F.lit("").alias("description"),
        F.lit("").alias("issuer"),
        F.lit(0).cast("int").alias("issue_height"),
        F.lit("2016-04-11 21:00:00").cast("timestamp").alias("issue_time_stamp"),
        F.col("_q").cast("decimal(38,8)").alias("total_quantity"),
        F.lit(WAVES_DECIMALS).cast("int").alias("decimals"),
        F.lit(False).alias("reissuable"),
        F.lit(False).alias("has_script"),
        F.lit(None).cast("long").alias("min_sponsored_asset_fee"),
        F.lit(False).alias("nft"),
    )
    return base.unionByName(waves)


def pairs_view(minute_candles_df: DataFrame) -> DataFrame:
    """The reference's `pairs` market-summary table (up.sql:387-402) derived
    as one rollup over minute candles.  The consumer never writes `pairs` —
    the companion API populates it from candles; this view IS that
    computation: per (amount_asset_id, price_asset_id, matcher_address),
    first/last price keyed on candle time_start, extremes/volumes summed,
    wap floored over the summed quote volume (same convention as the
    cascade rollup, pg.rs:740-815).
    """
    return (
        minute_candles_df.groupBy(
            "amount_asset_id", "price_asset_id", "matcher_address"
        ).agg(
            F.min_by("open", "time_start").alias("first_price"),
            F.max_by("close", "time_start").alias("last_price"),
            F.sum("volume").alias("volume"),
            F.sum("quote_volume").alias("quote_volume"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            floor_div_exact(F.sum("quote_volume"), F.sum("volume")).alias(
                "weighted_average_price"
            ),
            F.sum("txs_count").cast("long").alias("txs_count"),
        )
    )
