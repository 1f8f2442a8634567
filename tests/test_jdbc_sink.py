"""Unit tests for the JDBC sink's SQL generation (no Postgres server in the
container; the statement text is the portable contract)."""

from __future__ import annotations

from blockchain_postgres_sync_spark.sources.jdbc_sink import (
    delete_above_sql,
    insert_if_absent_sql,
    staging_name,
    upsert_sql,
)


def test_upsert_sql_matches_reference_shape():
    # mirror of the candles upsert (pg.rs:721-730): conflict on the candle
    # pk, every non-key column updated from EXCLUDED
    sql = upsert_sql(
        "candles",
        "_stg_candles_7",
        ["interval", "time_start", "amount_asset_id", "low", "high"],
        ["interval", "time_start", "amount_asset_id"],
    )
    assert sql == (
        "INSERT INTO candles (interval, time_start, amount_asset_id, low, high) "
        "SELECT interval, time_start, amount_asset_id, low, high FROM _stg_candles_7 "
        "ON CONFLICT (interval, time_start, amount_asset_id) "
        "DO UPDATE SET low = EXCLUDED.low, high = EXCLUDED.high"
    )


def test_insert_if_absent_sql():
    sql = insert_if_absent_sql(
        "asset_origins", "_stg_asset_origins_0",
        ["asset_id", "first_asset_update_uid"], ["asset_id"],
    )
    assert sql.endswith("ON CONFLICT (asset_id) DO NOTHING")
    assert "INSERT INTO asset_origins" in sql


def test_delete_above_sql():
    assert delete_above_sql("txs_7", "block_uid", 123) == (
        "DELETE FROM txs_7 WHERE block_uid > 123"
    )


def test_staging_name_unique_per_batch():
    assert staging_name("candles", 7) != staging_name("candles", 8)
