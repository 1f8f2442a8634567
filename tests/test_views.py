"""View tests: decimals / tickers / assets (up.sql:420-485) replayed in
DuckDB over the same SCD frames the pipeline produces."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark import ingest
from blockchain_postgres_sync_spark.constants import MAX_UID
from blockchain_postgres_sync_spark.operators.scd import chain_superseded_by
from blockchain_postgres_sync_spark.plans import views

from . import waves_fixtures as wf


@pytest.fixture(scope="module")
def frames(spark):
    updates = spark.createDataFrame(wf.scenario_log(), schema=ingest.RAW_UPDATE)
    au = chain_superseded_by(ingest.extract_asset_updates(updates))
    tick = chain_superseded_by(ingest.extract_ticker_updates(updates, wf.ASSET_STORAGE))
    raw = ingest.extract_raw_txs(updates)
    origins = ingest.extract_asset_origins(
        ingest.extract_asset_updates(updates), ingest.classify_txs(raw)[3]
    )
    wd = ingest.extract_waves_data(updates)
    return au, tick, origins, wd


def _duck(con, df, name):
    con.register(name, df.toPandas())


def test_decimals_view_matches_reference_sql(spark, frames):
    au, *_ = frames
    got = sorted(map(tuple, views.decimals_view(au, spark).collect()))
    con = duckdb.connect()
    _duck(con, au, "asset_updates")
    # up.sql:420-430 verbatim semantics (current = superseded_by = MAX_UID)
    expected = sorted(map(tuple, con.execute(f"""
        SELECT asset_id, CAST(decimals AS INT) AS decimals
        FROM asset_updates WHERE superseded_by = {MAX_UID}
        UNION ALL SELECT 'WAVES', 8
    """).fetchall()))
    assert got == expected


def test_tickers_view_matches_reference_sql(frames):
    _, tick, *_ = frames
    got = sorted(map(tuple, views.tickers_view(tick).collect()))
    con = duckdb.connect()
    _duck(con, tick, "asset_tickers")
    # up.sql:432-435: DISTINCT ON (asset_id) ORDER BY asset_id, uid DESC
    expected = sorted(map(tuple, con.execute("""
        SELECT asset_id, ticker FROM (
            SELECT asset_id, ticker,
                   ROW_NUMBER() OVER (PARTITION BY asset_id ORDER BY uid DESC) rn
            FROM asset_tickers) WHERE rn = 1
    """).fetchall()))
    assert got == expected


def test_assets_view_semantics(spark, frames):
    au, tick, origins, wd = frames
    out = {r["asset_id"]: r for r in views.assets_view(au, tick, origins, wd).collect()}
    # one row per distinct asset + WAVES
    assert set(out) == {"A1", "B2", "C3", "WAVES"}
    # current-state values win (B2's v2 update)
    assert out["B2"]["asset_name"] == "name-B2-v2" and out["B2"]["decimals"] == 1
    # ticker joined; A1's latest ticker is '' (deleted)
    assert out["A1"]["ticker"] == ""
    # origins joined only where an issue tx exists
    assert out["A1"]["issuer"] == "3PSender0"
    assert out["B2"]["issuer"] is None
    # WAVES synthetic row carries the latest supply (A9: max height)
    assert int(out["WAVES"]["total_quantity"]) == 10_000_300
    assert out["WAVES"]["decimals"] == 8
    # up.sql:471-485 constants: sender '', issue_height 0, genesis timestamp
    assert out["WAVES"]["issuer"] == ""
    assert out["WAVES"]["issue_height"] == 0
    assert str(out["WAVES"]["issue_time_stamp"]) == "2016-04-11 21:00:00"
    assert out["WAVES"]["min_sponsored_asset_fee"] is None


def test_table_diff_statuses(spark):
    """added / removed / changed classified per key; unchanged keys absent;
    NULL payloads compare via the sentinel (NULL != value, NULL == NULL)."""
    from blockchain_postgres_sync_spark.operators.scd import table_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    after = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, None, 30), (5, "e", 50)],
        "k long, s string, v long",
    )
    out = {r.k: r.status for r in table_diff(before, after, key="k").collect()}
    assert out == {2: "changed", 4: "removed", 5: "added"}
    # compare_cols restricts the payload: v-only diff sees key 2 unchanged
    out_v = {
        r.k: r.status
        for r in table_diff(before, after, key="k", compare_cols=["v"]).collect()
    }
    assert out_v == {4: "removed", 5: "added"}


def test_table_diff_null_vs_sentinel_string(spark):
    """NULL is hashed via an out-of-band flag, so a literal string that any
    in-band sentinel scheme would use (e.g. "\\x00null") is a CHANGE vs
    NULL, and equal literal sentinels are unchanged."""
    from blockchain_postgres_sync_spark.operators.scd import table_diff

    sentinel = "\x00null"
    before = spark.createDataFrame(
        [(1, None), (2, sentinel), (3, sentinel)], "k long, s string"
    )
    after = spark.createDataFrame(
        [(1, sentinel), (2, None), (3, sentinel)], "k long, s string"
    )
    out = {r.k: r.status for r in table_diff(before, after, key="k").collect()}
    # keys 1 and 2 flip NULL <-> literal sentinel: both must classify as
    # changed; key 3 (sentinel == sentinel) is unchanged and absent
    assert out == {1: "changed", 2: "changed"}
