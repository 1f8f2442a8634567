"""Ingest-path tests: classification, deterministic uids, conditional field
rules, children explode, lease resolution, ticker parsing (SURVEY.md §3.1)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark import ingest
from blockchain_postgres_sync_spark.constants import UID_HEIGHT_MULTIPLIER

from . import waves_fixtures as wf


@pytest.fixture(scope="module")
def updates(spark):
    return spark.createDataFrame(wf.scenario_log(), schema=ingest.RAW_UPDATE)


@pytest.fixture(scope="module")
def raw_txs(updates):
    return ingest.extract_raw_txs(updates).persist()


def test_blocks_extraction(updates):
    blocks = ingest.extract_blocks(updates).collect()
    assert len(blocks) == 6  # 4 blocks + 2 microblocks; rollback row excluded
    by_uid = {r["uid"]: r for r in blocks}
    assert by_uid[3]["time_stamp"] is None  # microblock marker (pg.rs:133-141)
    assert by_uid[1]["height"] == 100


def test_classification_covers_all_18(spark, raw_txs):
    typed = ingest.classify_txs(raw_txs)
    counts = {n: typed[n].count() for n in typed}
    assert all(counts[n] >= 1 for n in range(1, 19)), counts
    # txs_7 extras: fixture has 18-type block plus dedicated exchange txs
    assert counts[7] >= 8


def test_deterministic_uid_per_height(raw_txs):
    h100 = raw_txs.filter(F.col("height") == 100).orderBy("uid").collect()
    uids = [r["uid"] for r in h100]
    base = 100 * UID_HEIGHT_MULTIPLIER
    assert uids == list(range(base, base + len(uids)))


def test_signature_fee_status_rules(raw_txs):
    rows = {r["id"]: r for r in raw_txs.collect()}
    # signature = first proof when absent (convert.rs:108-112)
    assert rows["tx-1-1"]["signature"] == "proof-1a"
    # invoke with error -> script_execution_failed (convert.rs:115-128)
    assert rows["tx-16-16"]["status"] == "script_execution_failed"
    assert rows["tx-7-7"]["status"] == "succeeded"
    # fee_asset defaults to WAVES (waves.rs:79-85)
    assert rows["tx-4-4"]["fee_asset_id"] == "WAVES"


def test_children_explode(raw_txs):
    ch = ingest.extract_children(raw_txs)
    transfers = ch["txs_11_transfers"].orderBy("position_in_tx").collect()
    assert [t["amount"] for t in transfers] == [1, 2]
    assert transfers[0]["position_in_tx"] == 0
    data = ch["txs_12_data"].orderBy("position_in_tx").collect()
    assert data[0]["data_value_integer"] == 42 and data[1]["data_value_string"] == "v"
    args16 = ch["txs_16_args"].collect()
    assert len(args16) == 1 and args16[0]["arg_value_integer"] == 5
    pay18 = ch["txs_18_payment"].collect()
    assert len(pay18) == 1 and pay18[0]["asset_id"] == "A1"
    # payment with NULL asset -> WAVES sentinel
    pay16 = ch["txs_16_payment"].collect()
    assert pay16[0]["asset_id"] == "WAVES"


def test_lease_cancel_resolution(raw_txs):
    typed = ingest.classify_txs(raw_txs)
    nine = typed[9].collect()
    assert len(nine) == 2  # same-batch cancel + the later cross-batch cancel
    lease_uid = {r["id"]: r["uid"] for r in raw_txs.collect()}["tx-8-8"]
    assert {r["lease_tx_uid"] for r in nine} == {lease_uid}  # J1 (pg.rs:472-505)


def test_txs_union_view(raw_txs):
    typed = ingest.classify_txs(raw_txs)
    union = ingest.txs_union_view(typed)
    assert union.count() == raw_txs.count()
    assert set(union.columns) == {
        "uid", "tx_type", "sender", "sender_public_key", "time_stamp",
        "height", "id", "signature", "proofs", "tx_version", "fee",
        "status", "block_uid",
    }


def test_asset_updates_extraction(updates):
    au = ingest.extract_asset_updates(updates).collect()
    # 3 (block 1) + 1 (block 2) + 1 (block 7) = 5
    assert len(au) == 5
    uids = [r["uid"] for r in au]
    assert len(set(uids)) == 5  # unique, deterministic
    a1 = [r for r in au if r["asset_id"] == "A1"][0]
    assert a1["decimals"] == 2 and a1["name"] == "name-A1"


def test_ticker_parse(updates):
    tick = ingest.extract_ticker_updates(updates, wf.ASSET_STORAGE).orderBy("uid").collect()
    assert [(t["asset_id"], t["ticker"]) for t in tick] == [
        ("A1", "ONE"), ("B2", "TWO"), ("A1", "ONE2"), ("A1", ""),
    ]  # P8 incl. deleted-key => '' (mod.rs:566-574)


def test_waves_data_dedupe(updates):
    wd = ingest.extract_waves_data(updates).orderBy("height").collect()
    assert [int(r["quantity"]) for r in wd] == [
        10_000_000, 10_000_100, 10_000_200, 10_000_300,
    ]


def test_asset_origins_first_wins(updates, raw_txs):
    au = ingest.extract_asset_updates(updates)
    typed = ingest.classify_txs(raw_txs)
    org = ingest.extract_asset_origins(au, typed[3]).collect()
    assert len(org) == 1  # only A1 has an issue tx in the fixture
    assert org[0]["asset_id"] == "A1" and org[0]["origin_transaction_id"] == "tx-3-3"


def test_codecs_wired_into_ingest(spark):
    """P5/P6 wiring (convert.rs:130/242, 336, 561-566, 743; waves.rs:35-51):
    sender derived from the pk when absent, attachment stored base58,
    script base64:-prefixed, NULs escaped in names and data entries."""
    from blockchain_postgres_sync_spark.functions import codecs

    pk_raw = b"\x07" * 32
    pk_b58 = codecs.b58encode_bytes(pk_raw)
    expected_addr = codecs.address_from_public_key(pk_raw, 87)
    ts = wf.T0
    rows = [wf.block(1, 50, 0, [
        wf._tx(1, 4, ts, sender=None, sender_public_key=pk_b58,
               asset_id="A1", amount=5, recipient_address="3PR",
               attachment="YXR0"),           # b64(b"att")
        wf._tx(2, 3, ts, asset_id="A9", asset_name="bad\x00name",
               description="d\x00d", quantity=1, decimals=0,
               reissuable=True, script="AAE="),
        wf._tx(3, 1, ts, sender=None, sender_public_key=None,
               recipient_address="3PG", amount=1),  # genesis: stays NULL
        wf._tx(4, 12, ts, data_entries=[
            {"data_key": "k\x00k", "data_type": "binary",
             "data_value_integer": None, "data_value_boolean": None,
             "data_value_binary": "AQI=", "data_value_string": None},
            {"data_key": "ks", "data_type": "string",
             "data_value_integer": None, "data_value_boolean": None,
             "data_value_binary": None, "data_value_string": "s\x00s"},
        ]),
    ])]
    updates = spark.createDataFrame(rows, schema=ingest.RAW_UPDATE)
    raw = ingest.extract_raw_txs(updates, chain_id=87)
    by_id = {r["id"]: r for r in raw.collect()}
    assert by_id["tx-4-1"]["sender"] == expected_addr
    assert by_id["tx-4-1"]["attachment"] == codecs.b58encode_bytes(b"att")
    assert by_id["tx-3-2"]["asset_name"] == "bad\\0name"
    assert by_id["tx-3-2"]["description"] == "d\\0d"
    assert by_id["tx-3-2"]["script"] == "base64:AAE="
    assert by_id["tx-1-3"]["sender"] is None
    # non-empty sender passes through untouched (convert.rs:130)
    assert by_id["tx-12-4"]["sender"].startswith("3PSender")

    children = ingest.extract_children(raw)
    data = {r["data_key"]: r for r in children["txs_12_data"].collect()}
    assert "k\\0k" in data
    assert data["k\\0k"]["data_value_binary"] == "base64:AQI="
    assert data["ks"]["data_value_string"] == "s\\0s"


def test_ethereum_transfer_vs_invoke(spark):
    """txs_18 (mod.rs:518-568, convert.rs:134-210): version pinned to 1;
    a transfer action stores NULL function_name and no args/payments even
    if the envelope carries stale ones; invoke keeps them; raw bytes kept."""
    ts = wf.T0
    transfer = wf._tx(1, 18, ts, bytes=b"\xf8\x6b", eth_action="transfer",
                      function_name="stale", tx_version=2,
                      args=[{"arg_type": "integer", "arg_value_integer": 1,
                             "arg_value_boolean": None, "arg_value_binary": None,
                             "arg_value_string": None, "arg_value_list": None,
                             "arg_list": None}],
                      payments=[{"amount": 5, "asset_id": None}])
    invoke = wf._tx(2, 18, ts, bytes=b"\xf8\x6c", eth_action="invoke",
                    function_name="call", tx_version=3,
                    args=[], payments=[{"amount": 9, "asset_id": "A1"}])
    inferred = wf._tx(3, 18, ts, bytes=b"\xf8\x6d", function_name=None,
                      args=[], payments=[{"amount": 7, "asset_id": None}])
    updates = spark.createDataFrame(
        [wf.block(1, 70, 0, [transfer, invoke, inferred])], schema=ingest.RAW_UPDATE
    )
    raw = ingest.extract_raw_txs(updates)
    by_id = {r["id"]: r for r in raw.collect()}
    t, i, n = by_id["tx-18-1"], by_id["tx-18-2"], by_id["tx-18-3"]
    assert t["function_name"] is None and t["args"] == [] and t["payments"] == []
    assert bytes(t["bytes"]) == b"\xf8\x6b"
    assert t["tx_version"] == 1 and i["tx_version"] == 1
    assert i["function_name"] == "call" and len(i["payments"]) == 1
    assert n["function_name"] is None and n["payments"] == []  # inferred transfer
    children = ingest.extract_children(raw)
    pays = children["txs_18_payment"].collect()
    assert {(p["tx_uid"], p["amount"]) for p in pays} == {(i["uid"], 9)}
