"""Canonical order / arg-list JSON serialization (models.rs:101-189, 29-71):
byte-for-byte against the reference's serde output, including the
reference's OWN unit test vector (models.rs:219-249)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark import ingest
from blockchain_postgres_sync_spark.functions.orders import (
    ARG_ITEM, ORDER_RAW, arg_list_json, canonical_order_json,
)

from . import waves_fixtures as wf


def test_arg_list_reference_vector(spark):
    """models.rs:219-249 serialize_arg_list, reproduced byte-for-byte:
    [IntegerValue(5), BinaryValue(b"\\x00\\x01")] ->
    [{"type":"integer","value":5},{"type":"binary","value":"base64:AAE="}]"""
    items = [
        ("integer", 5, None, None, None),
        ("binary", None, None, base64.b64encode(b"\x00\x01").decode(), None),
    ]
    df = spark.createDataFrame(
        [(items,)], f"items array<struct<{','.join(f'{f.name}:{f.dataType.simpleString()}' for f in ARG_ITEM.fields)}>>"
    )
    out = df.select(arg_list_json(F.col("items")).alias("j")).collect()[0]["j"]
    assert out == '[{"type":"integer","value":5},{"type":"binary","value":"base64:AAE="}]'


def test_arg_list_string_and_bool_escaping(spark):
    items = [
        ("boolean", None, True, None, None),
        ("string", None, None, None, 'he said "hi"\x00'),
    ]
    df = spark.createDataFrame([(items,)], spark.createDataFrame([( [],)], "items array<string>").schema if False else None) if False else spark.createDataFrame(
        [(items,)],
        f"items array<struct<{','.join(f'{f.name}:{f.dataType.simpleString()}' for f in ARG_ITEM.fields)}>>",
    )
    out = df.select(arg_list_json(F.col("items")).alias("j")).collect()[0]["j"]
    expected = (
        '[{"type":"boolean","value":true},'
        + '{"type":"string","value":' + json.dumps('he said "hi"\\0') + "}]"
    )
    assert out == expected


def _order(version, **kw):
    base = dict(
        id="OrdId1", version=version, sender="3PSndr",
        sender_public_key="PK1", matcher_public_key="MPK",
        amount_asset_id="A1", price_asset_id="",   # empty = WAVES -> null
        order_side=0, amount=100, price=250, timestamp=1600000000000,
        expiration=1600000100000, matcher_fee=300,
        matcher_fee_asset_id="", proofs=["p1", "p2"],
        eip712_signature=None, price_mode=0,
    )
    base.update(kw)
    return tuple(base[f.name] for f in ORDER_RAW.fields)


def _expected(version, **kw):
    o = dict(
        id="OrdId1", version=version, sender="3PSndr",
        senderPublicKey="PK1", matcherPublicKey="MPK",
        assetPair={"amountAsset": "A1", "priceAsset": None},
        orderType="buy", amount=100, price=250, timestamp=1600000000000,
        expiration=1600000100000, matcherFee=300,
        proofs=["p1", "p2"], signature="p1",
    )
    o.update(kw)
    return json.dumps(o, separators=(",", ":"))


@pytest.mark.parametrize("version", [1, 2])
def test_order_json_v12(spark, version):
    df = spark.createDataFrame([( _order(version),)], ORDER_RAW.simpleString() if False else None) if False else spark.createDataFrame([(_order(version),)], f"o {ORDER_RAW.simpleString()}")
    out = df.select(canonical_order_json(F.col("o")).alias("j")).collect()[0]["j"]
    assert out == _expected(version)


def test_order_json_v3_fee_asset(spark):
    df = spark.createDataFrame(
        [(_order(3, matcher_fee_asset_id="FEE1", order_side=1),)],
        f"o {ORDER_RAW.simpleString()}",
    )
    out = df.select(canonical_order_json(F.col("o")).alias("j")).collect()[0]["j"]
    assert out == _expected(3, orderType="sell", matcherFeeAssetId="FEE1")


def test_order_json_v4_eip712_price_mode(spark):
    sig = bytes.fromhex("deadbeef01")
    df = spark.createDataFrame(
        [(_order(4, eip712_signature=base64.b64encode(sig).decode(),
                 price_mode=2, proofs=[]),)],
        f"o {ORDER_RAW.simpleString()}",
    )
    out = df.select(canonical_order_json(F.col("o")).alias("j")).collect()[0]["j"]
    assert out == _expected(
        4, proofs=[], signature="",
        matcherFeeAssetId=None,
        eip712Signature="0xdeadbeef01", priceMode="assetDecimals",
    )


def test_order_json_used_by_txs7_ingest(spark):
    """extract_raw_txs serializes order1_raw canonically; pre-serialized
    order strings still pass through when no struct is present."""
    ts = wf.T0
    tx = wf._tx(1, 7, ts, amount=100, price=250, amount_asset_id="A1",
                price_asset_id="", buy_matcher_fee=1, sell_matcher_fee=2)
    tx["order1_raw"] = dict(zip(
        [f.name for f in ORDER_RAW.fields], _order(3, matcher_fee_asset_id="FEE1")
    ))
    tx["order2"] = "{\"pre\":\"serialized\"}"
    rows = [wf.block(1, 60, 0, [tx])]
    updates = spark.createDataFrame(rows, schema=ingest.RAW_UPDATE)
    raw = ingest.extract_raw_txs(updates).collect()[0]
    assert raw["order1"] == _expected(3, matcherFeeAssetId="FEE1")
    assert raw["order2"] == "{\"pre\":\"serialized\"}"
