"""Explicit StructTypes for every table in the reference's data model.

Nothing is inferred at runtime, mirroring the reference's fixed Diesel
migrations (migrations/2022-04-27-111623_initial/up.sql; Rust structs in
src/lib/consumer/models/txs/mod.rs:23-568).  Type mapping per SURVEY.md §1.2:
VARCHAR/TEXT→String, BIGINT→Long, INTEGER→Int, SMALLINT→Short,
NUMERIC→Decimal(38,10) for money, TIMESTAMP(TZ)→Timestamp (session tz=UTC),
TEXT[]→Array<String>, JSONB→String (canonical JSON), BYTEA→Binary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DecimalType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

S, L, I, SH, B = StringType(), LongType(), IntegerType(), ShortType(), BooleanType()
TS = TimestampType()
DEC = DecimalType(38, 10)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# blocks_microblocks (up.sql:12-17); time_stamp NULL <=> microblock
BLOCKS_MICROBLOCKS = StructType([
    _f("uid", L, False),
    _f("id", S, False),
    _f("height", I, False),
    _f("time_stamp", TS, True),
])

# Common prefix of txs / every txs_N (up.sql:45-62)
_TX_COMMON = [
    _f("uid", L, False),
    _f("tx_type", SH, False),
    _f("sender", S, True),
    _f("sender_public_key", S, True),
    _f("time_stamp", TS, False),
    _f("height", I, False),
    _f("id", S, False),
    _f("signature", S, True),
    _f("proofs", ArrayType(S), True),
    _f("tx_version", SH, True),
    _f("fee", L, False),
    _f("status", S, False),
    _f("block_uid", L, False),
]

TX_COMMON_COLUMNS = [f.name for f in _TX_COMMON]


def _tx(extra: list[StructField]) -> StructType:
    return StructType(_TX_COMMON + extra)


# The 18 typed fact tables (SURVEY.md §1.3; up.sql:64-357)
TXS_1 = _tx([_f("recipient_address", S, False), _f("recipient_alias", S), _f("amount", L, False)])
TXS_2 = _tx([_f("recipient_address", S, False), _f("recipient_alias", S), _f("amount", L, False)])
TXS_3 = _tx([
    _f("asset_id", S, False), _f("asset_name", S, False), _f("description", S, False),
    _f("quantity", L, False), _f("decimals", SH, False), _f("reissuable", B, False),
    _f("script", S),
])
TXS_4 = _tx([
    _f("asset_id", S, False), _f("amount", L, False), _f("recipient_address", S, False),
    _f("recipient_alias", S), _f("fee_asset_id", S, False), _f("attachment", S),
])
TXS_5 = _tx([_f("asset_id", S, False), _f("quantity", L, False), _f("reissuable", B, False)])
TXS_6 = _tx([_f("asset_id", S, False), _f("amount", L, False)])
TXS_7 = _tx([
    _f("order1", S, False),  # JSONB as canonical JSON string
    _f("order2", S, False),
    _f("amount", L, False),
    _f("price", L, False),
    _f("amount_asset_id", S, False),
    _f("price_asset_id", S, False),
    _f("buy_matcher_fee", L),
    _f("sell_matcher_fee", L),
    _f("fee_asset_id", S, False),
])
TXS_8 = _tx([_f("recipient_address", S, False), _f("recipient_alias", S), _f("amount", L, False)])
TXS_9 = _tx([_f("lease_tx_uid", L, True)])
TXS_10 = _tx([_f("alias", S, False)])
TXS_11 = _tx([_f("asset_id", S, False), _f("attachment", S, False)])
TXS_11_TRANSFERS = StructType([
    _f("tx_uid", L, False), _f("recipient_address", S, False), _f("recipient_alias", S),
    _f("amount", L, False), _f("position_in_tx", SH, False), _f("height", I, False),
])
TXS_12 = _tx([])
TXS_12_DATA = StructType([
    _f("tx_uid", L, False), _f("data_key", S, False), _f("data_type", S),
    _f("data_value_integer", L), _f("data_value_boolean", B), _f("data_value_binary", S),
    _f("data_value_string", S), _f("position_in_tx", SH, False), _f("height", I, False),
])
TXS_13 = _tx([_f("script", S)])
TXS_14 = _tx([_f("asset_id", S, False), _f("min_sponsored_asset_fee", L)])
TXS_15 = _tx([_f("asset_id", S, False), _f("script", S)])
TXS_16 = _tx([
    _f("dapp_address", S, False), _f("dapp_alias", S),
    _f("function_name", S), _f("fee_asset_id", S, False),
])
TXS_16_ARGS = StructType([
    _f("tx_uid", L, False), _f("arg_type", S, False), _f("arg_value_integer", L),
    _f("arg_value_boolean", B), _f("arg_value_binary", S), _f("arg_value_string", S),
    _f("arg_value_list", S),  # JSONB list as canonical JSON
    _f("position_in_args", SH, False), _f("height", I, False),
])
TXS_16_PAYMENT = StructType([
    _f("tx_uid", L, False), _f("amount", L, False), _f("asset_id", S),
    _f("position_in_payment", SH, False), _f("height", I, False),
])
TXS_17 = _tx([_f("asset_id", S, False), _f("asset_name", S, False), _f("description", S, False)])
TXS_18 = _tx([_f("bytes", BinaryType()), _f("function_name", S)])
TXS_18_ARGS = TXS_16_ARGS
TXS_18_PAYMENT = TXS_16_PAYMENT

TX_SCHEMAS: dict[int, StructType] = {
    1: TXS_1, 2: TXS_2, 3: TXS_3, 4: TXS_4, 5: TXS_5, 6: TXS_6, 7: TXS_7,
    8: TXS_8, 9: TXS_9, 10: TXS_10, 11: TXS_11, 12: TXS_12, 13: TXS_13,
    14: TXS_14, 15: TXS_15, 16: TXS_16, 17: TXS_17, 18: TXS_18,
}

# asset_updates SCD-2 (up.sql:19-34)
ASSET_UPDATES = StructType([
    _f("block_uid", L, False),
    _f("uid", L, False),
    _f("superseded_by", L, False),
    _f("asset_id", S, False),
    _f("decimals", SH, False),
    _f("name", S, False),
    _f("description", S, False),
    _f("reissuable", B, False),
    _f("volume", L, False),
    _f("script", S),
    _f("sponsorship", L),
    _f("nft", B, False),
])

# asset_origins (up.sql:36-43)
ASSET_ORIGINS = StructType([
    _f("asset_id", S, False),
    _f("first_asset_update_uid", L, False),
    _f("origin_transaction_id", S, False),
    _f("issuer", S, False),
    _f("issue_height", I, False),
    _f("issue_time_stamp", TS, False),
])

# asset_tickers SCD-2 (up.sql:410-418)
ASSET_TICKERS = StructType([
    _f("uid", L, False),
    _f("superseded_by", L, False),
    _f("block_uid", L, False),
    _f("asset_id", S, False),
    _f("ticker", S, False),
])

# waves_data (up.sql:404-408)
WAVES_DATA = StructType([
    _f("height", I, True),
    _f("quantity", DecimalType(38, 8), False),
])

# candles (up.sql:368-385)
CANDLES = StructType([
    _f("time_start", TS, False),
    _f("amount_asset_id", S, False),
    _f("price_asset_id", S, False),
    _f("low", DEC, False),
    _f("high", DEC, False),
    _f("volume", DEC, False),
    _f("quote_volume", DEC, False),
    _f("max_height", I, False),
    _f("txs_count", I, False),
    _f("weighted_average_price", DEC, False),
    _f("open", DEC, False),
    _f("close", DEC, False),
    _f("interval", S, False),
    _f("matcher_address", S, False),
])

# Generic event-stream row for the streaming pipeline (FIXTURES.md §8):
# one row per blockchain update; kind in {block, microblock, rollback}.
UPDATE_EVENTS = StructType([
    _f("seq", L, False),
    _f("kind", S, False),
    _f("id", S, False),
    _f("height", I, True),
    _f("time_stamp", TS, True),
    _f("ref_id", S, True),
])

# LLM-pipeline tables shipped by the driver (TESTDATA.md)
DOCUMENTS = StructType([
    _f("doc_id", L, False), _f("text", S), _f("lang", S), _f("source", S), _f("n_chars", L),
])
EMBEDDINGS = StructType([
    _f("vec_id", L, False), _f("embedding", ArrayType(FloatType()), False), _f("label", I),
])

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
