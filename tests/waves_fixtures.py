"""Deterministic waves-shaped event-log fixtures (FIXTURES.md §8 scenarios).

Builds RAW_UPDATE-shaped python rows: blocks with transactions of all 18
types, microblocks, asset/ticker updates, and rollback events.  Seeded
arithmetic only — no RNG state — so every test run sees identical data.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

ASSET_STORAGE = "3PAssetStorageAddr"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

ASSETS = ["A1", "B2", "C3"]  # plus implicit WAVES


def _ms(t: dt.datetime) -> int:
    return int(t.timestamp() * 1000)


def _tx(i: int, tx_type: int, ts: dt.datetime, **kw) -> dict:
    base = {
        "id": f"tx-{tx_type}-{i}",
        "tx_type": tx_type,
        "sender": f"3PSender{i % 3}",
        "sender_public_key": f"pk{i % 3}",
        "time_stamp": _ms(ts),
        "signature": None,
        "proofs": [f"proof-{i}a", f"proof-{i}b"],
        "tx_version": 2,
        "fee": 100000 + i,
        "fee_asset_id": None,
        "invoke_error": None,
    }
    base.update(kw)
    return base


def exchange_tx(i: int, ts: dt.datetime, amount_asset: str, price_asset: str,
                matcher: str, amount: int, price: int, version: int = 2) -> dict:
    return _tx(
        i, 7, ts,
        sender=matcher,
        tx_version=version,
        order1='{"orderType":"buy"}',
        order2='{"orderType":"sell"}',
        amount=amount,
        price=price,
        amount_asset_id=amount_asset,
        price_asset_id=price_asset,
        buy_matcher_fee=300,
        sell_matcher_fee=300,
    )


def all_types_txs(ts: dt.datetime) -> list[dict]:
    """One tx of every type (covers classification + children)."""
    return [
        _tx(1, 1, ts, recipient_address="3PRecip1", amount=10),
        _tx(2, 2, ts, recipient_address="3PRecip2", amount=20),
        _tx(3, 3, ts, asset_id="A1", asset_name="Asset One", description="d",
            quantity=1000, decimals=2, reissuable=True),
        _tx(4, 4, ts, asset_id="A1", amount=5, recipient_address="3PRecip4",
            attachment="YXR0"),
        _tx(5, 5, ts, asset_id="A1", quantity=50, reissuable=False),
        _tx(6, 6, ts, asset_id="A1", amount=7),
        exchange_tx(7, ts, "A1", "WAVES", "3PMatcher0", 100, 250),
        _tx(8, 8, ts, recipient_address="3PRecip8", amount=80),
        _tx(9, 9, ts, lease_id="tx-8-8"),
        _tx(10, 10, ts, alias="my-alias"),
        _tx(11, 11, ts, asset_id="A1", attachment="YTEx",
            transfers=[{"recipient_address": "3PR0", "recipient_alias": None, "amount": 1},
                       {"recipient_address": "3PR1", "recipient_alias": None, "amount": 2}]),
        _tx(12, 12, ts,
            data_entries=[{"data_key": "k1", "data_type": "integer",
                           "data_value_integer": 42, "data_value_boolean": None,
                           "data_value_binary": None, "data_value_string": None},
                          {"data_key": "k2", "data_type": "string",
                           "data_value_integer": None, "data_value_boolean": None,
                           "data_value_binary": None, "data_value_string": "v"}]),
        _tx(13, 13, ts, script="AAE="),
        _tx(14, 14, ts, asset_id="A1", min_sponsored_asset_fee=5),
        _tx(15, 15, ts, asset_id="A1", script="AAI="),
        _tx(16, 16, ts, dapp_address="3PDapp", function_name="call",
            invoke_error="boom",
            args=[{"arg_type": "integer", "arg_value_integer": 5,
                   "arg_value_boolean": None, "arg_value_binary": None,
                   "arg_value_string": None, "arg_value_list": None}],
            payments=[{"amount": 9, "asset_id": None}]),
        _tx(17, 17, ts, asset_id="A1", asset_name="Asset One v2", description="d2"),
        _tx(18, 18, ts, bytes=b"\x01\x02", function_name="call18",
            eth_action="invoke",
            args=[], payments=[{"amount": 3, "asset_id": "A1"}]),
    ]


def asset_update(asset_id: str, decimals: int, volume: int, name: str | None = None) -> dict:
    return {
        "asset_id": asset_id,
        "decimals": decimals,
        "name": name or f"name-{asset_id}",
        "description": f"desc-{asset_id}",
        "reissuable": True,
        "volume": volume,
        "script": None,
        "sponsorship": None,
        "nft": False,
    }


def ticker_entry(asset_id: str, ticker: str | None) -> dict:
    """value_type None => deleted key => ticker '' (mod.rs:566-574)."""
    return {
        "address": ASSET_STORAGE,
        "key": f"%s%s__assetId2ticker__{asset_id}",
        "value_type": None if ticker is None else "string",
        "value_string": ticker,
    }


def block(seq: int, height: int, minute: int, txs: list[dict],
          asset_updates: list[dict] | None = None,
          data_entries: list[dict] | None = None,
          waves_quantity: int | None = None) -> dict:
    return {
        "seq": seq,
        "kind": "block",
        "id": f"block-{seq}",
        "height": height,
        "time_stamp": _ms(T0 + dt.timedelta(minutes=minute)),
        "ref_id": None,
        "waves_quantity": None if waves_quantity is None else Decimal(waves_quantity),
        "transactions": txs,
        "asset_updates": asset_updates or [],
        "data_entries": data_entries or [],
    }


def microblock(seq: int, height: int, txs: list[dict]) -> dict:
    return {
        "seq": seq,
        "kind": "microblock",
        "id": f"micro-{seq}",
        "height": height,
        "time_stamp": None,
        "ref_id": None,
        "waves_quantity": None,
        "transactions": txs,
        "asset_updates": [],
        "data_entries": [],
    }


def rollback(seq: int, ref_id: str) -> dict:
    return {
        "seq": seq,
        "kind": "rollback",
        "id": f"rb-{seq}",
        "height": None,
        "time_stamp": None,
        "ref_id": ref_id,
        "waves_quantity": None,
        "transactions": [],
        "asset_updates": [],
        "data_entries": [],
    }


def scenario_log() -> list[dict]:
    """The canonical multi-batch scenario: genesis assets, trades across
    minutes, microblocks, squash, ticker set/change/delete, rollback, and
    re-append — exercises T2, T3, W1, W3, A1-A4, P8 together."""
    m = dt.timedelta(minutes=1)
    s = dt.timedelta(seconds=1)
    log: list[dict] = []
    # block 1: issue assets + first trades
    log.append(block(
        1, 100, 0,
        all_types_txs(T0 + 10 * s)
        + [exchange_tx(100, T0 + 20 * s, "A1", "WAVES", "3PMatcher0", 10, 200),
           exchange_tx(101, T0 + 30 * s, "A1", "WAVES", "3PMatcher0", 20, 210)],
        asset_updates=[asset_update("A1", 2, 1000), asset_update("B2", 0, 500),
                       asset_update("C3", 8, 10)],
        data_entries=[ticker_entry("A1", "ONE")],
        waves_quantity=10_000_000,
    ))
    # block 2 next minute: more trades (v3 triggers price scaling), B2 update
    log.append(block(
        2, 101, 1,
        [exchange_tx(200, T0 + m + 5 * s, "B2", "A1", "3PMatcher1", 7, 300, version=3),
         exchange_tx(201, T0 + m + 15 * s, "B2", "A1", "3PMatcher1", 9, 310, version=3),
         exchange_tx(202, T0 + m + 25 * s, "A1", "WAVES", "3PMatcher0", 5, 220)],
        asset_updates=[asset_update("B2", 1, 600, name="name-B2-v2")],
        data_entries=[
            ticker_entry("B2", "TWO"),
            # decoys the extractor must DROP (mod.rs:555-574): marker not
            # prefix-anchored; present non-string value
            {"address": ASSET_STORAGE, "key": "X__assetId2ticker__Z9",
             "value_type": "string", "value_string": "NOPE"},
            {"address": ASSET_STORAGE, "key": "%s%s__assetId2ticker__Z8",
             "value_type": "integer", "value_string": None},
        ],
        waves_quantity=10_000_100,
    ))
    # microblocks on height 102
    log.append(microblock(3, 102, [
        exchange_tx(300, T0 + 2 * m + 5 * s, "A1", "WAVES", "3PMatcher0", 3, 230)]))
    log.append(microblock(4, 102, [
        exchange_tx(301, T0 + 2 * m + 10 * s, "A1", "WAVES", "3PMatcher0", 4, 240)]))
    # key block 103 -> squashes micro-3/micro-4 into block-2? No: into the
    # previous KEY block (block-2) per T2.
    log.append(block(
        5, 103, 3,
        [exchange_tx(400, T0 + 3 * m + 5 * s, "A1", "WAVES", "3PMatcher0", 6, 260)],
        data_entries=[ticker_entry("A1", "ONE2")],
        waves_quantity=10_000_200,
    ))
    # rollback to the squashed total-block id: after T2, block-2 carries the
    # id "micro-4" (key block takes the last folded microblock id) — rolling
    # back to it deletes block-5's trades + the A1->ONE2 ticker update.
    log.append(rollback(6, "micro-4"))
    # re-append after rollback: new block at height 104 + ticker delete
    log.append(block(
        7, 104, 4,
        [exchange_tx(500, T0 + 4 * m + 5 * s, "B2", "A1", "3PMatcher1", 11, 320, version=3),
         # cancel of a lease ingested 6 batches earlier (J1 cross-batch)
         _tx(501, 9, T0 + 4 * m + 6 * s, lease_id="tx-8-8")],
        asset_updates=[asset_update("C3", 8, 20)],
        data_entries=[ticker_entry("A1", None)],  # delete => ticker ''
        waves_quantity=10_000_300,
    ))
    return log
