"""Ingest: raw update batches → blocks + 18 typed tx frames + children.

Mirrors the reference's decode/classify path (SURVEY.md §3.1):
- proto → domain decode & positional zip (S3/J8): updates.rs:154-263 — here
  the raw batch is already a nested DataFrame (one row per blockchain
  update, transactions as an array column); explode replaces the zip.
- classification into 18 typed tables: mod.rs:359-474, per-type transforms
  convert.rs:87-728.
- conditional field logic (P7): status = 'script_execution_failed' when an
  invoke result carries an error (convert.rs:115-128); signature = first
  proof (convert.rs:108-112); fee defaults to (0, 'WAVES')
  (convert.rs:236-240).
- deterministic uids (W3) replace the reference's per-height tx counter
  (convert.rs:45-72) and block RETURNING ids (J5): tx uid =
  height*100000+seq ordered by (update seq, position in block); block uid =
  the update's seq (monotonic append order).
- lease-cancel resolution (J1): pg.rs:472-505 as a left lookup join.
- asset/ticker update extraction: mod.rs:476-581.

Everything is Catalyst: explode/posexplode + filters + window row_number;
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DecimalType, IntegerType, LongType,
    ShortType, StringType, StructField, StructType,
)

from .constants import UID_HEIGHT_MULTIPLIER
from .functions.codecs import (
    base58_encode_udf,
    default_asset_id,
    escape_nul,
    sender_or_address_udf,
)
from .functions.orders import ARG_ITEM, ORDER_RAW, arg_list_json, canonical_order_json
from .schemas import TX_COMMON_COLUMNS, TX_SCHEMAS

# ------------------------------------------------------------ raw schemas

_S, _L, _I, _SH, _B = StringType(), LongType(), IntegerType(), ShortType(), BooleanType()


def _f(n, t, nullable=True):
    return StructField(n, t, nullable)


#: generic envelope covering all 18 tx kinds (unused fields stay NULL)
RAW_TX = StructType([
    _f("id", _S, False),
    _f("tx_type", _SH, False),
    _f("sender", _S),
    _f("sender_public_key", _S),
    _f("time_stamp", _L),            # epoch ms
    _f("signature", _S),
    _f("proofs", ArrayType(_S)),
    _f("tx_version", _SH),
    _f("fee", _L),
    _f("fee_asset_id", _S),
    _f("invoke_error", _S),          # non-null => script_execution_failed
    _f("recipient_address", _S),
    _f("recipient_alias", _S),
    _f("amount", _L),
    _f("asset_id", _S),
    _f("asset_name", _S),
    _f("description", _S),
    _f("quantity", _L),
    _f("decimals", _SH),
    _f("reissuable", _B),
    _f("script", _S),
    _f("price", _L),
    _f("amount_asset_id", _S),
    _f("price_asset_id", _S),
    _f("buy_matcher_fee", _L),
    _f("sell_matcher_fee", _L),
    _f("order1", _S),
    _f("order2", _S),
    # structured (unserialized) orders: when present, ingest serializes them
    # canonically (models.rs:101-189) instead of trusting order1/order2
    _f("order1_raw", ORDER_RAW),
    _f("order2_raw", ORDER_RAW),
    _f("lease_id", _S),
    _f("alias", _S),
    _f("attachment", _S),
    _f("min_sponsored_asset_fee", _L),
    _f("dapp_address", _S),
    _f("dapp_alias", _S),
    _f("function_name", _S),
    # Ethereum action from decoded metadata (convert.rs:155-161):
    # "transfer" | "invoke"; when absent, inferred from function_name
    _f("eth_action", _S),
    _f("bytes", BinaryType()),
    _f("transfers", ArrayType(StructType([
        _f("recipient_address", _S), _f("recipient_alias", _S), _f("amount", _L),
    ]))),
    _f("data_entries", ArrayType(StructType([
        _f("data_key", _S), _f("data_type", _S), _f("data_value_integer", _L),
        _f("data_value_boolean", _B), _f("data_value_binary", _S),
        _f("data_value_string", _S),
    ]))),
    _f("args", ArrayType(StructType([
        _f("arg_type", _S), _f("arg_value_integer", _L), _f("arg_value_boolean", _B),
        _f("arg_value_binary", _S), _f("arg_value_string", _S), _f("arg_value_list", _S),
        # typed list items (models.rs:40-71); when present, ingest builds
        # arg_value_list from them canonically instead of trusting the
        # pre-serialized string
        _f("arg_list", ArrayType(ARG_ITEM)),
    ]))),
    _f("payments", ArrayType(StructType([
        _f("amount", _L), _f("asset_id", _S),
    ]))),
])

#: state-update extract carried by each raw update (mod.rs:476-581)
RAW_ASSET_UPDATE = StructType([
    _f("asset_id", _S, False), _f("decimals", _SH), _f("name", _S),
    _f("description", _S), _f("reissuable", _B), _f("volume", _L),
    _f("script", _S), _f("sponsorship", _L), _f("nft", _B),
])
RAW_DATA_ENTRY = StructType([
    _f("address", _S), _f("key", _S), _f("value_type", _S), _f("value_string", _S),
])

#: one row per blockchain update (block / microblock / rollback)
RAW_UPDATE = StructType([
    _f("seq", _L, False),
    _f("kind", _S, False),           # block | microblock | rollback
    _f("id", _S, False),
    _f("height", _I),
    _f("time_stamp", _L),            # epoch ms; NULL <=> microblock
    _f("ref_id", _S),                # rollback target block id
    _f("waves_quantity", DecimalType(38, 8)),
    _f("transactions", ArrayType(RAW_TX)),
    _f("asset_updates", ArrayType(RAW_ASSET_UPDATE)),
    _f("data_entries", ArrayType(RAW_DATA_ENTRY)),
])


# ------------------------------------------------------------ extraction


def extract_blocks(updates: DataFrame) -> DataFrame:
    """blocks_microblocks rows (up.sql:12-17): uid = append order (seq);
    microblocks keep time_stamp NULL (pg.rs:133-141 detection)."""
    appends = updates.filter(F.col("kind").isin("block", "microblock"))
    return appends.select(
        F.col("seq").alias("uid"),
        F.col("id"),
        F.col("height").cast("int").alias("height"),
        F.timestamp_millis(F.col("time_stamp")).alias("time_stamp"),
    )


def extract_raw_txs(updates: DataFrame, chain_id: int = 87) -> DataFrame:
    """Explode transactions, derive common columns + deterministic uid (W3).

    uid = height*100000 + per-height seq ordered by (update seq, position) —
    byte-for-byte the reference's TxUidGenerator semantics
    (convert.rs:45-72: counter resets when height changes).

    Codec rules applied here (the reference formats these itself rather
    than trusting the envelope):
    - sender: non-empty passes through (convert.rs:130); absent -> derived
      from the base58 public key via blake2b+keccak+base58
      (waves.rs:35-51), NULL for genesis rows with no key.
    - attachment: the envelope carries raw bytes base64-encoded (the JSON
      convention for proto ``bytes``); stored form is base58 of the raw
      bytes (convert.rs:336, 504 into_base58).
    - script: envelope carries raw-script base64; stored form is the
      ``base64:``-prefixed string (convert.rs:743 into_prefixed_base64,
      utils.rs:7-15), empty stays empty.
    - asset_name/description: embedded NULs escaped to the literal ``\\0``
      (convert.rs:307-308, 722-723, utils.rs:22-24).
    """
    appends = updates.filter(F.col("kind").isin("block", "microblock"))
    tx = appends.select(
        F.col("seq").alias("block_uid"),
        F.col("height").cast("int").alias("height"),
        F.posexplode(F.col("transactions")).alias("pos_in_block", "tx"),
    )
    w = Window.partitionBy("height").orderBy("block_uid", "pos_in_block")
    uid = (
        F.col("height").cast("long") * UID_HEIGHT_MULTIPLIER
        + F.row_number().over(w).cast("long") - 1
    )
    t = F.col("tx")
    return tx.select(
        uid.alias("uid"),
        t["tx_type"].alias("tx_type"),
        sender_or_address_udf(
            t["sender"], t["sender_public_key"], F.lit(chain_id)
        ).alias("sender"),
        t["sender_public_key"].alias("sender_public_key"),
        F.timestamp_millis(t["time_stamp"]).alias("time_stamp"),
        F.col("height"),
        t["id"].alias("id"),
        # signature = explicit signature else first proof (convert.rs:108-112)
        F.coalesce(t["signature"], F.element_at(t["proofs"], 1)).alias("signature"),
        t["proofs"].alias("proofs"),
        # Ethereum txs always store version 1 (convert.rs:147)
        F.when(t["tx_type"] == 18, F.lit(1).cast("short"))
        .otherwise(t["tx_version"])
        .alias("tx_version"),
        F.coalesce(t["fee"], F.lit(0)).alias("fee"),  # convert.rs:236-240
        # status rule: convert.rs:115-128
        F.when(t["invoke_error"].isNotNull(), F.lit("script_execution_failed"))
        .otherwise(F.lit("succeeded"))
        .alias("status"),
        F.col("block_uid"),
        # type-specific payload (projected per type in classify_txs)
        default_asset_id(t["fee_asset_id"]).alias("fee_asset_id"),
        t["recipient_address"].alias("recipient_address"),
        t["recipient_alias"].alias("recipient_alias"),
        t["amount"].alias("amount"),
        default_asset_id(t["asset_id"]).alias("asset_id"),
        escape_nul(t["asset_name"]).alias("asset_name"),
        escape_nul(t["description"]).alias("description"),
        t["quantity"].alias("quantity"),
        t["decimals"].alias("decimals"),
        t["reissuable"].alias("reissuable"),
        F.when(
            t["script"].isNotNull() & (F.length(t["script"]) > 0),
            F.concat(F.lit("base64:"), t["script"]),
        )
        .otherwise(t["script"])
        .alias("script"),
        t["price"].alias("price"),
        default_asset_id(t["amount_asset_id"]).alias("amount_asset_id"),
        default_asset_id(t["price_asset_id"]).alias("price_asset_id"),
        t["buy_matcher_fee"].alias("buy_matcher_fee"),
        t["sell_matcher_fee"].alias("sell_matcher_fee"),
        # canonical serialization preferred; pre-serialized passthrough kept
        # for envelopes that only carry the JSON (models.rs:101-189)
        F.coalesce(canonical_order_json(t["order1_raw"]), t["order1"]).alias("order1"),
        F.coalesce(canonical_order_json(t["order2_raw"]), t["order2"]).alias("order2"),
        t["lease_id"].alias("lease_id"),
        t["alias"].alias("alias"),
        base58_encode_udf(
            F.expr("try_to_binary(tx.attachment, 'base64')")
        ).alias("attachment"),
        t["min_sponsored_asset_fee"].alias("min_sponsored_asset_fee"),
        t["dapp_address"].alias("dapp_address"),
        t["dapp_alias"].alias("dapp_alias"),
        # Ethereum transfer-vs-invoke from decoded metadata (convert.rs:
        # 155-210): a transfer action stores NO function/args/payments;
        # function_name only exists for invoke (up.sql:327 NULL=transfer)
        F.when(_eth_transfer(t), F.lit(None).cast("string"))
        .otherwise(t["function_name"])
        .alias("function_name"),
        t["bytes"].alias("bytes"),
        t["transfers"].alias("transfers"),
        t["data_entries"].alias("data_entries"),
        F.when(_eth_transfer(t), F.filter(t["args"], lambda _: F.lit(False)))
        .otherwise(t["args"])
        .alias("args"),
        F.when(_eth_transfer(t), F.filter(t["payments"], lambda _: F.lit(False)))
        .otherwise(t["payments"])
        .alias("payments"),
    )


def resolve_lease_cancels(
    raw_txs: DataFrame, prior_ids: DataFrame | None = None
) -> DataFrame:
    """J1 (pg.rs:472-505): map txs_9.lease_id -> lease tx uid via a lookup
    join against ALL tx ids — the full stored history plus this batch (the
    reference queries the `txs` parent table, which already holds the same
    batch's earlier-type inserts); unmatched stays NULL (left join).

    ``prior_ids``: (id, uid) pairs of every previously stored tx.  Scale
    shape: the cancel side is tiny (bounded by batch size) while the id
    universe is the whole chain, so the id store is semi-joined against a
    broadcast of the batch's lease_ids first (one narrow two-column scan,
    no shuffle), and only the surviving pairs are broadcast into the left
    join.
    """
    nine = raw_txs.filter(F.col("tx_type") == 9)
    ids = raw_txs.select(
        F.col("id").alias("lease_id"), F.col("uid").alias("lease_tx_uid")
    )
    if prior_ids is not None:
        wanted = nine.select("lease_id").distinct()
        hits = prior_ids.select(
            F.col("id").alias("lease_id"), F.col("uid").alias("lease_tx_uid")
        ).join(F.broadcast(wanted), "lease_id", "left_semi")
        ids = hits.unionByName(ids)
    # ids are unique chain-wide; max() only pins determinism if an id ever
    # repeated (the reference's HashMap::from_iter would keep an arbitrary
    # insertion-order winner, pg.rs:486)
    ids = ids.groupBy("lease_id").agg(F.max("lease_tx_uid").alias("lease_tx_uid"))
    return nine.join(F.broadcast(ids), "lease_id", "left")


def classify_txs(
    raw_txs: DataFrame, prior_ids: DataFrame | None = None
) -> dict[int, DataFrame]:
    """mod.rs:359-474: route every tx to its typed table, projecting exactly
    that table's schema.  ``prior_ids`` feeds the lease-cancel resolution
    (J1) with stored history."""
    out: dict[int, DataFrame] = {}
    for n, schema in TX_SCHEMAS.items():
        src = (
            resolve_lease_cancels(raw_txs, prior_ids)
            if n == 9
            else raw_txs.filter(F.col("tx_type") == n)
        )
        cols = [f.name for f in schema.fields]
        out[n] = src.select(*cols)
    return out


def txs_union_view(typed: dict[int, DataFrame]) -> DataFrame:
    """The `txs` parent view: UNION ALL over the common-column prefix
    (Postgres INHERITS read analog, up.sql:45-62)."""
    frames = [df.select(*TX_COMMON_COLUMNS) for df in typed.values()]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _eth_transfer(t: Column) -> Column:
    """An Ethereum tx whose decoded metadata action is a plain transfer
    (convert.rs:155-160): explicitly marked, or — when the envelope carries
    no action — inferred from the absent function_name (up.sql:327)."""
    return (t["tx_type"] == 18) & (
        F.coalesce(
            t["eth_action"] == "transfer",
            t["function_name"].isNull(),
        )
    )


def _prefixed_b64(col: Column) -> Column:
    """Envelope binary (already base64 of raw bytes) -> the reference's
    stored ``base64:``-prefixed form (utils.rs:7-15); empty stays empty."""
    return F.when(
        col.isNotNull() & (F.length(col) > 0), F.concat(F.lit("base64:"), col)
    ).otherwise(col)


def extract_children(raw_txs: DataFrame) -> dict[str, DataFrame]:
    """Detail tables (SURVEY.md §1.1): mass-transfer recipients, data
    entries, invoke args/payments, ethereum args/payments — positional
    explode keyed by tx uid (J8)."""
    t11 = raw_txs.filter(F.col("tx_type") == 11).select(
        F.col("uid").alias("tx_uid"), F.col("height"),
        F.posexplode("transfers").alias("position_in_tx", "tr"),
    ).select(
        "tx_uid",
        F.col("tr.recipient_address").alias("recipient_address"),
        F.col("tr.recipient_alias").alias("recipient_alias"),
        F.col("tr.amount").alias("amount"),
        F.col("position_in_tx").cast("short").alias("position_in_tx"),
        "height",
    )
    t12 = raw_txs.filter(F.col("tx_type") == 12).select(
        F.col("uid").alias("tx_uid"), F.col("height"),
        F.posexplode("data_entries").alias("position_in_tx", "d"),
    ).select(
        "tx_uid",
        # data-entry codecs (convert.rs:561-566): key + string values get
        # NUL escaping; binary values store as base64:-prefixed text
        escape_nul(F.col("d.data_key")).alias("data_key"),
        F.col("d.data_type").alias("data_type"),
        F.col("d.data_value_integer").alias("data_value_integer"),
        F.col("d.data_value_boolean").alias("data_value_boolean"),
        _prefixed_b64(F.col("d.data_value_binary")).alias("data_value_binary"),
        escape_nul(F.col("d.data_value_string")).alias("data_value_string"),
        F.col("position_in_tx").cast("short").alias("position_in_tx"),
        "height",
    )

    def _args(n: int) -> DataFrame:
        return raw_txs.filter(F.col("tx_type") == n).select(
            F.col("uid").alias("tx_uid"), F.col("height"),
            F.posexplode("args").alias("position_in_args", "a"),
        ).select(
            "tx_uid",
            # invoke/ethereum arg codecs (convert.rs:204-205, 686-687)
            F.col("a.arg_type").alias("arg_type"),
            F.col("a.arg_value_integer").alias("arg_value_integer"),
            F.col("a.arg_value_boolean").alias("arg_value_boolean"),
            _prefixed_b64(F.col("a.arg_value_binary")).alias("arg_value_binary"),
            escape_nul(F.col("a.arg_value_string")).alias("arg_value_string"),
            F.coalesce(
                arg_list_json(F.col("a.arg_list")), F.col("a.arg_value_list")
            ).alias("arg_value_list"),
            F.col("position_in_args").cast("short").alias("position_in_args"),
            "height",
        )

    def _payments(n: int) -> DataFrame:
        return raw_txs.filter(F.col("tx_type") == n).select(
            F.col("uid").alias("tx_uid"), F.col("height"),
            F.posexplode("payments").alias("position_in_payment", "p"),
        ).select(
            "tx_uid",
            F.col("p.amount").alias("amount"),
            default_asset_id(F.col("p.asset_id")).alias("asset_id"),
            F.col("position_in_payment").cast("short").alias("position_in_payment"),
            "height",
        )

    return {
        "txs_11_transfers": t11,
        "txs_12_data": t12,
        "txs_16_args": _args(16),
        "txs_16_payment": _payments(16),
        "txs_18_args": _args(18),
        "txs_18_payment": _payments(18),
    }


def extract_asset_updates(updates: DataFrame) -> DataFrame:
    """mod.rs:476-546: flatten per-update asset records into the SCD update
    log.  uid = block_uid*100000 + position (deterministic, monotonic in
    append order — replaces the asset_updates_uid_seq sequence,
    pg.rs:190-194).  superseded_by is derived later by operators.scd."""
    appends = updates.filter(F.col("kind").isin("block", "microblock"))
    au = appends.select(
        F.col("seq").alias("block_uid"),
        F.posexplode("asset_updates").alias("pos", "a"),
    )
    return au.select(
        "block_uid",
        (F.col("block_uid") * UID_HEIGHT_MULTIPLIER + F.col("pos")).alias("uid"),
        F.col("a.asset_id").alias("asset_id"),
        F.col("a.decimals").alias("decimals"),
        F.col("a.name").alias("name"),
        F.col("a.description").alias("description"),
        F.col("a.reissuable").alias("reissuable"),
        F.col("a.volume").alias("volume"),
        F.col("a.script").alias("script"),
        # sponsorship is stored NULL unless > 0 (mod.rs:528-530: the consumer
        # maps min_sponsored_fee = Some(s) only when s > 0)
        F.when(F.col("a.sponsorship") > 0, F.col("a.sponsorship")).alias("sponsorship"),
        F.col("a.nft").alias("nft"),
    )


def extract_ticker_updates(updates: DataFrame, asset_storage_address: str) -> DataFrame:
    """P8 (mod.rs:548-581): data entries at the asset-storage address whose
    key matches '<prefix>__assetId2ticker__<asset_id>'; a deleted key
    (value_type NULL) means ticker '' (mod.rs:566-574)."""
    appends = updates.filter(F.col("kind").isin("block", "microblock"))
    de = appends.select(
        F.col("seq").alias("block_uid"),
        F.posexplode("data_entries").alias("pos", "d"),
    ).select(
        "block_uid", "pos",
        F.col("d.address").alias("address"),
        F.col("d.key").alias("key"),
        F.col("d.value_type").alias("value_type"),
        F.col("d.value_string").alias("value_string"),
    )
    # prefix-anchored match (starts_with, not contains: mod.rs:555-556) and
    # value-type gate: a present non-string value is DROPPED, not emitted as
    # '' — '' is reserved for deleted keys (mod.rs:558-574)
    matched = de.filter(
        (F.col("address") == asset_storage_address)
        & F.col("key").startswith("%s%s__assetId2ticker__")
        & (F.col("value_type").isNull() | (F.col("value_type") == "string"))
    )
    return matched.select(
        "block_uid",
        (F.col("block_uid") * UID_HEIGHT_MULTIPLIER + F.col("pos")).alias("uid"),
        F.regexp_extract(F.col("key"), r"__assetId2ticker__(.+)$", 1).alias("asset_id"),
        F.when(F.col("value_type").isNull(), F.lit(""))
        .otherwise(F.coalesce(F.col("value_string"), F.lit("")))
        .alias("ticker"),
    )


def extract_waves_data(updates: DataFrame) -> DataFrame:
    """mod.rs:318-330 + pg.rs:176-184: per-height WAVES supply, deduped on
    quantity.  ON CONFLICT (quantity) DO NOTHING keeps the FIRST-inserted
    row — blocks append in height order, so first-wins = min(height); a
    deterministic aggregate, where dropDuplicates would keep an arbitrary
    row and feed nondeterministic heights into the assets view's
    max_by(quantity, height) supply lookup."""
    return (
        updates.filter(F.col("kind") == "block")
        .filter(F.col("waves_quantity").isNotNull())
        .select(F.col("height").cast("int").alias("height"), F.col("waves_quantity").alias("quantity"))
        .groupBy("quantity")
        .agg(F.min("height").alias("height"))
        .select("height", "quantity")
    )


def extract_asset_origins(asset_updates: DataFrame, txs3: DataFrame) -> DataFrame:
    """asset_origins (up.sql:36-43, pg.rs:205-214 first-wins): the earliest
    update per asset joined to its issue tx."""
    first = asset_updates.groupBy("asset_id").agg(
        F.min("uid").alias("first_asset_update_uid")
    )
    issues = txs3.select(
        F.col("asset_id"),
        F.col("id").alias("origin_transaction_id"),
        F.col("sender").alias("issuer"),
        F.col("height").alias("issue_height"),
        F.col("time_stamp").alias("issue_time_stamp"),
        F.col("uid").alias("_issue_uid"),
    )
    w = Window.partitionBy("asset_id").orderBy("_issue_uid")
    first_issue = (
        issues.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_issue_uid")
    )
    return first.join(first_issue, "asset_id", "inner")
