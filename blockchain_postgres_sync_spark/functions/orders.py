"""Canonical exchange-order and invoke-arg-list JSON serialization.

The reference builds the ``txs_7.order1/order2`` JSONB documents itself with
a version-dependent field set (src/lib/models.rs:101-135: 14 common fields,
``matcherFeeAssetId`` from v3, ``eip712Signature``/``priceMode`` from v4),
an eip712 signature rendered as 0x-prefixed lowercase hex
(models.rs:178-183), a price_mode enum decode (models.rs:184-189:
0 -> absent, 1 -> fixedDecimals, 2 -> assetDecimals), and list-typed invoke
args as ``[{"type": ..., "value": ...}, ...]`` with lowercase type tags
(models.rs:29-71; its own unit test models.rs:219-249 pins the bytes).

Spark-first: everything is Catalyst expression work — ``to_json`` over
struct literals whose FIELD ORDER reproduces serde's field order, with
``ignoreNullFields=false`` so explicit nulls serialize like serde's
``Option`` fields.  The only subtlety is the heterogeneously-typed arg
``value`` (int/bool/string per row), which ``to_json`` cannot express; the
arg list therefore concatenates JSON fragments, borrowing ``to_json`` for
exact string escaping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from .codecs import escape_nul

#: envelope shape for a structured (not yet serialized) order — all
#: identifiers base58 strings, eip712_signature base64 of the raw signature
#: bytes (JSON binary convention), order_side 0=buy/1=sell, price_mode the
#: raw proto enum int
ORDER_RAW = StructType([
    StructField("id", StringType()),
    StructField("version", IntegerType()),
    StructField("sender", StringType()),
    StructField("sender_public_key", StringType()),
    StructField("matcher_public_key", StringType()),
    StructField("amount_asset_id", StringType()),
    StructField("price_asset_id", StringType()),
    StructField("order_side", IntegerType()),
    StructField("amount", LongType()),
    StructField("price", LongType()),
    StructField("timestamp", LongType()),
    StructField("expiration", LongType()),
    StructField("matcher_fee", LongType()),
    StructField("matcher_fee_asset_id", StringType()),
    StructField("proofs", ArrayType(StringType())),
    StructField("eip712_signature", StringType()),
    StructField("price_mode", IntegerType()),
])

#: list-arg envelope item (typed, pre-serialization; models.rs:40-56)
ARG_ITEM = StructType([
    StructField("arg_type", StringType()),
    StructField("arg_value_integer", LongType()),
    StructField("arg_value_boolean", BooleanType()),
    StructField("arg_value_binary", StringType()),
    StructField("arg_value_string", StringType()),
])


def _json_string(col: Column) -> Column:
    """JSON-escape ``col`` (quotes included) by round-tripping through
    ``to_json`` — exact Jackson escaping, no hand-rolled rules."""
    j = F.to_json(F.struct(col.alias("v")))
    # strip the  {"v":  prefix and the trailing }
    return F.substring(j, 6, F.length(j) - 6)


def arg_list_json(items: Column) -> Column:
    """Serialize a typed list-arg array to the reference's JSON bytes
    (models.rs:219-249: ``[{"type":"integer","value":5},
    {"type":"binary","value":"base64:AAE="}]``).  Binary items arrive as
    base64-of-raw and store with the ``base64:`` prefix (models.rs:46);
    string items get NUL escaping (models.rs:49)."""

    def item(a):
        value = (
            F.when(a["arg_type"] == "integer", a["arg_value_integer"].cast("string"))
            .when(
                a["arg_type"] == "boolean",
                F.when(a["arg_value_boolean"], F.lit("true")).otherwise(F.lit("false")),
            )
            .when(
                a["arg_type"] == "binary",
                F.concat(F.lit('"base64:'), a["arg_value_binary"], F.lit('"')),
            )
            .when(
                a["arg_type"] == "string",
                _json_string(escape_nul(a["arg_value_string"])),
            )
            .otherwise(F.lit("null"))
        )
        return F.concat(
            F.lit('{"type":"'), a["arg_type"], F.lit('","value":'), value, F.lit("}")
        )

    return F.when(
        items.isNotNull(),
        F.concat(F.lit("["), F.concat_ws(",", F.transform(items, item)), F.lit("]")),
    )


def canonical_order_json(o: Column) -> Column:
    """Serialize one structured order to the reference's canonical JSON
    (models.rs:101-135 field order and version-dependent shape).

    - signature = first proof, "" when no proofs (models.rs:146)
    - assetPair members null for the empty (WAVES) asset (models.rs:150-161)
    - matcherFee defaults 0, matcherFeeAssetId null when empty
      (models.rs:166-173)
    - eip712Signature: 0x + lowercase hex of the raw bytes, only for v>=4
      (models.rs:178-183); priceMode decoded per models.rs:184-189
    """
    nz = lambda c: F.when(c.isNotNull() & (F.length(c) > 0), c)
    proofs = F.coalesce(o["proofs"], F.array().cast("array<string>"))
    common = lambda: [
        o["id"].alias("id"),
        o["version"].cast("int").alias("version"),
        o["sender"].alias("sender"),
        o["sender_public_key"].alias("senderPublicKey"),
        o["matcher_public_key"].alias("matcherPublicKey"),
        F.struct(
            nz(o["amount_asset_id"]).alias("amountAsset"),
            nz(o["price_asset_id"]).alias("priceAsset"),
        ).alias("assetPair"),
        F.when(o["order_side"] == 1, F.lit("sell")).otherwise(F.lit("buy")).alias(
            "orderType"
        ),
        o["amount"].cast("long").alias("amount"),
        o["price"].cast("long").alias("price"),
        o["timestamp"].cast("long").alias("timestamp"),
        o["expiration"].cast("long").alias("expiration"),
        F.coalesce(o["matcher_fee"], F.lit(0)).cast("long").alias("matcherFee"),
        proofs.alias("proofs"),
        F.coalesce(F.try_element_at(proofs, F.lit(1)), F.lit("")).alias("signature"),
    ]
    mfa = nz(o["matcher_fee_asset_id"]).alias("matcherFeeAssetId")
    eip = F.when(
        o["eip712_signature"].isNotNull() & (o["version"] >= 4),
        F.concat(F.lit("0x"), F.lower(F.hex(F.unbase64(o["eip712_signature"])))),
    ).alias("eip712Signature")
    pmode = (
        F.when(o["price_mode"] == 1, F.lit("fixedDecimals"))
        .when(o["price_mode"] == 2, F.lit("assetDecimals"))
        .alias("priceMode")
    )
    opts = {"ignoreNullFields": "false"}
    return F.when(
        o.isNotNull(),
        F.when(o["version"] <= 2, F.to_json(F.struct(*common()), opts))
        .when(o["version"] == 3, F.to_json(F.struct(*common(), mfa), opts))
        .otherwise(F.to_json(F.struct(*common(), mfa, eip, pmode), opts)),
    )
