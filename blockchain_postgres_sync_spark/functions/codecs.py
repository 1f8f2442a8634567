"""Codec function surface (P5/P6): base58, prefixed base64, NUL-escape,
epoch-ms timestamps, and Waves address derivation.

Reference: src/lib/utils.rs:3-24 (base58 encode, "base64:" prefix,
epoch-ms→datetime, NUL escaping) and src/lib/waves.rs:15-85 (keccak256 /
blake2b256, address derivation, base58 validation, asset-id defaulting).

Catalyst handles everything except base58 and the hash chain:
- base64 with prefix: concat(lit("base64:"), base64(col))
- NUL escape: replace(col, "\0", "\\0")  (utils.rs:22-24 escapes to literal)
- epoch ms: timestamp_millis(col)
- asset-id default: when(length==0, "WAVES")

base58 and blake2b/keccak need Python; they run as vectorized pandas UDFs
(Arrow batches) and appear only in ingest — never in the analytical hot
path.  keccak-256 (pre-standard padding) is implemented in pure Python here
to avoid non-baked dependencies; blake2b-256 is stdlib hashlib.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def b58encode_bytes(data: bytes) -> str:
    """Base58 (bitcoin alphabet) encode — mirrors utils.rs:3-5."""
    n = int.from_bytes(data, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def b58decode_str(s: str) -> bytes | None:
    """Base58 decode; None on invalid characters (waves.rs:75-77 validate)."""
    n = 0
    for c in s:
        if c not in _B58_INDEX:
            return None
        n = n * 58 + _B58_INDEX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    return b"\x00" * pad + raw


# ---- keccak-256 (original Keccak padding 0x01, as used by Waves addresses)

_KECCAK_ROT = [
    [0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56], [27, 20, 39, 8, 14],
]
_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _keccak_f(state: list[int]) -> None:
    for rc in _KECCAK_RC:
        c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ (((c[(x + 1) % 5] << 1) | (c[(x + 1) % 5] >> 63)) & _MASK)
             for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                r = _KECCAK_ROT[x][y]
                v = state[x + 5 * y]
                b[y + 5 * ((2 * x + 3 * y) % 5)] = ((v << r) | (v >> (64 - r))) & _MASK
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]) & _MASK
        state[0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Keccak-256 with original 0x01 padding (waves.rs:15-21 uses
    sha3::Keccak256 — the pre-NIST Keccak, not SHA3-256)."""
    rate = 136
    state = [0] * 25
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % rate:
        padded.append(0x00)
    padded[-1] |= 0x80
    for block_start in range(0, len(padded), rate):
        block = padded[block_start:block_start + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        _keccak_f(state)
    return b"".join(state[i].to_bytes(8, "little") for i in range(4))


def blake2b256(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=32).digest()


def address_from_public_key(pk: bytes, chain_id: int) -> str:
    """waves.rs:35-51: addr = 0x01 ++ chain ++ keccak(blake2b(pk))[:20]
    ++ keccak(blake2b(head))[:4] checksum, base58-encoded."""
    pk_hash = keccak256(blake2b256(pk))[:20]
    return address_from_public_key_hash(pk_hash, chain_id)


def address_from_public_key_hash(pk_hash: bytes, chain_id: int) -> str:
    """waves.rs:53-67 (from precomputed pk-hash)."""
    head = bytes([1, chain_id]) + pk_hash[:20]
    checksum = keccak256(blake2b256(head))[:4]
    return b58encode_bytes(head + checksum)


def is_valid_base58(s: str) -> bool:
    """waves.rs:75-77."""
    return b58decode_str(s) is not None


# ---------------------------------------------------------------- pandas UDFs


@pandas_udf(StringType())
def base58_encode_udf(col: pd.Series) -> pd.Series:
    """bytes -> base58 string (utils.rs:3-5); None passes through."""
    return col.map(lambda v: None if v is None else b58encode_bytes(bytes(v)))


@pandas_udf(BooleanType())
def base58_valid_udf(col: pd.Series) -> pd.Series:
    return col.map(lambda v: None if v is None else is_valid_base58(str(v)))


@pandas_udf(StringType())
def address_from_pk_udf(pk: pd.Series, chain_id: pd.Series) -> pd.Series:
    """(public key bytes, chain id) -> base58 address (waves.rs:35-51)."""
    return pd.Series(
        None if p is None else address_from_public_key(bytes(p), int(c))
        for p, c in zip(pk, chain_id)
    )


@pandas_udf(StringType())
def sender_or_address_udf(
    sender: pd.Series, pk_b58: pd.Series, chain_id: pd.Series
) -> pd.Series:
    """Ingest sender rule: keep a non-empty sender (the node-provided
    address, convert.rs:130 `(sender.len() > 0).then_some(sender)`), else
    derive it from the base58 public key (waves.rs:35-51 Address::from
    ((pk, chain_id))); empty/invalid pk (genesis) -> NULL.  The expensive
    blake2b+keccak chain runs only for rows actually missing the sender."""

    def one(s, pk, c):
        if s is not None and len(s) > 0:
            return s
        if pk is None or len(pk) == 0:
            return None
        raw = b58decode_str(str(pk))
        if raw is None or len(raw) == 0:
            return None
        return address_from_public_key(raw, int(c))

    return pd.Series(one(s, pk, c) for s, pk, c in zip(sender, pk_b58, chain_id))


# ---------------------------------------------------------------- Catalyst


def base64_prefixed(col: Column) -> Column:
    """utils.rs:7-15: 'base64:' + standard base64; empty/null -> None."""
    return F.when(
        col.isNotNull() & (F.length(col) > 0),
        F.concat(F.lit("base64:"), F.base64(col)),
    )


def escape_nul(col: Column) -> Column:
    """utils.rs:22-24: escape embedded NUL so text stores can't choke."""
    return F.replace(col, F.lit("\x00"), F.lit("\\0"))


def epoch_ms_to_timestamp(col: Column) -> Column:
    """utils.rs:17-20."""
    return F.timestamp_millis(col)


def default_asset_id(col: Column) -> Column:
    """waves.rs:79-85: empty asset-id bytes mean the WAVES sentinel."""
    return F.when(col.isNull() | (F.length(col) == 0), F.lit("WAVES")).otherwise(col)
