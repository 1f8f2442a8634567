"""Codec tests mirroring the reference's own unit tests (SURVEY.md §5) plus
known-vector checks for the hash chain."""

from __future__ import annotations

from blockchain_postgres_sync_spark.functions import codecs


def test_base58_known_vector():
    assert codecs.b58encode_bytes(b"hello world") == "StV1DL6CwTryKyV"
    assert codecs.b58decode_str("StV1DL6CwTryKyV") == b"hello world"


def test_base58_leading_zeros():
    assert codecs.b58encode_bytes(b"\x00\x00abc") == "11ZiCa"
    assert codecs.b58decode_str("11ZiCa") == b"\x00\x00abc"


def test_base58_validation():
    # mirrors waves.rs:91-107 should_validate_base58_string
    assert codecs.is_valid_base58("3PLPCb3wKVswnLDLxqADEKzYuqkLa9LrWPQ")
    assert not codecs.is_valid_base58("0OIl")  # excluded alphabet chars


def test_keccak256_known_vectors():
    # Keccak-256 (original 0x01 padding), NOT SHA3-256
    assert codecs.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert codecs.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_blake2b256_known_vector():
    assert codecs.blake2b256(b"").hex() == (
        "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8"
    )


def test_address_derivation_structure():
    # waves.rs:35-51: version byte 1, chain id, 20-byte pk-hash, 4-byte
    # checksum — self-consistency + checksum verification
    addr = codecs.address_from_public_key(b"\x01" * 32, ord("W"))
    raw = codecs.b58decode_str(addr)
    assert raw is not None and len(raw) == 26
    assert raw[0] == 1 and raw[1] == ord("W")
    head, checksum = raw[:22], raw[22:]
    assert codecs.keccak256(codecs.blake2b256(head))[:4] == checksum
    # deterministic
    assert addr == codecs.address_from_public_key(b"\x01" * 32, ord("W"))


def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(b"hello world", "W")], ["data", "chain"]
    ).select(
        codecs.base58_encode_udf(F.col("data")).alias("b58"),
        codecs.base64_prefixed(F.col("data")).alias("b64"),
        codecs.default_asset_id(F.lit("")).alias("asset"),
        codecs.escape_nul(F.lit("a\x00b")).alias("nul"),
    )
    row = df.collect()[0]
    assert row["b58"] == "StV1DL6CwTryKyV"
    assert row["b64"] == "base64:aGVsbG8gd29ybGQ="
    assert row["asset"] == "WAVES"
    assert row["nul"] == "a\\0b"
