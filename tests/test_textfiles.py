"""JSONL/CSV source reader tests: explicit schema, corrupt-line quarantine,
round-trip."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from blockchain_postgres_sync_spark.sources.textfiles import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
    write_csv,
    write_jsonl,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_jsonl_reads_and_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "bye", "lang": "de"}\n'
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, bad = split_corrupt(df)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "NOT JSON" in bad_rows[0][CORRUPT_COL]


def test_csv_reads_and_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("doc_id,text,lang\n1,hello,en\nnot-a-long,x,y\n2,bye,de\n")
    clean, bad = split_corrupt(read_csv(spark, str(p), SCHEMA))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    assert bad.count() == 1


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c", "de")], ["doc_id", "text", "lang"]
    )
    out = os.path.join(tmp_path, "out_jsonl")
    write_jsonl(df, out, partitions=1)
    back, bad = split_corrupt(read_jsonl(spark, out, SCHEMA))
    assert bad.count() == 0
    assert sorted((r.doc_id, r.text, r.lang) for r in back.collect()) == [
        (1, "a b", "en"),
        (2, "c", "de"),
    ]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c", "de")], ["doc_id", "text", "lang"]
    )
    out = os.path.join(tmp_path, "out_csv")
    write_csv(df, out, partitions=1)
    back, bad = split_corrupt(read_csv(spark, out, SCHEMA))
    assert bad.count() == 0
    assert back.count() == 2
