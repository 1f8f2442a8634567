"""Training-shard writer tests: balance, determinism, file caps."""

from __future__ import annotations

import glob

from blockchain_postgres_sync_spark.sources.shards import write_training_shards
from blockchain_postgres_sync_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_shards_balanced_and_deterministic(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, out1, n_shards=8)
    write_training_shards(docs, out2, n_shards=8)
    files1 = sorted(glob.glob(out1 + "/part-*"))
    assert len(files1) == 8
    counts = [spark.read.parquet(f).count() for f in files1]
    assert sum(counts) == n
    # range-partitioned hash order: no shard more than 2x the mean
    assert max(counts) <= 2 * (n / 8)
    # determinism: same membership and order per shard position
    for f1, f2 in zip(files1, sorted(glob.glob(out2 + "/part-*"))):
        a = [r.doc_id for r in spark.read.parquet(f1).collect()]
        b = [r.doc_id for r in spark.read.parquet(f2).collect()]
        assert a == b
    # full corpus preserved exactly once
    all_ids = sorted(
        r.doc_id for f in files1 for r in spark.read.parquet(f).collect()
    )
    assert all_ids == sorted(r.doc_id for r in docs.collect())


def test_shards_max_records_per_file(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    out = str(tmp_path / "capped")
    write_training_shards(docs, out, n_shards=2, max_records_per_file=20)
    for f in glob.glob(out + "/part-*"):
        assert spark.read.parquet(f).count() <= 20
