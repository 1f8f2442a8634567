"""Training-shard writer: evenly-sized, deterministically-shuffled parquet
shards — the layout a data loader consumes.

Trainers want (a) shards of near-equal row count so data-parallel workers
stay balanced, (b) a global shuffle that is REPRODUCIBLE (re-running the
pipeline yields byte-identical shard membership), and (c) no driver-side
collection.  The standard hash-order trick (same family as
``operators.sampling``): order by ``md5(id)`` — uniform, so hash order IS a
uniform shuffle — and range-partition that order into ``n_shards`` buckets.

``repartitionByRange`` samples the hash column to pick balanced boundaries
(one extra pass over the ids, no driver materialization), and
``sortWithinPartitions`` makes each shard's internal order deterministic
too.  ``maxRecordsPerFile`` caps file size so a skewed boundary can't
produce a monster file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` parquet parts, hash-shuffled and
    deterministic (same input -> same shard membership and order)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = df.withColumn("_shuffle_key", F.md5(F.col(id_col).cast("string")))
    out = keyed.repartitionByRange(n_shards, "_shuffle_key").sortWithinPartitions(
        "_shuffle_key"
    )
    writer = out.drop("_shuffle_key").write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
