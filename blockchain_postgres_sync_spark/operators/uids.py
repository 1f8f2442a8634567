"""Deterministic uid assignment (W3) — replaces Postgres sequences.

Reference: ``uid = height * 100000 + seq_in_height`` with the sequence
resetting per height (src/lib/consumer/models/txs/convert.rs:45-72, static
generator mod.rs:41); SCD uids come from sequences preallocated per batch
(pg.rs:190-194, mod.rs:592-599).

Spark translation: a row_number window partitioned by height makes the uid a
pure function of (height, stable order), eliminating all cross-batch mutable
state (SURVEY.md §4 custom work 1).  Collision bound: < 100000 rows per
height, same assumption as the reference (convert.rs:52-58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import UID_HEIGHT_MULTIPLIER


def assign_uids(
    df: DataFrame,
    height_col: str = "height",
    order_cols: list[str] | None = None,
    out_col: str = "uid",
) -> DataFrame:
    """uid = height * 100000 + (rank of row within its height) - 1.

    ``order_cols`` must be a deterministic total order within a height
    (e.g. block order + position-in-block); never rely on physical order.
    """
    order_cols = order_cols or ["id"]
    w = Window.partitionBy(height_col).orderBy(*[F.col(c).asc() for c in order_cols])
    uid: Column = (
        F.col(height_col).cast("long") * UID_HEIGHT_MULTIPLIER
        + F.row_number().over(w).cast("long")
        - 1
    )
    return df.withColumn(out_col, uid)
