"""Skew-hardened equi-join via key salting.

When one join key carries a disproportionate share of rows (a hot asset,
a stop-token, a viral document), a shuffle hash join sends ALL of that
key's rows to one reducer — the task that decides the stage's wall-clock
at 100 TB.  Salting splits the hot key across ``salts`` reducers:

- the PROBE (big) side adds ``_salt = pmod(xxhash64(salt_from), salts)``
  — a pure function of an existing column, so plans stay deterministic
  (no ``rand()``/``monotonically_increasing_id`` whose values change per
  retry and can break exactly-once semantics under task re-execution);
- the BUILD (small-but-not-broadcastable) side replicates each row once
  per salt value (``explode(sequence(0, salts-1))``) — a ``salts``-fold
  blow-up of the SMALL side only;
- the join adds ``_salt`` to the equi-keys, so each probe row still meets
  exactly one replica of its match set: the result is ROW-IDENTICAL to
  the unsalted join (pinned by a property test), only the partitioning
  changed.

Relation to AQE skew handling: AQE's skew-join splits oversized
SORT-MERGE partitions at runtime and is the first line of defense —
salting remains the explicit tool when (a) the skew is in a HASH
aggregation/join AQE won't split, (b) the salt must be stable across
runs for reproducible shard layouts, or (c) the hot key is known ahead
of time and the extra exchange AQE inserts is unwanted.

Reference analog: none (the reference's Postgres runtime has no shuffle;
skew is a distributed-engine concern introduced by the Spark re-design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt_from: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key rows of ``big``
    spread over ``salts`` reducers.  ``salt_from`` names a ``big`` column
    whose per-row variety distributes the salt (any high-cardinality
    column — a row id, a timestamp); correctness never depends on it.

    Supports ``inner`` and ``left`` (left rows with no match survive with
    one NULL-extended row exactly as unsalted: every probe row carries ONE
    salt, and its single build bucket either matches or not).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if SALT_COL in big.columns or SALT_COL in small.columns:
        raise ValueError(f"{SALT_COL} column already present")
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salts)).cast("int")
    )
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return salted_big.join(replicated, [*keys, SALT_COL], how).drop(SALT_COL)
