"""Bounded-model-state driver fast paths: the shared guard.

Several operators iterate or rank over MODEL-sized state (BPE's word
table, the tokenizer vocabulary) that is sublinear in the corpus: one
shuffle reduces the corpus to |vocab| rows and everything after is pure
deterministic integer/string work.  Below a documented threshold that
state can be collected ONCE and the recurrence run in plain Python —
collapsing a chain of driver-sequential Spark jobs (each ~0.2 s of
scheduler+AQE floor at bench scale) into a single bounded collect —
exactly the ``duplicate_clusters`` driver-union-find precedent.  Above
the threshold the distributed form runs unchanged; the guard makes the
"bounded side only, never the corpus" contract executable.

The BMP check keeps the Python twins bit-identical to the JVM forms:
``F.split(s, "")`` and JVM string comparison work in UTF-16 code units,
Python in code points — values containing astral characters route to the
distributed path instead of silently diverging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: rows of model state at or below which the driver path engages; 64k
#: short strings ≈ a few MB driver-side.  Open-web vocabularies (10M+
#: distinct words) always take the distributed path.
DRIVER_STATE_THRESHOLD = 65536


def collect_if_bounded(
    df: DataFrame, col: str, threshold: int
) -> list | None:
    """Collect ``df`` iff it has at most ``threshold`` rows and every
    value of string column ``col`` is BMP-only.  Returns the rows or
    None (caller falls back to the distributed path)."""
    rows = df.limit(threshold + 1).collect()
    if len(rows) > threshold:
        return None
    for r in rows:
        w = r[col]
        if w and max(map(ord, w)) > 0xFFFF:
            return None
    return rows
