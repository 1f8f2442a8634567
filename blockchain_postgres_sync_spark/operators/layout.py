"""Multi-dimensional data-layout keys (Z-order / Morton curves).

The storage-layout half of scan performance: parquet min/max pruning only
skips files when the file's value RANGE is narrow, and sorting by one
column leaves every other column's per-file range full-width.  A Z-order
(Morton) key interleaves the bits of several columns so range-sorting by
the single key keeps EVERY participating column's per-file range narrow —
the technique behind Delta/Iceberg ``ZORDER BY``, reimplemented here as a
pure Catalyst expression (static bit unroll, no UDF) so it can feed
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` writers such as
``sources.bucketed``.

Integer-exact and engine-reproducible: shifts/masks only, so a DuckDB
oracle replays the same arithmetic (see the ``zorder_layout`` catalog
query and ``tests/test_graph.py::test_zorder_improves_minmax_pruning``,
which asserts the pruning benefit itself, not just the key math).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits taken from each dimension (two dims -> a 2*ZORDER_BITS-bit key)
ZORDER_BITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns into one long: bit ``i`` of ``a`` lands at position ``2i+1``,
    bit ``i`` of ``b`` at ``2i``.  Callers normalize dimensions into
    ``[0, 2^bits)`` first (modulo, scaling, or rank-bucketing).

    Statically unrolled bitwise expression — in-row, codegen-friendly,
    zero shuffle; the sort/partition step that CONSUMES the key decides
    the layout cost.
    """
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = ZORDER_BITS) -> str:
    """The identical interleave as ANSI-ish SQL (DuckDB dialect) for
    oracle replay — kept next to the Spark form so the two unrolls can
    never drift independently."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"
