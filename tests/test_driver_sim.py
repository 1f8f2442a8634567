"""Pins for tools/driver_sim.py — the local replica of the external
driver's correctness gate.

The round-6 regression: the real gate canonicalizes query output through a
pandas multi-column ``sort_values`` (which hash-factorizes every cell and
therefore raises ``TypeError: unhashable type: 'list'`` on ArrayType
columns), while ``driver_sim.canon_rows`` sorted pure-Python tuples (lists
compare fine) — so three array-emitting queries were green locally and
``err`` at the gate.  These tests pin the pandas-parity behaviour so the
divergence cannot reappear.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from driver_sim import canon_rows  # noqa: E402


def test_canon_rows_scalars_stable():
    cols = ["b", "a"]
    rows = [(2, "y"), (1, "x"), (None, "z")]
    out = canon_rows(cols, rows)
    # columns sorted by name (a, b), rows sorted by canonical tuple
    assert out == sorted(
        [("y", "2"), ("x", "1"), ("z", "\x00NULL")]
    )


def test_canon_rows_floats_and_bytes():
    out = canon_rows(["f", "blob"], [(0.1, b"\x01\xff")])
    assert out == [("01ff", repr(0.1))]


def test_canon_rows_raises_on_list_cells_like_the_real_gate():
    """An ArrayType output column must CRASH canonicalization (pandas
    factorize path), exactly as the external driver does — a passing sim
    must imply a passing gate."""
    with pytest.raises(TypeError, match="unhashable"):
        canon_rows(["id", "arr"], [(1, [1, 2]), (2, [3, 4])])
