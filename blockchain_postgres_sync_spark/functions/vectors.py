"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Dot products / norms are expressed with ``zip_with`` + ``aggregate`` (a
sequential left fold in array order), which keeps the computation JVM-side
and — because the fold order is fixed — bit-deterministic, so results are
reproducible across runs and comparable against a DuckDB ``list_reduce``
oracle.  For 100 TB-scale ANN the brute-force path below is the correctness
baseline; the LSH-bucketed variant in operators/similarity.py is the scale
path (candidates only meet inside a bucket → no full cross join).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product in float64 (deterministic).

    The zip_with + aggregate fold is the FAST form here, not just the
    deterministic one: measured at sf0.1 (2M-pair near-dup join, local[32]),
    an unrolled element_at product-sum chain of the same 64 terms ran ~4x
    SLOWER (per-call array-access overhead beats the vectorized HOF
    evaluator).  ``dim`` is accepted for API stability and ignored.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
