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


def quantize_int8(a: Column) -> Column:
    """Symmetric max-abs int8 quantization of a float embedding — the
    standard compression step before an embedding index ships (4x smaller
    vectors, distance math in integers).

    q_i = floor(x_i * 127 / max|x| + 0.5) in [-127, 127].  The floor(+0.5)
    form (round-half-up) is chosen over ``F.round`` because it is pure IEEE
    double arithmetic — bit-identical in any engine that widens float32 the
    same way — whereas round() tie semantics differ across engines.  The
    all-zero vector quantizes to all zeros (guarded divisor).  Map-only,
    pure Catalyst: no shuffle, no UDF.
    """
    scale = F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    return F.transform(
        a,
        lambda x: F.floor(x.cast("double") * 127.0 / safe + 0.5).cast("int"),
    )
