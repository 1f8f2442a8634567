"""Distributed PCA (top principal component) in exact integer arithmetic.

The LLM-pipeline use: project an embedding column onto its leading
principal direction for 1-D layout/bucketing (curriculum ordering,
coarse semantic sharding, drift monitoring) — the cheap linear cousin of
the k-means/PQ codebooks this engine already trains.

Everything is integer-exact so an external SQL oracle replays the whole
computation bit-for-bit (the kmeans_train/centroid_assign playbook):

1. **Quantize** each vector: ``xq[i] = floor(x*scale + 0.5)`` (the shared
   ``quantize_vectors`` spec).
2. **Gram/moment reduce** (the only distributed heavy lifting): one
   map-only Arrow kernel computes per-batch partial sums of the outer
   product ``X^T X`` (int64 matmul over a bounded Arrow batch — exact by
   the batch-size bound), the component sums and the count; partials are
   then summed with ONE exchange on (dims x dims) keys in
   ``DECIMAL(38,0)`` (Spark's exact wide-integer aggregation — int64
   would overflow the GLOBAL Gram sums long before 100 TB, decimal38
   holds to ~1e38).  This is the classic distributed covariance shape:
   map-side O(batch x d^2), shuffle O(d^2), never O(n^2), never a
   driver collect of row data.
3. **Power iteration, driver-side** on the d x d integer matrix
   ``C = n*G - S S^T`` (unnormalized covariance, exact big ints — Python
   integers are unbounded): ``iters`` rounds of ``w = C v`` followed by
   re-quantization ``v = floor(w * scale / max|w|)`` — bounded model
   state (d x d ints), the same driver role kmeans_train's centroids
   play.  Deterministic: no norms, no floats, floor-division only.
4. **Project**: ``proj = sum_i xq[i] * v[i]`` as a STATICALLY UNROLLED
   sum expression (d literal terms — pure codegen, no interpreted
   higher-order fold, no Python in the scan); map-only, zero shuffle.

Magnitude contract (why the arithmetic cannot overflow): |x| <= 16
after quantization gives |xq| <= 16*scale; per-batch int64 partials are
bounded by batch_rows * (16*scale)^2 (Arrow batches are ~10^4 rows —
~1e16 at scale 2^20); global sums ride decimal38; the driver matvec
``C v`` is exact Python; the projection is <= d * (16*scale) * scale
(~2^50 at d=64) — comfortably int64.  The SQL oracle mirrors each step
in HUGEINT (int128), whose ~1.7e38 ceiling accommodates ``n`` up to
~1e9 rows at scale 2^20; beyond that, drop ``scale`` a bit at 2x
headroom per bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .clustering import quantize_vectors

#: quantization scale (power of two: float quantization and the
#: re-quantizing floor-div both stay exact-and-cheap); matches the
#: centroid_assign oracle family's 2^20
PCA_SCALE = 1 << 20


def gram_moments(
    vecs: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = PCA_SCALE,
) -> tuple[int, list[int], list[list[int]]]:
    """Exact integer moments of the quantized vectors: returns
    ``(n, S, G)`` with ``S[i] = sum xq_i`` and ``G[i][j] = sum xq_i*xq_j``
    — one Arrow map pass + one decimal38 aggregation exchange; only the
    (1 + d + d^2) aggregated moment values reach the driver."""
    import pandas as pd

    def batch(it):
        import numpy as np

        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["xq"]), dtype=np.int64)
            g = x.T @ x                      # (d, d) int64, exact per batch
            s = x.sum(axis=0)                # (d,)
            flat = [len(x)] + s.tolist() + g.reshape(-1).tolist()
            yield pd.DataFrame({"part": [flat]})

    q = quantize_vectors(vecs, id_col, vec_col, scale)
    moments = (
        q.mapInPandas(batch, "part array<long>")
        .select(F.posexplode("part").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("total"))
        .collect()
    )
    vals = {r.idx: int(r.total) for r in moments}
    n = vals[0]
    s = [vals[1 + i] for i in range(dims)]
    g = [
        [vals[1 + dims + i * dims + j] for j in range(dims)]
        for i in range(dims)
    ]
    return n, s, g


def power_iteration(
    n: int,
    s: list[int],
    g: list[list[int]],
    iters: int = 6,
    scale: int = PCA_SCALE,
) -> list[int]:
    """Leading eigenvector of ``C = n*G - S S^T`` by ``iters`` rounds of
    exact integer power iteration, starting from the all-``scale`` vector
    and re-quantizing with floor division by the max component magnitude
    each round.  Pure Python big-int arithmetic — deterministic and
    replayed verbatim by the SQL oracle's unrolled CTE chain."""
    dims = len(s)
    c = [
        [n * g[i][j] - s[i] * s[j] for j in range(dims)]
        for i in range(dims)
    ]
    v = [scale] * dims
    for _ in range(iters):
        w = [sum(c[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError(
                "degenerate covariance (C v = 0): constant input vectors"
            )
        v = [(x * scale) // m for x in w]   # Python // floors — sign-safe
    return v


def pca_project_expr(
    vec: Column, v: list[int], scale: int = PCA_SCALE
) -> Column:
    """``sum_i floor(vec[i]*scale + 0.5) * v[i]`` as a statically unrolled
    literal sum — the quantization is applied PER ELEMENT inside the
    unroll (no intermediate array, no higher-order fold), so the whole
    projection is one whole-stage-codegen arithmetic expression."""
    out = F.lit(0).cast("long")
    for i, vi in enumerate(v, start=1):
        xq_i = F.floor(
            F.element_at(vec, i).cast("double") * float(scale) + 0.5
        ).cast("long")
        out = out + xq_i * F.lit(int(vi))
    return out


def pca_project(
    vecs: DataFrame,
    dims: int,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = PCA_SCALE,
    keep_cols: list[str] | None = None,
) -> tuple[DataFrame, list[int]]:
    """Project every vector onto the corpus' leading principal component:
    returns ``(projections, component)`` where projections has
    ``(id_col, *keep_cols, pc1_proj)`` and ``component`` is the learned
    integer direction (model state, broadcast into the scan as literals).

    Two jobs total: the moment reduce (one exchange) and the map-only
    projection scan."""
    n, s, g = gram_moments(vecs, dims, id_col, vec_col, scale)
    v = power_iteration(n, s, g, iters=iters, scale=scale)
    proj = vecs.select(
        id_col,
        *(keep_cols or []),
        pca_project_expr(F.col(vec_col), v, scale).alias("pc1_proj"),
    )
    return proj, v
