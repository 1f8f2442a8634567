"""Product quantization (PQ) — vector compression for ANN at corpus scale.

The missing leg of the ANN family (`operators/similarity.py` covers
brute-force / hyperplane-LSH / IVF): PQ splits each ``dim``-dimensional
vector into ``m`` contiguous subvectors and learns an independent
k-centroid codebook per subspace; a vector is then stored as ``m`` small
codes (4 bytes at m=4/k<=256 vs 256 bytes for 64 float32 dims — the
compression that makes a 100 TB embedding corpus scannable), and queries
score against codes through per-subspace lookup tables (asymmetric
distance computation, ADC) without ever reconstructing the vectors.

Integer-exact spec — the same bit-reproducible recurrence as
``operators/clustering.py`` (x1000 round-half-up input quantization,
floor-div re-quantized centroids, exact integer squared-distance argmin
with ties to the smaller code, hash-order seeding, empty-cluster state
carry), applied per subspace.  Because the ``m`` recurrences never
interact, PQ training is definitionally equal to ``m`` independent
``kmeans_train`` runs over the slices — but the implementation below runs
them JOINTLY:

- ``pq_train``: per round ONE map-side assignment pass computes all ``m``
  argmins in-row (slices staged as columns, one fold per subspace over a
  literal codebook) and ONE partial-aggregated shuffle reduces to exactly
  ``m * k * (dim/m) = k * dim`` rows — the same shuffle budget as plain
  k-means, where m sequential trainings would scan the corpus ``m`` times
  per round.  Only model state (k*dim ints) crosses the driver.
- ``pq_encode``: map-only — zero shuffle, zero expansion; codes are
  1-based per-subspace cluster ids in subspace order.
- ``pq_adc_topk``: the ADC serving scan — per query a (m x k) integer
  LUT of subvector-to-codeword distances is computed driver-side from
  model state (queries are the bounded side by definition), broadcast,
  and each encoded row folds its ``m`` codes through the LUT (m lookups
  per row, no reconstruction).  Top-k per query via a per-query window.
  Compose with IVF (`similarity.ivf_topk`) for the bucketed 100 TB form;
  this operator is the in-bucket scorer.

Reference parity: the reference engine has no vector surface; this
extends the training-data north star (BASELINE.json) alongside the IVF /
LSH families.  Oracle: the per-subspace recurrence unrolls to the same
DuckDB CTE chain as ``kmeans_train`` (plans/catalog.py::_kmeans_ctes with
a slice expression), so codebooks, codes, and ADC ranks all hash-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .clustering import (
    _centroid_ints,
    _cents_expr,
    _fold_best,
    quantize_vectors,
)
from .sampling import _hash31

#: codebooks type: {subspace (0-based): [(code 1-based, [centroid ints])]}
Codebooks = dict[int, list[tuple[int, list[int]]]]


def _staged_slices(q: DataFrame, m: int, sub: int) -> DataFrame:
    """xq split into m staged subvector columns _x0.._x{m-1} (slices as
    real columns — HOF arguments re-evaluate per fold step otherwise)."""
    return q.select(
        "*",
        *[
            F.slice(F.col("xq"), s * sub + 1, sub).alias(f"_x{s}")
            for s in range(m)
        ],
    )


def pq_train(
    vecs: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> Codebooks:
    """Train the m per-subspace codebooks jointly: per round one in-row
    m-argmin assignment scan + one (subspace, code, dim) shuffle.  Seeds
    are the k hash-order rows (same draw as ``kmeans_train``), sliced per
    subspace, so subspace s's recurrence is bit-identical to
    ``kmeans_train`` over ``slice(vec, s*sub+1, sub)``.
    """
    q = quantize_vectors(vecs, id_col, vec_col, scale).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        seed_rows = (
            q.orderBy(_hash31(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(k)
            .select("xq")
            .collect()
        )
        if len(seed_rows) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
        dim = len(seed_rows[0].xq)
        if dim % m:
            raise ValueError(f"dim={dim} not divisible by m={m}")
        sub = dim // m

        # state[s][j] = (component sums, member count); seeds enter as
        # single-member clusters, exactly like kmeans_train
        state: dict[int, dict[int, tuple[list[int], int]]] = {
            s: {
                j: (list(r.xq[s * sub: (s + 1) * sub]), 1)
                for j, r in enumerate(seed_rows, start=1)
            }
            for s in range(m)
        }
        staged = _staged_slices(q, m, sub)

        prev: Codebooks | None = None
        for _ in range(iters):
            cents: Codebooks = {
                s: [(j, _centroid_ints(*state[s][j])) for j in sorted(state[s])]
                for s in range(m)
            }
            if cents == prev:
                # fixed point in EVERY subspace: identical codebooks
                # reproduce the previous assignment and state (same
                # argument as kmeans_train's early stop)
                break
            prev = cents
            assigned = staged.select(
                F.array(
                    *[
                        _fold_best(_cents_expr(cents[s]), F.col(f"_x{s}"))["j"]
                        for s in range(m)
                    ]
                ).alias("cls"),
                "xq",
            )
            # one posexplode of the FULL vector: position p0 (0-based)
            # maps to subspace p0 div sub and in-subspace dim p0 % sub + 1,
            # so all m updates ride ONE shuffle reduced to k*dim rows
            upd = (
                assigned.select(
                    "cls", F.posexplode("xq").alias("p0", "v")
                )
                .select(
                    F.expr(f"CAST(p0 DIV {sub} AS INT)").alias("s"),
                    (F.col("p0") % sub + 1).cast("int").alias("dd"),
                    F.element_at(
                        F.col("cls"),
                        F.expr(f"CAST(p0 DIV {sub} AS INT)") + 1,
                    ).alias("cl"),
                    "v",
                )
                .groupBy("s", "cl", "dd")
                .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            nxt: dict[int, dict[int, tuple[list[int], int]]] = {
                s: {} for s in range(m)
            }
            for r in upd:
                sN = int(r.s)
                sums, _ = nxt[sN].setdefault(
                    int(r.cl), ([0] * sub, int(r.n))
                )
                sums[int(r.dd) - 1] = int(r.sv)
            # empty clusters keep their previous (S, n), per subspace
            state = {
                s: {j: nxt[s].get(j, state[s][j]) for j in state[s]}
                for s in range(m)
            }

        return {
            s: [(j, _centroid_ints(*state[s][j])) for j in sorted(state[s])]
            for s in range(m)
        }
    finally:
        q.unpersist()


def pq_encode(
    vecs: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-codeword ids (1-based,
    subspace order).  Map-only — quantize + m staged slices + m in-row
    argmin folds; zero shuffle, works unchanged on a streaming frame
    (stateless, like ``cluster_assign``)."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    staged = _staged_slices(q, m, sub)
    return staged.select(
        F.col(id_col),
        F.array(
            *[
                _fold_best(
                    _cents_expr(sorted(codebooks[s])), F.col(f"_x{s}")
                )["j"]
                for s in range(m)
            ]
        ).alias("codes"),
    )


def pq_reconstruction_error(
    vecs: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(id, err_sq): exact integer squared distance between each quantized
    vector and its PQ codeword reconstruction — the distortion metric
    that tunes m/k (a compression run reports this next to the recall
    probe).  Free byproduct of the encode fold: the per-subspace argmin
    struct already carries the chosen codeword's distance, so the total
    is the sum of the m fold minima — map-only, zero shuffle."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    staged = _staged_slices(q, m, sub)
    errs = [
        _fold_best(_cents_expr(sorted(codebooks[s])), F.col(f"_x{s}"))["a"]
        for s in range(m)
    ]
    total = errs[0]
    for e in errs[1:]:
        total = total + e
    return staged.select(F.col(id_col), total.alias("err_sq"))


def _adc_lut(query_xq: list[int], codebooks: Codebooks) -> list[list[int]]:
    """Per-subspace distance lookup table for one quantized query: LUT[s][j-1]
    = exact integer squared distance between the query's subspace-s slice
    and codeword j.  Pure driver-side ints — m*k entries from model state."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    lut = []
    for s in range(m):
        qs = query_xq[s * sub: (s + 1) * sub]
        lut.append(
            [
                sum((a - b) * (a - b) for a, b in zip(qs, cw))
                for _, cw in sorted(codebooks[s])
            ]
        )
    return lut


def ivfpq_index(
    vecs: DataFrame,
    cents: list[tuple[int, list[int]]],
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(id, cell, codes): the IVF+PQ index — each vector's nearest coarse
    cell (``cents`` = ``kmeans_train`` integer centroids) AND its m PQ
    codes, computed in ONE map-only pass (quantize once, m+1 staged
    argmin folds; zero shuffle, zero joins).  This is the structure an
    IVF-PQ system (FAISS-style) stores per vector: ~1 int + m bytes.  In
    production the output is written bucketed/partitioned BY ``cell`` so
    an ADC probe reads only the probed cells' files."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    staged = _staged_slices(q, m, sub)
    return staged.select(
        F.col(id_col),
        _fold_best(_cents_expr(sorted(cents)), "xq")["j"].alias("cell"),
        F.array(
            *[
                _fold_best(
                    _cents_expr(sorted(codebooks[s])), F.col(f"_x{s}")
                )["j"]
                for s in range(m)
            ]
        ).alias("codes"),
    )


def _cell_probes(
    query_xq: list[int], cents: list[tuple[int, list[int]]], n_probe: int
) -> list[int]:
    """The n_probe nearest coarse cells for one quantized query — exact
    integer distances, ties to the smaller cell id (the same order the
    in-row fold and the SQL oracle use)."""
    scored = sorted(
        (sum((a - b) * (a - b) for a, b in zip(query_xq, cv)), j)
        for j, cv in cents
    )
    return [j for _, j in scored[:n_probe]]


def ivfpq_topk(
    index: DataFrame,
    codebooks: Codebooks,
    cents: list[tuple[int, list[int]]],
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF+PQ ANN: each query ADC-scores ONLY the rows of its ``n_probe``
    nearest coarse cells — the bucketed serving shape that makes PQ scans
    sub-linear.  ``index`` is :func:`ivfpq_index` output; per query the
    probe list and the (m x k) LUT are derived driver-side from model
    state and broadcast as (query_id, cell, lut) rows, so the cell
    restriction is a broadcast EQUI-join on ``cell`` (with cell-
    partitioned storage it prunes to the probed partitions; never a
    corpus scan per query).  Returns (query_id, vec_id, rank, adc) with
    ties to the smaller vec_id; a query's recall floor is whatever its
    probed cells contain — the n_probe/recall trade is measured by
    ``ann_ivfpq`` vs the exact baseline (same probe semantics as
    similarity.ivf_topk)."""
    spark = index.sparkSession
    # probes and LUTs broadcast SEPARATELY: a (query, cell, lut) row set
    # would carry n_probe duplicate copies of each query's (m x k) LUT —
    # at m=16/k=256/n_probe=32 that is 31 redundant 4096-entry arrays per
    # query in the broadcast.  Each LUT is computed once per query.
    probes = spark.createDataFrame(
        [
            (int(qid), int(cell))
            for qid, qx in queries
            for cell in _cell_probes(list(qx), sorted(cents), n_probe)
        ],
        "query_id long, cell int",
    )
    luts = spark.createDataFrame(
        [(int(qid), _adc_lut(list(qx), codebooks)) for qid, qx in queries],
        "query_id long, lut array<array<bigint>>",
    )
    scored = (
        index.join(F.broadcast(probes), "cell")
        .join(F.broadcast(luts), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    F.col("lut"),
                    F.col("codes"),
                    lambda l, c: F.element_at(l, c),
                ),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            ).alias("adc"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: Codebooks,
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: score every encoded row against each
    query through the query's (m x k) integer LUT — ``adc = sum_s
    LUT[s][code_s]``, the exact squared distance between the query and
    the row's RECONSTRUCTION (codeword concatenation).

    ``queries`` is ``[(query_id, quantized_vector_ints)]`` — the bounded
    side (a query batch, never the corpus); LUTs are computed driver-side
    from model state and broadcast.  Returns (query_id, vec_id, rank,
    adc); ties break by vec_id ascending.  Plan: one encoded-corpus scan
    x Q LUT folds, then a per-query top-k window.
    """
    spark = encoded.sparkSession
    lut_rows = [(int(qid), _adc_lut(list(qx), codebooks)) for qid, qx in queries]
    luts = spark.createDataFrame(
        lut_rows, "query_id long, lut array<array<bigint>>"
    )
    scored = encoded.crossJoin(F.broadcast(luts)).select(
        "query_id",
        F.col(id_col),
        F.aggregate(
            F.zip_with(
                F.col("lut"),
                F.col("codes"),
                lambda l, c: F.element_at(l, c),
            ),
            F.lit(0).cast("long"),
            lambda acc, d: acc + d,
        ).alias("adc"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )
