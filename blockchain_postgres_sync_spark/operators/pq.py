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
  argmins in-row and ONE partial-aggregated shuffle reduces to exactly
  ``m * k * (dim/m) = k * dim`` rows — the same shuffle budget as plain
  k-means, where m sequential trainings would scan the corpus ``m`` times
  per round.  Only model state (k*dim ints) crosses the driver.
- ``pq_encode``: map-only — zero shuffle, zero expansion; codes are
  1-based per-subspace cluster ids in subspace order.
- ``pq_adc_topk``: the ADC serving scan — per query a (m x k) integer
  LUT of subvector-to-codeword distances is computed driver-side from
  model state (queries are the bounded side by definition, enforced by
  ``PQ_MAX_QUERY_BATCH``) and each encoded row gathers its ``m`` codes
  through the LUT (m lookups per row, no reconstruction).  Top-k per
  query via a per-query window.  Compose with IVF
  (`similarity.ivf_topk`) for the bucketed 100 TB form; this operator is
  the in-bucket scorer.

Kernels (round 10): every per-row argmin/LUT fold runs as an
Arrow-batched pandas UDF over numpy int64 — Spark evaluates
higher-order-function lambdas in the INTERPRETED expression path
(~50M boxed evals/s regardless of body cost; the round-9 shingle /
entropy / contamination lesson), and the PQ encode + ADC folds were the
last >2x-vs-oracle family left on it.  The expression forms are kept as
``*_hof`` (``pq_encode_hof``, ``pq_reconstruction_error_hof``,
``ivfpq_index_hof``, ``pq_adc_topk_hof``, ``ivfpq_topk_hof``) and pinned
value-equal by tests/test_pq.py — all integer arithmetic, so the two
paths are bit-identical on the documented int64 domain (the HOF/ANSI
path errors loudly past ``sum_d (xq-c)^2 < 2^63``; the numpy path shares
the same caller-declared bound).

Reference parity: the reference engine has no vector surface; this
extends the training-data north star (BASELINE.json) alongside the IVF /
LSH families.  Oracle: the per-subspace recurrence unrolls to the same
DuckDB CTE chain as ``kmeans_train`` (plans/catalog.py::_kmeans_ctes with
a slice expression), so codebooks, codes, and ADC ranks all hash-check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .clustering import (
    _centroid_ints,
    _cents_expr,
    _fold_best,
    _np_spec,
    _partial_update,
    quantize_vectors,
)
from .sampling import _hash31

#: codebooks type: {subspace (0-based): [(code 1-based, [centroid ints])]}
Codebooks = dict[int, list[tuple[int, list[int]]]]

#: hard cap on the driver-built per-query side (probe lists, ADC LUTs,
#: kernel closures).  The ADC/IVF-PQ contract is "queries are the bounded
#: side, never the corpus" — this makes the bound code, not convention:
#: at the cap the broadcast state is ~4096 queries x m*k i64 (a few MB at
#: m=16/k=256), far under any broadcast limit, and anything larger is a
#: corpus masquerading as a query batch (join it as a DataFrame instead).
PQ_MAX_QUERY_BATCH = 4096


def _check_query_batch(queries) -> None:
    if len(queries) > PQ_MAX_QUERY_BATCH:
        raise ValueError(
            f"query batch of {len(queries)} exceeds PQ_MAX_QUERY_BATCH="
            f"{PQ_MAX_QUERY_BATCH}; per-query LUT/probe state is built "
            "driver-side and broadcast, so the query side must stay "
            "bounded — for corpus-x-corpus scoring join the encoded "
            "frames instead"
        )


# ------------------------------------------------------- Arrow kernels


def _specs(
    codebooks: Codebooks, sub: int, prefix: list[tuple[int, list[tuple[int, list[int]]]]] | None = None
):
    """Flatten codebooks into kernel specs [(slice offset, code ids,
    centroid matrix)] — ascending subspace order, entries sorted by code
    id so numpy's first-min argmin reproduces the fold's ties-to-smaller
    rule.  ``prefix`` prepends extra (offset, entries) argmin problems
    (the IVF coarse cells, scored over the FULL vector at offset 0)."""
    import numpy as np

    out = []
    for off, entries in (prefix or []):
        ent = sorted(entries)
        out.append(
            (
                off,
                np.asarray([j for j, _ in ent], dtype=np.int32),
                np.asarray([cv for _, cv in ent], dtype=np.int64),
            )
        )
    for s in sorted(codebooks):
        ent = sorted(codebooks[s])
        out.append(
            (
                s * sub,
                np.asarray([j for j, _ in ent], dtype=np.int32),
                np.asarray([cv for _, cv in ent], dtype=np.int64),
            )
        )
    return out


def _argmin_batch(specs, want: str):
    """Kernel factory: per Arrow batch stack xq into an (N, dim) int64
    matrix and, per spec, argmin the exact integer squared distances to
    the codeword matrix — one C-level einsum per (batch, subspace)
    instead of an interpreted lambda per (row, codeword, component).
    ``want`` selects the output: 'codes' -> array<int> of per-spec argmin
    code ids, 'err' -> int64 sum of the per-spec minima (the
    reconstruction distortion).  NULL vectors yield NULL (the HOF fold
    instead degenerates to code 1 with a NULL distance — divergence
    pinned by tests/test_pq.py::test_pq_kernel_hof_parity; no caller
    feeds NULL embeddings)."""

    def fn(s):
        import numpy as np
        import pandas as pd

        mask = s.notna().to_numpy()
        out = np.empty(len(s), dtype=object)
        if mask.any():
            X = np.stack(s[mask].to_numpy()).astype(np.int64, copy=False)
            n = X.shape[0]
            codes = np.empty((n, len(specs)), dtype=np.int32)
            mins = np.zeros(n, dtype=np.int64)
            for i, (off, J, C) in enumerate(specs):
                d = X[:, off:off + C.shape[1]][:, None, :] - C[None, :, :]
                d2 = np.einsum("nkd,nkd->nk", d, d)
                am = np.argmin(d2, axis=1)
                codes[:, i] = J[am]
                if want == "err":
                    mins += d2[np.arange(n), am]
            vals = (
                [r.tolist() for r in codes] if want == "codes" else mins.tolist()
            )
            # per-index assignment: numpy rejects boolean-mask assignment
            # of equal-length list-of-lists (it reads them as a 2-D block)
            for i, v in zip(np.nonzero(mask)[0], vals):
                out[i] = v
        return pd.Series(out)

    return fn


def _codes_col(codebooks: Codebooks, sub: int, xq, prefix=None) -> Column:
    from pyspark.sql.types import ArrayType, IntegerType

    udf = F.pandas_udf(
        _argmin_batch(_specs(codebooks, sub, prefix), "codes"),
        ArrayType(IntegerType()),
    )
    return udf(F.col(xq) if isinstance(xq, str) else xq)


def _err_col(codebooks: Codebooks, sub: int, xq) -> Column:
    from pyspark.sql.types import LongType

    udf = F.pandas_udf(
        _argmin_batch(_specs(codebooks, sub), "err"), LongType()
    )
    return udf(F.col(xq) if isinstance(xq, str) else xq)


def _adc_col(lut_by_qid, qid: Column, codes: Column) -> Column:
    """ADC scoring kernel: the per-query (m x k) LUTs ride the UDF
    closure (bounded by PQ_MAX_QUERY_BATCH), and a batch vectorizes per
    DISTINCT query id — one numpy gather+sum per (batch, query) instead
    of an interpreted zip_with/aggregate lambda pair per row."""
    from pyspark.sql.types import LongType

    def fn(qids, codes_s):
        import numpy as np
        import pandas as pd

        mask = codes_s.notna().to_numpy()
        out = np.empty(len(codes_s), dtype=object)
        if mask.any():
            C = np.stack(codes_s[mask].to_numpy()).astype(np.int64) - 1
            q = qids[mask].to_numpy()
            vals = np.empty(C.shape[0], dtype=np.int64)
            cols = np.arange(C.shape[1])
            for u in np.unique(q):
                sel = q == u
                vals[sel] = lut_by_qid[int(u)][cols, C[sel]].sum(axis=1)
            out[mask] = vals.tolist()
        return pd.Series(out)

    return F.pandas_udf(fn, LongType())(qid, codes)


def _staged_slices(q: DataFrame, m: int, sub: int) -> DataFrame:
    """xq split into m staged subvector columns _x0.._x{m-1} (slices as
    real columns — HOF arguments re-evaluate per fold step otherwise).
    Used by the ``*_hof`` expression forms only."""
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
    m-argmin assignment scan (Arrow kernel) + one (subspace, code, dim)
    shuffle.  Seeds are the k hash-order rows (same draw as
    ``kmeans_train``), sliced per subspace, so subspace s's recurrence is
    bit-identical to ``kmeans_train`` over ``slice(vec, s*sub+1, sub)``.
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
            agg2 = _partial_update(
                q, [_np_spec(cents[s], offset=s * sub) for s in range(m)]
            )
            if agg2 is not None:
                # round-10 path: ONE map-only Arrow pass fuses all m
                # assignments with the update's per-task exact partial
                # sums (no posexplode, no shuffle; bit-identical — int
                # partials combine order-free — pinned by
                # tests/test_pq.py::test_pq_partials_distributed_parity)
                state = {
                    s: {
                        j: (agg2[(s, j)][2], agg2[(s, j)][0])
                        if (s, j) in agg2
                        else state[s][j]
                        for j in state[s]
                    }
                    for s in range(m)
                }
                continue
            assigned = q.select(_codes_col(cents, sub, "xq").alias("cls"), "xq")
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
    subspace order).  Map-only — quantize + one Arrow argmin kernel; zero
    shuffle, works unchanged on a streaming frame (stateless, like
    ``cluster_assign``).  Bit-identical to :func:`pq_encode_hof` (pinned
    by tests/test_pq.py); isolated sf1 A/B: 5.9 -> under 2s — the
    interpreted per-subspace fold was the cost, not the plan."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    return q.select(
        F.col(id_col), _codes_col(codebooks, sub, "xq").alias("codes")
    )


def pq_encode_hof(
    vecs: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Pure-Catalyst expression form of :func:`pq_encode` (m staged
    slices + m in-row argmin folds).  Kept as the cross-implementation
    parity pin and for sessions where Python workers are unavailable."""
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
    probe).  Free byproduct of the encode argmin: the kernel already has
    each subspace's minimum distance, so the total is their sum —
    map-only, zero shuffle.  Bit-identical to
    :func:`pq_reconstruction_error_hof` (tests/test_pq.py)."""
    sub = len(codebooks[0][0][1])
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    return q.select(F.col(id_col), _err_col(codebooks, sub, "xq").alias("err_sq"))


def pq_reconstruction_error_hof(
    vecs: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Expression form of :func:`pq_reconstruction_error` (sum of the m
    fold minima) — the parity pin."""
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


def _lut_arrays(queries, codebooks: Codebooks):
    """{query_id: (m x k) int64 LUT matrix} for the ADC kernel closure."""
    import numpy as np

    return {
        int(qid): np.asarray(_adc_lut(list(qx), codebooks), dtype=np.int64)
        for qid, qx in queries
    }


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
    codes, computed in ONE map-only pass: a single Arrow kernel solves
    the m+1 argmin problems per batch (the coarse cell is just one more
    spec over the full vector at offset 0); zero shuffle, zero joins.
    This is the structure an IVF-PQ system (FAISS-style) stores per
    vector: ~1 int + m bytes.  In production the output is written
    bucketed/partitioned BY ``cell`` so an ADC probe reads only the
    probed cells' files.  Bit-identical to :func:`ivfpq_index_hof`."""
    sub = len(codebooks[0][0][1])
    m = len(codebooks)
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    combined = _codes_col(
        codebooks, sub, "xq", prefix=[(0, sorted(cents))]
    )
    return q.select(
        F.col(id_col), combined.alias("_cc")
    ).select(
        id_col,
        F.element_at(F.col("_cc"), 1).alias("cell"),
        F.slice(F.col("_cc"), 2, m).alias("codes"),
    )


def ivfpq_index_hof(
    vecs: DataFrame,
    cents: list[tuple[int, list[int]]],
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Expression form of :func:`ivfpq_index` (m+1 staged folds) — the
    parity pin."""
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


def _topk_by_adc(scored: DataFrame, topk: int, id_col: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )


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
    probe list is derived driver-side from model state and broadcast as
    (query_id, cell) rows, so the cell restriction is a broadcast
    EQUI-join on ``cell`` (with cell-partitioned storage it prunes to the
    probed partitions; never a corpus scan per query), and the (m x k)
    LUTs ride the ADC kernel's closure — no LUT column, no duplicate LUT
    copies per probe.  The query side is bounded by
    ``PQ_MAX_QUERY_BATCH`` (raises beyond it).  Returns (query_id,
    vec_id, rank, adc) with ties to the smaller vec_id; a query's recall
    floor is whatever its probed cells contain — the n_probe/recall trade
    is measured by ``ann_ivfpq`` vs the exact baseline (same probe
    semantics as similarity.ivf_topk).  Bit-identical to
    :func:`ivfpq_topk_hof`."""
    _check_query_batch(queries)
    spark = index.sparkSession
    probes = spark.createDataFrame(
        [
            (int(qid), int(cell))
            for qid, qx in queries
            for cell in _cell_probes(list(qx), sorted(cents), n_probe)
        ],
        "query_id long, cell int",
    )
    scored = index.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col(id_col),
        _adc_col(
            _lut_arrays(queries, codebooks), F.col("query_id"), F.col("codes")
        ).alias("adc"),
    )
    return _topk_by_adc(scored, topk, id_col)


def ivfpq_topk_hof(
    index: DataFrame,
    codebooks: Codebooks,
    cents: list[tuple[int, list[int]]],
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Expression form of :func:`ivfpq_topk`: LUTs broadcast as a
    (query_id, lut) frame — SEPARATE from the probes frame, which would
    otherwise carry n_probe duplicate copies of each query's (m x k) LUT
    — and each row folds its codes through the LUT column with
    ``aggregate(zip_with(...))``.  The parity pin."""
    _check_query_batch(queries)
    spark = index.sparkSession
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
    return _topk_by_adc(scored, topk, id_col)


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
    side (a query batch, never the corpus; ``PQ_MAX_QUERY_BATCH``
    enforces it); LUTs are computed driver-side from model state and
    ride the Arrow kernel's closure, so the corpus expansion broadcast
    is just the (query_id) spine.  Returns (query_id, vec_id, rank,
    adc); ties break by vec_id ascending.  Plan: one encoded-corpus scan
    x Q kernel gathers, then a per-query top-k window.  Bit-identical to
    :func:`pq_adc_topk_hof` (tests/test_pq.py).
    """
    _check_query_batch(queries)
    spark = encoded.sparkSession
    qframe = spark.createDataFrame(
        [(int(qid),) for qid, _ in queries], "query_id long"
    )
    scored = encoded.crossJoin(F.broadcast(qframe)).select(
        "query_id",
        F.col(id_col),
        _adc_col(
            _lut_arrays(queries, codebooks), F.col("query_id"), F.col("codes")
        ).alias("adc"),
    )
    return _topk_by_adc(scored, topk, id_col)


def pq_adc_topk_hof(
    encoded: DataFrame,
    codebooks: Codebooks,
    queries: list[tuple[int, list[int]]],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Expression form of :func:`pq_adc_topk` (broadcast (query_id, lut)
    rows + an ``aggregate(zip_with(...))`` fold per row) — the parity
    pin."""
    _check_query_batch(queries)
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
    return _topk_by_adc(scored, topk, id_col)
