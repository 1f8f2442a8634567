"""Distributed k-means training (Lloyd iterations) over an embedding column.

The clustering counterpart of the scoring-side operators in
``operators/similarity.py``: `centroid_assign` CLASSIFIES against given
centroids; this module LEARNS the centroids.  Together they cover the
embedding-clustering legs of a training-data pipeline (SemDeDup-style
semantic dedup, topic bucketing, per-cluster sampling quotas).

Execution model — the canonical scalable Lloyd shape (same as Spark
MLlib's, re-derived on the DataFrame API):

- the corpus NEVER leaves the executors: each iteration is ONE map-only
  Arrow pass fusing assignment (vectorized exact-integer argmin) with the
  update's per-task partial sums (round 10; above the
  ``_PARTIALS_COLLECT_CAP`` task*code bound it falls back to the
  pre-round-10 shape — in-row argmin fold + one partial-aggregated
  shuffle reduced to ``k * dim`` rows);
- only model state crosses the driver boundary: ``k`` seed rows at init
  and at most ``tasks * k`` exact partial-sum rows per iteration (a few
  KB for any realistic ``k``/``dim``, independent of corpus size);
- the quantized corpus is ``persist(MEMORY_AND_DISK)``-ed for the
  duration of the loop and released deterministically before return.

Integer-exact spec (cross-engine reproducible, no float accumulation):

- inputs quantize once: ``xq[d] = floor(x[d] * scale + 0.5)`` as int64
  (the house x1000 quantization, see functions/vectors.py);
- centroids RE-QUANTIZE to the same integer grid each round:
  ``c[d] = floordiv(2 * S[d] + n, 2 * n)`` — the round-half-up integer
  mean of the member sums, computed with exact floor division;
- assignment minimizes the exact integer squared distance
  ``A_j = sum_d (xq[d] - c_j[d])^2`` with ties going to the smaller
  cluster id (fold order is fixed: ascending j, strict < replacement);
- an empty cluster keeps its previous ``(S, n)`` state;
- seeding is the deterministic hash-order pick used across the repo's
  sampling family: the ``k`` rows with the smallest
  ``(md5-hash31(id), id)`` (operators/sampling.py::_hash31) — a uniform
  pseudo-random draw any engine with md5 can replay.

Every step is integer arithmetic, so a SQL engine unrolling the same
recurrence (see plans/catalog.py ORACLES["kmeans_train"]) reproduces the
assignment BIT-EXACTLY — no FP-order caveats anywhere.

Reference parity: the reference engine has no clustering surface; this
extends the BASELINE.json training-data north star alongside
similarity.py (centroid scoring) and dedup.py (near-dup families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .sampling import _hash31


def _floordiv(a: int, b: int) -> int:
    """Exact floor division (Python // is already floor semantics)."""
    return a // b


def _centroid_ints(s: list[int], n: int) -> list[int]:
    """Round-half-up integer mean per component: floor((S + n/2) / n)."""
    return [_floordiv(2 * sd + n, 2 * n) for sd in s]


def _fold_best(cents: Column, xq: str | Column = "xq") -> Column:
    """In-row argmin over a centroid array column (array of struct(j, c)
    in ascending-j order): the fold SEEDS from the first centroid's actual
    distance and folds the tail with strict < replacement (ties keep the
    smaller cluster id).  O(k * dim) per row, zero shuffle, zero row
    expansion.  Returns struct(a = min squared distance, j = argmin).
    ``xq`` is a column name or a Column (e.g. a staged subvector slice —
    stage it as a real column first, HOF arguments re-evaluate per fold
    step).

    No sentinel: an earlier version seeded with distance 2^62 / cluster 0,
    which would silently assign a nonexistent cluster 0 if a real squared
    distance ever reached the sentinel (round-6 advice).  Seeding from a
    real centroid removes that failure mode entirely; the remaining bound
    is int64 itself — ``sum_d (xq-c)^2 < 2^63`` needs
    ``max|xq - c| * sqrt(dim) < 3.0e9``, i.e. quantized magnitudes up to
    ~4e8 at dim=64 — and ANSI mode (Spark 4 default) turns an overflow
    beyond that into a loud error, never a wrong assignment.
    """

    xcol = F.col(xq) if isinstance(xq, str) else xq

    def dist(cst: Column) -> Column:
        return F.aggregate(
            F.zip_with(xcol, cst["c"], lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    def step(acc: Column, cst: Column) -> Column:
        a = dist(cst)
        return F.when(
            a < acc["a"], F.struct(a.alias("a"), cst["j"].alias("j"))
        ).otherwise(acc)

    first = F.element_at(cents, 1)
    init = F.struct(dist(first).alias("a"), first["j"].alias("j"))
    rest = F.slice(cents, F.lit(2), F.greatest(F.size(cents) - 1, F.lit(0)))
    return F.aggregate(rest, init, step)


def _fold_argmin(cents: Column, xq: str | Column = "xq") -> Column:
    """Cluster id of :func:`_fold_best`."""
    return _fold_best(cents, xq)["j"]


def _cents_expr(cent_ints: list[tuple[int, list[int]]]) -> Column:
    """The centroids as ONE parsed SQL literal.  A single expr string
    instead of k*dim F.lit() calls: every lit() is a py4j round-trip, and
    at k=8 x dim=64 x (iters+1) assignment builds that overhead (~1500
    JVM calls) dominated the whole training run — the expr string is one
    call and parses JVM-side."""
    return F.expr(
        "array("
        + ",".join(
            f"named_struct('j', CAST({int(j)} AS INT), 'c', "
            + "array(" + ",".join(f"{int(c)}L" for c in cv) + "))"
            for j, cv in cent_ints
        )
        + ")"
    )


def _assign_col(cent_ints: list[tuple[int, list[int]]], xq: str = "xq") -> Column:
    """:func:`_fold_argmin` over the literal centroid array."""
    return _fold_argmin(_cents_expr(cent_ints), xq)


# ---------------------------------------------------- Arrow train kernels
#
# Spark evaluates higher-order-function lambdas in the INTERPRETED
# expression path (~50M boxed evals/s — the round-9/10 lesson that already
# moved the PQ encode/ADC folds to numpy), and the Lloyd loop paid it
# twice per round: the k*dim-per-row assignment fold AND a posexplode
# (x dim row expansion) + shuffle + collect for the update sums.  The
# kernels below fuse one whole (assign + update) round into ONE map-only
# Arrow pass whose per-task output is <= codes rows of exact int64
# partial sums — integers are associative, so per-task partials combined
# driver-side (arbitrary-precision Python ints) are bit-identical to the
# old global groupBy sums; assignment argmin over sorted-by-code-id
# matrices keeps first-min = ties-to-smaller-id, exactly the fold's rule.
# The int64 domain is the same one the HOF/ANSI path documents
# (sum_d (xq-c)^2 < 2^63); numpy wraps silently past it where ANSI
# errors, so the caller-declared quantized-magnitude bound in
# :func:`_fold_best` is the operative contract for both paths.


def _np_spec(entries: list[tuple[int, list[int]]], offset: int = 0):
    """One argmin problem as (slice offset, code-id vector, centroid
    matrix) — entries sorted by code id so numpy's first-min argmin
    reproduces the fold's ties-to-smaller rule (same layout as
    operators/pq.py::_specs)."""
    import numpy as np

    ent = sorted(entries)
    return (
        offset,
        np.asarray([j for j, _ in ent], dtype=np.int32),
        np.asarray([cv for _, cv in ent], dtype=np.int64),
    )


def _argmin_ids_fn(spec):
    """pandas-UDF kernel: nearest code id per row (exact integer squared
    distance, first-min ties).  NULL vectors yield NULL (no caller feeds
    NULL embeddings; the HOF fold instead returns the first centroid's id
    with a NULL distance — divergence pinned by tests/test_clustering.py).
    """
    off, J, C = spec

    def fn(s):
        import numpy as np
        import pandas as pd

        mask = s.notna().to_numpy()
        out = np.empty(len(s), dtype=object)
        if mask.any():
            X = np.stack(s[mask].to_numpy()).astype(np.int64, copy=False)
            d = X[:, off:off + C.shape[1]][:, None, :] - C[None, :, :]
            d2 = np.einsum("nkd,nkd->nk", d, d)
            out[mask] = J[np.argmin(d2, axis=1)].tolist()
        return pd.Series(out)

    return fn


def _partials_fn(specs, xq_col: str = "xq"):
    """mapInPandas kernel: one Lloyd round's per-task partial sums.  For
    every spec (subspace) and every code with members in this task:
    (spec index, code, member count, sum of min squared distances, and
    the component sums of the members' subvectors) — at most
    sum(len(codes)) rows per task regardless of row count.  NULL vectors
    contribute nothing (the explode form never emitted them)."""

    def fn(it):
        import numpy as np
        import pandas as pd

        accs = [
            (
                np.zeros(len(J), dtype=np.int64),
                np.zeros(len(J), dtype=np.int64),
                np.zeros((len(J), C.shape[1]), dtype=np.int64),
            )
            for (_, J, C) in specs
        ]
        for pdf in it:
            if not len(pdf):
                continue
            col = pdf[xq_col]
            mask = col.notna().to_numpy()
            if not mask.any():
                continue
            X = np.stack(col[mask].to_numpy()).astype(np.int64, copy=False)
            for (off, J, C), (n, sa, S) in zip(specs, accs):
                Xs = X[:, off:off + C.shape[1]]
                d = Xs[:, None, :] - C[None, :, :]
                d2 = np.einsum("nkd,nkd->nk", d, d)
                am = np.argmin(d2, axis=1)
                np.add.at(n, am, 1)
                np.add.at(sa, am, d2[np.arange(len(am)), am])
                np.add.at(S, am, Xs)
        ii, cls, ns, sas, ss = [], [], [], [], []
        for i, ((_, J, _C), (n, sa, S)) in enumerate(zip(specs, accs)):
            for c in np.nonzero(n)[0]:
                ii.append(i)
                cls.append(int(J[c]))
                ns.append(int(n[c]))
                sas.append(int(sa[c]))
                ss.append(S[c].tolist())
        yield pd.DataFrame(
            {
                "i": pd.Series(ii, dtype="int32"),
                "cl": pd.Series(cls, dtype="int32"),
                "n": pd.Series(ns, dtype="int64"),
                "sa": pd.Series(sas, dtype="int64"),
                "s": pd.Series(ss, dtype="object"),
            }
        )

    return fn


#: partial-sum collect cap: above ``tasks * total codes`` rows the driver
#: combine would itself become data-scale work, so training falls back to
#: the distributed explode/groupBy update (the pre-round-10 path, kept
#: below) — the same bounded-driver-state discipline as
#: ``dedup.duplicate_clusters``' union-find threshold.
_PARTIALS_COLLECT_CAP = 1 << 18


def _partial_update(qp: DataFrame, specs) -> dict | None:
    """One training round as a map-only partial-sum scan + tiny collect.
    Returns {(spec index, code): (n, sum min dist, component sums)} with
    exact Python-int combination, or None when ``tasks * codes`` exceeds
    :data:`_PARTIALS_COLLECT_CAP` (caller falls back to the distributed
    update)."""
    k_total = sum(len(J) for _, J, _ in specs)
    if qp.rdd.getNumPartitions() * k_total > _PARTIALS_COLLECT_CAP:
        return None
    rows = qp.select("xq").mapInPandas(
        _partials_fn(specs), "i int, cl int, n long, sa long, s array<long>"
    ).collect()
    agg: dict = {}
    for r in rows:
        key = (int(r.i), int(r.cl))
        if key in agg:
            n0, sa0, s0 = agg[key]
            agg[key] = (
                n0 + int(r.n),
                sa0 + int(r.sa),
                [a + int(b) for a, b in zip(s0, r.s)],
            )
        else:
            agg[key] = (int(r.n), int(r.sa), [int(v) for v in r.s])
    return agg


def quantize_vectors(
    vecs: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, xq): int64 round-half-up quantization of a float vector col."""
    return vecs.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * float(scale) + 0.5).cast(
                "long"
            ),
        ).alias("xq"),
    )


def cluster_assign(
    vecs: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    literal: bool = True,
) -> DataFrame:
    """Assign vectors to FIXED learned integer centroids (the serving /
    online leg of :func:`kmeans_train`): quantize + one Arrow argmin
    kernel (exact integer distances, codebook in the task closure), a
    stateless map-only plan with no shuffle, window, or join — so the
    SAME call works on a batch frame and on an unbounded streaming frame
    (Spark's unified semantics; parity pinned by
    tests/test_clustering.py::test_streaming_assign_matches_batch).
    ``centroids`` is kmeans_train's ``[(cluster_id, [ints])]`` output.
    The pre-round-10 literal-expression fold is kept as
    :func:`cluster_assign_hof` (bit-identical on non-NULL vectors,
    pinned by test_assign_kernel_hof_parity) — the interpreted HOF path
    cost k*dim boxed lambda evals per row.

    ``literal=False`` switches the codebook from the kernel closure to
    a ONE-ROW broadcast frame feeding the Catalyst fold (the house
    codebook pattern, see similarity.centroid_assign) — use it when
    ``k * dim`` outgrows what a per-task closure should carry (~1e5
    values; the SCALE.md knob).  The attach is a dummy-key stream-static-compatible
    broadcast EQUI-join (not a crossJoin), so the SAME call serves an
    unbounded streaming frame with a 64k-centroid codebook — parity
    pinned by test_streaming_bcast_assign_large_codebook.  Bit-identical
    assignments either way (test_bcast_assign_matches_literal).
    """
    # both paths fold in ascending-j order (the documented
    # smaller-cluster-id tie-break), independent of the caller's ordering
    centroids = sorted(centroids)
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    if literal:
        from pyspark.sql.types import IntegerType

        udf = F.pandas_udf(
            _argmin_ids_fn(_np_spec(centroids)), IntegerType()
        )
        return q.select(F.col(id_col), udf(F.col("xq")).alias("cluster"))
    spark = vecs.sparkSession
    row = spark.createDataFrame(
        [(1, [(int(j), [int(c) for c in cv]) for j, cv in centroids])],
        "_k int, _cents array<struct<j:int,c:array<bigint>>>",
    )
    return (
        q.withColumn("_k", F.lit(1))
        .join(F.broadcast(row), "_k")
        .select(F.col(id_col), _fold_argmin(F.col("_cents")).alias("cluster"))
    )


def cluster_assign_hof(
    vecs: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Pure-Catalyst expression form of :func:`cluster_assign` (literal
    centroid array + in-row argmin fold) — kept as the
    cross-implementation parity pin and for sessions where Python
    workers are unavailable."""
    centroids = sorted(centroids)
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    return q.select(F.col(id_col), _assign_col(centroids).alias("cluster"))


def kmeans_train(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    history: list | None = None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Train k-means for ``iters`` (assign, update) rounds, then run one
    final assignment against the learned centroids.

    Pass a list as ``history`` to receive one ``{"round", "inertia"}``
    dict per round — the exact integer total within-cluster squared
    distance under that round's centroids (the elbow-method diagnostic
    for choosing k).  It rides the SAME per-round shuffle (an extra
    first-dimension-only sum in the update aggregation), so tracking
    costs no additional job.  If the fixed-point early stop fires,
    skipped rounds are padded with the converged value (what running
    them literally would produce).

    Returns ``(assignments, centroids)``: a lazy ``(id_col, cluster)``
    frame (one row per input vector; evaluating it costs one quantize +
    assignment scan) and the final re-quantized integer centroids as
    ``[(cluster_id, [c_1..c_dim]), ...]`` for all ``k`` clusters
    (1-based ids, hash-order seeded).
    """
    q = quantize_vectors(vecs, id_col, vec_col, scale)
    qp = q.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        seed_rows = (
            qp.orderBy(_hash31(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(k)
            .select("xq")
            .collect()
        )
        if len(seed_rows) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
        # model state: cluster j -> (component sums S, member count n);
        # seeds enter as single-member clusters so c_j == the seed vector
        state: dict[int, tuple[list[int], int]] = {
            j: (list(r.xq), 1) for j, r in enumerate(seed_rows, start=1)
        }

        prev_cent: list[tuple[int, list[int]]] | None = None
        for _ in range(iters):
            cent = [(j, _centroid_ints(*state[j])) for j in sorted(state)]
            if cent == prev_cent:
                # fixed point: identical integer centroids reproduce the
                # previous assignment, hence the previous state — every
                # remaining round is a no-op.  Skipping them is
                # bit-identical to running iters out (pinned by
                # test_early_stop_parity) and saves one corpus scan +
                # shuffle per converged round.
                break
            prev_cent = cent
            agg = _partial_update(qp, [_np_spec(cent)])
            if agg is not None:
                # round-10 path: ONE map-only Arrow scan (assignment +
                # per-task exact partial sums) + a <= tasks*k-row collect
                # — no interpreted assignment fold, no x-dim posexplode,
                # no shuffle (combination of int partials is exact and
                # order-free, so this is bit-identical to the groupBy
                # form below; pinned by test_partials_distributed_parity)
                if history is not None:
                    history.append(
                        {
                            "round": len(history) + 1,
                            "inertia": sum(v[1] for v in agg.values()),
                        }
                    )
                # empty clusters keep their previous (S, n)
                state = {
                    j: (agg[(0, j)][2], agg[(0, j)][0])
                    if (0, j) in agg
                    else state[j]
                    for j in state
                }
                continue
            best = _fold_best(_cents_expr(cent))
            assigned = qp.select(
                best["j"].alias("cl"), best["a"].alias("_a"), "xq"
            )
            upd = (
                assigned.select("cl", "_a", F.posexplode("xq").alias("dd", "v"))
                .groupBy("cl", "dd")
                .agg(
                    F.sum("v").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                    # per-row min distance, summed once (dd == 0 only):
                    # the round's inertia contribution of this cluster
                    F.sum(F.when(F.col("dd") == 0, F.col("_a"))).alias("sa"),
                )
                .collect()
            )
            if history is not None:
                history.append(
                    {
                        "round": len(history) + 1,
                        "inertia": sum(
                            int(r.sa) for r in upd if int(r.dd) == 0
                        ),
                    }
                )
            nxt: dict[int, tuple[list[int], int]] = {}
            for r in upd:
                s, n = nxt.setdefault(
                    int(r.cl), ([0] * len(state[1][0]), int(r.n))
                )
                s[int(r.dd)] = int(r.s)
            # empty clusters keep their previous (S, n)
            state = {j: nxt.get(j, state[j]) for j in state}

        final_cent = [(j, _centroid_ints(*state[j])) for j in sorted(state)]
        # early stop skips rounds whose centroids (hence assignment and
        # inertia) equal the fixed point — pad so history always has
        # ``iters`` entries matching a literal full run
        if history is not None and history and len(history) < iters:
            last = history[-1]["inertia"]
            while len(history) < iters:
                history.append(
                    {"round": len(history) + 1, "inertia": last}
                )
    finally:
        # a failed collect (executor loss, interrupt) must not leave the
        # corpus-scale quantized frame pinned in the session cache
        qp.unpersist()
    # final assignment re-derives the quantization lazily (one scan when
    # the caller evaluates; no persisted state outlives this call)
    return cluster_assign(vecs, final_cent, id_col, vec_col, scale), final_cent
