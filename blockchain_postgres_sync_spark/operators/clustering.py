"""Distributed k-means training (Lloyd iterations) over an embedding column.

The clustering counterpart of the scoring-side operators in
``operators/similarity.py``: `centroid_assign` CLASSIFIES against given
centroids; this module LEARNS the centroids.  Together they cover the
embedding-clustering legs of a training-data pipeline (SemDeDup-style
semantic dedup, topic bucketing, per-cluster sampling quotas).

Execution model — the canonical scalable Lloyd shape (same as Spark
MLlib's, re-derived on the DataFrame API):

- the corpus NEVER leaves the executors: each iteration is one map-side
  assignment pass (in-row argmin fold over a broadcast-literal centroid
  array — no k-times row expansion) plus one partial-aggregated shuffle
  reduced to exactly ``k * dim`` rows;
- only model state crosses the driver boundary: ``k`` seed rows at init
  and ``k * dim`` component sums per iteration (a few KB for any
  realistic ``k``/``dim``, independent of corpus size);
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
    online leg of :func:`kmeans_train`): quantize + in-row argmin fold,
    a stateless map-only plan with no shuffle, window, or join — so the
    SAME call works on a batch frame and on an unbounded streaming frame
    (Spark's unified semantics; parity pinned by
    tests/test_clustering.py::test_streaming_assign_matches_batch).
    ``centroids`` is kmeans_train's ``[(cluster_id, [ints])]`` output.

    ``literal=False`` switches the codebook from a parsed SQL literal to
    a ONE-ROW broadcast frame (the house codebook pattern, see
    similarity.centroid_assign): the fold is identical, but the centroid
    data rides the broadcast instead of the expression tree — use it when
    ``k * dim`` outgrows literal-expression size (~1e5 values; the
    SCALE.md knob).  The attach is a dummy-key stream-static-compatible
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
        return q.select(
            F.col(id_col), _assign_col(centroids).alias("cluster")
        )
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
