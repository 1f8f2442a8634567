"""kmeans_train vs a pure-Python reference of the identical integer spec.

The operator's contract (operators/clustering.py) is a deterministic
integer recurrence: md5-hash31-order seeding, x1000 round-half-up input
quantization, floor-div re-quantized centroids, exact squared-distance
argmin with ties to the smaller cluster id, empty-cluster state carry.
The reference below replays that spec in plain Python (exact ints
throughout), so any divergence is a real operator bug, not FP noise.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.clustering import kmeans_train


def _hash31_py(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 2147483647


def _quantize(vec: list[float], scale: int = 1000) -> list[int]:
    import math

    return [math.floor(x * scale + 0.5) for x in vec]


def _kmeans_py(
    rows: list[tuple[int, list[float]]], k: int, iters: int
) -> tuple[dict[int, int], dict[int, list[int]], list[int]]:
    """(assignments id->cluster, final integer centroids, per-round
    inertia) — every round run literally (no early stop)."""
    q = {i: _quantize(v) for i, v in rows}
    seed_ids = sorted(q, key=lambda i: (_hash31_py(i), i))[:k]
    state = {j: (list(q[i]), 1) for j, i in enumerate(seed_ids, start=1)}

    def cents(st):
        return {
            j: [(2 * sd + n) // (2 * n) for sd in s] for j, (s, n) in st.items()
        }

    def assign(c):
        out = {}
        for i, x in q.items():
            best = min(
                (sum((xd - cd) ** 2 for xd, cd in zip(x, c[j])), j)
                for j in sorted(c)
            )
            out[i] = (best[1], best[0])
        return out

    inertias = []
    for _ in range(iters):
        a2 = assign(cents(state))
        inertias.append(sum(d for (_, d) in a2.values()))
        a = {i: j for i, (j, _) in a2.items()}
        nxt: dict[int, tuple[list[int], int]] = {}
        for i, j in a.items():
            s, n = nxt.get(j, ([0] * len(q[i]), 0))
            nxt[j] = ([sd + xd for sd, xd in zip(s, q[i])], n + 1)
        state = {j: nxt.get(j, state[j]) for j in state}
    fc = cents(state)
    return {i: j for i, (j, _) in assign(fc).items()}, fc, inertias


def _run_both(spark, rows, k, iters):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    hist: list = []
    assigned, cent = kmeans_train(
        df, k=k, iters=iters, id_col="vec_id", vec_col="embedding",
        history=hist,
    )
    got = {int(r.vec_id): int(r.cluster) for r in assigned.collect()}
    # Spark quantizes the FLOAT column (cast to double first), so the
    # Python reference must quantize the same float32-rounded values
    import numpy as np

    f32rows = [(i, [float(np.float32(x)) for x in v]) for i, v in rows]
    want, want_cent, want_inertia = _kmeans_py(f32rows, k, iters)
    assert got == want
    assert dict(cent) == want_cent
    # history matches a literal full run round for round (early-stopped
    # rounds are padded with the converged value)
    assert [h["inertia"] for h in hist] == want_inertia
    assert [h["round"] for h in hist] == list(range(1, iters + 1))


def test_matches_python_reference_random(spark):
    rng = random.Random(42)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(60)
    ]
    _run_both(spark, rows, k=5, iters=3)


def test_duplicate_points_and_empty_cluster_carry(spark):
    # 4 distinct points, k=4 seeds, but mass collapses onto 2 locations:
    # some clusters must go empty and carry their previous state
    rng = random.Random(7)
    base = [[0.1] * 4, [0.1] * 4, [-0.3] * 4, [-0.3] * 4]
    rows = [(i, base[i % 4]) for i in range(24)] + [
        (100 + i, [rng.uniform(-0.4, 0.4) for _ in range(4)]) for i in range(4)
    ]
    _run_both(spark, rows, k=4, iters=2)


def test_single_iteration_and_k_too_large(spark):
    rows = [(i, [float(i) / 10, -float(i) / 10]) for i in range(6)]
    _run_both(spark, rows, k=2, iters=1)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_train(df, k=10, iters=1)


def test_soft_dedup_weights_unit(spark):
    """soft_dedup_weights: inverse-cluster-size integer weights, size-1
    pass-through for unclustered docs, exact floor division."""
    from blockchain_postgres_sync_spark.operators.dedup import (
        soft_dedup_weights,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    # clusters: {1,2,3} -> 1, {5,6} -> 5; 4 and 7 unclustered
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    got = {
        int(r.doc_id): (int(r.cluster_size), int(r.weight_x1000))
        for r in soft_dedup_weights(docs, clusters).collect()
    }
    assert got == {
        1: (3, 333), 2: (3, 333), 3: (3, 333),
        4: (1, 1000), 5: (2, 500), 6: (2, 500), 7: (1, 1000),
    }


def test_early_stop_parity(spark):
    """Fixed-point early stop is bit-identical to running iterations out:
    train with a large iters (certainly converged) and compare against the
    pure-Python reference run for the SAME iters (which executes every
    round literally)."""
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(6)]) for i in range(40)
    ]
    _run_both(spark, rows, k=3, iters=12)


def test_streaming_assign_matches_batch(spark):
    """cluster_assign is stateless map-only, so running it over a file
    stream (2 micro-batches) must reproduce the batch assignment row for
    row — the online-serving leg of the learned model."""
    import shutil
    import tempfile

    from blockchain_postgres_sync_spark.operators.clustering import (
        cluster_assign,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch_assigned, cents = kmeans_train(emb, k=6, iters=2)
    expected = {(r.vec_id, r.cluster) for r in batch_assigned.collect()}

    d = tempfile.mkdtemp(prefix="cluster_stream_")
    try:
        emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/b0")
        emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/b1")
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            cluster_assign(stream, cents)
            .writeStream.format("memory")
            .queryName("cluster_assign_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.vec_id, r.cluster)
            for r in spark.sql("SELECT * FROM cluster_assign_out").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_bcast_assign_large_codebook(spark):
    """The broadcast-codebook path serves a STREAM (round-6 verdict #7):
    stream-static broadcast equi-join, k*dim >= 1e5 — far beyond what a
    literal centroid expression should carry — and the stream output is
    row-identical to the batch assignment of the same codebook."""
    import shutil
    import tempfile

    from blockchain_postgres_sync_spark.operators.clustering import (
        cluster_assign,
    )

    k, dim = 1600, 64  # k*dim = 102_400
    rng = random.Random(11)
    cents = [
        (j, [rng.randrange(-500, 500) for _ in range(dim)])
        for j in range(1, k + 1)
    ]
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(40)
    )
    expected = {
        (r.vec_id, r.cluster)
        for r in cluster_assign(emb, cents, literal=False).collect()
    }
    assert len(expected) == 40

    d = tempfile.mkdtemp(prefix="cluster_bcast_stream_")
    try:
        emb.coalesce(1).write.parquet(f"{d}/b0")
        stream = spark.readStream.schema(emb.schema).parquet(f"{d}/b*")
        q = (
            cluster_assign(stream, cents, literal=False)
            .writeStream.format("memory")
            .queryName("bcast_assign_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.vec_id, r.cluster)
            for r in spark.sql("SELECT * FROM bcast_assign_out").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bcast_assign_matches_literal(spark):
    """The broadcast-codebook assignment path (literal=False, the large-k
    form) must be row-identical to the literal-expression path."""
    from blockchain_postgres_sync_spark.operators.clustering import (
        cluster_assign,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, cents = kmeans_train(emb, k=5, iters=1)
    lit = {(r.vec_id, r.cluster) for r in cluster_assign(emb, cents).collect()}
    bc = {
        (r.vec_id, r.cluster)
        for r in cluster_assign(emb, cents, literal=False).collect()
    }
    assert lit == bc and len(lit) == emb.count()


def test_assign_kernel_hof_parity(spark):
    """cluster_assign's Arrow argmin kernel (round-10 default) must be
    row-identical to the literal-expression fold it replaced
    (cluster_assign_hof) on non-NULL vectors — exact integer distances,
    ties to the smaller cluster id in both."""
    from blockchain_postgres_sync_spark.operators.clustering import (
        cluster_assign,
        cluster_assign_hof,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, cents = kmeans_train(emb, k=5, iters=1)
    kern = {(r.vec_id, r.cluster) for r in cluster_assign(emb, cents).collect()}
    hof = {
        (r.vec_id, r.cluster)
        for r in cluster_assign_hof(emb, cents).collect()
    }
    assert kern == hof and len(kern) == emb.count()


def test_partials_distributed_parity(spark, monkeypatch):
    """The fused map-only partial-sum training round (round-10 default)
    must be bit-identical to the distributed explode/groupBy update it
    replaced: force the fallback by zeroing the collect cap and compare
    assignments, centroids, and per-round inertia."""
    from blockchain_postgres_sync_spark.operators import clustering

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run():
        hist: list = []
        assigned, cents = clustering.kmeans_train(
            df, k=4, iters=3, history=hist
        )
        return (
            {int(r.vec_id): int(r.cluster) for r in assigned.collect()},
            cents,
            [h["inertia"] for h in hist],
        )

    fast = run()
    monkeypatch.setattr(clustering, "_PARTIALS_COLLECT_CAP", 0)
    slow = run()
    assert fast == slow
