"""Product quantization vs its definitional decomposition: training must
equal m independent kmeans_train runs over the subvector slices (the
recurrences never interact), encode must equal the per-slice argmin, and
ADC must equal the exact reconstruction distance — all in plain integers.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.clustering import kmeans_train
from blockchain_postgres_sync_spark.operators.pq import (
    _adc_lut,
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _vecs(spark, n=48, dim=8, seed=5):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(dim)]) for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        rows,
    )


def test_pq_train_equals_sliced_kmeans(spark):
    df, _ = _vecs(spark)
    m, k, iters, dim = 2, 3, 2, 8
    sub = dim // m
    books = pq_train(df, m=m, k=k, iters=iters)
    for s in range(m):
        sliced = df.select(
            "vec_id", F.slice("embedding", s * sub + 1, sub).alias("embedding")
        )
        _, cents = kmeans_train(sliced, k=k, iters=iters)
        assert books[s] == cents, f"subspace {s} diverges from kmeans_train"


def test_pq_encode_matches_python_argmin(spark):
    df, rows = _vecs(spark)
    m, k = 2, 3
    books = pq_train(df, m=m, k=k, iters=1)
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}

    import math

    import numpy as np

    sub = 8 // m
    for vid, vec in rows:
        xq = [
            math.floor(float(np.float32(x)) * 1000 + 0.5) for x in vec
        ]
        want = []
        for s in range(m):
            qs = xq[s * sub: (s + 1) * sub]
            best = min(
                (
                    sum((a - b) * (a - b) for a, b in zip(qs, cw)),
                    j,
                )
                for j, cw in books[s]
            )
            want.append(best[1])
        assert got[vid] == want, f"vec {vid}"


def test_pq_adc_topk_matches_reconstruction_distance(spark):
    df, rows = _vecs(spark)
    m, k, topk = 2, 3, 5
    books = pq_train(df, m=m, k=k, iters=1)
    enc = pq_encode(df, books)

    import math

    import numpy as np

    def quant(vec):
        return [math.floor(float(np.float32(x)) * 1000 + 0.5) for x in vec]

    queries = [(vid, quant(vec)) for vid, vec in rows[:3]]
    out = pq_adc_topk(enc, books, queries, topk=topk).collect()
    got = {
        (r.query_id, r.rank): (r.vec_id, r.adc) for r in out
    }
    assert len(out) == 3 * topk

    codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    cw = {s: dict(books[s]) for s in books}
    sub = 8 // m
    for qid, qx in queries:
        scored = []
        for vid, _ in rows:
            recon = []
            for s in range(m):
                recon.extend(cw[s][codes[vid][s]])
            adc = sum((a - b) * (a - b) for a, b in zip(qx, recon))
            # the LUT decomposition must equal the reconstruction distance
            lut = _adc_lut(qx, books)
            assert adc == sum(
                lut[s][codes[vid][s] - 1] for s in range(m)
            )
            scored.append((adc, vid))
        scored.sort()
        for rank, (adc, vid) in enumerate(scored[:topk], start=1):
            assert got[(qid, rank)] == (vid, adc)


def test_pq_encode_streaming_matches_batch(spark):
    """pq_encode is stateless map-only, so running it over a file stream
    must reproduce the batch codes row for row — the online-compression
    leg of the learned codebooks (same contract as cluster_assign)."""
    import shutil
    import tempfile

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_train(emb, m=4, k=4, iters=1)
    expected = {
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(emb, books).collect()
    }

    d = tempfile.mkdtemp(prefix="pq_stream_")
    try:
        emb.coalesce(1).write.parquet(f"{d}/b0")
        stream = spark.readStream.schema(emb.schema).parquet(f"{d}/b*")
        q = (
            pq_encode(stream, books)
            .writeStream.format("memory")
            .queryName("pq_encode_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.vec_id, tuple(r.codes))
            for r in spark.sql("SELECT * FROM pq_encode_out").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivfpq_topk_is_probed_subset_of_full_adc(spark):
    """IVF+PQ must equal the FULL ADC scan restricted to each query's
    probed cells: same LUT distances, the cell equi-join only prunes
    candidates.  Verified against a pure-Python replay of probes + ADC
    over the index rows."""
    from blockchain_postgres_sync_spark.operators.clustering import (
        kmeans_train,
    )
    from blockchain_postgres_sync_spark.operators.pq import (
        _cell_probes,
        ivfpq_index,
        ivfpq_topk,
    )

    import math

    import numpy as np

    df, rows = _vecs(spark, n=60, dim=8, seed=9)
    m, k, ivf_k, n_probe, topk = 2, 3, 4, 2, 5
    _, cents = kmeans_train(df, k=ivf_k, iters=1)
    books = pq_train(df, m=m, k=k, iters=1)
    index = ivfpq_index(df, cents, books)
    idx = {r.vec_id: (r.cell, list(r.codes)) for r in index.collect()}

    def quant(vec):
        return [math.floor(float(np.float32(x)) * 1000 + 0.5) for x in vec]

    queries = [(vid, quant(vec)) for vid, vec in rows[:3]]
    out = ivfpq_topk(
        index, books, cents, queries, topk=topk, n_probe=n_probe
    ).collect()
    got = {(r.query_id, r.rank): (r.vec_id, r.adc) for r in out}

    cw = {s: dict(books[s]) for s in books}
    sub = 8 // m
    for qid, qx in queries:
        probe = set(_cell_probes(qx, sorted(cents), n_probe))
        lut = _adc_lut(qx, books)
        scored = sorted(
            (
                sum(lut[s][codes[s] - 1] for s in range(m)),
                vid,
            )
            for vid, (cell, codes) in idx.items()
            if cell in probe
        )
        for rank, (adc, vid) in enumerate(scored[:topk], start=1):
            assert got[(qid, rank)] == (vid, adc)
        # every index cell assignment is the nearest coarse centroid
        for vid, (cell, _) in idx.items():
            xq = quant(dict(rows)[vid])
            assert cell == _cell_probes(xq, sorted(cents), 1)[0]


def test_pq_train_validates_inputs(spark):
    df, _ = _vecs(spark, n=10, dim=8)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, k=2, iters=1)
    with pytest.raises(ValueError, match="exceeds corpus size"):
        pq_train(df, m=2, k=11, iters=1)

def test_pq_kernel_hof_parity(spark):
    """Round-10 pin: the Arrow argmin/ADC kernels must stay bit-identical
    to the pure-Catalyst ``*_hof`` expression forms (encode codes,
    reconstruction distortion, IVF+PQ index, full-scan ADC ranks, probed
    ADC ranks) — same integers, same tie-breaks, NULL vectors stay NULL.
    The kernels are the shipped forms (interpreted-HOF folds were the
    last >2x-vs-oracle family); the HOF forms are the spec."""
    import math

    import numpy as np

    from blockchain_postgres_sync_spark.operators.pq import (
        ivfpq_index,
        ivfpq_index_hof,
        ivfpq_topk,
        ivfpq_topk_hof,
        pq_adc_topk_hof,
        pq_encode_hof,
        pq_reconstruction_error,
        pq_reconstruction_error_hof,
    )

    df, rows = _vecs(spark, n=60, dim=8, seed=11)
    # a NULL vector must pass through both paths as NULL codes
    df = df.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<float>"
        )
    )
    m, k, ivf_k = 2, 3, 4
    books = pq_train(df.filter(F.col("embedding").isNotNull()), m=m, k=k, iters=2)
    enc_k = {r.vec_id: r.codes and list(r.codes) for r in pq_encode(df, books).collect()}
    enc_h = {
        r.vec_id: r.codes and list(r.codes)
        for r in pq_encode_hof(df, books).collect()
    }
    assert enc_k[999] is None
    assert enc_h[999] == [1] * m  # the documented HOF degenerate case
    assert {v: c for v, c in enc_k.items() if v != 999} == {
        v: c for v, c in enc_h.items() if v != 999
    }

    live = df.filter(F.col("embedding").isNotNull())
    err_k = {r.vec_id: r.err_sq for r in pq_reconstruction_error(live, books).collect()}
    err_h = {
        r.vec_id: r.err_sq
        for r in pq_reconstruction_error_hof(live, books).collect()
    }
    assert err_k == err_h

    from blockchain_postgres_sync_spark.operators.clustering import kmeans_train

    _, cents = kmeans_train(live, k=ivf_k, iters=1)
    idx_k = {
        r.vec_id: (r.cell, list(r.codes))
        for r in ivfpq_index(live, cents, books).collect()
    }
    idx_h = {
        r.vec_id: (r.cell, list(r.codes))
        for r in ivfpq_index_hof(live, cents, books).collect()
    }
    assert idx_k == idx_h

    def quant(vec):
        return [math.floor(float(np.float32(x)) * 1000 + 0.5) for x in vec]

    queries = [(vid, quant(vec)) for vid, vec in rows[:4]]
    enc = pq_encode(live, books)
    adc_k = {
        (r.query_id, r.rank): (r.vec_id, r.adc)
        for r in pq_adc_topk(enc, books, queries, topk=7).collect()
    }
    adc_h = {
        (r.query_id, r.rank): (r.vec_id, r.adc)
        for r in pq_adc_topk_hof(enc, books, queries, topk=7).collect()
    }
    assert adc_k == adc_h

    index = ivfpq_index(live, cents, books)
    ivf_k_out = {
        (r.query_id, r.rank): (r.vec_id, r.adc)
        for r in ivfpq_topk(index, books, cents, queries, topk=5, n_probe=2).collect()
    }
    ivf_h_out = {
        (r.query_id, r.rank): (r.vec_id, r.adc)
        for r in ivfpq_topk_hof(
            index, books, cents, queries, topk=5, n_probe=2
        ).collect()
    }
    assert ivf_k_out == ivf_h_out


def test_pq_query_batch_guard(spark):
    """The 'queries are the bounded side' contract is code, not comment:
    both ADC entry points (kernel and HOF forms) raise past
    PQ_MAX_QUERY_BATCH before building any driver-side LUT/probe state."""
    from blockchain_postgres_sync_spark.operators.pq import (
        PQ_MAX_QUERY_BATCH,
        ivfpq_topk,
        pq_adc_topk_hof,
    )

    df, _ = _vecs(spark, n=8, dim=8)
    books = pq_train(df, m=2, k=2, iters=1)
    enc = pq_encode(df, books)
    oversized = [(i, [0] * 8) for i in range(PQ_MAX_QUERY_BATCH + 1)]
    with pytest.raises(ValueError, match="PQ_MAX_QUERY_BATCH"):
        pq_adc_topk(enc, books, oversized)
    with pytest.raises(ValueError, match="PQ_MAX_QUERY_BATCH"):
        pq_adc_topk_hof(enc, books, oversized)
    with pytest.raises(ValueError, match="PQ_MAX_QUERY_BATCH"):
        ivfpq_topk(enc, books, [(1, [0] * 8)] , oversized)  # type: ignore[arg-type]


def test_pq_partials_distributed_parity(spark, monkeypatch):
    """pq_train's fused map-only partial-sum round (round-10 default)
    must be bit-identical to the distributed posexplode/groupBy update it
    replaced: force the fallback by zeroing the collect cap and compare
    the trained codebooks."""
    import random

    from blockchain_postgres_sync_spark.operators import clustering, pq

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(12)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fast = pq.pq_train(df, m=3, k=4, iters=2)
    monkeypatch.setattr(clustering, "_PARTIALS_COLLECT_CAP", 0)
    slow = pq.pq_train(df, m=3, k=4, iters=2)
    assert fast == slow
