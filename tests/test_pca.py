"""Distributed integer PCA: moment exactness vs numpy, power-iteration
alignment vs the float eigensolver, projection plan shape, degenerate
input."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import pca

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_gram_moments_exact(spark):
    emb = _emb(spark)
    n, s, g = pca.gram_moments(emb, 64)
    pdf = emb.toPandas()
    x = np.array(
        [
            [int(np.floor(float(v) * pca.PCA_SCALE + 0.5)) for v in row]
            for row in pdf["embedding"]
        ],
        dtype=object,  # exact python ints
    )
    assert n == len(pdf)
    assert s == list(x.sum(axis=0))
    gx = [[int(sum(x[:, i] * x[:, j])) for j in range(64)] for i in range(64)]
    assert g == gx


def test_power_iteration_aligns_with_eigensolver(spark):
    # the synthetic embeddings are near-isotropic (eigengap ~1%), the
    # adversarial case for power iteration — 64 rounds still reach >0.95
    # alignment at this SF; real corpora with a dominant PC need <10
    emb = _emb(spark)
    n, s, g = pca.gram_moments(emb, 64)
    v = pca.power_iteration(n, s, g, iters=64)
    pdf = emb.toPandas()
    x = np.array(list(pdf["embedding"]), dtype=np.float64)
    xc = x - x.mean(0)
    _, vecs = np.linalg.eigh(xc.T @ xc)
    pc1 = vecs[:, -1]
    vv = np.array(v, dtype=np.float64)
    vv /= np.linalg.norm(vv)
    assert abs(float(vv @ pc1)) > 0.95


def test_projection_matches_manual_dot(spark):
    emb = _emb(spark).limit(20)
    proj, v = pca.pca_project(_emb(spark), dims=64, iters=8)
    got = {r.vec_id: r.pc1_proj for r in proj.filter(F.col("vec_id") < 20).collect()}
    for row in emb.collect():
        xq = [int(np.floor(float(x) * pca.PCA_SCALE + 0.5)) for x in row.embedding]
        assert got[row.vec_id] == sum(a * b for a, b in zip(xq, v))


def test_projection_scan_is_map_only(spark):
    proj, _ = pca.pca_project(_emb(spark), dims=64, iters=2)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # statically unrolled arithmetic — no Python, no higher-order fold
    assert "Python" not in plan
    assert "lambdafunction" not in plan.lower()


def test_moment_reduce_is_one_exchange(spark):
    from blockchain_postgres_sync_spark.operators.clustering import (
        quantize_vectors,
    )
    # rebuild the moment plan lazily (gram_moments collects eagerly)
    import pandas as pd

    def batch(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["xq"]), dtype=np.int64)
            flat = [len(x)] + x.sum(0).tolist() + (x.T @ x).reshape(-1).tolist()
            yield pd.DataFrame({"part": [flat]})

    q = quantize_vectors(_emb(spark), "vec_id", "embedding", pca.PCA_SCALE)
    agg = (
        q.mapInPandas(batch, "part array<long>")
        .select(F.posexplode("part").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("total"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_degenerate_covariance_raises(spark):
    rows = [(i, [1.0, 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, s, g = pca.gram_moments(df, 2)
    with pytest.raises(ValueError, match="degenerate"):
        pca.power_iteration(n, s, g, iters=4)
