"""ANN quality tests: the approximate paths must actually approximate.

Plan-shape tests pin that ann_lsh / ann_ivf avoid the O(n^2) scan; these
pin the other side of the trade — the candidates they do score must recover
most of the true neighbors.  Recall is measured against the brute-force
oracle on the sf0.001 embeddings (deterministic: hash-derived hyperplanes,
id-seeded centroids), so the thresholds are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from blockchain_postgres_sync_spark.sources.tables import load_table

from .conftest import SF_SMOKE

K = 10
N_QUERIES = 20


def _corpus_and_queries(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") % 97 == 0)
        .limit(N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
    )
    return emb, queries


def _topk_sets(df, query_id_col="query_id"):
    rows = df.collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r[query_id_col], set()).add(r["neighbor_id"])
    return out


def test_lsh_recall_vs_bruteforce(spark):
    emb, queries = _corpus_and_queries(spark)
    truth = _topk_sets(brute_force_topk(emb, queries, k=K))
    approx = _topk_sets(lsh_topk(emb, queries, k=K))
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    # measured ~0.55 at the default knobs (bits=4, 1-bit multi-probe =
    # 5/16 buckets scanned); the floor leaves noise margin while still
    # being ~30x the random baseline (k/n ~ 0.017)
    assert mean_recall >= 0.45, f"mean LSH recall@{K} = {mean_recall:.2f}"


def test_ivf_recall_vs_bruteforce(spark):
    emb, queries = _corpus_and_queries(spark)
    truth = _topk_sets(brute_force_topk(emb, queries, k=K))
    approx = _topk_sets(ivf_topk(emb, queries, k=K))
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    # measured ~0.57 at the default knobs (n_probe cells of the trained
    # codebook); same margin rationale as the LSH floor
    assert mean_recall >= 0.45, f"mean IVF recall@{K} = {mean_recall:.2f}"


def test_every_query_retrieves_itself(spark):
    """A query vector's nearest neighbor is itself (cosine 1.0) — any
    bucketing scheme that can lose the identity match is broken."""
    emb, queries = _corpus_and_queries(spark)
    for df in (lsh_topk(emb, queries, k=K), ivf_topk(emb, queries, k=K)):
        top1 = {
            r["query_id"]: r["neighbor_id"]
            for r in df.filter(F.col("rank") == 1).collect()
        }
        self_hits = sum(1 for q, n in top1.items() if q == n)
        assert self_hits == len(top1)
