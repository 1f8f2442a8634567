#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints the full metrics JSON line (also written to BENCH_LOCAL.json)
followed by a compact final JSON line sized to survive tail-truncating
log collectors.

Queries execute to completion via the no-op sink (full pipeline, no driver
collect overhead).  Each query runs BENCH_RUNS times (default 2) and reports
the minimum: the harness box runs periodic background jobs that can inflate a
single shot by up to 10x, and min-of-N is the standard steady-state estimator
under asymmetric noise (noise only ever adds time)."""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

from blockchain_postgres_sync_spark.plans.catalog import CATALOG
from blockchain_postgres_sync_spark.session import get_spark

HEADLINE = [
    "candles_1m",
    "candles_cascade",
    "scd2_chain",
    "scd2_current",
    "deterministic_uid",
    "assets_view",
    "lookup_join",
    "pricing_summary",
    "top_orders",
    "regional_revenue",
    "tumbling_window_5m",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "ngram_jaccard",
    "text_stats",
    "ann_bruteforce",
    "candles_scaled",
    "dedup_simhash",
    "dedup_embedding",
    "ann_lsh",
    "ann_ivf",
    "label_centroids",
    "pairs_view",
    "lang_id",
    "doc_fingerprint",
    "media_image_features",
    "media_audio_features",
    "media_frame_sample",
    "media_image_real",
    "media_audio_real",
    "json_field_agg",
    "asset_name_search",
    "asof_quotes",
    "session_windows",
    "twap",
    "stratified_sample",
    "corpus_curation",
    "corpus_stats",
    "session_attribution",
    "dedup_kept_corpus",
    "contamination",
    "shingle_novelty",
    "text_repetition",
    "pii_scrub",
    "corpus_cardinality",
    "doc_chunks",
    "pack_concat",
    "pack_greedy",
    "pack_greedy_sharded",
    "quality_gate_pct",
    "doc_chunks_strided",
    "char_entropy",
    "token_vocab",
    "token_encode",
    "ngram_topk",
    "salient_terms",
    "length_histogram",
    "dataset_split",
    "split_decontamination",
    "event_rollup",
    "top_docs_per_source",
    "sliding_window_rate",
    "embedding_quantize",
    "unigram_logprob",
    "order_priority_exists",
    "centroid_assign",
    "label_confusion",
    "semantic_dedup",
    "brand_revenue_salted",
    "tfidf_vectorize",
    "snapshot_diff",
    "integrity_audit",
    "quality_score",
    "normalize_text",
    "curated_training_corpus",
    "bigram_logprob",
    "event_funnel",
    "retention_cohorts",
    "tfidf_rerank",
    "bm25_topk",
    "daily_anomalies",
    "source_overlap",
    "chunk_dedup",
    "lang_mismatch",
    "embedding_outliers",
    "label_purity",
    "dedup_incremental",
    "boilerplate_scrub",
    "mixture_plan",
    "leakage_safe_split",
    "bpe_merge_pairs",
    "bpe_train_merges",
    "quality_auc",
    "dsir_weights",
    "quality_pr_curve",
    "kmeans_train",
    "soft_dedup_weights",
    "cluster_balanced_sample",
    "ann_ivf_learned",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "kmeans_inertia",
    "decimals_view",
    "ticker_parse_latest",
    "latest_supply",
    "order_json",
    "rollback_scd",
    "rollback_candles",
    "squash_blocks",
    "squash_repoint",
    "weighted_sample",
    "weighted_sample_strata",
    "pq_codebooks",
    "pq_encode",
    "ann_pq",
    "ann_ivfpq",
    "ann_pq_recall",
    "ann_ivfpq_recall",
    "pq_reconstruction_error",
    "bpe_encode_pieces",
    "bigram_lift",
    "difficulty_buckets",
    "ann_pq_mrr",
    "repeated_spans",
    "scrub_repeated_spans",
    "small_qty_revenue",
    "pagerank_sim",
    "cdc_chunks",
    "cdc_dedup",
    "quantile_summary",
    "bloom_prefilter",
    "cms_heavy_hitters",
    "zorder_layout",
    "range_join",
    "winnow_fingerprints",
    "vocab_coverage",
    "pca_project",
    "hll_cardinality",
    "minhash_jaccard_est",
    "ngram_jaccard_prefix",
]

#: the reference-parity surface (candles/SCD/uid/views/TPC-ish shapes) —
#: echoed in the FINAL compact JSON line so these timings survive a
#: tail-truncating log collector (only the last ~2000 chars of stdout are
#: guaranteed to be kept; the full dict exceeds that)
REF_SURFACE = [
    "candles_1m", "candles_cascade", "candles_scaled", "scd2_chain",
    "scd2_current", "deterministic_uid", "assets_view", "lookup_join",
    "pricing_summary", "top_orders", "regional_revenue",
    "tumbling_window_5m", "pairs_view", "json_field_agg",
    "asset_name_search", "snapshot_diff", "integrity_audit",
    "decimals_view", "ticker_parse_latest", "latest_supply", "order_json",
    "rollback_scd", "rollback_candles", "squash_blocks", "squash_repoint",
]


def serve_benchmarks(spark, sf_dir: str, runs: int = 3) -> dict:
    """Pre-trained-model SERVING legs (train/serve split, round-7 verdict
    item #5): the PQ / IVFPQ / kmeans HEADLINE rows train their model
    in-query — a sequence of tiny driver-coordinated jobs whose per-job
    floor dominates at 500 training vectors and says nothing about the
    serving plan a 100 TB deployment actually runs.  Here the codebooks /
    centroids are trained ONCE outside the timed region, the encoded
    corpus and IVF+PQ index are materialized to parquet (the stored-index
    shape), and the timed work is exactly the serving plan: map-only
    encode / distortion, stored-codes scan + broadcast-LUT ADC, probed-
    cell equi-join, stateless centroid assign.  No DuckDB twin — the
    BASELINE.md oracle numbers for these queries include training; serve
    rows are tracked round-over-round (see BASELINE.md note)."""
    import shutil
    import tempfile

    from blockchain_postgres_sync_spark.operators import clustering, pq
    from blockchain_postgres_sync_spark.plans.catalog import (
        _PQ_ITERS, _PQ_K, _PQ_M, _pq_query_batch, _t,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = pq.pq_train(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    _, cents = clustering.kmeans_train(emb, k=8, iters=1)
    queries = _pq_query_batch(emb)
    work = tempfile.mkdtemp(prefix="serve_bench_")
    enc_path = os.path.join(work, "encoded")
    idx_path = os.path.join(work, "index")
    pq.pq_encode(emb, books).write.parquet(enc_path)
    pq.ivfpq_index(emb, cents, books).write.parquet(idx_path)

    legs = {
        "pq_encode_serve": lambda: pq.pq_encode(emb, books),
        "pq_distortion_serve": lambda: pq.pq_reconstruction_error(
            emb, books
        ),
        "ann_pq_serve": lambda: pq.pq_adc_topk(
            spark.read.parquet(enc_path), books, queries, topk=10
        ),
        "ann_ivfpq_serve": lambda: pq.ivfpq_topk(
            spark.read.parquet(idx_path), books, cents, queries,
            topk=10, n_probe=3,
        ),
        "kmeans_assign_serve": lambda: clustering.cluster_assign(
            emb, cents
        ),
    }
    best = {n: float("inf") for n in legs}
    for _ in range(runs):
        for n, fn in legs.items():
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            best[n] = min(best[n], time.time() - t0)
    shutil.rmtree(work, ignore_errors=True)
    return {n: round(v, 3) for n, v in best.items()}


def stream_throughput(
    spark, sf_dir: str, n_events: int = 10_000, per_block: int = 200
) -> dict:
    """End-to-end streaming-pipeline throughput: synthesize block updates
    from the events table (same mapping as the analytical `_trades`), drain
    them through run_stream (startup ladder + squash + SCD + candle
    recompute + atomic commits), report events/sec.  Makes ingest/reorg
    regressions visible in BENCH — the catalog queries above never exercise
    the streaming path."""
    import json as _json
    import shutil
    import tempfile

    from blockchain_postgres_sync_spark.sources.tables import load_table
    from blockchain_postgres_sync_spark.streaming.pipeline import run_stream

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.orderBy("event_id")
        .limit(n_events)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )
    blocks: dict[int, list] = {}
    for r in rows:
        blocks.setdefault(int(r["event_id"]) // per_block, []).append(r)
    work = tempfile.mkdtemp(prefix="stream_bench_")
    events_dir = os.path.join(work, "events")
    os.makedirs(events_dir)
    files, per_file = [], 10
    for fi in range(0, (len(blocks) + per_file - 1) // per_file):
        lines = []
        for bi in range(fi * per_file, min((fi + 1) * per_file, len(blocks))):
            txs = [
                {
                    "id": f"tx-7-{int(r['event_id'])}",
                    "tx_type": 7,
                    "sender": f"3PM{int(r['user_id']) % 2}",
                    "sender_public_key": "pk",
                    "time_stamp": int(r["ts"].timestamp() * 1000),
                    "signature": None, "proofs": ["p"], "tx_version": 2,
                    "fee": 300000, "fee_asset_id": None, "invoke_error": None,
                    "amount": int(r["event_id"]) % 97 + 1,
                    "price": int(float(r["value"]) * 100),
                    "amount_asset_id": r["event_type"],
                    "price_asset_id": ["USD", "EUR", "BTC"][int(r["user_id"]) % 3],
                    "buy_matcher_fee": 1, "sell_matcher_fee": 2,
                }
                for r in blocks[bi]
            ]
            lines.append(_json.dumps({
                "seq": bi + 1, "kind": "block", "id": f"b{bi}",
                "height": 1000 + bi,
                "time_stamp": txs[0]["time_stamp"],
                "ref_id": None, "waves_quantity": None,
                "transactions": txs,
                "asset_updates": [
                    {"asset_id": a, "decimals": 2, "name": a,
                     "description": "", "reissuable": True, "volume": 1,
                     "script": None, "sponsorship": None, "nft": False}
                    for a in sorted({t["amount_asset_id"] for t in txs}
                                    | {t["price_asset_id"] for t in txs})
                ] if bi == 0 else [],
                "data_entries": [],
            }))
        path = os.path.join(events_dir, f"batch_{fi:04d}.json")
        with open(path, "w") as f:
            f.write("\n".join(lines))
        files.append(path)
    n_events = len(rows)
    # min-of-N like the catalog queries: the streaming path is store-I/O
    # heavy and the harness box's background I/O bursts inflate single
    # shots; each run uses a fresh store directory (cold store, warm JVM)
    # min-of-3 with a GC nudge between runs: the streaming path JITs on its
    # first run of a session (isolated A/B: run 1 ~90 s, runs 2-3 ~60-62 s)
    # and the leg runs AFTER the aged catalog passes, so 2 runs regularly
    # left BOTH attempts pre-steady-state (the r8 "−23% stream regression"
    # was this harness artifact: isolated steady state measured ~165 ev/s
    # against identical streaming code — see BASELINE.md round-9 note)
    runs = int(os.environ.get("STREAM_RUNS", "3"))
    elapsed = float("inf")
    for i in range(runs):
        gc.collect()
        spark._jvm.System.gc()
        store_dir = os.path.join(work, f"store_{i}")
        t0 = time.time()
        run_stream(spark, events_dir, store_dir, max_files_per_trigger=1)
        elapsed = min(elapsed, time.time() - t0)
    shutil.rmtree(work, ignore_errors=True)
    return {
        "events": n_events,
        "batches": len(files),
        "sec": round(elapsed, 3),
        "events_per_sec": round(n_events / elapsed, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    # warm the JVM (codegen, shuffle machinery, parquet reader) with a tiny
    # out-of-band job so the first measured query doesn't absorb JVM startup
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().write.mode("overwrite").format("noop").save()

    # 3 passes: harness noise bursts last minutes and inflate several
    # ADJACENT queries of one pass together — with 2 passes both attempts of
    # a query regularly land inside bursts; a third pass makes the min a
    # usable steady-state estimate
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    # pass-interleaved (all queries, then all again): a query's attempts are
    # separated by a full pass, so a transient background-load burst can't
    # inflate every attempt of the same query
    best: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for r in range(runs):
        for name in HEADLINE:
            fn = CATALOG[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best[name] = min(best[name], time.time() - t0)
            print(f"# pass {r} {name}: {round(time.time() - t0, 3)}s", file=sys.stderr)
        # session-aging control: ~95 queries/pass leave localCheckpoint
        # blocks and persisted frames whose release is GC-bound
        # (ContextCleaner); by pass 2 the accumulated executor storage
        # inflates unrelated queries ~1.3-2x (the r5 "uniform drift").
        # Deterministically drop the engine caches and nudge both GCs so
        # each pass starts from a clean heap.
        from blockchain_postgres_sync_spark.operators import encoding
        encoding.release_caches()
        gc.collect()
        spark._jvm.System.gc()
    timings = {name: round(v, 3) for name, v in best.items()}

    # train/serve split: serving legs over pre-trained models
    serve = serve_benchmarks(spark, sf_dir, runs=runs)

    # streaming path: synthesized updates from sf0.01's events table (fixed
    # size so the number is comparable across rounds regardless of bench SF)
    stream = stream_throughput(spark, "/root/testdata/sf0.01")

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "catalog_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "serve": serve,
        "stream": stream,
        "sf": sf,
        "runs_per_query": runs,
    }
    # full record to a file (survives any stdout truncation), full line for
    # humans, then a FINAL compact line — metric + stream + the
    # reference-surface timings — small enough that a tail-2000-chars log
    # collector always keeps a complete, parseable JSON object as the last
    # line of output
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f)
    print(json.dumps(full))
    print(json.dumps({
        "metric": "catalog_headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "runs_per_query": runs,
        "stream": stream,
        "serve": serve,
        "headline": {k: timings[k] for k in REF_SURFACE if k in timings},
        "full_queries_in": "BENCH_LOCAL.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
