#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Queries execute to completion via the no-op sink (full pipeline, no driver
collect overhead).  Each query runs BENCH_RUNS times (default 2) and reports
the minimum: the harness box runs periodic background jobs that can inflate a
single shot by up to 10x, and min-of-N is the standard steady-state estimator
under asymmetric noise (noise only ever adds time)."""

from __future__ import annotations

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
]


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
    timings = {name: round(v, 3) for name, v in best.items()}

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "catalog_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
