"""Scale-validation run (round-7 verdict item #6): engine vs DuckDB on the
same queries at two scale factors, to TEST (not assert) the "Spark's
per-query floor amortizes at scale" argument used to waive small-query
ratios.  A query whose engine/DuckDB ratio GROWS from sf0.1 to sf1 has a
plan problem; one whose ratio shrinks is floor-dominated as claimed.

Usage:
    python tools/scale_check.py [sf_a] [sf_b] [out_json]
    # defaults: /root/testdata/sf0.1  /root/repo/.localdata/sf1
    #           (generate sf_b first: python tools/gen_sf.py)

Methodology matches BASELINE.md: Spark = min-of-2 noop writes on a warm
local[32] session (engine configs, cache release between passes); DuckDB
= min-of-2 of CREATE TEMP TABLE AS <oracle SQL> (full materialization
INSIDE DuckDB — fetchall converts multi-million-row results to Python
tuples and times the conversion, not the engine; the noop write on the
Spark side doesn't convert either), 32 threads, one fresh subprocess per
query with a hard timeout (an oracle that cannot finish at sf1 records
null — the engine number still prints).
Run SOLO: concurrent JVMs contaminate timings.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_A = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF_B = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_check.json"
DUCK_TIMEOUT = int(os.environ.get("SCALE_DUCK_TIMEOUT", "600"))
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

#: the structural queries the round-7 verdict names, plus one
#: representative per remaining family (ref-surface agg/join, dedup,
#: shingle, tf-idf, spans, stats, packing, ANN, TPC-ish)
SCALE_SET = [
    "candles_1m", "candles_cascade", "scd2_chain", "lookup_join",
    "assets_view", "pricing_summary", "top_orders", "small_qty_revenue",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding", "dedup_clusters", "soft_dedup_weights",
    "ngram_jaccard", "contamination", "shingle_novelty",
    "repeated_spans", "scrub_repeated_spans", "boilerplate_scrub",
    "tfidf_vectorize", "tfidf_rerank", "token_encode",
    "quality_auc", "difficulty_buckets", "bigram_lift",
    "pack_concat", "pack_greedy", "doc_chunks",
    "ann_lsh", "ann_ivf", "bpe_encode_pieces",
    # round-8 additions
    "pagerank_sim", "cdc_chunks", "cdc_dedup", "bloom_prefilter",
    "cms_heavy_hitters", "quantile_summary", "zorder_layout",
    # round-9 additions (verdict item #6): the PQ family (train+encode+
    # serve in one query), the multimodal real-codec paths, and the
    # entropy-scoring family (re-implemented on the Arrow entropy kernel
    # this round — the sweep guards the new path's scaling)
    "pq_encode", "ann_pq", "ann_ivfpq",
    "media_image_real", "media_audio_real", "media_frame_sample",
    "char_entropy", "quality_score", "corpus_curation",
    "curated_training_corpus",
    # round-10 additions: the new operator families (keyless capped range
    # join, winnowing fingerprints, OOV coverage, integer PCA)
    "range_join", "winnow_fingerprints", "vocab_coverage", "pca_project",
]

_DUCK_WORKER = r"""
import json, os, sys, time
import duckdb
sf_dir, names_json, timeout = sys.argv[1], sys.argv[2], float(sys.argv[3])
sys.path.insert(0, %(repo)r)
from blockchain_postgres_sync_spark.plans.catalog import ORACLES
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
# a quadratic oracle (brute-force pair join at sf1) must ERROR, not fill
# the disk: dedup_embedding's sf1 oracle spilled 80 GB before this cap
con.execute("SET max_temp_directory_size='20GB'")
for t in %(tables)r:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
out = {}
deadline = time.time() + timeout
for name in json.loads(names_json):
    if time.time() > deadline:
        out[name] = None
        continue
    best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(
            "CREATE OR REPLACE TEMP TABLE _scale_r AS (" + ORACLES[name]
            + ")")
        dt = time.time() - t0
        con.execute("DROP TABLE _scale_r")
        best = dt if best is None else min(best, dt)
        if time.time() > deadline:
            break
    out[name] = round(best, 3)
    print(f"duck {name}: {out[name]}", file=sys.stderr, flush=True)
print(json.dumps(out))
"""


def duck_times(sf_dir: str, names: list[str]) -> dict[str, float | None]:
    """One subprocess PER QUERY so a single runaway oracle (BPE at sf1)
    times out alone instead of starving the rest."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _DUCK_WORKER % {"repo": here, "tables": TABLES}
    out: dict[str, float | None] = {}
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", script, sf_dir,
                 json.dumps([name]), str(DUCK_TIMEOUT)],
                capture_output=True, text=True, timeout=DUCK_TIMEOUT + 60,
            )
            got = json.loads(proc.stdout.strip().splitlines()[-1])
            out[name] = got.get(name)
        except Exception as exc:  # noqa: BLE001 timeout / crash -> null
            print(f"duck {name}: TIMEOUT/ERR ({type(exc).__name__})",
                  flush=True)
            out[name] = None
        print(f"duck {name} @ {sf_dir}: {out[name]}", flush=True)
    return out


def spark_times(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    import gc

    from blockchain_postgres_sync_spark.operators import encoding
    from blockchain_postgres_sync_spark.plans.catalog import CATALOG

    best = {n: float("inf") for n in names}
    for _ in range(2):
        for n in names:
            # measurement isolation: a predecessor's dead shuffle/agg
            # buffers (e.g. ngram_jaccard's ~95M-pair hash agg at sf1)
            # otherwise tax the NEXT query's HOF-heavy stages 2-4x
            # (measured: contamination 18.4 s after jaccard without the
            # gc, 10.9 s with it) — per-query gc makes the number a
            # property of the PLAN, not of sweep ordering
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.time()
            CATALOG[n](spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
            best[n] = min(best[n], time.time() - t0)
            print(f"spark {n} @ {sf_dir}: {round(time.time() - t0, 3)}",
                  flush=True)
        encoding.release_caches()
    return {n: round(v, 3) for n, v in best.items()}


def main() -> None:
    from blockchain_postgres_sync_spark.session import get_spark

    spark = get_spark(app_name="scale-check")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # warm-up
    spark.read.parquet(f"{SF_A}/nation.parquet").groupBy(
        "n_regionkey").count().write.mode("overwrite").format("noop").save()

    result: dict[str, dict] = {}
    eng_a = spark_times(spark, SF_A, SCALE_SET)
    eng_b = spark_times(spark, SF_B, SCALE_SET)
    # streaming volume scaling (round-9 verdict item #6): same 50-block /
    # 5-trigger feed shape at 1x and 10x events-per-block — per-trigger
    # overhead dominates the stream leg, so events/sec must GROW roughly
    # with batch size if per-event cost is truly marginal; a flat or
    # falling ev/s at 10x would mean per-event work is the bottleneck.
    import bench as _bench

    stream = {
        "x1": _bench.stream_throughput(
            spark, SF_A, n_events=10_000, per_block=200
        ),
        "x10": _bench.stream_throughput(
            spark, SF_A, n_events=100_000, per_block=2_000
        ),
    }
    spark.stop()
    duck_a = duck_times(SF_A, SCALE_SET)
    duck_b = duck_times(SF_B, SCALE_SET)

    for n in SCALE_SET:
        ra = (eng_a[n] / duck_a[n]) if duck_a.get(n) else None
        rb = (eng_b[n] / duck_b[n]) if duck_b.get(n) else None
        result[n] = {
            "spark_a": eng_a[n], "duck_a": duck_a.get(n),
            "ratio_a": round(ra, 2) if ra else None,
            "spark_b": eng_b[n], "duck_b": duck_b.get(n),
            "ratio_b": round(rb, 2) if rb else None,
            "ratio_trend": (
                "GROWS" if ra and rb and rb > ra * 1.2
                else ("shrinks" if ra and rb and rb < ra * 0.8 else "flat")
            ) if ra and rb else "n/a",
        }
    with open(OUT, "w") as f:
        json.dump({"sf_a": SF_A, "sf_b": SF_B, "queries": result,
                   "stream_volume_scaling": stream}, f, indent=1)
    print(json.dumps({"out": OUT, "grows": [
        n for n, r in result.items() if r["ratio_trend"] == "GROWS"
    ]}))


if __name__ == "__main__":
    main()
