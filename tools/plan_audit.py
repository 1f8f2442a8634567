"""Physical-plan audit: dump the formatted EXPLAIN of every headline query
plus a red-flag scan (row-wise Python, cartesian products, oversized
exchanges, missing pushdown) into PLANS.md.

Evidence artifact for plan-quality review without re-running the engine:
each query section shows the operator tree Spark actually schedules at
bench SF, and the summary table counts the structural properties the
plan-shape tests (tests/test_plans.py) pin individually.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_postgres_sync_spark.plans.catalog import CATALOG  # noqa: E402
from blockchain_postgres_sync_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"

RED_FLAGS = {
    "BatchEvalPython": "row-wise Python UDF in plan",
    "CartesianProduct": "unconstrained cartesian product",
    "BroadcastNestedLoopJoin": "nested-loop join (non-equi fallback)",
}

#: flags that are deliberate in specific queries (reviewed, documented at
#: the operator): the brute-force ANN baseline IS a scored cross product
#: (queries side broadcasts); IVF attaches the broadcast one-row centroid
#: codebook to every corpus row before the in-row argmax.
BY_DESIGN = {
    ("ann_bruteforce", "BroadcastNestedLoopJoin"):
        "by design: broadcast query side × corpus (exact baseline)",
    ("ann_ivf", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("ann_ivf_recall", "BroadcastNestedLoopJoin"):
        "by design: brute-force baseline's broadcast query side "
        "(bounded query sample); the recall join itself is equi",
    ("ann_lsh_recall", "BroadcastNestedLoopJoin"):
        "by design: brute-force baseline's broadcast query side "
        "(bounded query sample); the recall join itself is equi",
    ("ann_ivf_learned", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("token_vocab", "BroadcastNestedLoopJoin"):
        "by design: triangular offsets join over the rank-partition-count "
        "dimension (<= rank_partitions rows, broadcast)",
    ("token_encode", "BroadcastNestedLoopJoin"):
        "by design: same triangular offsets join inside build_vocab",
    ("tfidf_vectorize", "BroadcastNestedLoopJoin"):
        "by design: same triangular offsets join inside build_vocab",
    ("tfidf_rerank", "BroadcastNestedLoopJoin"):
        "by design: same triangular offsets join inside build_vocab "
        "(vectors side)",
    ("unigram_logprob", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast corpus-total attach (no shuffle, "
        "never a driver collect)",
    ("mixture_plan", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast source-count attach (no shuffle, "
        "never a driver collect)",
    ("dsir_weights", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast corpus-totals attach (no shuffle, "
        "never a driver collect)",
    ("centroid_assign", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("label_confusion", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("label_purity", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("semantic_dedup", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("curated_training_corpus", "BroadcastNestedLoopJoin"):
        "by design: one-row broadcast codebook attach (no shuffle)",
    ("ann_pq", "BroadcastNestedLoopJoin"):
        "by design: broadcast per-query ADC LUTs (bounded query batch) "
        "x encoded corpus — the PQ serving scan",
    ("ann_pq_recall", "BroadcastNestedLoopJoin"):
        "by design: brute-force baseline's broadcast query side (bounded "
        "query sample) + the ADC LUT broadcast; the recall join is equi",
    ("ann_pq_mrr", "BroadcastNestedLoopJoin"):
        "by design: brute-force baseline's broadcast query side (bounded "
        "query sample) + the ADC LUT broadcast; the MRR joins are equi",
    ("ann_ivfpq_recall", "BroadcastNestedLoopJoin"):
        "by design: brute-force baseline's broadcast query side (bounded "
        "query sample); every IVF+PQ-side join is equi",
}
GREEN_MARKS = {
    "BroadcastHashJoin": "broadcast joins",
    "PushedFilters: [I": "parquet filter pushdown",
    "WholeStageCodegen": "codegen spans",
}


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows = []
    sections = []
    for name in sorted(CATALOG):
        df = CATALOG[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        flags = [
            BY_DESIGN.get((name, pat), msg)
            for pat, msg in RED_FLAGS.items()
            if pat in plan
        ]
        # formatted mode prints shuffle nodes as "Exchange (n)" (broadcasts
        # as "BroadcastExchange (n)" — not counted: they move dimension-sized
        # data only)
        import re

        exch = len(re.findall(r"[+:]- Exchange \(", plan))
        rows.append((name, exch, "; ".join(flags) if flags else "—"))
        sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
    with open(OUT, "w") as f:
        f.write(
            "# Physical plans (initial, pre-AQE) — generated by "
            "tools/plan_audit.py\n\n"
            f"Scale factor dir: `{SF_DIR}`.  AQE re-plans exchanges at "
            "runtime (coalescing, skew splits, exchange reuse), so runtime "
            "stage counts are at most these.\n\n"
            "| query | hash exchanges | red flags |\n|---|---|---|\n"
        )
        for name, exch, flags in rows:
            f.write(f"| {name} | {exch} | {flags} |\n")
        f.write("\n")
        f.writelines(sections)
    flagged = [r for r in rows if r[2] != "—"]
    print(f"wrote {OUT}: {len(rows)} queries, {len(flagged)} with red flags")
    for name, _, flags in flagged:
        print(f"  FLAG {name}: {flags}")
    spark.stop()


if __name__ == "__main__":
    main()
