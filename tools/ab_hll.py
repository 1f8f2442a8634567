"""Interleaved A/B for hll_cardinality (round-10 session 7).

`cur` = shipped form: both legs over ONE shared distinct (lang, shingle)
frame (kernel + explode + corpus scan once, AQE stage reuse).
`old` = pre-session form kept inline: est leg re-runs the shingle kernel
on its own scan, exact leg countDistinct on another.

Run: python tools/ab_hll.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import functions as F  # noqa: E402

from blockchain_postgres_sync_spark.session import get_spark  # noqa: E402
from blockchain_postgres_sync_spark.functions import text as T  # noqa: E402
from blockchain_postgres_sync_spark.operators import stats  # noqa: E402
from blockchain_postgres_sync_spark.plans.catalog import CATALOG  # noqa: E402
from blockchain_postgres_sync_spark.sources.tables import load_table  # noqa: E402

spark = get_spark(app_name="ab_hll")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def v_cur():
    return CATALOG["hll_cardinality"](spark, SF)


def v_old():
    docs = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    sh = docs.select(
        "lang", F.explode(T.token_shingles(F.col("text"))).alias("shingle")
    )
    est = stats.hll_cardinality(sh, "shingle", ["lang"])
    exact = sh.groupBy("lang").agg(F.countDistinct("shingle").alias("n_exact"))
    return exact.join(est, "lang").select(
        "lang",
        "n_exact",
        "n_registers_set",
        "hll_est",
        F.expr("(abs(hll_est - n_exact) * 10000) div n_exact")
        .cast("long")
        .alias("err_x10000"),
    )


cur = {tuple(r) for r in v_cur().collect()}
old = {tuple(r) for r in v_old().collect()}
assert cur == old, f"VALUE MISMATCH ({len(cur)} vs {len(old)})"
print(f"parity OK ({len(cur)} rows identical)")

times = {"cur": [], "old": []}
for r in range(REPS):
    for tag, fn in (("cur", v_cur), ("old", v_old)):
        sc.setJobDescription(f"ab_hll {tag}")
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        sc.setJobDescription(None)
        times[tag].append(dt)
        print(f"pass {r} {tag:4s} {dt:6.2f}s", flush=True)

for tag, ts in times.items():
    print(f"{tag:4s} min={min(ts):.2f}  all={[round(t, 2) for t in ts]}")
