"""Round-10 optimization profiler: isolated per-query measurement.

For each named catalog query at $SPARK_GRAFT_SF_DIR (default sf0.1):
- run RUNS times (construction + noop sink, exactly the bench's timed
  region — guide §1.4), report min seconds;
- count Spark jobs the query launches (AppStatusStore delta on the first
  run) — the driver-round-trip floor that dominates small-SF timings;
- dump ``explain("formatted")`` to plans/r10/<query>_<tag>.txt.

Usage: python tools/profile_r10.py <tag> [query ...]
       (no query args = the full bench HEADLINE list)
Output: one JSON line per query to stdout + /tmp/profile_<tag>.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_postgres_sync_spark.plans.catalog import CATALOG  # noqa: E402
from blockchain_postgres_sync_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)


def _n_jobs(sc) -> int:
    return sc._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    if not NAMES:
        from bench import HEADLINE
        names = list(HEADLINE)
    else:
        names = NAMES
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name=f"profile_{TAG}")
    sc = spark.sparkContext
    # warm the JVM out-of-band
    spark.read.parquet(f"{SF_DIR}/nation.parquet").groupBy("n_regionkey").count() \
        .write.mode("overwrite").format("noop").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = CATALOG[name]
        sc.setJobDescription(f"profile:{name}")
        best, jobs = float("inf"), -1
        df = None
        for r in range(RUNS):
            n0 = _n_jobs(sc)
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = min(best, dt)
            if r == 0:
                jobs = _n_jobs(sc) - n0
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(plan)
        except Exception as e:  # noqa: BLE001
            print(f"# explain failed for {name}: {e}", file=sys.stderr)
        out[name] = {"sec": round(best, 3), "jobs_first_run": jobs}
        print(json.dumps({"query": name, **out[name]}), flush=True)
        sc.setJobDescription(None)
    with open(f"/tmp/profile_{TAG}.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
