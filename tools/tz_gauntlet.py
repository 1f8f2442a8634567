"""Both-timezone driver-sim gauntlet in ONE command (round-7 verdict #7):

    python tools/tz_gauntlet.py [sf_dir] [--only q1,q2,...]

Runs tools/driver_sim.py twice — once with the driver JVM/session in UTC
(the default) and once under a hostile driver timezone (Asia/Tokyo via
DRIVER_SIM_TZ) — and fails if either pass fails.  The second pass is what
catches a timestamp query that bypasses the ``queries()`` wrapper's UTC
re-pin (round-5 lesson: raw-timestamp outputs like squash_blocks only
diverge under a non-UTC driver).

Each pass is a fresh subprocess because the timezone must be set before
the JVM forks (spark.driver.extraJavaOptions is ignored once the gateway
is up in local mode).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SIM = os.path.join(HERE, "driver_sim.py")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    passes = [("UTC (driver default)", None), ("Asia/Tokyo", "Asia/Tokyo")]
    for label, tz in passes:
        env = dict(os.environ)
        env.pop("DRIVER_SIM_TZ", None)
        if tz:
            env["DRIVER_SIM_TZ"] = tz
        if only:
            env["DRIVER_SIM_ONLY"] = only
        t0 = time.time()
        print(f"=== driver_sim pass: {label} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, SIM, *args], env=env
        )
        print(f"=== {label}: exit {proc.returncode} "
              f"({time.time() - t0:.0f}s) ===", flush=True)
        if proc.returncode != 0:
            print(f"FAILED under {label}")
            return proc.returncode
    print("BOTH TZ PASSES GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
