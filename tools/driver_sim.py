"""Driver simulation — verifies the external-driver contract of
``__spark_entry__.py`` exactly as the skill recipe specifies:

- VANILLA SparkSession (no engine configs; the driver won't have them)
- run ``entry(spark)`` and every ``queries()[name](spark, sf_dir)``
- compare against ``oracle_sql()[name]`` through DuckDB over the same
  parquet tables
- columns: sorted names equal; rows: canonicalized (cols sorted by name,
  floats via repr, None sentinel), sorted, equal.

Usage: python tools/driver_sim.py [sf_dir]  (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import os
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_rows(cols, rows):
    """Canonicalize result rows THROUGH PANDAS, mirroring the external
    driver's gate: the driver builds a pandas frame, sorts columns by name,
    then multi-column ``sort_values`` before value-hashing.  pandas'
    multi-key sort factorizes (hashes) every cell — an ArrayType output
    column therefore raises ``TypeError: unhashable type: 'list'`` in the
    REAL gate.  Round 6 shipped three such queries green locally because
    this function sorted pure-Python tuples (lists compare fine); now the
    sim crashes exactly where the driver does (round-6 verdict item #3).

    The returned value keeps the old deterministic string-tuple form (the
    pandas sort order itself is irrelevant — only its type constraints are
    being replicated), so spark-vs-oracle comparison semantics are
    unchanged for scalar outputs.
    """
    import pandas as pd

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ocols = [cols[i] for i in order]
    pdf = pd.DataFrame(
        [tuple(r[i] for i in order) for r in rows], columns=ocols
    )
    if len(pdf):
        # replicate the driver's multi-column sort (factorize path hashes
        # each cell; unhashable cells raise here, as in the real gate)
        pdf.sort_values(ocols, kind="stable")

    def cv(v):
        if v is None:
            return "\x00NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    return sorted(tuple(cv(r[i]) for i in order) for r in rows)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.master("local[8]")
               .appName("driver-sim"))
    # non-UTC probe (verify-skill recipe): DRIVER_SIM_TZ=Asia/Tokyo runs the
    # whole sim under a hostile driver timezone — the queries() wrapper's
    # UTC re-pin is what must keep timestamp queries green
    tz = os.environ.get("DRIVER_SIM_TZ")
    if tz:
        builder = (builder
                   .config("spark.driver.extraJavaOptions",
                           f"-Duser.timezone={tz}")
                   .config("spark.sql.session.timeZone", tz))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as E

    t0 = time.time()
    edf = E.entry(spark)
    n = edf.count()
    print(f"entry(): OK rows={n} cols={edf.columns} "
          f"({time.time() - t0:.1f}s)", flush=True)

    qs, orc = E.queries(), E.oracle_sql()
    only = os.environ.get("DRIVER_SIM_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    failures = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = canon_rows(sdf.columns, sdf.collect())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {exc}", flush=True)
            continue
        if name not in orc:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only)",
                  flush=True)
            continue
        try:
            cur = con.execute(orc[name])
            ocols = sorted(d[0] for d in cur.description)
            orows = canon_rows([d[0] for d in cur.description],
                               cur.fetchall())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error {exc}", flush=True)
            continue
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}",
                  flush=True)
        elif srows != orows:
            failures.append(name)
            diff = next((i for i, (a, b) in enumerate(zip(srows, orows))
                         if a != b), min(len(srows), len(orows)))
            print(f"FAIL {name}: rows spark={len(srows)} "
                  f"oracle={len(orows)} first-diff@{diff}", flush=True)
            if diff < len(srows):
                print(f"  spark : {srows[diff]}", flush=True)
            if diff < len(orows):
                print(f"  oracle: {orows[diff]}", flush=True)
        else:
            print(f"PASS {name}: rows={len(srows)} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print(f"\nALL {len(qs)} queries match oracle at {SF_DIR}")


if __name__ == "__main__":
    main()
