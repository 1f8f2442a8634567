"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark catalog query and its oracle SQL on the same parquet tables,
then compares row count, column names, and an order-insensitive value
representation (columns sorted by name, rows sorted by their full tuple).
"""

from __future__ import annotations

import math

import duckdb

from blockchain_postgres_sync_spark.schemas import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_arrow_table()


def _canon(value):
    if value is None:
        return "<NULL>"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(value)
    return str(value)


def canonical_rows(names: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_names = list(spark_df.columns)
    o_tab = run_oracle(oracle_sql, sf_dir)
    o_names = list(o_tab.column_names)
    o_rows = list(zip(*[col.to_pylist() for col in o_tab.columns])) if o_tab.num_rows else []

    if sorted(s_names) != sorted(o_names):
        problems.append(f"columns differ: spark={sorted(s_names)} oracle={sorted(o_names)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    sc = canonical_rows(s_names, s_rows)
    oc = canonical_rows(o_names, o_rows)
    if sc != oc:
        diff_s = [r for r in sc if r not in set(oc)][:5]
        diff_o = [r for r in oc if r not in set(sc)][:5]
        problems.append(
            f"values differ; spark-only sample={diff_s} oracle-only sample={diff_o}"
        )
    return problems
