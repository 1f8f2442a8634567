"""Interleaved A/B for minhash_jaccard_probe variants (round-10 session 7).

The shipped form re-evaluates the minhash Arrow kernel in THREE stages
(pair branch + signature side A + signature side B) and the shingle-set
projection in TWO, because no exchange sits above either computation for
AQE stage reuse to dedupe (the kernels are ABOVE the scan fan-out
exchange, so reusing that exchange still re-runs the kernel per consumer
stage).  Variant `shared` hoists an id-hash repartition above the
signature kernel and the shingle-set projection — the same partitioning
the id-keyed joins need anyway — so both become ONE reused stage each.

Signature-kernel output is TINY (id + 12 longs per doc), so the hoisted
exchange ships ~100 bytes/doc; the shingle-set exchange ships the
distinct 3-gram hash array (~text-sized) that the exact-Jaccard joins
would exchange per side at cluster scale anyway.

After adoption the roles flipped: `cur` calls the SHIPPED operator
(now the shared-stage form, plus the id-not-null filter that aligns the
banding branch's canonical plan with the join sides) and `old` is the
pre-round form kept inline for regression re-runs.

Run: python tools/ab_minhash_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from blockchain_postgres_sync_spark.session import get_spark  # noqa: E402
from blockchain_postgres_sync_spark.operators import dedup  # noqa: E402
from blockchain_postgres_sync_spark.functions.text import (  # noqa: E402
    hashed_token_shingles,
)

spark = get_spark(app_name="ab_minhash_probe")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

NUM_HASHES, SHINGLE, BANDS = 12, 3, 4


def load_docs():
    from blockchain_postgres_sync_spark.sources.tables import load_table

    return load_table(spark, SF, "documents")


def v_cur(df: DataFrame) -> DataFrame:
    return dedup.minhash_jaccard_probe(
        df, num_hashes=NUM_HASHES, shingle_size=SHINGLE, bands=BANDS
    )


def v_old(df: DataFrame) -> DataFrame:
    id_col, text_col, num_hashes = "doc_id", "text", NUM_HASHES
    sigs = dedup.minhash_signatures(
        df, id_col, text_col, num_hashes, SHINGLE
    )
    pairs = dedup.lsh_candidate_pairs(sigs, id_col, num_hashes, BANDS)
    a = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh_{j}").alias(f"_a{j}") for j in range(num_hashes)],
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh_{j}").alias(f"_b{j}") for j in range(num_hashes)],
    )
    agree_terms = [
        (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int")
        for j in range(num_hashes)
    ]
    agree = agree_terms[0]
    for t in agree_terms[1:]:
        agree = agree + t
    est = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", agree.cast("long").alias("n_agree"))
    )
    sets = df.select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(
            hashed_token_shingles(F.col(text_col), SHINGLE)
        ).alias("_shs"),
    )
    a_sets = sets.select(
        F.col("_sid").alias("id_a"), F.col("_shs").alias("_sa")
    )
    b_sets = sets.select(
        F.col("_sid").alias("id_b"), F.col("_shs").alias("_sb")
    )
    n_inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    n_union = F.size("_sa") + F.size("_sb") - n_inter
    return (
        est.join(a_sets, "id_a")
        .join(b_sets, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.expr(f"(100 * n_agree) div {num_hashes}")
            .cast("long")
            .alias("est_x100"),
            F.floor(
                n_inter.cast("double") * 100.0 / n_union.cast("double")
            )
            .cast("long")
            .alias("jaccard_x100"),
        )
        .withColumn(
            "err_x100",
            (F.col("est_x100") - F.col("jaccard_x100")).cast("long"),
        )
    )


def run(tag, fn, docs):
    sc.setJobDescription(f"ab_minhash_probe {tag}")
    j0 = sc._jsc.sc().statusStore().jobsList(None).size()
    t0 = time.monotonic()
    fn(docs).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    jobs = sc._jsc.sc().statusStore().jobsList(None).size() - j0
    sc.setJobDescription(None)
    return dt, jobs


def parity(docs):
    cur = {tuple(r) for r in v_cur(docs).collect()}
    new = {tuple(r) for r in v_old(docs).collect()}
    assert cur == new, (
        f"VALUE MISMATCH: cur={len(cur)} rows, old={len(new)} rows, "
        f"sym-diff={len(cur ^ new)}"
    )
    print(f"parity OK ({len(cur)} rows identical)")


docs = load_docs()
parity(docs)

times: dict[str, list[float]] = {"cur": [], "old": []}
for r in range(REPS):
    for tag, fn in (("cur", v_cur), ("old", v_old)):
        dt, jobs = run(tag, fn, docs)
        times[tag].append(dt)
        print(f"pass {r} {tag:7s} {dt:6.2f}s  jobs={jobs}", flush=True)

for tag, ts in times.items():
    print(f"{tag:7s} min={min(ts):.2f}  all={[round(t, 2) for t in ts]}")
