"""HLL cardinality sketch + MinHash-accuracy probe tests (round 10).

The HLL spec reference below is deliberately pure Python (hashlib md5 +
integer arithmetic) — the same role the pure-Python k-means/BPE references
play: the Spark plan, the DuckDB oracle, and this file must all land on
the IDENTICAL integers.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.operators import dedup, stats


def _py_hll(keys: set[str]) -> tuple[dict[int, int], int, int]:
    """Pure-Python HLL spec: registers, n_registers_set, estimate."""
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
        bucket, body = h % stats.HLL_M, h // stats.HLL_M
        if body == 0:
            rho = stats.HLL_RHO_MAX
        else:
            rho = 1
            while body % 2 == 0:
                rho += 1
                body //= 2
        regs[bucket] = max(regs.get(bucket, 0), rho)
    sp = sum(1 << (stats.HLL_SCALE - r) for r in regs.values())
    sinv = sp + (stats.HLL_M - len(regs)) * (1 << stats.HLL_SCALE)
    raw = stats._HLL_EST_NUM // (stats._HLL_EST_DEN * sinv)
    v = stats.HLL_M - len(regs)
    est = (
        stats.HLL_LC_TABLE[v - 1]
        if (2 * raw <= 5 * stats.HLL_M and v > 0)
        else raw
    )
    return regs, len(regs), est


def test_hll_matches_python_spec_raw_regime(spark):
    """5000 distinct keys (every register set → raw-estimator branch):
    registers and estimate equal the pure-Python spec, duplicates
    change nothing, and the estimate is within the ~3·1.04/sqrt(512)
    error band of the truth."""
    keys = [f"key-{i}" for i in range(5000)]
    df = spark.createDataFrame(
        [(k,) for k in keys + keys[:137]], ["k"]
    )
    regs = {
        (r["bucket"], r["reg"])
        for r in stats.hll_registers(df, "k").collect()
    }
    py_regs, py_nset, py_est = _py_hll(set(keys))
    assert regs == set(py_regs.items())
    row = stats.hll_cardinality(df, "k").collect()[0]
    assert (row["n_registers_set"], row["hll_est"]) == (py_nset, py_est)
    assert abs(row["hll_est"] - 5000) <= 5000 * 14 // 100


def test_hll_linear_counting_regime_and_groups(spark):
    """A 60-key group lands in the small-range regime (E_raw <= 5m/2 with
    zero registers) and must read straight out of the embedded LC table;
    grouping keeps per-group sketches independent."""
    rows = [("small", f"s-{i}") for i in range(60)] + [
        ("big", f"b-{i}") for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = {
        r["g"]: (r["n_registers_set"], r["hll_est"])
        for r in stats.hll_cardinality(df, "k", ["g"]).collect()
    }
    for g, keys in (
        ("small", {f"s-{i}" for i in range(60)}),
        ("big", {f"b-{i}" for i in range(4000)}),
    ):
        _, py_nset, py_est = _py_hll(keys)
        assert out[g] == (py_nset, py_est)
    # the small group really exercised the LC branch
    _, nset_small, est_small = _py_hll({f"s-{i}" for i in range(60)})
    assert est_small == stats.HLL_LC_TABLE[stats.HLL_M - nset_small - 1]


def test_hll_registers_merge_by_max(spark):
    """Partial sketches from disjoint halves union+max to exactly the
    whole-corpus registers — the property that makes the sketch safe to
    compute per partition / micro-batch / day and fold later."""
    keys = [f"m-{i}" for i in range(3000)]
    half_a = spark.createDataFrame([(k,) for k in keys[:1500]], ["k"])
    half_b = spark.createDataFrame([(k,) for k in keys[1500:]], ["k"])
    whole = spark.createDataFrame([(k,) for k in keys], ["k"])
    merged = (
        stats.hll_registers(half_a, "k")
        .unionByName(stats.hll_registers(half_b, "k"))
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    est_merged = stats.hll_estimate(merged).collect()[0]
    est_whole = stats.hll_estimate(
        stats.hll_registers(whole, "k")
    ).collect()[0]
    assert est_merged == est_whole


def test_minhash_probe_exact_on_identical_and_bounded(spark):
    """Identical documents estimate Jaccard 100 with zero error; every
    probe row keeps 0 <= est_x100 <= 100 and n_agree in [0, 12], and
    candidate pairs carry the exact Jaccard of their shingle sets."""
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "alpha beta gamma delta epsilon zeta eta iota"  # near-dup
    df = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, text_b), (4, "totally different words here")],
        ["doc_id", "text"],
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.minhash_jaccard_probe(df).collect()
    }
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert (r12["n_agree"], r12["est_x100"], r12["jaccard_x100"]) == (
        12,
        100,
        100,
    )
    assert r12["err_x100"] == 0
    for r in rows.values():
        assert 0 <= r["n_agree"] <= 12
        assert 0 <= r["est_x100"] <= 100
        assert r["err_x100"] == r["est_x100"] - r["jaccard_x100"]
    # the (1,3)/(2,3) near-dup pairs, if surfaced, must report the true
    # shingle Jaccard of the two texts (5 shared of 7 total -> 71)
    for pair in ((1, 3), (2, 3)):
        if pair in rows:
            assert rows[pair]["jaccard_x100"] == 71


def test_streaming_hll_registers_match_batch(spark):
    """hll_registers is stream-native as-is: the register build is a
    stateless map + a streaming max-aggregation (state bounded by
    HLL_M buckets per group, never by keys).  Two micro-batches in
    complete mode must land on exactly the batch registers — and
    therefore, via hll_estimate, on the identical estimate."""
    import shutil
    import tempfile

    keys = [(f"sk-{i % 700}",) for i in range(1200)]
    d = tempfile.mkdtemp(prefix="hll_stream_")
    try:
        batch_df = spark.createDataFrame(keys, ["k"])
        for i, lo in enumerate((0, 600)):
            spark.createDataFrame(keys[lo : lo + 600], ["k"]).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{d}/b{i}")
        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        q = (
            stats.hll_registers(stream, "k")
            .writeStream.format("memory")
            .queryName("hll_stream_regs")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT * FROM hll_stream_regs")
        want = stats.hll_registers(batch_df, "k")
        assert {(r["bucket"], r["reg"]) for r in got.collect()} == {
            (r["bucket"], r["reg"]) for r in want.collect()
        }
        assert (
            stats.hll_estimate(got).collect()
            == stats.hll_estimate(want).collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prefix_filtered_jaccard_equals_full_form(spark):
    """The AllPairs/PPJoin prefix-filter plan must land on EXACTLY the
    full-posting-expansion pair set at every threshold — the prefix
    theorem is lossless, so any divergence is a bug.  Checked on the
    sf0.001 corpus across thresholds (0.9 drops a boundary pair in the
    full form too — both forms must agree on that)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.3, 0.5, 0.8, 0.9):
        full = {
            (r["id_a"], r["id_b"], r["jaccard_x100"])
            for r in dedup.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        pre = {
            (r["id_a"], r["id_b"], r["jaccard_x100"])
            for r in dedup.ngram_jaccard_pairs_prefix(
                docs, threshold=t
            ).collect()
        }
        assert full == pre, (t, full ^ pre)
