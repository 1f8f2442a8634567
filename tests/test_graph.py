"""Unit tests for operators/graph.py (integer PageRank) and the new
round-8 in-row primitives (CDC chunk spans, exact quantiles).

The catalog oracle test covers the full queries against DuckDB; these pin
the SEMANTICS on hand-computable inputs so a refactor that still happens
to hash-match a synthetic corpus can't silently change meaning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_postgres_sync_spark.functions import text as T
from blockchain_postgres_sync_spark.operators import stats
from blockchain_postgres_sync_spark.operators.graph import pagerank


def test_pagerank_star_graph_exact(spark):
    # star: 1 is the hub, 2..4 leaves.  Hand-unrolled two iterations:
    #   iter1: hub  = 150000 + 850000*(3 * (1e6 div 1)) div 1e6 = 2700000
    #          leaf = 150000 + 850000*(1e6 div 3)       div 1e6 =  433333
    #   iter2: hub  = 150000 + 850000*(3 * 433333)      div 1e6 = 1254999
    #          leaf = 150000 + 850000*(2700000 div 3)   div 1e6 =  915000
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {
        r["node"]: (r["degree"], r["pagerank_x1e6"])
        for r in pagerank(pairs, iters=2).collect()
    }
    assert out[1] == (3, 1254999)
    assert out[2] == out[3] == out[4] == (1, 915000)


def test_pagerank_mass_is_conserved_approximately(spark):
    # a 4-cycle is regular: every node keeps exactly the initial score
    # (pr div deg is exact for deg=2 and 1e6 halves cleanly)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "id_a long, id_b long"
    )
    rows = pagerank(pairs, iters=3).collect()
    assert {r["pagerank_x1e6"] for r in rows} == {1_000_000}
    assert {r["degree"] for r in rows} == {2}


def _digests(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    staged = df.select(
        T.tokens(F.col("text")).alias("_t"),
        T.cdc_chunk_spans(F.col("text")).alias("_sp"),
    )
    row = staged.select(
        F.transform(
            "_sp",
            lambda s: F.md5(
                F.array_join(F.slice(F.col("_t"), s["start"], s["len"]), " ")
            ),
        ).alias("d")
    ).collect()[0]
    return row["d"]


def test_cdc_chunks_edit_locality(spark):
    # the CDC property fixed-stride chunking lacks: a one-token insertion
    # near the front re-digests only the chunk(s) whose 3-token boundary
    # windows see the edit; every later chunk digest survives verbatim
    base_tokens = [f"w{i}" for i in range(400)]
    base = " ".join(base_tokens)
    edited = " ".join(base_tokens[:3] + ["INSERTED"] + base_tokens[3:])
    d0, d1 = _digests(spark, base), _digests(spark, edited)
    assert len(d0) > 5  # the corpus actually chunks
    # every original chunk beyond the edit neighborhood is refound
    surviving = set(d0) & set(d1)
    assert len(surviving) >= len(d0) - 2


def test_cdc_chunks_cover_and_partition(spark):
    # spans partition 1..n: contiguous, non-overlapping, full coverage
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i % 13}" for i in range(100)))],
        "doc_id long, text string",
    )
    spans = df.select(
        T.cdc_chunk_spans(F.col("text")).alias("sp")
    ).collect()[0]["sp"]
    pos = 1
    for s in spans:
        assert s["start"] == pos
        assert s["len"] >= 1
        pos += s["len"]
    assert pos - 1 == 100


def test_cdc_short_doc_single_chunk(spark):
    assert _digests(spark, "only two") == [
        __import__("hashlib").md5(b"only two").hexdigest()
    ]


def test_exact_quantiles_disc_semantics(spark):
    # 1..10 in one group: percentile_disc picks the smallest value whose
    # cumulative count reaches ceil(q*n): p25->3, p50->5, p75->8, p95->10
    df = spark.createDataFrame(
        [("g", v) for v in range(1, 11)], "lang string, v long"
    )
    row = stats.exact_quantiles(df, "v", ["lang"]).collect()[0]
    assert (row["n_rows"], row["p25"], row["p50"], row["p75"], row["p95"]) \
        == (10, 3, 5, 8, 10)


def test_exact_quantiles_ties_and_nulls(spark):
    # ties collapse into one (group, value) count row; nulls are excluded
    data = [("g", 1)] * 5 + [("g", 2)] * 5 + [("g", None)]
    df = spark.createDataFrame(data, "lang string, v long")
    row = stats.exact_quantiles(df, "v", ["lang"]).collect()[0]
    assert (row["n_rows"], row["p25"], row["p50"], row["p95"]) == (10, 1, 1, 2)


def test_bloom_prefilter_no_false_negatives(spark):
    from blockchain_postgres_sync_spark.operators import contamination as C

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # exact bench copy
            (11, "qq ww ee rr tt yy uu ii oo pp"),        # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in C.bloom_prefilter(corpus, bench).collect()
    }
    # a verbatim benchmark copy can NEVER pass the prefilter unflagged
    assert out[10]["maybe_x100"] == 100
    assert out[10]["n_maybe"] == out[10]["n_shingles"]
    assert out[11]["n_shingles"] == 8


def test_bloom_bitmap_is_bounded(spark):
    from blockchain_postgres_sync_spark.operators import contamination as C

    bench = spark.range(200).select(
        F.col("id").alias("bench_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"t{i}_"), F.col("id")) for i in range(12)],
        ).alias("text"),
    )
    bitmap = C.bloom_bitmap(bench)
    assert bitmap.count() <= C.BLOOM_WORDS


def test_cms_never_undercounts_and_merges(spark):
    from blockchain_postgres_sync_spark.operators import stats as S

    toks = spark.createDataFrame(
        [(t,) for t in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]],
        "token string",
    )
    sketch = S.cms_build(toks)
    assert sketch.count() <= S.CMS_DEPTH * S.CMS_WIDTH
    q = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)],
                              "token string")
    est = {r["token"]: r["cms_count"]
           for r in S.cms_estimate(sketch, q).collect()}
    # upper-bound estimator: never below the true count
    for tok, true in [("a", 50), ("b", 20), ("c", 5), ("d", 1), ("zz", 0)]:
        assert est[tok] >= true
    # cells merge by addition: sketch(half1) + sketch(half2) == sketch(all)
    h1 = S.cms_build(toks.filter(F.col("token").isin("a", "c")))
    h2 = S.cms_build(toks.filter(~F.col("token").isin("a", "c")))
    merged = (
        h1.unionAll(h2).groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["row"], r["col"]): r["cnt"] for r in sketch.collect()}
    got = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    assert got == full


def test_zorder_improves_minmax_pruning(spark):
    """The point of Z-order: range-bucketing by the interleaved key keeps
    BOTH dimensions' per-bucket min/max ranges narrow, where single-column
    sorting leaves the other dimension full-width (so min/max file pruning
    on it skips nothing)."""
    from blockchain_postgres_sync_spark.operators import layout as L

    n, buckets = 4096, 16
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 4096).alias("x"),
        (F.col("id") * 40503 % 4096).alias("y"),
    )
    zk = L.zorder_key(F.col("x"), F.col("y"), bits=12)
    # bucket by z-key range vs by x alone (ntile = range partitioner stand-in)
    from pyspark.sql import Window

    def avg_y_span(bucket_col):
        spans = (
            df.withColumn("_b", bucket_col)
            .groupBy("_b")
            .agg((F.max("y") - F.min("y")).alias("span"))
            .agg(F.avg("span").alias("s"))
            .collect()[0]["s"]
        )
        return spans

    z_b = F.ntile(buckets).over(Window.orderBy(zk))
    x_b = F.ntile(buckets).over(Window.orderBy(F.col("x")))
    y_span_z = avg_y_span(z_b)
    y_span_x = avg_y_span(x_b)
    # under x-sort, y stays ~full-range per bucket; z-order at least halves it
    assert y_span_z < y_span_x / 2
    # and the key math itself: interleave of known values
    row = spark.range(1).select(
        L.zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("k")
    ).collect()[0]
    # a=101 -> bits at odd positions: 1_0_1_ -> 100010; b=011 -> _0_1_1 -> 000101
    assert row["k"] == 0b100111


def test_pagerank_bucketed_edges(spark, tmp_path):
    """pagerank_from_edges over a src-BUCKETED edge table: the bucket
    spec survives AQE (unlike a repartition-before-localCheckpoint, whose
    LogicalRDD partitioning AQE discards — measured 22 exchanges either
    way), so every iteration's edge-side join reads co-located buckets
    and only the rank frame shuffles.  Pin: values identical to the
    in-memory form AND the bucketed plan carries fewer shuffle exchanges."""
    from blockchain_postgres_sync_spark.operators.graph import (
        pagerank_from_edges,
    )
    from blockchain_postgres_sync_spark.sources.bucketed import (
        read_bucketed, write_bucketed,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (2, 6), (3, 6)],
        "id_a long, id_b long",
    )
    expected = sorted(map(tuple, pagerank(pairs, iters=4).collect()))

    edges = pairs.selectExpr("id_a AS src", "id_b AS dst").unionAll(
        pairs.selectExpr("id_b AS src", "id_a AS dst")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").select("src", "dst", "deg")
    n_shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed(edges_deg, "pr_edges_b", ["src"], n_shuf,
                   sort_cols=["src"], path=str(tmp_path / "pr_edges_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = pagerank_from_edges(
            read_bucketed(spark, "pr_edges_b"), iters=4
        )
        got = sorted(map(tuple, bucketed.collect()))
        assert got == expected
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        n_bucketed = plan.count("Exchange hashpartitioning")

        mem = pagerank_from_edges(edges_deg.localCheckpoint(eager=False),
                                  iters=4)
        mem.write.format("noop").mode("overwrite").save()
        n_mem = mem._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )
        assert n_bucketed < n_mem, (n_bucketed, n_mem)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pr_edges_b")
