"""Benchmark-contamination detection and cross-document shingle novelty.

Standard LLM training-data hygiene operators beyond the reference's own
surface (the reference's closest analog is its tsvector name search,
migrations/.../up.sql:703-705 — token-level containment over a corpus):

- ``benchmark_contamination``: for each corpus document, the benchmark
  document with the highest n-gram containment (|doc ∩ bench| / |doc|) —
  the decontamination primitive (drop corpus docs that "contain" an eval
  set item).
- ``shingle_novelty``: per document, how many of its shingles also occur
  in other documents — the inter-document repetition signal used for
  boilerplate pruning.

Plan shapes (100 TB posture):
- contamination: the benchmark side is small by definition (an eval set) —
  its posting list (one row per shingle carrying the ARRAY of bench ids)
  BROADCASTS; the corpus streams map-side through one explode +
  broadcast-hash-join, then ONE doc-keyed shuffle collects each doc's
  matched bench-id arrays (flattened + sorted in-row) and an in-row
  run-length fold finds the max-containment bench (round-8 forms: the
  per-(doc, bench) hash agg had ~|pairs| distinct keys — nothing combined
  map-side — and fed a second |pairs|-row shuffle, sf1 A/B 29.4 -> 13.3 s;
  carrying bench-id ARRAYS through the join instead of exploded bench rows
  cut the shuffle row count ~12x on a dense shingle space, 12.7 -> 9.2 s).
  No corpus self-join anywhere.
- novelty: ONE groupBy(shingle) builds posting counts, then doc stats come
  from re-exploding the grouped ids — same single-exchange re-use trick as
  ngram_jaccard_pairs (operators/dedup.py), no shingle join back to docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hashed_token_shingles, token_shingles

#: lazy cache for the containment argmax kernel (pandas_udf creation is
#: deferred so importing this module never requires an active session)
_ARGMAX_UDF = None


def _containment_argmax_udf(bids: Column) -> Column:
    """Arrow-batched argmax over a doc's (unsorted) matched bench-id list:
    returns ``struct(bid, blen)`` — the bench id with the most shared
    shingles, smallest id on ties (np.unique sorts; the first count-argmax
    is therefore the smallest id with the max count — exactly the old
    sorted-fold's strict-'>' semantics)."""
    global _ARGMAX_UDF
    if _ARGMAX_UDF is None:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        # NOTE: no type annotations on the kernel — this module has
        # `from __future__ import annotations`, which stringifies hints
        # and breaks pandas_udf's eval-type inference; the returnType
        # argument below fully determines the UDF type.
        def kernel(arrs):
            out_b, out_n = [], []
            for arr in arrs:
                a = np.asarray(arr, dtype=np.int64)
                u, c = np.unique(a, return_counts=True)
                i = int(c.argmax())
                out_b.append(int(u[i]))
                out_n.append(int(c[i]))
            return pd.DataFrame({"bid": out_b, "blen": out_n})

        # asNondeterministic is a lie about the (bit-deterministic,
        # parity-pinned) kernel told to stop guide-§4.4 duplication: the
        # min-containment filter references the kernel's struct output,
        # and pushing it below the final projection re-ran the argmax on
        # every doc row — plan showed kernel -> Filter -> kernel stacked
        # (round-10 session 7; same treatment as the rerank + entropy
        # kernels).
        _ARGMAX_UDF = F.pandas_udf(
            kernel,
            StructType([
                StructField("bid", LongType()),
                StructField("blen", LongType()),
            ]),
        ).asNondeterministic()
    return _ARGMAX_UDF(bids)


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs with the shingle as a 64-bit hash key: every
    consumer in this module counts or joins on shingle IDENTITY only, so
    the keys come straight from ``hashed_token_shingles`` — token hashes
    combined in-row, no shingle string ever built, and the shuffled/joined
    key is 8 bytes instead of a multi-token string.  A collision merges two
    shingles' counts with probability ~|shingles|^2 / 2^64 — the same
    accepted approximation family as MinHash/SimHash blocking."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(hashed_token_shingles(F.col(text_col), n))
        ).alias("shingle"),
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    shingle_size: int = 3,
    min_containment: float = 0.0,
) -> DataFrame:
    """Per corpus document: the benchmark document with the highest n-gram
    containment score, ``containment_x100 = floor(100 * |doc ∩ bench| /
    |doc shingles|)`` (exact integer — hash-comparable across engines).

    Returns (id_col, bench_id, containment_x100) for documents whose best
    score reaches ``min_containment`` (a 0..1 fraction).  Documents sharing
    no shingle with any benchmark doc are clean and do not appear.

    Ties on containment resolve to the smallest bench id (deterministic).
    """
    bench_sh = _doc_shingles(
        benchmark.select(F.col(bench_id_col).alias("_bid"), text_col),
        "_bid", text_col, shingle_size,
    )
    # one broadcast row per shingle carrying ALL bench ids that contain it:
    # the corpus join then fans out per (doc shingle, shingle) instead of
    # per (doc shingle, bench doc) — ~12x fewer shuffle rows on a dense
    # shingle space (sf1 A/B: 12.7 -> 9.2 s), same bytes, flattened in-row
    bench_posts = bench_sh.groupBy("shingle").agg(
        F.collect_list("_bid").alias("_bids_arr")
    )
    # per-doc shingle count computed IN-ROW before the explode and carried
    # through the postings join — a separate (doc_id, _n_doc) frame would be
    # corpus-sized, and broadcasting it is a driver-collect of every
    # document id at 100 TB.  _n_doc is functionally dependent on the doc
    # id, so grouping on (id, _n_doc) is the same grouping as on id alone.
    doc_sh = corpus.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.array_distinct(
            hashed_token_shingles(F.col(text_col), shingle_size)
        ).alias("_shs"),
    ).select(
        id_col,
        F.size("_shs").cast("long").alias("_n_doc"),
        F.explode("_shs").alias("shingle"),
    )

    # the benchmark suite is a true dimension (fixed eval sets, not
    # SF-scaled) — broadcast is correct here.
    #
    # ONE doc-keyed aggregation, not per-(doc, bench) counting: the join
    # fans out to one row per (doc shingle, bench doc sharing it), and on
    # boilerplate-heavy data most pairs share exactly one shingle — a
    # groupBy(doc, bench) hash agg then has ~|pairs| distinct keys
    # (nothing combines) and its output feeds a SECOND |pairs|-row
    # shuffle for the per-doc max.  Instead: collect each doc's matched
    # bench ids (one exchange, |docs| groups), sort in-row, and fold a
    # run-length argmax — ascending scan with a strict '>' keeps the
    # smallest bench id on ties, the documented tie-break.  The in-row
    # list is bounded by the matched part of the EVAL SET (a dimension),
    # never by the corpus.  sf1 A/B: 29.4 s -> this form, one exchange.
    # the per-doc match list stays UNSORTED: the Arrow argmax kernel's
    # np.unique sorts internally (round 9 — this replaces a sorted-array
    # run-length F.aggregate fold, whose per-element lambda ran in the
    # INTERPRETED HOF path: sf1 A/B 13.8 -> 9.3 s in identical conditions,
    # row-identical output; np.unique returns sorted uniques, so
    # counts.argmax()'s first-max IS the fold's strict-'>' smallest-id
    # tie-break).  The in-row list is bounded by the matched part of the
    # EVAL SET (a dimension), never by the corpus.
    matched = doc_sh.join(F.broadcast(bench_posts), "shingle").groupBy(
        id_col, "_n_doc"
    ).agg(F.flatten(F.collect_list("_bids_arr")).alias("_bids"))
    staged = matched.select(
        id_col, "_n_doc", _containment_argmax_udf(F.col("_bids")).alias("_f")
    )
    best = staged.select(
        id_col,
        "_n_doc",
        F.col("_f.bid").alias("_bid"),
        F.col("_f.blen").alias("_n_inter"),
    )
    return best.select(
        id_col,
        F.col("_bid").cast("long").alias(bench_id_col),
        F.floor(
            F.col("_n_inter").cast("double") * 100.0
            / F.col("_n_doc").cast("double")
        ).cast("long").alias("containment_x100"),
    ).filter(F.col("containment_x100") >= int(min_containment * 100))


def shingle_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """Per document: distinct-shingle count, how many of those shingles also
    appear in at least one OTHER document, and the shared fraction
    ``shared_x100`` (floor of 100 * shared / total, exact integer).

    Count-only postings (never a materialized id list — a stop-shingle's
    posting list would be one corpus-sized row) joined back to the shingle
    table ON THE SAME KEY the count aggregate shuffled on: AQE exchange
    reuse executes the tokenize+shingle+shuffle once and the join consumes
    the co-partitioned sides without a new exchange, so the whole operator
    costs one wide exchange over (doc, shingle) plus the final per-doc agg.
    """
    sh = _doc_shingles(df, id_col, text_col, shingle_size)
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_n_docs"))
    out = (
        sh.join(counts, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_n_docs") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_shared",
        F.floor(
            F.col("n_shared").cast("double") * 100.0 / F.col("n_shingles").cast("double")
        ).cast("long").alias("shared_x100"),
    )


def split_decontamination(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    min_overlap_x100: int = 0,
) -> DataFrame:
    """Cross-split leakage: for every TRAIN document (under the same
    hash-band split as :func:`..sampling.dataset_split`), how many of its
    distinct shingles also occur in any val/test document.  Training on
    these documents leaks the holdout — the per-split counterpart of
    :func:`benchmark_contamination`, where the "benchmark" is the corpus's
    own holdout and is NOT small enough to broadcast.

    Returns (key_col, n_shingles, n_holdout_shared, overlap_x100) for train
    documents sharing at least one shingle with the holdout (and at least
    ``min_overlap_x100``); fully-novel train docs are clean and absent.

    Plan shape (100 TB posture): the holdout side collapses to a DISTINCT
    shingle SET before the join, so each train (doc, shingle) row matches
    at most one set row — a plain shuffle hash join on ``shingle`` with NO
    fan-out, immune to stop-shingle skew (the skewed key exists once on the
    build side).  One wide exchange each side, one per-doc agg; the split
    predicate itself is map-only hash math, so both sides prune before
    shuffling anything.
    """
    from . import sampling

    split = sampling.dataset_split(
        df.filter(F.col(text_col).isNotNull()),
        key_col=key_col, val_frac=val_frac, test_frac=test_frac,
    )
    train_sh = _doc_shingles(
        split.filter(F.col("split") == "train"), key_col, text_col, shingle_size
    )
    holdout_set = (
        _doc_shingles(
            split.filter(F.col("split") != "train"),
            key_col, text_col, shingle_size,
        )
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        train_sh.join(holdout_set, "shingle", "left")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)).cast("long")).alias(
                "n_holdout_shared"
            ),
        )
    )
    return per_doc.filter(F.col("n_holdout_shared") > 0).select(
        key_col,
        "n_shingles",
        "n_holdout_shared",
        F.floor(
            F.col("n_holdout_shared").cast("double")
            * 100.0
            / F.col("n_shingles").cast("double")
        ).cast("long").alias("overlap_x100"),
    ).filter(F.col("overlap_x100") >= min_overlap_x100)


def source_overlap(
    pairs: DataFrame,
    docs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — the dataset-management question
    "how much of source A already lives in source B?" answered from any
    candidate-pair frame (MinHash-LSH, semantic, exact-digest): pairs map
    to their documents' sources, collapse to UNORDERED source pairs
    (least/greatest), and normalize by the smaller source's doc count
    (``rate_x1m = floor(1e6 * n_pairs / min(|A|, |B|))`` — the containment
    orientation: a tiny source fully duplicated inside a huge one scores
    1e6, not noise).  The diagonal (A = B) is intra-source duplication.

    Plan shape (100 TB): two hash joins of the (bounded) pair frame
    against the (id -> source) projection — no fan-out; per-source totals
    are a group-count dimension that BROADCASTS (source cardinality ≪
    corpus); one final (source_a, source_b) agg over pair-count rows.
    """
    src = docs.select(F.col(id_col), F.col(group_col).alias("_src"))
    j = (
        pairs.select(id_a, id_b)
        .join(src.withColumnRenamed(id_col, id_a).withColumnRenamed("_src", "_sa"), id_a)
        .join(src.withColumnRenamed(id_col, id_b).withColumnRenamed("_src", "_sb"), id_b)
    )
    grouped = (
        j.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    totals = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    ta = totals.select(
        F.col(group_col).alias("source_a"), F.col("_n").alias("n_docs_a")
    )
    tb = totals.select(
        F.col(group_col).alias("source_b"), F.col("_n").alias("n_docs_b")
    )
    return (
        grouped.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.col("n_docs_a").cast("long").alias("n_docs_a"),
            F.col("n_docs_b").cast("long").alias("n_docs_b"),
            F.floor(
                F.col("n_pairs").cast("double")
                * 1000000.0
                / F.least("n_docs_a", "n_docs_b").cast("double")
            ).cast("long").alias("rate_x1m"),
        )
    )


#: Bloom layout: 63 usable bits per 64-bit word (DuckDB's BIGINT << refuses
#: the sign bit, and 63-bit words keep every shift cross-engine-exact), so
#: BLOOM_WORDS * 63 positions total.
BLOOM_WORDS = 1040
BLOOM_BITS = BLOOM_WORDS * 63  # 65520


def _bloom_positions(shingle: Column) -> tuple[Column, Column]:
    """Two bit positions per shingle from independent md5 slices (the
    k=2 double-hash family), both in [0, BLOOM_BITS)."""
    h = F.md5(shingle)
    p1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BLOOM_BITS
    p2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % BLOOM_BITS
    return p1, p2


def bloom_bitmap(
    benchmark: DataFrame,
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """The benchmark's shingle set folded into a fixed-size Bloom bitmap:
    ``(word int, bits long)`` — at most :data:`BLOOM_WORDS` rows REGARDLESS
    of eval-suite size.  This is the 100 TB decontamination prefilter: the
    posting-list broadcast of :func:`benchmark_contamination` grows with
    the eval suite, but a bitmap broadcast is ~8 KB forever, and the
    membership probe is two broadcast-hash-joins + bit tests, map-only.
    """
    sh = benchmark.filter(F.col(text_col).isNotNull()).select(
        F.explode(
            F.array_distinct(token_shingles(F.col(text_col), shingle_size))
        ).alias("shingle")
    )
    p1, p2 = _bloom_positions(F.col("shingle"))
    pos = sh.select(F.explode(F.array(p1, p2)).alias("pos"))
    # SQL shiftleft: the scalar-API form requires a literal shift count
    return pos.groupBy(
        (F.col("pos") / 63).cast("int").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
        ).alias("bits")
    )


def bloom_prefilter(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """Per corpus document: how many of its distinct shingles MAY belong to
    the benchmark (both Bloom bits set) — the cheap first pass that lets
    the exact containment join (:func:`benchmark_contamination`) run on
    the flagged sliver only.  False positives are deterministic given the
    bit math (identical across engines), false negatives impossible.

    Returns ``(id_col, n_shingles, n_maybe, maybe_x100)`` for every
    non-NULL-text document.

    Plan shape: corpus shingles explode once, two broadcast equi-joins
    against the <= BLOOM_WORDS-row bitmap (map-side), one doc-keyed
    partial-agg count — no posting-list shuffle, no corpus self-join, and
    the broadcast is eval-suite-size-INDEPENDENT.
    """
    words = bloom_bitmap(
        benchmark, bench_id_col=bench_id_col, text_col=text_col,
        shingle_size=shingle_size,
    )
    sh = corpus.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles(F.col(text_col), shingle_size))
        ).alias("shingle"),
    )
    p1, p2 = _bloom_positions(F.col("shingle"))
    staged = sh.select(id_col, p1.alias("_p1"), p2.alias("_p2"))
    probed = staged.select(
        id_col,
        (F.col("_p1") / 63).cast("int").alias("_w1"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p1 % 63 AS INT))").alias(
            "_b1"
        ),
        (F.col("_p2") / 63).cast("int").alias("_w2"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p2 % 63 AS INT))").alias(
            "_b2"
        ),
    )
    w1 = words.select(F.col("word").alias("_w1"), F.col("bits").alias("_bits1"))
    w2 = words.select(F.col("word").alias("_w2"), F.col("bits").alias("_bits2"))
    hit = (
        probed.join(F.broadcast(w1), "_w1", "left")
        .join(F.broadcast(w2), "_w2", "left")
        .select(
            id_col,
            (
                (
                    F.coalesce(F.col("_bits1"), F.lit(0)).bitwiseAND(
                        F.col("_b1")
                    )
                    != 0
                )
                & (
                    F.coalesce(F.col("_bits2"), F.lit(0)).bitwiseAND(
                        F.col("_b2")
                    )
                    != 0
                )
            ).cast("long").alias("_hit"),
        )
    )
    out = hit.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("_hit").alias("n_maybe"),
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_maybe",
        # integer-exact, matching the module's convention (no float64
        # round-trip; 100 * n_maybe <= 100 * n_shingles, far from 2^63)
        F.expr("(100 * n_maybe) div n_shingles")
        .cast("long").alias("maybe_x100"),
    )
