"""Approximate-nearest-neighbor search over embedding columns.

- brute_force_topk: exact cosine top-k via crossJoin — the correctness
  baseline.  The query side is broadcast (queries << corpus), so the corpus
  is scanned once with no shuffle; ranking is a per-query window top-k.
- lsh_topk: the scale path — random-hyperplane signs bucket the corpus;
  queries only compare against their bucket (and its 1-bit-flip neighbors),
  turning O(Q x N) into O(Q x N / 2^bits) expected work.

Hyperplanes are generated deterministically from a seed (md5-derived
pseudo-randoms), so plans are reproducible without driver-side RNG state.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on corpus id.

    Output: (query_id, rank, neighbor_id, cosine_sim).
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec"), dim).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed, bit, i)."""
    planes = []
    for b in range(bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{b}|{i}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append((u / 2**64) * 2.0 - 1.0)  # uniform [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bucket id: bit b = 1 iff dot(vec, plane_b) >= 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                         plane_arr, dim=len(plane)) >= 0, F.lit(1 << b)).otherwise(0)
        bucket = bucket + bit.cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: compare only within the query's hyperplane-sign bucket and
    its Hamming-distance-1 neighbor buckets (recall knob = bits).
    """
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket(F.col(vec_col), planes).alias("_qbucket"),
    )
    # probe buckets: own bucket + all 1-bit flips (multi-probe LSH)
    probes = F.array(
        F.col("_qbucket"),
        *[F.col("_qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
    )
    q = q0.select(query_id_col, "_qvec", F.explode(probes).alias("bucket"))
    scored = c.join(F.broadcast(q), "bucket").select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec"), dim).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def ivf_fit(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Train an IVF codebook with MLlib k-means|| over the embedding column;
    returns a (cid, _cent) centroid DataFrame that plugs straight into
    :func:`ivf_topk` — the trained-codebook path promised there, same plan
    shape.  Seeded, so repeated fits on the same corpus agree.

    Scale: k-means|| is the distributed initialization built for exactly
    this (per-iteration cost O(N*k*d) map-side + a k*d-sized reduce); the
    returned codebook is k*d floats — always a broadcast dimension.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "cid int, _cent array<float>"
    )


def _assign_cells_numpy(
    corpus: DataFrame, cent: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Corpus→cell assignment as an Arrow-batched numpy kernel.

    The Catalyst in-row argmax evaluates C interpreted HOF cosine folds per
    corpus row — the dominant cost of ivf_topk.  This kernel runs the SAME
    float64 operation sequence vectorized ACROSS rows but sequentially
    ACROSS dimensions (``acc_k+1 = acc_k + A[:,k,None]*C[None,:,k]``), so
    cell scores — and therefore assignments and the oracle hash — are
    bit-identical to the fold (identical argument established for
    ``dedup.embedding_neardup_pairs_blocked``); ``np.argmax`` keeps the
    first max, matching the fold's strict-greater / lowest-cid tie-break.
    The codebook is a classic broadcast dimension (C·d floats; same
    materialization ``ivf_fit`` already performs).  Map-only: no exchange
    between the scan and the assignment.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, FloatType

    # Intermediate dtype must follow the COLUMN's element type: an
    # array<float> column passes through float32 (matching Arrow's batch
    # representation and the Catalyst fold's cast), but an array<double>
    # column must go straight to float64 — routing it through float32 would
    # silently truncate and could flip assignments near ties, breaking the
    # documented bit-identity with the Catalyst cosine fold.
    elem_t = corpus.schema[vec_col].dataType
    narrow = isinstance(elem_t, ArrayType) and isinstance(
        elem_t.elementType, FloatType
    )
    via = np.float32 if narrow else np.float64

    crows = sorted(cent.collect(), key=lambda r: r["cid"])
    cids = np.array([int(r["cid"]) for r in crows], dtype=np.int32)
    cmat = np.array([r["_cent"] for r in crows], dtype=via).astype(np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((cids, cmat, narrow))

    def kernel(batches):
        cids_b, c64, narrow_b = bc.value
        d = c64.shape[1]
        nc_acc = np.zeros(len(cids_b))
        for k in range(d):
            nc_acc += c64[:, k] * c64[:, k]
        nc = np.sqrt(nc_acc)
        for pdf in batches:
            if not len(pdf):
                continue
            a64 = np.asarray(
                list(pdf[vec_col]), dtype=np.float32 if narrow_b else np.float64
            ).astype(np.float64)
            acc = np.zeros((len(a64), len(cids_b)))
            tmp = np.empty_like(acc)
            na_acc = np.zeros(len(a64))
            for k in range(d):
                np.multiply(a64[:, k][:, None], c64[:, k][None, :], out=tmp)
                np.add(acc, tmp, out=acc)
                na_acc += a64[:, k] * a64[:, k]
            cos = acc / (np.sqrt(na_acc)[:, None] * nc[None, :])
            best = cids_b[np.argmax(cos, axis=1)]
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "_cvec": pdf[vec_col],
                    "cid": best.astype(np.int32),
                }
            )

    vec_t = dict(corpus.dtypes)[vec_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, f"neighbor_id long, _cvec {vec_t}, cid int"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into ``n_centroids``
    cells by nearest centroid, search only the query's ``n_probe`` nearest
    cells.  Expected work O(Q x (C + N*n_probe/C)) vs brute force O(Q x N).

    Default centroids are the first ``n_centroids`` corpus vectors by id —
    a deterministic stand-in for a trained codebook so results are exactly
    reproducible (and oracle-checkable); pass ``centroids=ivf_fit(corpus)``
    for the trained k-means|| codebook — identical plan shape, cells just
    get better balance.  Cell assignment is MAP-ONLY: the codebook
    broadcasts (C*d floats) and each Arrow batch scores its rows against
    all centroids in one vectorized numpy pass (``_assign_cells_numpy``,
    bit-identical to the Catalyst fold; the round-2 form shuffled
    corpus x C rows through a per-vector window, and the interpreted
    in-row HOF argmax it replaced paid C fold evaluations per row).  Ties
    break to the lowest cid, matching a (cos desc, cid asc) rank.  Each corpus
    vector lands in exactly one cell, so probed cells never produce
    duplicate candidates.  At 100 TB the assigned cells are written
    bucketed by cid, making the probe join a pruned, co-located read.
    """
    if centroids is not None:
        cent = centroids.select("cid", "_cent")
    else:
        cent = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).cast("int").alias("cid"), F.col(vec_col).alias("_cent")
        )
    # one-row broadcast dimension: the codebook as an array in cid order
    # (array_sort on struct(cid, _cent) orders by the leading cid field, so
    # the argmax fold's tie-break is deterministic regardless of partitioning)
    cent_arr = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "_cent"))).alias("_cents")
    )

    def cell_scores(vec):
        return F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cosine(vec, c["_cent"]).alias("cos"), c["cid"].alias("cid")
            ),
        )

    assigned = _assign_cells_numpy(corpus, cent, id_col, vec_col)
    # probe cells in-row as well: sort scores by (cos desc, cid asc) via the
    # (-cos, cid) ascending struct sort, take the first n_probe, explode
    probe_cells = F.slice(
        F.array_sort(
            F.transform(
                cell_scores(F.col(vec_col)),
                lambda s: F.struct((-s["cos"]).alias("negcos"), s["cid"].alias("cid")),
            )
        ),
        1,
        n_probe,
    )
    probes = (
        queries.crossJoin(F.broadcast(cent_arr))
        .select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            F.explode(probe_cells).alias("_p"),
        )
        .select(query_id_col, "_qvec", F.col("_p.cid").alias("cid"))
    )
    scored = assigned.join(F.broadcast(probes), "cid").select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_sim")
    )


def centroid_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    keep_vec: bool = False,
) -> DataFrame:
    """Nearest-centroid classification — assign every vector to the closest
    label centroid by cosine (the k-NN/centroid labeling step of an
    embedding-clustering pipeline; with centroids from
    plans.catalog.q_label_centroids it doubles as a clustering-quality
    probe: a vector whose nearest centroid is NOT its own label is a
    boundary/outlier point).

    ``centroids`` is the (label, pos, centroid_q) long-form frame from the
    label-centroid aggregation (quantized-exact component means).

    Zero-shuffle scoring: the k centroids pivot to arrays, collapse to ONE
    row (array of (label, vector, norm) structs sorted by label), broadcast
    via crossJoin, and the per-vector argmax runs IN-ROW as a fold over the
    centroid array — nested HOFs, no k-times row expansion, no groupBy.
    The corpus streams map-side at any scale; the only non-map work is the
    tiny centroid pivot.  Fold order is fixed (labels ascending, strict >
    replacement), so ties deterministically keep the smallest label and
    every float op replays the oracle's left-to-right sequence.

    Returns (id_col, label_col, assigned_label, score_x1m).
    """
    carr = (
        centroids.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("centroid_q")))
            ).alias("_pc")
        )
        .select(
            F.col(label_col).alias("_l"),
            F.transform(
                F.col("_pc"), lambda s: s["centroid_q"].cast("double")
            ).alias("_c"),
        )
        .withColumn(
            "_cn",
            F.sqrt(F.aggregate("_c", F.lit(0.0), lambda a, v: a + v * v)),
        )
    )
    # the ONE-row centroid frame is localCheckpoint-ed (lazy): collect_list
    # is non-deterministic to the canonicalizer, so without the checkpoint a
    # consumer that references this subplan twice (the semantic-dedup
    # self-join) rebuilds the centroids — and their source scan — per
    # branch; the checkpoint makes both branches read one computed row.
    cents = carr.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_l"), F.col("_c"), F.col("_cn")))
        ).alias("_cents")
    ).localCheckpoint(eager=False)
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    xnorm = F.sqrt(F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v))
    joined = emb.crossJoin(F.broadcast(cents)).withColumn("_xn", xnorm)

    def step(acc, cst):
        dot_xc = F.aggregate(
            F.zip_with(F.col(vec_col), cst["_c"], lambda p, q: p.cast("double") * q),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        s = dot_xc / (F.col("_xn") * cst["_cn"])
        return F.when(
            s > acc["s"],
            F.struct(cst["_l"].alias("l"), s.alias("s")),
        ).otherwise(acc)

    best = F.aggregate(
        F.col("_cents"),
        F.struct(
            F.lit(-1).cast("int").alias("l"), F.lit(-2.0).alias("s")
        ),
        step,
    )
    cols = [
        F.col(id_col),
        F.col(label_col),
        best["l"].alias("assigned_label"),
        F.floor(best["s"] * 1000000.0).cast("long").alias("score_x1m"),
    ]
    if keep_vec:
        cols.append(F.col(vec_col))
    return joined.select(*cols)


def semantic_dedup_pairs(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: assign every vector to
    its nearest label centroid (map-only, :func:`centroid_assign`), then
    compare ONLY within a cluster — the cluster bucketing that turns the
    O(N^2) all-pairs cosine scan into per-cluster work, the standard recipe
    for semantic dedup of embedding corpora (cf. the grid kernel in
    operators/dedup.py::embedding_neardup_pairs_grid, which buckets
    geometrically instead; clustering adapts to the data's density).

    Candidate semantics are cluster-local BY DESIGN: a near-dup pair split
    across two clusters is not a candidate (exactly SemDeDup's trade), so
    results depend deterministically on the centroid set.

    Plan shape (100 TB): ONE corpus scan (map-only assignment) and ONE
    shuffle on the cluster id into an Arrow ``applyInPandas`` pair kernel —
    the same numpy block kernel discipline as
    ``embedding_neardup_pairs_grid``: scores accumulate dimension-at-a-time
    in fixed array order, replaying the exact FP sequence of the Catalyst
    ``aggregate`` fold and the DuckDB ``list_reduce`` oracle, so the
    floor(x1m) cut is bit-identical.  (Measured vs the pure-Catalyst
    self-join form this replaced: 9.3 s -> ~1.5 s at sf0.1, and two corpus
    scans -> one.)  Per-task memory is bounded by the largest cluster —
    k-means-balanced by construction; a pathological giant cluster should
    be pre-split by a secondary hash the same way ``packing.shard_streams``
    shards giant streams.

    Returns (cluster, vec_id_a, vec_id_b, cos_x1m) with
    cos_x1m >= floor(threshold * 1e6).
    """
    import numpy as np
    import pandas as pd

    thr = int(threshold * 1000000)
    assigned = centroid_assign(
        emb, centroids,
        id_col=id_col, vec_col=vec_col, label_col=label_col, keep_vec=True,
    ).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col("assigned_label").alias("cluster"),
        F.col(vec_col).alias("_v"),
    )

    def cluster_kernel(key, pdf):
        empty = pd.DataFrame(
            {"cluster": [], "vec_id_a": [], "vec_id_b": [], "cos_x1m": []}
        ).astype({"cluster": "int32", "vec_id_a": "int64",
                  "vec_id_b": "int64", "cos_x1m": "int64"})
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        v = np.asarray(list(pdf["_v"]), dtype=np.float32).astype(np.float64)
        d = v.shape[1]
        acc = np.zeros((n, n))
        tmp = np.empty_like(acc)
        nrm = np.zeros(n)
        for k in range(d):
            np.multiply(v[:, k][:, None], v[:, k][None, :], out=tmp)
            np.add(acc, tmp, out=acc)
            nrm += v[:, k] * v[:, k]
        nr = np.sqrt(nrm)
        cos = np.floor(acc / (nr[:, None] * nr[None, :]) * 1000000.0)
        keep = (ids[:, None] < ids[None, :]) & (cos >= thr)
        ii, jj = np.nonzero(keep)
        return pd.DataFrame({
            "cluster": np.full(len(ii), int(key[0]), dtype=np.int32),
            "vec_id_a": ids[ii],
            "vec_id_b": ids[jj],
            "cos_x1m": cos[ii, jj].astype(np.int64),
        })

    return assigned.groupBy("cluster").applyInPandas(
        cluster_kernel,
        "cluster int, vec_id_a long, vec_id_b long, cos_x1m long",
    )
