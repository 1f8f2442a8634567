"""Streaming near-duplicate detection: MinHash-LSH as a custom stateful
operator (``applyInPandasWithState``).

Batch LSH (operators/dedup.py) buckets the whole corpus at once; a live
pipeline wants candidate pairs AS DOCUMENTS ARRIVE: a new document is a
near-dup candidate of every earlier document that shares one of its band
buckets.  State = the doc-ids seen per (band, bucket) key — exactly the
posting list the batch bucket-join materializes, held in the streaming
state store instead.

The signature is computed IN-ROW (transform + array_min over the shingle
array — no per-doc groupBy, which a streaming plan could not chain before
the stateful op) and is value-identical to the batch
``minhash_signatures`` family: same md5 base hash, same affine
permutations (min is duplicate-insensitive, so skipping the distinct pass
changes nothing).

Scale posture: state is hash-partitioned by (band, bucket) — each
micro-batch shuffles only its own rows; a viral bucket's posting list is
capped by ``max_bucket_size`` (the streaming form of the batch op's
``max_postings`` stop-shingle rule: overflow docs stop witnessing pairs
through that bucket).  A pair sharing several bands is emitted once per
shared band — downstream consumers dedupe idempotently (the batch op's
final ``.distinct()``), keeping this operator single-pass.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StructField, StructType,
)

from ..functions.text import token_shingles
from ..operators.dedup import MINHASH_PRIME, minhash_affine_params

_PAIR_SCHEMA = StructType([
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
])
_STATE_SCHEMA = StructType([StructField("ids", ArrayType(LongType()))])


def inrow_minhash_columns(
    text_col: Column, num_hashes: int = 12, shingle_size: int = 3
) -> list[Column]:
    """The batch minhash signature as pure per-row expressions
    (mh_0..mh_{k-1}), value-identical to ``minhash_signatures``."""
    hv = F.transform(
        token_shingles(text_col, shingle_size),
        lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
        % MINHASH_PRIME,
    )
    return [
        F.array_min(
            F.transform(hv, lambda v: (F.lit(a) * v + F.lit(b)) % MINHASH_PRIME)
        ).alias(f"mh_{j}")
        for j, (a, b) in enumerate(minhash_affine_params(num_hashes))
    ]


def band_buckets(num_hashes: int, bands: int) -> Column:
    """Band the in-row signature into (band, bucket-md5) structs — the same
    bucket GROUPING as batch ``lsh_candidate_pairs`` (identical member
    tuples land in one bucket), so the emitted pair set matches batch
    output; the batch op keys its buckets by an 8-byte xxhash instead of
    this md5 string, which changes only the key encoding, not grouping."""
    rows_per_band = num_hashes // bands
    cols = []
    for b in range(bands):
        members = [
            F.col(f"mh_{j}").cast("string")
            for j in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *members)).alias("bucket"),
            )
        )
    return F.array(*cols)


def streaming_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Emit (id_a, id_b) near-dup candidate pairs as documents stream in:
    each new document pairs with every earlier document sharing one of its
    band buckets.  Union over time of the output (deduped) equals the batch
    ``lsh_candidate_pairs`` of the union of inputs (parity-tested)."""
    banded = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        *inrow_minhash_columns(F.col(text_col), num_hashes, shingle_size),
    ).select(
        "_id", F.explode(band_buckets(num_hashes, bands)).alias("bb")
    ).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )

    def emit_pairs(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for new_id in pdf["_id"].astype("int64"):
                nid = int(new_id)
                if nid in seen:
                    continue  # redelivery / duplicate id: idempotent
                for old in seen:
                    lo, hi = (old, nid) if old < nid else (nid, old)
                    out_a.append(lo)
                    out_b.append(hi)
                if len(seen) < max_bucket_size:
                    seen.append(nid)
        state.update((seen,))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        emit_pairs,
        outputStructType=_PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def inrow_banded_signature_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_size: int = 3,
    bands: int = 4,
) -> DataFrame:
    """``operators.dedup.banded_signature_rows`` as pure per-row
    expressions — value-identical rows (same signatures, same band-salted
    xxhash64 bucket keys, docs with no shingles absent), but with NO
    aggregation, so it is legal in an append-mode stream.  The shingle
    hash array materializes as a column first: higher-order expressions do
    not common-subexpression-eliminate, so deriving all k minhash columns
    from one concrete array avoids re-hashing every shingle k times."""
    base = docs.select(
        F.col(id_col),
        F.transform(
            token_shingles(F.col(text_col), shingle_size),
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
            % MINHASH_PRIME,
        ).alias("_hv"),
    ).filter(F.size("_hv") > 0)
    sig = base.select(
        id_col,
        F.array(
            *[
                F.array_min(
                    F.transform(
                        "_hv", lambda v: (F.lit(a) * v + F.lit(b)) % MINHASH_PRIME
                    )
                )
                for a, b in minhash_affine_params(num_hashes)
            ]
        ).alias("sig"),
    )
    rows_per_band = num_hashes // bands
    buckets = [
        F.xxhash64(
            F.lit(b),
            *[F.element_at("sig", j + 1)
              for j in range(b * rows_per_band, (b + 1) * rows_per_band)],
        )
        for b in range(bands)
    ]
    return sig.select(
        id_col, "sig", F.explode(F.array(*buckets)).alias("bucket")
    )


def streaming_index_matches(
    docs: DataFrame,
    index_banded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_size: int = 3,
    bands: int = 4,
    min_agree: float = 0.5,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.incremental_lsh_matches``: as
    documents STREAM in, match each against a STORED LSH index
    (``banded_signature_rows`` persisted bucketed on the bucket key) via a
    stateless stream-static join — emits ``(id_col, index_id,
    agree_x100)`` per shared band at ``min_agree`` or above.

    A pair meeting in several bands repeats with an identical
    deterministic score, so consumers dedupe idempotently (same contract
    as ``streaming_lsh_candidates``); the distinct union over micro-
    batches equals the batch ``banded_match_scores`` of the union of
    inputs at the same threshold (parity-tested).  Unlike the batch
    operator there is no best-match collapse — that would be a stateful
    max over the unbounded stream; collapse in the sink, where the
    candidate set is already bounded."""
    from ..operators.dedup import banded_match_scores

    inc = inrow_banded_signature_rows(
        docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_size=shingle_size, bands=bands,
    )
    scored = banded_match_scores(
        inc, index_banded, id_col=id_col, num_hashes=num_hashes
    )
    return scored.filter(F.col("agree_x100") >= int(min_agree * 100))
