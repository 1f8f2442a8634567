"""Token dictionary encoding: vocabulary build + document-to-ids encode.

The last step before a text corpus becomes trainer input: map each token to
a dense integer id.  Two operators, both deterministic and engine-exact:

- :func:`build_vocab` — (token, token_id, count) with ids assigned by
  (count desc, token asc) rank.  The heavy part (per-token counts) is a
  map-side-combined aggregation over the exploded corpus — one shuffle
  whose reduce side is VOCABULARY-sized, not corpus-sized.  The id
  assignment ranks only the vocabulary; it uses a single-partition window
  because dense ranks are inherently a total order (same trade as
  ngram_topk's final rank) — a vocabulary is bounded (≤ a few million
  rows) regardless of corpus size, so this never becomes the scale
  bottleneck.
- :func:`encode_docs` — (doc_id, n_tokens, token_ids array) with ids in
  document order.  posexplode → broadcast-join the vocab → re-assemble with
  ``array_sort(collect_list(struct(pos, id)))``.  One shuffle on doc_id;
  the vocab side broadcasts (it is the small dimension by definition).
  Unknown tokens (below ``min_count``) encode as ``oov_id``.

Reference analog: the engine generalizes the reference's `to_tsvector`
search-token surface (up.sql:703-705) to the trainer-facing encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(token, token_id, count), ids dense from 0 by (count desc, token asc).

    The (count, token) ordering is total, so ids are reproducible on any
    engine; ``min_count`` drops the long tail before ranking."""
    counts = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    return counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long")
    ).select("token", "token_id", F.col("count").cast("long").alias("count"))


def encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """(id, n_tokens, token_ids) — each document as its token-id sequence.

    The struct sort key is (pos, id): pos is unique per document, so the
    re-assembly order is total and the output arrays are deterministic
    under any partitioning."""
    exploded = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    joined = exploded.join(F.broadcast(vocab.select("token", "token_id")),
                           "token", "left")
    assembled = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos").alias("pos"),
                        F.coalesce(
                            F.col("token_id"), F.lit(oov_id).cast("long")
                        ).alias("tid"),
                    )
                )
            ),
            lambda s: s["tid"],
        ).alias("token_ids"),
    )
    return assembled
