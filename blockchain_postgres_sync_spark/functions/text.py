"""Text-analysis function surface for the training-data pipeline.

The reference's only text workload is a `to_tsvector('simple', name)` GIN
index over current assets (migrations/.../up.sql:703-705) — i.e. tokenized
search over names.  We generalize to the standard LLM-pipeline set: token
stats, fingerprints, quality ratios, n-gram shingles.  Everything here is
Catalyst built-ins (JVM-side, codegen) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches `to_tsvector('simple')`'s word split
    closely enough for stats; exact parity is not required by the reference).
    """
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def char_count_no_spaces(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit("")))


def tokenset_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set.  Collapses shuffled/duplicated-token near-dups (Jaccard = 1).
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def token_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-token shingles (space-joined), for minhash/Jaccard dedup.

    Pure Catalyst: sequence + transform + slice — vectorized, no UDF.
    Documents shorter than n tokens produce a single whole-text shingle.
    """
    t = tokens(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.array_join(F.slice(t, i, n), " "))


def quality_ratios(text: Column) -> dict[str, Column]:
    """Cheap quality-score signals (length, mean token length, repetition).

    All integer-exact (scaled x100 via integral division) so results are
    bit-identical across engines — no float ratios in hash-compared output.
    """
    n_tok = token_count(text)
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "n_distinct_tokens": distinct_token_count(text).cast("long"),
        "sum_token_len": char_count_no_spaces(text).cast("long"),
        "mean_token_len_x100": _idiv(
            char_count_no_spaces(text).cast("long") * 100, n_tok.cast("long")
        ),
        "repetition_x100": _idiv(
            distinct_token_count(text).cast("long") * 100, n_tok.cast("long")
        ),
    }


def _idiv(a: Column, b: Column) -> Column:
    """Integral floor-division, exact for values < 2^53 (single IEEE divide
    over exact integers -> identical across engines)."""
    return F.floor(a.cast("double") / b.cast("double")).cast("long")
