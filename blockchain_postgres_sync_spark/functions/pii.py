"""PII detection / redaction for training-data curation.

No analog in the reference (its data is public chain state); this is the
standard pre-training scrub pass: find and mask emails, phone numbers, and
IPv4 addresses before a corpus ships to training.

Patterns deliberately stay in the syntax subset where Java regex (Spark)
and RE2 (DuckDB) agree — character classes, bounded repeats, no
backslash-classes, no lookaround — so results are oracle-comparable and
portable.  All matching is Catalyst built-ins (regexp_count /
regexp_replace): JVM-side, codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
#: international (+ prefix, 7-15 digits) or dashed US-style numbers
PHONE_RE = "[+][0-9]{7,15}|[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

#: redaction order matters: phones before emails would not (digits can't
#: start a match inside an already-replaced token), but IPv4 must go AFTER
#: emails (an all-numeric domain could otherwise lose its dots first) and
#: phones after both.
_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document PII match counts (exact integers)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)).cast("long"),
    }


def redact_pii(text: Column) -> Column:
    """Mask every PII match with a typed placeholder token."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
