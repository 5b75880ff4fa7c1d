"""Text-cleaning / tokenization as native column expressions.

Semantics mirror the reference exactly where it defines them:

- ``clean_text``: strip non-letters (keeping whitespace) then lowercase —
  ``lower(regexp_replace(col, "[^a-zA-Z\\s]", ""))``; reference
  work.py:230-235 and streaming_pipeline.py:122-128 (F1 in SURVEY §2).
- ``tokens``: whitespace split of the cleaned text with empty tokens
  dropped (the pandas twin work.py:143-147 achieves the same via
  fillna('') + strip).

Everything here is a pure Catalyst expression — stays inside whole-stage
codegen, fully pushdown-transparent, zero Python in the hot path. The
60-bit hash is built from md5 so the *identical* integer is computable in
ANSI SQL on the oracle side (DuckDB: ``('0x'||substr(md5(w),18,15))::BIGINT``),
unlike Spark's murmur3 ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CLEAN_RE = "[^a-zA-Z\\s]"


def clean_text(col: Column | str) -> Column:
    """Strip non-letters, lowercase. Null-safe: null in -> null out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, CLEAN_RE, ""))


def tokens(col: Column | str) -> Column:
    """Array of non-empty whitespace tokens of the *cleaned* text."""
    return F.filter(F.split(clean_text(col), " "), lambda t: t != "")


def token_hash60(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative integer hash of a string.

    Lower 15 hex digits of md5, parsed base-16. Chosen over Spark's
    ``hash()`` (murmur3) so DuckDB can reproduce it bit-for-bit:
    ``('0x' || substr(md5(w), 18, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 18, 15), 16, 10).cast("bigint")


def stable_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Two bag-of-words permutations of the same vocabulary get
    the same fingerprint — the scalable blocking key for dedup.
    DuckDB twin: ``md5(array_to_string(list_sort(list_distinct(...)), ' '))``.
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))
