"""PII detection and redaction — the scrubbing pass a training-data
pipeline runs before anything else sees the text.

All native Catalyst expressions (``regexp_count`` / ``regexp_replace``)
so the scrub runs at scan speed inside whole-stage codegen: no shuffle,
no Python, output partitioning = input partitioning. At 100 TB this is
a pure map stage that pipelines with the filters around it.

Pattern notes: the defaults deliberately stay inside the common subset
of Java regex (Spark) and RE2 (DuckDB/Go) — no backreferences, no
lookaround — so the same pattern string is portable to the oracle and
to other engines. Word boundaries (``\\b``) and bounded repetition are
in both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "pii_features", "pii_scrub"]

#: name -> (regex, replacement token). Order is the application order
#: of the redaction pass (emails before phones so an address is never
#: half-eaten by the phone pattern).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def _count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern))


def pii_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-doc PII match counts (one ``n_<kind>`` column per pattern)
    and a total — the audit half: measure leakage without rewriting."""
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    counts = [_count(t, rx).alias(f"n_{k}") for k, (rx, _) in pats.items()]
    total = None
    for k in pats:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return df.select(F.col(id_col), *counts).withColumn("n_pii", total)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str = "clean_text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Redaction pass: counts per kind plus the masked text. Patterns
    apply in dict order, each replacing every match with its token, so
    downstream tokenizers see stable placeholder vocabulary instead of
    unique secrets. ``keep_cols`` carries extra columns through so the
    scrub chains with downstream gates in one narrow pass."""
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    counts = [_count(t, rx).alias(f"n_{k}") for k, (rx, _) in pats.items()]
    masked = t
    for rx, repl in pats.values():
        masked = F.regexp_replace(masked, rx, repl)
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], *counts,
        masked.alias(out_col),
    )
