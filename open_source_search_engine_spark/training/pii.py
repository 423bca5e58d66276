"""PII detection and redaction for training-corpus curation.

Production LLM pipelines scrub personally identifiable information from
web text before training (C4 drops pages on a blocklist; later pipelines
redact emails/phones/IDs in place).  This module does both, entirely
JVM-side:

  * ``pii_profile`` — per-document match counts per PII class
    (``regexp_count``, whole-stage codegen; the usual gate is
    "drop the doc if total > k, else redact"),
  * ``pii_redact`` — in-place replacement with typed placeholders
    (``regexp_replace``; all occurrences).

Patterns deliberately stay inside the Java-regex ∩ RE2 common subset
(character classes, bounded quantifiers, ``\\b``) so the same pattern
text runs identically in Spark and in the DuckDB oracle — no engine-
specific syntax.

Scale: a linear scan with no shuffle at all — the operator is
embarrassingly parallel and fuses into whatever projection reads the
text column; at 100 TB the only cost is the scan you were already
paying.  Order of redaction is fixed (SSN before phone before IPv4
before email) so overlapping matches resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: more-specific patterns first so redaction is deterministic
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
]


def pii_profile(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ssn, n_phone, n_ipv4, n_email, n_pii) — counts are over
    the RAW text per class (overlaps between classes each count; the
    redaction path is where precedence applies)."""
    cols: list[Column] = [F.col(id_col)]
    total = F.lit(0).cast("long")
    for name, pat, _ in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    cols.append(total.alias("n_pii"))
    return docs.select(*cols)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All columns preserved; ``text_col`` rewritten with typed
    placeholders, applying ``PII_PATTERNS`` in order."""
    out = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return docs.withColumn(text_col, out)
