"""Text normalization and PII scrubbing for training-data preparation.

Standard pre-training cleanup surface (absent in the reference, SURVEY §2.7):
redact personally-identifiable patterns (emails, URLs, IPv4 addresses, phone-
like digit runs) and canonicalize whitespace/case before dedup and tokenize —
scrubbing must run BEFORE near-dup signatures, or the same article with two
different tracking URLs never clusters.

Implementation constraint: every pattern is a regex subset valid in BOTH
Java's engine (Spark `regexp_replace`, codegen'd JVM-side — no Python in this
per-row hot path) and RE2 (the DuckDB oracle): explicit character classes,
bounded repetition, alternation — no lookaround, no backreferences.
Replacement order is fixed (URL → EMAIL → IP → PHONE) so a URL's digits are
already collapsed before the phone pattern scans; both engines apply the
same order, keeping results hash-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (token, pattern) in application order — see module docstring.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("<URL>", r"https?://[A-Za-z0-9./_?=&%#:~-]+"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("<PHONE>", r"[0-9]{3}[ .-][0-9]{3,4}[ .-][0-9]{3,4}"),
)


def scrub_pii(col: Column | str) -> Column:
    """Redact PII-shaped spans with typed placeholder tokens."""
    c = F.col(col) if isinstance(col, str) else col
    for token, pattern in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii` (RE2; 'g' flag = replace-all, which
    is Spark's default)."""
    out = expr
    for token, pattern in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip control chars, collapse whitespace runs, trim —
    the canonical form fed to shingling/fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\x00-\x1f]", " ")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_text`."""
    out = f"lower({expr})"
    out = f"regexp_replace({out}, '[\\x00-\\x1f]', ' ', 'g')"
    out = f"regexp_replace({out}, '[ \\t]+', ' ', 'g')"
    return f"trim({out})"
