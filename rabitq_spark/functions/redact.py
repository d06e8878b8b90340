"""PII detection and redaction — pure Column codegen (regexp only, no UDFs).

A corpus feeding model training must strip personally identifiable
information; the workhorse pass is regex-family redaction (emails, phone
numbers, IP addresses) applied at full-scan speed. Everything here is
`regexp_replace` / `regexp_extract_all` Column expressions — whole-stage
codegen, one scan, no shuffle, trivially parallel at 100 TB.

Cross-engine regex discipline (the oracle runs DuckDB/RE2, Spark runs Java
regex): patterns stay inside the common subset — character classes,
quantifiers, alternation; no backreferences, no lookaround, no \\b (Java's is
Unicode-aware, RE2's is ASCII — equal only on ASCII text). DuckDB's
regexp_replace needs the explicit 'g' flag to match Java's replace-all
default; counting uses match group 0 on both engines (Spark's
regexp_extract_all defaults to group 1 — always pass idx=0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — order matters (emails before IPs: an IP
#: inside an email-like token must be consumed by the email rule first), and
#: the oracle SQL must apply the same order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    ("phone", r"555-[0-9]{4}", "[PHONE]"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its rule token, rules applied in order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(col: Column | str, rule: str) -> Column:
    """Number of matches of one named rule (group 0 — engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat, _ in PII_RULES:
        if name == rule:
            return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
    raise KeyError(rule)
