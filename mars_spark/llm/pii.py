"""PII detection and redaction for training-data pipelines.

ADDITIVE — the reference has no PII operator (SURVEY.md §1.1); this is
the "scrub emails/IPs/phones before pretraining" step every corpus
pipeline runs. Design constraints at 100 TB:

- **Pure Column expressions.** Detection is ``regexp_count`` and
  redaction is chained ``regexp_replace`` — whole-stage codegen, a
  narrow per-row map with zero shuffle and zero Python.
- **Portable regexes.** Patterns stay inside the syntax intersection
  of Java regex (Spark) and RE2 (DuckDB/Go): character classes,
  bounded quantifiers, ``\\b`` word boundaries — no lookaround, no
  backrefs — so the SQL oracle replays detection bit-identically.
- **Composable.** ``redact`` applies the patterns in a fixed
  documented order (email first, so ``user@host.com`` is consumed
  whole before the narrower rules see its substrings). An email at a
  bare-IP host (``bob@10.0.0.1``) has no alphabetic TLD and falls to
  the IP rule — the address is still destroyed, the local part
  survives.

A production pipeline adds model-based NER behind ``mapInPandas``
for names/addresses; these regex rules are the JVM-side fast path
that needs no model artifact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed application order — email first so "user@10.0.0.1"-style hosts
# are consumed by the email rule before the IP rule sees them.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def pii_count(col: Column, kind: str) -> Column:
    """Occurrence count of one PII kind (email/ipv4/phone/ssn)."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(col, F.lit(pat))


def redact(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with its ``<KIND>`` token, applying the
    rules in PII_PATTERNS order (restricted to ``kinds`` if given)."""
    keep = set(kinds) if kinds is not None else None
    out = col
    for kind, pat, token in PII_PATTERNS:
        if keep is None or kind in keep:
            out = F.regexp_replace(out, pat, token)
    return out


def pii_report(col: Column) -> Column:
    """Struct of per-kind match counts plus the total — one projection
    that a quality-gate filter or per-source rollup consumes."""
    counts = {k: pii_count(col, k) for k, _, _ in PII_PATTERNS}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return F.struct(*[c.alias(k) for k, c in counts.items()],
                    total.alias("total"))
