"""PII detection and redaction for training-corpus hygiene.

Counts and masks the three machine-recognizable PII classes a web-scale
text pipeline conventionally scrubs before training (emails, IPv4
addresses, phone-like digit runs).  Everything is a built-in JVM regex
expression — zero Python in the plan, zero shuffle: the operators are
embarrassingly row-parallel and run inside whole-stage codegen.

Cross-engine pattern discipline (the same rule functions/text.py
WS_CLASS exists for): Spark compiles java.util.regex, DuckDB compiles
RE2, and the two disagree on shorthand classes (`\\s` includes \\x0B in
Java but not RE2) and on features RE2 lacks (lookaround, backrefs).
Every pattern here therefore uses only the intersection — explicit
character classes, bounded quantifiers, `\\b` word boundaries — so a
DuckDB oracle can run the IDENTICAL pattern string and match
byte-for-byte.

The IPv4 pattern is deliberately the conventional naive form (it accepts
999.999.999.999): octet-range tightening triples the pattern for a
false-positive class that barely exists in real text, and corpus
scrubbing errs toward over-masking.  Phone matching is conservative —
strictly NANP-shaped (optional +1-3-digit country code, optional
parenthesized area code, then exactly 3-3-4 digit groups with
explicit separators) — to keep years, ISO dates, prices and long id
runs unmasked; bare 7-digit or unseparated international forms are
deliberately out of scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# NOTE: separator classes are explicit ([ .\-]) — never \s (engine-
# divergent) — and there is no lookaround (RE2 has none).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# NANP-shaped: optional +CC prefix, optional (area), then 3-3-4 digit
# groups.  The \b sits BEFORE the first digit group (not at the pattern
# start): '(' and '+' are non-word chars, so a leading \b would fail
# after a space, while the interior \b still blocks anchoring mid-way
# into a longer digit run.  Exactly-3/exactly-4 group widths keep ISO
# dates (2024-01-15: 4-2-2) and yyyy ranges unmatched.
PHONE_RE = (
    r"(\+[0-9]{1,3}[ .\-])?\(?\b[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}\b"
)

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# redaction applies in this fixed order; earlier passes consume their
# matches so later patterns cannot re-match inside a replacement (an
# email's digits are gone before the phone pass runs)
_PASSES = (
    (EMAIL_RE, EMAIL_TOKEN, "n_emails"),
    (IPV4_RE, IPV4_TOKEN, "n_ipv4"),
    (PHONE_RE, PHONE_TOKEN, "n_phones"),
)


def _count(col: Column, pattern: str) -> Column:
    # size(regexp_extract_all) rather than regexp_count: DuckDB has no
    # regexp_count, and the oracle must be able to transcribe the exact
    # same computation (len(regexp_extract_all(...)))
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts: ``doc_id, n_emails, n_ipv4, n_phones,
    has_pii`` (int 0/1).  Counts are taken on the progressively-redacted
    text, mirroring exactly what :func:`redact_pii` would mask — so
    stats and redaction can never disagree about a span claimed by two
    patterns (an IP inside a URL is counted once, by the first pass that
    matches it).
    """
    clash = {n for _, _, n in _PASSES} | {"has_pii"}
    # lowercase both sides: Spark resolves column names
    # case-INsensitively by default, so an input column `N_Emails`
    # collides at analysis time even though the literal names differ
    taken = {c for c in docs.columns if c.lower() in clash}
    if taken:
        # an input already carrying count columns (e.g. a previously
        # stats'd table joined back to text) would otherwise emit
        # DUPLICATE column names and the has_pii sum below would die on
        # AMBIGUOUS_REFERENCE — or silently pick one under lax configs
        raise ValueError(
            f"pii_stats output columns already present: {sorted(taken)}"
        )
    cols = [F.col(c) for c in docs.columns if c != text_col]
    # NULL text must yield 0-counts, not NULL: size(regexp_extract_all)
    # propagates NULL, which would make has_pii NULL and silently drop
    # the row from both `has_pii = 0` and `has_pii = 1` filters
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for pattern, token, name in _PASSES:
        counts.append(_count(cur, pattern).alias(name))
        cur = F.regexp_replace(cur, pattern, token)
    out = docs.select(*cols, *counts)
    total = None
    for _, _, name in _PASSES:
        c = F.col(name)
        total = c if total is None else total + c
    return out.withColumn("has_pii", (total > 0).cast("int"))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask every PII match with its class token, preserving all other
    columns.  Passes run in the fixed ``_PASSES`` order on the output of
    the previous pass (see module docstring)."""
    cur = F.col(text_col)
    for pattern, token, _ in _PASSES:
        cur = F.regexp_replace(cur, pattern, token)
    return docs.withColumn(text_col, cur)
