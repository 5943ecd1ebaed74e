"""PII redaction over the documents/pages text column — the scrubbing
pass every training-data pipeline runs before tokenization (emails,
IPv4 addresses, phone-shaped numbers replaced with typed placeholders).

Reference analog: the per-point validity masking of
products.py:1818-1847 (M1) — a cheap stateless per-record rewrite; here
the "mask" rewrites byte spans instead of nulling rows.

Scale shape: stateless ``map_batches`` task, ONE RE2
``replace_substring_regex`` call per pattern per batch over the whole
Arrow string column (never per row), counts via
``count_substring_regex`` on the ORIGINAL text (so counts are
independent of replacement order). Patterns are RE2 (Arrow and DuckDB
share the RE2 engine, so the SQL oracle's ``regexp_replace(..., 'g')``
is byte-identical — same non-overlapping left-to-right match
semantics).

Replacement order is fixed (email, then IP, then phone) and the
placeholders contain no digits or '@', so later patterns can never
match text created by an earlier replacement.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible (no lookarounds/backrefs); shared verbatim with the SQL
# oracle via PII_PATTERNS.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text",
                    out_col: str = "text_scrubbed") -> pa.Table:
    """Append ``n_emails/n_ips/n_phones`` (matches in the original text)
    and ``out_col`` (text with all three pattern families replaced, in
    PII_PATTERNS order)."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text.cast(pa.string()), "")
    out = batch
    scrubbed = text
    for name, pat, repl in PII_PATTERNS:
        n = pc.count_substring_regex(text, pat)
        out = out.append_column(f"n_{name}s", n.cast(pa.int64()))
        scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
    return out.append_column(out_col, scrubbed)


def pii_scrub(ds, *, text_col: str = "text", out_col: str = "text_scrubbed"):
    """Dataset form: one streamed stateless pass."""
    import functools

    return ds.map_batches(
        functools.partial(pii_scrub_batch, text_col=text_col,
                          out_col=out_col),
        batch_format="pyarrow")
