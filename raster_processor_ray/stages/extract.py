"""HTML -> text extraction: the operator that PRODUCES the pages table's
``text`` column from ``html`` (input contract: ``url, warc_ts,
html:binary, text:string, lang``; the engine-wide invariant is
byte-identical extracted text per url through every stage — reference
analog: the reference's strict pass-through of pixel values it does not
own, products.py variable copies).

Two extraction modes, both pure RE2 chains over the whole string column
(``pc.replace_substring_regex`` — no per-row Python, no HTML parser
state, so the stage is a stateless ``map_batches`` task that streams):

- ``collapse_whitespace=False`` (default): drop ``<script>``/``<style>``
  blocks and comments, strip tags, decode the five named entities
  (&amp; &lt; &gt; &quot; &#39;) in the inverse order of
  :func:`escape_text_batch` — the EXACT inverse of ``render_html_batch``
  for any text, so extraction is byte-identical and re-runnable.
- ``collapse_whitespace=True``: browser-like normalization on top
  (block-end tags -> newline, runs of spaces/tabs -> one space, 3+
  newlines -> 2, strip) for real-crawl HTML where byte identity is not
  defined.

Determinism contract: output depends only on the input bytes (fixed
regex set, fixed order); invalid-UTF-8 html decodes with replacement
characters rather than failing the block.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# encode order: & first (else it would double-escape the others);
# decode order: & LAST (exact inverse).
_ENTITY_ENCODE = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                  ('"', "&quot;"), ("'", "&#39;")]
_ENTITY_DECODE = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&amp;", "&")]

# (?s): DOTALL so blocks spanning newlines are removed. RE2 is
# non-backtracking, so these are linear-time on adversarial input.
_DROP_BLOCKS = [
    r"(?s)<head\b[^>]*>.*?</head\s*>",   # title/style/meta never render
    r"(?s)<script\b[^>]*>.*?</script\s*>",
    r"(?s)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
_BLOCK_END = r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre)\s*>|<br\s*/?>"
_ANY_TAG = r"(?s)<[^>]*>"


def _utf8(col: pa.ChunkedArray | pa.Array):
    """binary -> string; invalid UTF-8 bytes become U+FFFD (a crawl
    corpus always contains some — failing the whole block is wrong)."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    try:
        return col.cast(pa.string())
    except pa.ArrowInvalid:
        py = col.to_pylist()
        return pa.array(
            [None if b is None else b.decode("utf-8", "replace") for b in py],
            type=pa.string())


def escape_text_batch(col) -> pa.ChunkedArray:
    """Entity-escape text for embedding in HTML (vectorized; inverse of
    the decode pass in :func:`extract_text_batch`)."""
    for lit, ent in _ENTITY_ENCODE:
        col = pc.replace_substring(col, lit, ent)
    return col


def render_html_batch(text_col, *, title: str = "page") -> pa.ChunkedArray:
    """Render a deterministic HTML document around escaped ``text``
    (fixed head/style/script chrome, body in ``<main>``). Used by the
    synthetic pages source and the round-trip oracle: for EVERY input
    string, ``extract_text_batch(render_html_batch(t)) == t`` byte-for-
    byte (no whitespace is touched in non-collapse mode)."""
    esc = escape_text_batch(_utf8(text_col))
    pre = (f"<html><head><title>{title}</title>"
           "<style>body{margin:0} main{padding:1em}</style></head>"
           "<body><script>var loaded=1;</script><main>")
    post = "</main><!-- footer --></body></html>"
    n = len(esc)
    return pc.binary_join_element_wise(
        pa.array([pre] * n), esc, pa.array([post] * n), "")


def extract_text_batch(html_col, *, collapse_whitespace: bool = False):
    """Extract visible text from an HTML string/binary column.

    One RE2 pass per rule over the whole column; see module docstring
    for the two modes. Null html -> null text (callers decide the fill).
    """
    s = _utf8(html_col)
    for pat in _DROP_BLOCKS:
        s = pc.replace_substring_regex(s, pat, "")
    if collapse_whitespace:
        s = pc.replace_substring_regex(s, _BLOCK_END, "\n")
    s = pc.replace_substring_regex(s, _ANY_TAG, "")
    if collapse_whitespace:
        # real-crawl extras (NOT part of the strict-inverse entity set)
        s = pc.replace_substring_regex(s, r"&(?:nbsp|#160);", " ")
    for ent, lit in _ENTITY_DECODE:
        s = pc.replace_substring(s, ent, lit)
    if collapse_whitespace:
        s = pc.replace_substring_regex(s, r"[ \t\r\f\v]+", " ")
        s = pc.replace_substring_regex(s, r" ?\n ?", "\n")
        s = pc.replace_substring_regex(s, r"\n{3,}", "\n\n")
        s = pc.replace_substring_regex(s, r"^\s+|\s+$", "")
    return s


def extract_text(ds, *, html_col: str = "html", out_col: str = "text",
                 collapse_whitespace: bool = False):
    """Dataset form: add/replace ``out_col`` with the text extracted
    from ``html_col``. Stateless map_batches — streams at any scale."""

    def fn(b: pa.Table) -> pa.Table:
        txt = extract_text_batch(b[html_col],
                                 collapse_whitespace=collapse_whitespace)
        if out_col in b.column_names:
            b = b.drop_columns([out_col])
        return b.append_column(out_col, txt)

    return ds.map_batches(fn, batch_format="pyarrow")
