"""HTML -> text extraction (stages/extract.py): strict-inverse
round-trip, browser-mode golden, structured synthetic pages, and the
Dataset form."""

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from raster_processor_ray.stages.extract import (
    escape_text_batch, extract_text, extract_text_batch, render_html_batch)
from raster_processor_ray.sources.pages import make_pages_batch


def test_roundtrip_golden():
    texts = [
        "hello world :: https://site1.example/p/1",
        "entities & < > \" ' and literal &amp; &#39; &lt;b&gt;",
        "line1\nline2\n\n\tindented\t end  double-space",
        "",
        "</script><style> raw tag-ish text <notatag",
        "unicode ✓ émigré 中文 بيانات",
    ]
    col = pa.array(texts, type=pa.string())
    out = extract_text_batch(render_html_batch(col)).to_pylist()
    assert out == texts  # byte-identical, whitespace untouched


def test_null_html_stays_null():
    out = extract_text_batch(pa.array([None, "<p>x</p>"], type=pa.string()))
    assert out.to_pylist() == [None, "x"]


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_roundtrip_property(text):
    col = pa.array([text], type=pa.string())
    got = extract_text_batch(render_html_batch(col)).to_pylist()[0]
    assert got == text


def test_escape_is_injective_on_specials():
    col = pa.array(["&lt;", "<", "&amp;lt;"])
    esc = escape_text_batch(col).to_pylist()
    assert len(set(esc)) == 3


def test_browser_mode_golden():
    html = pa.array([
        b"<html><head><title>T</title><meta x></head><body>"
        b"<h1>Head</h1><p>para  one</p><p>para&nbsp;two &amp; more</p>"
        b"<script>var x=1;</script><!-- hidden --><ul><li>a</li><li>b</li>"
        b"</ul></body></html>",
        b"",
    ], type=pa.binary())
    out = extract_text_batch(html, collapse_whitespace=True).to_pylist()
    assert out[0] == "Head\npara one\npara two & more\na\nb"
    assert out[1] == ""


def test_invalid_utf8_replaced_not_fatal():
    html = pa.array([b"<p>ok</p>", b"<p>\xff\xfe</p>"], type=pa.binary())
    out = extract_text_batch(html, collapse_whitespace=True).to_pylist()
    assert out[0] == "ok"
    assert "�" in out[1]


def test_structured_pages_batch_invariant():
    t = make_pages_batch(0, 500, html_mode="structured")
    got = extract_text_batch(t["html"]).to_pylist()
    assert got == t["text"].to_pylist()
    # still the contract schema, html really is binary
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert pa.types.is_binary(t.schema.field("html").type)


def test_extract_text_dataset(ray_session):
    import ray.data as rd

    t = make_pages_batch(0, 400, html_mode="structured")
    noisy = t.drop_columns(["text"])
    out = (extract_text(rd.from_arrow(noisy), html_col="html")
           .to_pandas().sort_values("url").reset_index(drop=True))
    exp = t.select(["url", "text"]).to_pandas().sort_values(
        "url").reset_index(drop=True)
    assert (out["text"] == exp["text"]).all()
