"""html_to_text extraction (sources/html_text.py): visible-text rules,
entity decoding, malformed-markup tolerance, and the WebSource wiring."""

from __future__ import annotations

import random

from magictables_spark.sources import WebSource
from magictables_spark.sources.html_text import html_to_text

DOC = """<!doctype html>
<html><head>
  <title>  The &amp; Title </title>
  <style>body { color: red }</style>
  <script>var hidden = "SCRIPT_TEXT";</script>
</head>
<body>
  <h1>Heading</h1>
  <p>First <b>bold</b> paragraph &mdash; with entities &lt;ok&gt;.</p>
  <div>Second<br/>line</div>
  <noscript>NOSCRIPT_TEXT</noscript>
  <ul><li>alpha</li><li>beta</li></ul>
</body></html>"""


def test_visible_text_and_title():
    out = html_to_text(DOC)
    assert out["title"] == "The & Title"
    t = out["text"]
    assert "Heading" in t and "First bold paragraph" in t
    assert "—" in t and "<ok>" in t  # entities decoded
    assert "SCRIPT_TEXT" not in t and "NOSCRIPT_TEXT" not in t
    assert "color: red" not in t
    # block tags break lines, inline tags don't
    assert "Second\nline" in t
    import re

    assert re.search(r"alpha\n+beta", t)


def test_inline_tags_do_not_split_words():
    out = html_to_text("<p>un<b>break</b>able</p>")
    assert out["text"] == "unbreakable"


def test_malformed_markup_never_raises():
    rng = random.Random(11)
    base = DOC.encode()
    for _ in range(500):
        data = bytearray(base)
        for _ in range(rng.randint(1, 20)):
            op = rng.random()
            if op < 0.5:
                data[rng.randrange(len(data))] = rng.randrange(256)
            elif op < 0.75 and len(data) > 30:
                i = rng.randrange(len(data) - 20)
                del data[i : i + rng.randint(1, 20)]
            else:
                i = rng.randrange(len(data) + 1)
                data[i:i] = rng.randbytes(rng.randint(1, 10))
        out = html_to_text(bytes(data).decode("utf-8", errors="replace"))
        assert isinstance(out["text"], str) and isinstance(out["title"], str)


def test_websource_extract_text_flag():
    src = WebSource("http://x.test/page", fetcher=lambda url, params: DOC, extract_text=True)
    [row] = src.fetch_data()
    assert row["url"] == "http://x.test/page"
    assert row["content"].startswith("<!doctype")
    assert row["title"] == "The & Title"
    assert "Heading" in row["text"]
    # default stays reference-shaped: content only
    [plain] = WebSource("http://x.test/p2", fetcher=lambda url, params: DOC).fetch_data()
    assert "text" not in plain and "title" not in plain
