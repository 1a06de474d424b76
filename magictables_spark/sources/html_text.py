"""Pure-stdlib HTML -> visible text extraction for WebSource.

The reference's WebSource returns raw HTML and never parses it (bs4 is
declared in its pyproject but unused — /root/reference/magictables/
sources.py:96-119); a training-data pipeline wants the visible text.
This is the real implementation of that gesture, on html.parser:

- <script>/<style>/<template>/<noscript> subtrees are dropped;
- block-level boundaries (p, div, li, br, headings, table rows, ...)
  become newlines, inline tags don't break words;
- entities decode via the parser (convert_charrefs);
- whitespace normalizes: runs of spaces/tabs collapse, >= 3 newlines
  collapse to blank-line paragraph breaks;
- the <title> is extracted separately.

html.parser is a tolerant state machine that never raises on malformed
markup (asserted by the mutation-fuzz test), so there is no exception
contract to wrap — garbage in, best-effort text out.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_SUBTREE = {"script", "style", "template", "noscript"}
_BLOCK = {
    "p", "div", "li", "ul", "ol", "br", "hr", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "aside", "blockquote", "pre", "figure", "figcaption",
    "form", "fieldset", "dl", "dt", "dd",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE and self._skip_depth:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.parts.append("\n")

    # malformed markup routes through here for <br/> style tags
    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            self.parts.append(data)


def html_to_text(html: str) -> dict:
    """Extract visible text + title. Returns {"title": str, "text": str}."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    raw = "".join(p.parts)
    # collapse horizontal whitespace, then squeeze newline runs
    text = re.sub(r"[ \t\r\f\v]+", " ", raw)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text).strip()
    title = re.sub(r"\s+", " ", "".join(p.title_parts)).strip()
    return {"title": title, "text": text}
