"""Minimal HTML event parsing on stdlib ``html.parser``.

Produces exactly the three views the extraction operators need
(reference html_data_extractor.py:143-155 derives the same three from a
BeautifulSoup tree; bs4 is unavailable here, so this is a from-scratch
stdlib equivalent — not a port):

- ``texts``: document-order list of stripped, non-empty text nodes
  (== ``soup.stripped_strings`` after the fetcher's pre-shrink removed
  <script>/<style>, reference fetcher_service.py:30-41 — we fold that
  removal in here by skipping those subtrees),
- ``anchors``: document-order ``(href, text)`` for every <a href=...>,
  text being the concatenation of the anchor's stripped strings
  (== ``a.get_text(strip=True)``),
- ``address_segments``: whitespace-collapsed text of every <address>
  element or element with ``itemprop="address"``
  (== reference html_data_extractor.py:100-105).
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_SUBTREES = {"script", "style"}
# void elements never get an end tag; don't push them on the stack
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class PageDoc(HTMLParser):
    """One-pass event parser collecting texts / anchors / address segments."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[str] = []
        self.anchors: list[tuple[str, str]] = []
        self.address_segments: list[str] = []
        # graft: <img src alt> pairs for the image+caption payload
        # (the reference has no image path — web_fetcher.py:36-39 drops
        # non-HTML responses; collecting these is axes-A+B graft work)
        self.images: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._anchor_href: str | None = None
        self._anchor_depth = 0
        self._anchor_texts: list[str] = []
        self._addr_depth_stack: list[int] = []
        self._addr_texts: list[str] = []
        self._depth = 0

    # -- tag events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "img":
            attrd = dict(attrs)
            src = attrd.get("src")
            if src:
                self.images.append((src, attrd.get("alt") or ""))
        if tag in _VOID:
            return
        self._depth += 1
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        attrd = dict(attrs)
        if tag == "a" and attrd.get("href") is not None and self._anchor_href is None:
            self._anchor_href = attrd["href"]
            self._anchor_depth = self._depth
            self._anchor_texts = []
        if tag == "address" or attrd.get("itemprop") == "address":
            self._addr_depth_stack.append(self._depth)
            if len(self._addr_depth_stack) == 1:
                self._addr_texts = []

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        if tag in _SKIP_SUBTREES and self._skip_depth > 0:
            self._skip_depth -= 1
            self._depth -= 1
            return
        if self._anchor_href is not None and tag == "a" and self._depth == self._anchor_depth:
            self.anchors.append((self._anchor_href, "".join(self._anchor_texts)))
            self._anchor_href = None
        if self._addr_depth_stack and self._depth == self._addr_depth_stack[-1]:
            self._addr_depth_stack.pop()
            if not self._addr_depth_stack:
                segment = " ".join(" ".join(self._addr_texts).split())
                self.address_segments.append(segment)
        self._depth -= 1

    def handle_startendtag(self, tag, attrs):
        # self-closing form: no text can nest inside, but <img .../> still
        # needs its src/alt collected
        if tag == "img":
            attrd = dict(attrs)
            src = attrd.get("src")
            if src:
                self.images.append((src, attrd.get("alt") or ""))

    # -- text events -----------------------------------------------------
    def handle_data(self, data):
        if self._skip_depth:
            return
        stripped = data.strip()
        if not stripped:
            return
        self.texts.append(stripped)
        if self._anchor_href is not None:
            self._anchor_texts.append(stripped)
        if self._addr_depth_stack:
            self._addr_texts.append(stripped)


def parse_page(html: str) -> PageDoc:
    doc = PageDoc()
    try:
        doc.feed(html or "")
        doc.close()
    except Exception:
        # malformed HTML: keep whatever was collected (bs4's html.parser
        # backend is similarly forgiving)
        pass
    return doc


def page_text(doc: PageDoc) -> str:
    """Space-joined stripped strings (reference html_data_extractor.py:146)."""
    return " ".join(doc.texts)


def text_with_newlines(doc: PageDoc) -> str:
    """Newline-joined stripped strings (reference html_data_extractor.py:150)."""
    return "\n".join(doc.texts)
