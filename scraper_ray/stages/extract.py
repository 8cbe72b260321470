"""HTML link extraction with the reference extractor's semantics.

Mirrors `/root/reference/worker/src/extractor/html.rs:62-90` (HTMLLinkExtractor):
all ``<a>`` elements' ``href`` attributes, in document order, resolved against
the page's base URL, keeping only ``http``/``https`` schemes. Anchors without
an href are skipped; unparseable hrefs are dropped silently (the reference's
``filter_map``). Golden tests ported from `extractor/html.rs:93-172`.

Implemented as a compiled-regex scan (no HTML parser library here); the regex
is compiled once per actor/worker at import time — never per batch.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

# anchor open tags, case-insensitive; href value in single/double/no quotes
_ANCHOR_RE = re.compile(r"<a\b[^>]*>", re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def extract_links(html: str, base_url: str) -> list[str]:
    """Absolute http(s) link targets of all anchors, document order."""
    out: list[str] = []
    for m in _ANCHOR_RE.finditer(html):
        href_m = _HREF_RE.search(m.group(0))
        if not href_m:
            continue  # <a> with no href extracts nothing (html.rs:73)
        href = href_m.group(1) or href_m.group(2) or href_m.group(3) or ""
        try:
            absolute = urljoin(base_url, href.strip())
            scheme = urlsplit(absolute).scheme.lower()
        except ValueError:
            continue
        if scheme in ("http", "https"):  # scheme filter (html.rs:80-86)
            out.append(absolute)
    return out
