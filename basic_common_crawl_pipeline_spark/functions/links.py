"""Link discovery: ``<a href>`` extraction from HTML (north-rule addition;
the reference discards page content without link-following —
`python/worker.py:26-27` "TODO: process text").

Pure Python, shared by oracle and UDFs. Links are resolved against the
page URL, restricted to http(s), canonicalized, de-duplicated preserving
first-occurrence order (document order = deterministic discovery order).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

from .extract import decode_lossy
from .urls import canon_host_surt


class _LinkCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value:
                    self.hrefs.append(value)
                    break


def extract_links(html: bytes | str | None, base_url: str) -> list[str]:
    """All out-links of a page, canonicalized, first-occurrence order."""
    return [canon for canon, _h, _s in extract_links_rich(html, base_url)]


def extract_links_rich(
    html: bytes | str | None, base_url: str
) -> list[tuple[str, str, str]]:
    """``(canon_url, host, surt)`` per out-link, first-occurrence order —
    the crawl hot path's variant: host and surt come from the same single
    parse as the canonical form (functions/urls.py::canon_host_surt)
    instead of three more parses per link. ``extract_links`` is the
    canon-only view of the same core (oracle parity pinned by tests)."""
    decoded = decode_lossy(html)
    if not decoded:
        return []
    parser = _LinkCollector()
    try:
        parser.feed(decoded)
        parser.close()
    except Exception:
        return []
    seen: set[str] = set()
    out: list[tuple[str, str, str]] = []
    for href in parser.hrefs:
        try:
            absolute = urljoin(base_url, href.strip())
        except ValueError:
            continue
        canon, host, surt_key = canon_host_surt(absolute)
        if canon is not None and canon not in seen:
            seen.add(canon)
            out.append((canon, host, surt_key))
    return out
