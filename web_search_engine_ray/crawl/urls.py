"""URL canonicalization, link extraction, and domain parsing.

Behavior parity with the reference crawler (``HW1/crawl/parse.py:4-88``,
``HW1/crawl/helpers.py:3-23``):

- canonicalize: lowercase scheme/host, drop fragment, drop default ports,
  strip ``utm_*``/``fbclid``/``gclid`` query params, sort remaining query
  pairs, collapse a bare root path ``/`` to ``""``. NOTE the reference's
  index-file collapse (``/index.html`` -> ``/``) is dead code — it computes
  the collapsed path and then reassigns ``path = parsed.path`` two lines
  later (``parse.py:41-50``) — so the OBSERVED behavior, which we match, has
  no index collapse.
- link extraction: ``<a href>`` resolved against the page URL (or the first
  ``<base href>``), skipping mailto/javascript/tel/ftp/file/data/blob and
  pure-fragment links; every link canonicalized.
- domain: registrable eTLD+1 with ``co.uk``/``ac.uk`` special-cased;
  superdomain = the TLD label.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import parse_qsl, urldefrag, urlencode, urljoin, urlparse, urlunparse

_SKIP_SCHEMES = ("mailto:", "javascript:", "tel:", "ftp:", "file:", "data:", "blob:")
_TRACKING = ("fbclid", "gclid")


def canonicalize_url(url: str) -> str:
    url, _ = urldefrag(url)
    p = urlparse(url)
    scheme = p.scheme.lower()
    netloc = p.hostname.lower() if p.hostname else ""
    try:
        port = p.port
    except ValueError:
        port = None
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{netloc}:{port}"
    pairs = [
        (k, v)
        for k, v in parse_qsl(p.query, keep_blank_values=True)
        if not k.lower().startswith("utm_") and k.lower() not in _TRACKING
    ]
    pairs.sort()
    path = p.path or ""
    if path == "/":
        path = ""
    return urlunparse((scheme, netloc, path, "", urlencode(pairs), ""))


class LinkExtractor(HTMLParser):
    """Collect canonicalized <a href> targets; honor the first <base href>."""

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.base_url = base_url
        self._base_seen = False

    def handle_starttag(self, tag, attrs):
        t = tag.lower()
        if t == "a":
            href = dict(attrs).get("href")
            if not href:
                return
            href = href.strip()
            if href.startswith(_SKIP_SCHEMES) or href.startswith("#"):
                return
            self.links.append(canonicalize_url(urljoin(self.base_url, href)))
        elif t == "base" and not self._base_seen:
            href = dict(attrs).get("href")
            if href:
                self.base_url = canonicalize_url(urljoin(self.base_url, href.strip()))
                self._base_seen = True


def get_domain(url: str) -> str:
    host = urlparse(url).hostname or ""
    parts = host.split(".")
    if len(parts) < 2:
        return host
    if parts[-2] in ("co", "ac") and parts[-1] == "uk":
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def get_superdomain(url: str) -> str:
    host = urlparse(url).hostname or ""
    parts = host.split(".")
    return parts[-1] if parts else ""
