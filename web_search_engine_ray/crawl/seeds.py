"""Seed acquisition: search-engine result pages -> seed URLs.

Parity with ``HW1/crawl/seed_from_query.py:5-28``: parse a DuckDuckGo-style
HTML result page, take the first N ``result__a`` anchors, and unwrap the
``uddg=`` redirect parameter. The HTTP GET is injected
(``fetch_html(url, params) -> html str``) — there is no network in this
container; tests feed a canned result page, production feeds a real client.
HTML parsing uses stdlib ``html.parser`` (no bs4 dependency).
"""

from __future__ import annotations

from collections.abc import Callable
from html.parser import HTMLParser
from urllib.parse import parse_qs, unquote, urlparse


class _ResultAnchors(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag.lower() != "a":
            return
        a = dict(attrs)
        classes = (a.get("class") or "").split()
        if "result__a" in classes and a.get("href"):
            self.hrefs.append(a["href"])


def parse_result_links(html: str, num_results: int = 10) -> list[str]:
    p = _ResultAnchors()
    p.feed(html)
    out = []
    for href in p.hrefs[:num_results]:
        if "uddg=" in href:
            qs = parse_qs(urlparse(href).query)
            if "uddg" in qs:
                out.append(unquote(qs["uddg"][0]))
            else:
                out.append("https:" + href)
        else:
            out.append(href)
    return out


def get_seeds_from_query(
    query: str,
    fetch_html: Callable[[str, dict], str],
    num_results: int = 10,
) -> list[str]:
    html = fetch_html("https://duckduckgo.com/html/", {"q": query})
    return parse_result_links(html, num_results)
