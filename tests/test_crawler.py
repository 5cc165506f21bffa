"""Crawler operators: canonicalization, link extraction, domains, robots,
priority, and the end-to-end deterministic crawl over the fake web."""

import math

import pytest

from web_search_engine_ray.crawl.crawler import (
    compute_priority,
    crawl,
    looks_binary_by_suffix,
    write_log_csv,
)
from web_search_engine_ray.crawl.fakeweb import FakeWeb
from web_search_engine_ray.crawl.robots import RobotsCache
from web_search_engine_ray.crawl.urls import (
    LinkExtractor,
    canonicalize_url,
    get_domain,
    get_superdomain,
)


def test_canonicalize_vectors():
    # reference test vectors (HW1/test_parse.py behavior)
    assert canonicalize_url("https://GitHub.com/") == "https://github.com"
    assert (
        canonicalize_url("https://github.com?utm_source=foo&b=2&a=1")
        == "https://github.com?a=1&b=2"
    )
    assert canonicalize_url("https://example.com:443/") == "https://example.com"
    assert canonicalize_url("http://example.com:80/") == "http://example.com"
    assert canonicalize_url("https://example.com:8080/path") == "https://example.com:8080/path"
    assert canonicalize_url("https://example.com/page#fragment") == "https://example.com/page"
    assert canonicalize_url("https://x.com/a?fbclid=1&q=2") == "https://x.com/a?q=2"
    # reference's index-file collapse is dead code -> paths survive
    assert canonicalize_url("https://x.com/foo/index.html") == "https://x.com/foo/index.html"


def test_link_extractor_base_href():
    html = """
    <html><head><base href="https://GitHub.com/SomePage"></head><body>
      <a href="https://github.com/">Home</a>
      <a href="/Contact#team">Contact</a>
      <a href="javascript:void(0)">Bad</a>
      <a href="#frag">Frag</a>
      <a href="mailto:x@y.z">Mail</a>
    </body></html>"""
    ex = LinkExtractor("https://github.com/")
    ex.feed(html)
    assert ex.links == ["https://github.com", "https://github.com/Contact"]


def test_domains():
    assert get_domain("https://a.b.example.com/x") == "example.com"
    assert get_domain("https://news.bbc.co.uk/x") == "bbc.co.uk"
    assert get_domain("https://uni.ac.uk/") == "uni.ac.uk"
    assert get_domain("http://localhost/") == "localhost"
    assert get_superdomain("https://a.example.com") == "com"
    assert get_superdomain("https://bbc.co.uk") == "uk"


def test_binary_suffix_filter():
    assert looks_binary_by_suffix("https://x.com/a.PNG")
    assert looks_binary_by_suffix("https://x.com/a.tar.gz")
    assert not looks_binary_by_suffix("https://x.com/a.html")


def test_priority_formula():
    p, s, t = compute_priority(0, 0, 0)
    assert p == 1.0 and s == pytest.approx(0.1) and t == pytest.approx(2.1)
    p2, _, _ = compute_priority(6, 0, 0)
    assert p2 == pytest.approx(1.0 / math.log2(8))


def test_robots_cache():
    web = FakeWeb()
    rc = RobotsCache("bot", web.fetch_text)
    assert rc.can_fetch("https://site00.example.com/page1")
    assert not rc.can_fetch("https://site00.example.com/private/x")
    # unknown host -> robots fetch fails -> allow-all fallback
    rc2 = RobotsCache("bot", lambda u: None)
    assert rc2.can_fetch("https://whatever.example.org/x")
    assert not rc2.can_fetch("nohost")


def test_crawl_deterministic_and_policy(tmp_path):
    web = FakeWeb()
    seeds = [web.page_url(0, 1), web.page_url(1, 2)]
    rows = crawl(seeds, web.fetch, max_pages=40, max_depth=3,
                 robots_fetch_text=web.fetch_text)
    rows2 = crawl(seeds, web.fetch, max_pages=40, max_depth=3,
                  robots_fetch_text=web.fetch_text)
    assert rows == rows2, "crawl must be deterministic"
    assert 0 < len(rows) <= 40
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls), "no duplicate fetch accounting"
    assert all("/private/" not in u for u in urls), "robots must gate"
    assert all("cgi" not in u for u in urls)
    assert all(not looks_binary_by_suffix(u) for u in urls)
    assert all(r["depth"] <= 3 for r in rows)
    # counters: first page of a domain sees domain_count_before == 0
    first = rows[0]
    assert first["domain_count_before"] == 0 and first["page_score"] == 1.0
    # log sink round-trips
    out = tmp_path / "log.csv"
    write_log_csv(rows, str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == len(rows) + 1
    assert lines[0].startswith("ts_iso,url,status")


def test_crawl_ray_parallel_waves(ray_session):
    web = FakeWeb()
    seeds = [web.page_url(h, 0) for h in range(4)]
    rows = crawl(seeds, web.fetch, max_pages=30, max_depth=2,
                 robots_fetch_text=web.fetch_text, parallelism=4, use_ray=True)
    assert 0 < len(rows) <= 30
    assert len({r["url"] for r in rows}) == len(rows)
    # same schedule, same result (wave order is deterministic)
    rows2 = crawl(seeds, web.fetch, max_pages=30, max_depth=2,
                  robots_fetch_text=web.fetch_text, parallelism=4, use_ray=True)
    assert rows == rows2


def test_seed_from_query_parsing():
    from web_search_engine_ray.crawl.seeds import get_seeds_from_query

    page = """
    <html><body>
      <a class="result__a" href="//duckduckgo.com/l/?uddg=https%3A%2F%2Fexample.com%2Fa&x=1">A</a>
      <a class="result__a" href="https://direct.example.org/b">B</a>
      <a class="other" href="https://nope.example/c">C</a>
      <a class="result__a" href="//duckduckgo.com/l/?other=1">D</a>
      <a class="result__a" href="//duckduckgo.com/l/?notuddg=1">E</a>
    </body></html>"""
    seeds = get_seeds_from_query("q", lambda url, params: page, num_results=10)
    assert seeds == [
        "https://example.com/a",
        "https://direct.example.org/b",
        "//duckduckgo.com/l/?other=1",           # no redirect wrapper: raw href
        "https://duckduckgo.com/l/?notuddg=1",   # uddg= substring, param absent
    ]
    assert get_seeds_from_query("q", lambda u, p: page, num_results=1) == [
        "https://example.com/a"
    ]
