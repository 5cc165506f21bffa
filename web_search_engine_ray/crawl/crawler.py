"""Priority-frontier crawler with the reference's exact policy, Ray-ready.

Policy parity with ``HW1/crawl/crawler.py``:

- priority = ``1/log2(2 + domain_count) + 0.1/log2(2 + superdomain_count)
  + 1/(1 + depth)`` computed at enqueue time (``crawler.py:37-43``);
- frontier = max-heap of ``(-prio, depth, seq, url, prio)``, capped at 10k
  and trimmed to the best 2k (``crawler.py:184-189``);
- lazy robots check at POP time (seeds checked up front) (``crawler.py:72-74``);
- dedupe on the FINAL (post-redirect) url; per-domain / per-superdomain
  counters bumped at fetch accounting (``crawler.py:94-113``);
- children: oversample 200 / keep <=100 when a page has >100 links, binary
  suffix blacklist, ``cgi`` substring filter, visited/in-frontier dedupe
  (``crawler.py:140-182``);
- stop at ``max_pages``; don't expand children when body empty, depth at
  ``max_depth``, or status >= 400.

Differences: the fetch function is INJECTED (no network here — use
``FakeWeb.fetch`` in tests, a real HTTP client in production) and the crawl
loop is deterministic: a seeded RNG replaces the global ``random`` and
fetches happen in priority waves (``parallelism`` URLs popped together and
fetched concurrently as Ray tasks when ``use_ray=True``), replacing the
reference's 32 racing threads with a reproducible schedule.
"""

from __future__ import annotations

import heapq
import math
import random
import time
from urllib.parse import urldefrag, urlparse

from web_search_engine_ray.crawl.robots import RobotsCache
from web_search_engine_ray.crawl.urls import LinkExtractor, get_domain, get_superdomain

BINARY_SUFFIXES = (
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".ico",
    ".pdf", ".zip", ".tar", ".gz", ".tgz", ".bz2", ".xz", ".rar", ".7z",
    ".mp3", ".wav", ".flac", ".mp4", ".avi", ".mov", ".mkv", ".webm",
    ".css", ".js", ".woff", ".woff2", ".ttf", ".eot",
)
SUPERDOMAIN_WEIGHT = 0.1
MAX_KEEP = 100
OVERSAMPLE = 200
FRONTIER_CAP = 10_000
FRONTIER_KEEP = 2_000

LOG_COLUMNS = [
    "ts_iso", "url", "status", "depth", "bytes", "domain", "superdomain",
    "domain_count_before", "super_count_before",
    "page_score", "super_score", "total_priority", "priority_at_pop",
]


def looks_binary_by_suffix(url: str) -> bool:
    path = urlparse(url).path.lower()
    return any(path.endswith(ext) for ext in BINARY_SUFFIXES)


def compute_priority(domain_before: int, super_before: int, depth: int):
    page = 1.0 / math.log2(2.0 + float(domain_before))
    sup = SUPERDOMAIN_WEIGHT / math.log2(2.0 + float(super_before))
    dep = 1.0 / (1.0 + depth)
    return page, sup, page + sup + dep


def crawl(
    seeds: list[str],
    fetch,
    max_pages: int = 50,
    max_depth: int = 3,
    user_agent: str = "wse-ray-crawler",
    robots_fetch_text=None,
    seed: int = 1234,
    parallelism: int = 1,
    use_ray: bool = False,
) -> list[dict]:
    """Run the crawl; returns the log rows (dicts keyed by LOG_COLUMNS)."""
    rng = random.Random(seed)
    robots = RobotsCache(user_agent, robots_fetch_text)
    visited: set[str] = set()
    in_frontier: set[str] = set()
    per_domain: dict[str, int] = {}
    per_super: dict[str, int] = {}
    frontier: list = []
    rows: list[dict] = []
    seq = 0

    for s in seeds:
        s = (s or "").strip()
        if not s:
            continue
        s, _ = urldefrag(s)
        if not robots.can_fetch(s):
            continue
        if s in visited or s in in_frontier:
            continue
        _, _, prio = compute_priority(
            per_domain.get(get_domain(s), 0), per_super.get(get_superdomain(s), 0), 0
        )
        heapq.heappush(frontier, (-prio, 0, seq, s, prio))
        in_frontier.add(s)
        seq += 1

    ray_fetch = None
    if use_ray:
        import ray

        ray_fetch = ray.remote(num_cpus=0.25)(lambda u: fetch(u))

    while frontier and len(rows) < max_pages:
        # pop a priority wave
        wave = []
        while frontier and len(wave) < max(1, parallelism):
            neg, depth, _, url, prio_at_pop = heapq.heappop(frontier)
            in_frontier.discard(url)
            if not robots.can_fetch(url):  # lazy robots check at pop time
                continue
            wave.append((url, depth, prio_at_pop))
        if not wave:
            continue
        if ray_fetch is not None:
            import ray

            results = ray.get([ray_fetch.remote(u) for u, _, _ in wave])
        else:
            results = [fetch(u) for u, _, _ in wave]

        for (url, depth, prio_at_pop), res in zip(wave, results):
            if len(rows) >= max_pages:
                break
            final_url = res["final_url"]
            try:
                status = int(res["status"])
            except (TypeError, ValueError):
                status = 0
            body = res["body"]
            if final_url in visited:
                continue
            domain = get_domain(final_url)
            superdomain = get_superdomain(final_url)
            d_before = per_domain.get(domain, 0)
            s_before = per_super.get(superdomain, 0)
            page_score, super_score, total_priority = compute_priority(
                d_before, s_before, depth
            )
            rows.append(
                {
                    "ts_iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(0)),
                    "url": final_url,
                    "status": status,
                    "depth": depth,
                    "bytes": len(body) if body else 0,
                    "domain": domain,
                    "superdomain": superdomain,
                    "domain_count_before": d_before,
                    "super_count_before": s_before,
                    "page_score": round(page_score, 3),
                    "super_score": round(super_score, 3),
                    "total_priority": round(total_priority, 3),
                    "priority_at_pop": round(prio_at_pop, 3),
                }
            )
            visited.add(final_url)
            per_domain[domain] = d_before + 1
            per_super[superdomain] = s_before + 1

            if (not body) or (depth >= max_depth) or (status >= 400):
                continue

            parser = LinkExtractor(final_url)
            parser.feed(body.decode("utf-8", errors="replace"))
            links = parser.links
            if len(links) > MAX_KEEP:
                idx = rng.sample(range(len(links)), min(OVERSAMPLE, len(links)))
                links = [links[i] for i in idx]
            to_enqueue = []
            page_seen: set[str] = set()  # same href repeated within a page
            for child in links:
                if looks_binary_by_suffix(child):
                    continue
                if child in visited or child in in_frontier or child in page_seen:
                    continue
                page_seen.add(child)
                if "cgi" in child.lower():
                    continue
                cd, csd = get_domain(child), get_superdomain(child)
                _, _, tp = compute_priority(
                    per_domain.get(cd, 0), per_super.get(csd, 0), depth + 1
                )
                to_enqueue.append((-tp, depth + 1, seq, child, tp))
                seq += 1
            accepted = 0
            for item in to_enqueue:
                child = item[3]
                if child not in visited and child not in in_frontier:
                    heapq.heappush(frontier, item)
                    in_frontier.add(child)
                    accepted += 1
                    if accepted >= MAX_KEEP:
                        break
            if len(frontier) > FRONTIER_CAP:
                frontier[:] = heapq.nsmallest(FRONTIER_KEEP, frontier, key=lambda x: x[0])
                heapq.heapify(frontier)
                in_frontier.intersection_update({x[3] for x in frontier})

    return rows


def write_log_csv(rows: list[dict], path: str) -> None:
    """The reference's crawl-log CSV sink (``crawler.py:226-234``)."""
    import csv

    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(LOG_COLUMNS)
        for r in rows:
            w.writerow([r[c] for c in LOG_COLUMNS])
