"""Deterministic synthetic web for crawler tests (no network in this
container; real HTTP fetching is the one stubbed step — inject your own
``fetch`` for production, everything else is real).

Splitmix-seeded site graph: ~N hosts (including ``.co.uk`` ones), each with a
tree of pages linking within and across hosts; sprinkled binary-suffix links,
``cgi`` paths, tracking params, fragments, an occasional redirect and 404,
and per-host robots.txt rules that disallow ``/private/``.
"""

from __future__ import annotations

import numpy as np

SEED = 42


def _mix(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


class FakeWeb:
    def __init__(self, n_hosts: int = 12, pages_per_host: int = 30, seed: int = SEED):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.seed = seed

    def host(self, h: int) -> str:
        if h % 5 == 4:
            return f"site{h:02d}.example.co.uk"
        return f"site{h:02d}.example.com"

    def page_url(self, h: int, p: int) -> str:
        return f"https://{self.host(h)}/page{p}"

    def robots_txt(self, host: str) -> str:
        return "User-agent: *\nDisallow: /private/\n"

    def _links_for(self, h: int, p: int) -> list[str]:
        k = _mix(self.seed * 1000003 + h * 10007 + p)
        links = []
        # intra-host children
        for j in range(3):
            child = (_mix(k + j) % self.pages_per_host)
            links.append(f"/page{child}?utm_source=x&b=2&a=1#frag")
        # cross-host link
        other = (_mix(k + 7) % self.n_hosts)
        links.append(self.page_url(other, _mix(k + 8) % self.pages_per_host))
        # junk that must be filtered
        if k % 3 == 0:
            links.append("/assets/logo.png")
        if k % 4 == 0:
            links.append("/cgi-bin/tool")
        if k % 5 == 0:
            links.append("/private/secret")
        if k % 6 == 0:
            links.append("javascript:void(0)")
        return links

    def html_for(self, h: int, p: int) -> str:
        anchors = "\n".join(f'<a href="{u}">x</a>' for u in self._links_for(h, p))
        return f"<html><body><h1>site {h} page {p}</h1>\n{anchors}\n</body></html>"

    def fetch(self, url: str, timeout: float = 5.0, ua: str = "bot") -> dict:
        """``fetch_url``-shaped response: {final_url, status, body}."""
        from urllib.parse import urlparse

        p = urlparse(url)
        host, path = p.hostname or "", p.path or ""
        try:
            h = int(host.split(".")[0].removeprefix("site"))
        except ValueError:
            return {"final_url": url, "status": 404, "body": b""}
        if path == "/robots.txt":
            return {"final_url": url, "status": 200, "body": self.robots_txt(host).encode()}
        if path.startswith("/private/"):
            return {"final_url": url, "status": 403, "body": b""}
        if not path.startswith("/page"):
            return {"final_url": url, "status": 404, "body": b""}
        try:
            pg = int(path.removeprefix("/page"))
        except ValueError:
            return {"final_url": url, "status": 404, "body": b""}
        if pg >= self.pages_per_host:
            return {"final_url": url, "status": 404, "body": b""}
        k = _mix(self.seed + h * 131 + pg)
        if k % 17 == 0:  # deterministic redirect to the host root page
            final = self.page_url(h, 0)
            if final != url:
                return {"final_url": final, "status": 200, "body": self.html_for(h, 0).encode()}
        if k % 13 == 0:
            return {"final_url": url, "status": 404, "body": b""}
        return {"final_url": url, "status": 200, "body": self.html_for(h, pg).encode()}

    def fetch_text(self, url: str) -> str | None:
        res = self.fetch(url)
        if res["status"] != 200:
            return None
        return res["body"].decode()
