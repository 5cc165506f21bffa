"""robots.txt cache with allow-all fallback (``HW1/crawl/robots.py:3-31``).

The fetch is injected (this container has no network): ``fetch_text(url) ->
str | None``. ``None`` / exceptions fall back to allow-all, like the
reference. One parser cached per ``https://{host}/robots.txt``.
"""

from __future__ import annotations

import urllib.robotparser
from collections.abc import Callable
from urllib.parse import urlparse


class RobotsCache:
    def __init__(self, user_agent: str, fetch_text: Callable[[str], str | None] | None = None):
        self.user_agent = user_agent
        self.fetch_text = fetch_text
        self.cache: dict[str, urllib.robotparser.RobotFileParser] = {}

    def _parser_for(self, robots_url: str):
        rp = urllib.robotparser.RobotFileParser()
        text = None
        if self.fetch_text is not None:
            try:
                text = self.fetch_text(robots_url)
            except Exception:
                text = None
        if text is None:
            rp.parse(["User-agent: *", "Disallow:"])  # allow-all fallback
        else:
            rp.parse(text.splitlines())
        return rp

    def can_fetch(self, url: str) -> bool:
        host = urlparse(url).netloc
        if not host:
            return False
        robots_url = f"https://{host}/robots.txt"
        rp = self.cache.get(robots_url)
        if rp is None:
            rp = self._parser_for(robots_url)
            self.cache[robots_url] = rp
        return rp.can_fetch(self.user_agent, url)
