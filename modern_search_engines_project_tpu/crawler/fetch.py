"""Async polite fetch layer (reference C11, urlRequestManagement.py).

httpx AsyncClient, 1.5 s timeout, redirects NOT followed (the status policy
decides, urlRequestManagement.py:98), per-domain robots.txt fetched+cached
alongside the first page of a domain (urlRequestManagement.py:38-85).
The transport is injectable so tests run fully offline.
"""

from __future__ import annotations

import asyncio
import dataclasses
import urllib.parse
from typing import Callable, Dict, List, Optional

from modern_search_engines_project_tpu.crawler.helpers import get_domain
from modern_search_engines_project_tpu.crawler.robots import USER_AGENT

TIMEOUT_S = 1.5  # urlRequestManagement.py:98
HEADERS = {
    "User-Agent": f"{USER_AGENT} (+course-project; polite; contact: none)",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.5",
    "Accept-Language": "en;q=0.9,de;q=0.6",
}


@dataclasses.dataclass
class FetchResult:
    url: str
    status: int  # <=0 for connection failure
    text: str = ""
    content_type: str = ""
    location: Optional[str] = None  # redirect target
    retry_after: Optional[str] = None
    robots_text: Optional[str] = None  # set when robots was (re)fetched
    responded: bool = False


class HttpxTransport:
    """Real network transport."""

    def __init__(self, timeout: float = TIMEOUT_S):
        import httpx

        self._client = httpx.AsyncClient(
            timeout=timeout, follow_redirects=False, headers=HEADERS
        )

    async def get(self, url: str):
        resp = await self._client.get(url)
        return resp.status_code, dict(resp.headers), resp.text

    async def aclose(self):
        await self._client.aclose()


class Fetcher:
    def __init__(self, transport=None, max_concurrency: int = 100):
        self._transport = transport
        self._sem = asyncio.Semaphore(max_concurrency)
        self._robots_seen: Dict[str, bool] = {}

    def _ensure_transport(self):
        if self._transport is None:
            self._transport = HttpxTransport()
        return self._transport

    async def fetch_one(self, url: str) -> FetchResult:
        transport = self._ensure_transport()
        domain = get_domain(url)
        robots_text = None
        async with self._sem:
            # fetch robots.txt once per domain (cached flag; content cached
            # by the caller's RobotsCache)
            if domain and not self._robots_seen.get(domain):
                self._robots_seen[domain] = True
                try:
                    # robots.txt must come from the URL's full netloc —
                    # ``domain`` strips :port (reference getDomain regex,
                    # helpers.py), and fetching port 80 for a site on a
                    # non-default port fails silently, which would DROP the
                    # robots rules (caught by tests/test_crawl_live_http.py).
                    # urlsplit (not string slicing) so path-less URLs with a
                    # query/fragment don't leak it into the robots URL;
                    # userinfo is stripped.
                    parts = urllib.parse.urlsplit(url)
                    netloc = parts.netloc.rsplit("@", 1)[-1]
                    code, _h, body = await transport.get(
                        f"{parts.scheme}://{netloc}/robots.txt"
                    )
                    robots_text = body if 200 <= code < 300 else ""
                except Exception:
                    robots_text = ""
            try:
                code, headers, body = await transport.get(url)
            except Exception:
                return FetchResult(
                    url, status=0, robots_text=robots_text, responded=False
                )
        headers = {k.lower(): v for k, v in (headers or {}).items()}
        return FetchResult(
            url=url,
            status=code,
            text=body if 200 <= code < 300 else "",
            content_type=headers.get("content-type", ""),
            location=headers.get("location"),
            retry_after=headers.get("retry-after"),
            robots_text=robots_text,
            responded=True,
        )

    async def fetch_many(self, urls: List[str]) -> List[FetchResult]:
        """<= max_concurrency parallel fetches (asyncio.gather parity,
        urlRequestManagement.py:96-102)."""
        return list(
            await asyncio.gather(*(self.fetch_one(u) for u in urls))
        )

    async def aclose(self):
        if self._transport is not None and hasattr(self._transport, "aclose"):
            await self._transport.aclose()
