"""Crawl against a REAL local HTTP server: every other crawl test injects a
fake transport, so this is the one place the actual network stack
(HttpxTransport -> sockets -> aiohttp server) runs end-to-end — robots.txt
fetch, page fetch, link expansion, redirect non-following, 404 handling."""

import asyncio
import threading

import pytest

from modern_search_engines_project_tpu.crawler import (
    Crawler,
    CrawlStore,
    Fetcher,
)
from modern_search_engines_project_tpu.crawler.fetch import HttpxTransport


def _page(title, links, extra=""):
    # page body mirrors tests/test_crawler._page — scores above the
    # tueEngScore link-expansion gate (metric.py parity)
    anchors = "".join(f'<a href="{u}">{u}</a>' for u in links)
    return (
        f"<html><head><title>{title}</title></head><body><main>"
        f"Tuebingen Tuebingen Tuebingen is a university town in Germany on "
        f"the Neckar river in Baden-Wuerttemberg in the Swabian hills. The "
        f"research institute and the faculty campus host a seminar and a "
        f"lecture for every professor. Stocherkahn punting starts at the "
        f"Marktplatz. {extra} {anchors}</main></body></html>"
    )


@pytest.fixture()
def live_site():
    """Aiohttp server on an OS-assigned loopback port, run in a thread."""
    from aiohttp import web

    ready = threading.Event()
    state = {}

    def make_app(base):
        routes = {
            "/robots.txt": (
                "User-agent: *\nDisallow: /private\nCrawl-delay: 0\n",
                "text/plain",
            ),
            "/": (_page("Home", [f"{base}/a", f"{base}/b",
                                 f"{base}/private/x"]), "text/html"),
            "/a": (_page("Alpha", [f"{base}/b"], "alpha law faculty"),
                   "text/html"),
            "/b": (_page("Beta", [f"{base}/"], "beta library science"),
                   "text/html"),
            "/private/x": (_page("Secret", []), "text/html"),
        }

        async def handler(request):
            item = routes.get(request.path)
            if item is None:
                return web.Response(status=404, text="nope")
            body, ctype = item
            return web.Response(text=body, content_type=ctype)

        app = web.Application()
        app.router.add_get("/{tail:.*}", handler)
        return app

    def run():
        from aiohttp import web

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)

        async def start():
            runner = web.AppRunner(make_app("http://127.0.0.1:0"))
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            port = runner.addresses[0][1]
            base = f"http://127.0.0.1:{port}"
            # rebuild with correct absolute links now that the port is known
            await runner.cleanup()
            runner2 = web.AppRunner(make_app(base))
            await runner2.setup()
            site2 = web.TCPSite(runner2, "127.0.0.1", port)
            await site2.start()
            state["base"] = base
            state["runner"] = runner2
            ready.set()

        loop.run_until_complete(start())
        state["loop"] = loop
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(10), "live test server failed to start"
    yield state["base"]
    state["loop"].call_soon_threadsafe(state["loop"].stop)


class TestLiveHttpCrawl:
    def test_crawl_over_real_sockets(self, live_site, tmp_path):
        store = CrawlStore(str(tmp_path / "live.sqlite"))
        crawler = Crawler(
            store, Fetcher(HttpxTransport(timeout=5.0)), max_pages=10
        )
        crawler.robots.delay = lambda d: 0.0
        n = asyncio.run(crawler.run(seeds=[live_site + "/"]))
        assert n >= 3, n
        docs = list(store.iter_documents(min_score=0.0))
        urls = {d.url for d in docs}
        assert live_site + "/a" in urls
        assert live_site + "/b" in urls
        # robots.txt honored over the real stack: /private never stored
        assert not any("/private" in u for u in urls), urls
        titles = {d.title for d in docs}
        assert {"Home", "Alpha", "Beta"} <= titles
