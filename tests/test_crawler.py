"""Crawler subsystem tests: robots, UTEMA, status policy, metric, frontier,
HTML parsing, storage checkpoint/resume, and a full offline crawl."""

import asyncio
import math
import time

import pytest

from modern_search_engines_project_tpu.crawler import (
    Crawler,
    CrawlStore,
    Fetcher,
    Frontier,
    StatusPolicy,
    Utema,
    english_score,
    parse_html,
    parse_retry_after,
    parse_robots,
    tue_eng_score,
    url_score,
)


class TestRobots:
    def test_basic_disallow(self):
        r = parse_robots("User-agent: *\nDisallow: /private/\n")
        assert not r.allowed("https://x.de/private/page")
        assert r.allowed("https://x.de/public/page")

    def test_longest_match_allow_wins(self):
        r = parse_robots(
            "User-agent: *\nDisallow: /a/\nAllow: /a/public/\n"
        )
        assert r.allowed("https://x.de/a/public/page")
        assert not r.allowed("https://x.de/a/secret")

    def test_agent_specific_group(self):
        txt = (
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: mse-tpu-crawler\nDisallow: /internal/\n"
        )
        r = parse_robots(txt)
        assert r.allowed("https://x.de/page")
        assert not r.allowed("https://x.de/internal/x")

    def test_crawl_delay_parsed(self):
        # NOTE: dead code in the reference (re.searcch typo); we honor it
        r = parse_robots("User-agent: *\nCrawl-delay: 7\n")
        assert r.crawl_delay == 7.0

    def test_crawl_delay_below_default_honored(self):
        # a declared delay below the 1.5 s default is the site opting in
        # to faster crawling; the default is only a fallback
        r = parse_robots("User-agent: *\nCrawl-delay: 0.1\n")
        assert r.crawl_delay == 0.1

    def test_empty_robots_allows(self):
        r = parse_robots(None)
        assert r.allowed("https://x.de/anything")
        assert r.crawl_delay == 1.5

    def test_multi_agent_header(self):
        txt = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
        r = parse_robots(txt)
        assert not r.allowed("https://x.de/x/1")


class TestUtema:
    def test_unweighted_start(self):
        u = Utema()
        assert u.update(2.0, t=0.0) == 2.0

    def test_recursion_matches_closed_form(self):
        # two samples dt apart: A = (e^-b*dt*x0 + x1) / (e^-b*dt + 1)
        u = Utema(beta=0.2)
        u.update(1.0, t=0.0)
        avg = u.update(3.0, t=5.0)
        d = math.exp(-0.2 * 5.0)
        assert abs(avg - (d * 1.0 + 3.0) / (d + 1.0)) < 1e-12

    def test_old_samples_decay(self):
        u = Utema(beta=0.2)
        u.update(5.0, t=0.0)
        avg = u.update(0.0, t=1000.0)
        assert avg < 0.01


class TestStatusPolicy:
    def test_ok_resets(self):
        p = StatusPolicy()
        p.record("https://a.de/x", 500, now=0.0)
        d = p.record("https://a.de/x", 200, now=1.0)
        assert d.action == "ok"
        assert p.urls["https://a.de/x"].failures == 0

    def test_retry_budget_5xx(self):
        p = StatusPolicy()
        actions = [
            p.record("https://a.de/x", 503, now=float(i)).action
            for i in range(5)
        ]
        assert actions[:4] == ["retry"] * 4
        assert actions[4] == "drop"

    def test_4xx_budget_2(self):
        p = StatusPolicy()
        a1 = p.record("https://a.de/x", 404, now=0.0)
        a2 = p.record("https://a.de/x", 404, now=1.0)
        assert a1.action == "retry" and a2.action == "drop"

    def test_backoff_doubles_and_caps(self):
        p = StatusPolicy()
        delays = [
            p.record("https://a.de/x", 429, now=float(i)).delay
            for i in range(9)
        ]
        assert delays[1] > delays[0]
        assert all(d <= 3600.0 * 1.26 for d in delays)

    def test_retry_after_honored(self):
        p = StatusPolicy()
        d = p.record("https://a.de/x", 429, retry_after="120", now=0.0)
        assert d.delay >= 120

    def test_redirect_loop_dropped(self):
        p = StatusPolicy()
        for i in range(4):
            d = p.record(
                "https://a.de/x", 301, location=f"https://a.de/r{i}", now=float(i)
            )
            assert d.action == "follow_redirect"
        d = p.record("https://a.de/x", 301, location="https://a.de/r5", now=9.0)
        assert d.action == "drop" and "loop" in d.reason

    def test_domain_kill_switch(self):
        p = StatusPolicy()
        kill = False
        for i in range(4):
            d = p.record(f"https://bad.de/{i}", 503, now=float(i))
            kill = kill or d.kill_domain
        assert kill  # sustained 5xx severity 4.0 > threshold 3


class TestMetric:
    def test_english_detection(self):
        en = "The university is one of the oldest in the country and the students are happy with it."
        de = "Die Universität ist eine der ältesten im Land und die Studenten sind zufrieden damit."
        assert english_score(en) > 0.5
        assert english_score(de) < 0.3

    def test_trigram_detector(self):
        from modern_search_engines_project_tpu.crawler.metric import (
            trigram_english_score,
        )

        en = "The university is one of the oldest in the country and the students are happy with it."
        de = "Die Universität ist eine der ältesten im Land und die Studenten sind zufrieden damit."
        assert trigram_english_score(en) > 0.5
        assert trigram_english_score(de) < 0.3, trigram_english_score(de)

    def test_dual_detector_or_gate(self):
        from modern_search_engines_project_tpu.crawler.metric import (
            english_score,
            is_probably_english,
            trigram_english_score,
        )

        # stopword-poor English (headline/listing style): the stopword
        # detector is inconclusive, the trigram detector rescues it —
        # mirroring the reference's langdetect-OR-polyglot rule
        listing = (
            "Opening hours: Monday closed. Tickets available online. "
            "Castle tours daily. Great view. Student discounts available. "
            "Wheelchair accessible entrance. Guided visits hourly."
        )
        assert english_score(listing) < 0.5  # signal 1 misses
        assert trigram_english_score(listing) >= 0.5  # signal 2 catches
        assert is_probably_english(listing)
        # German rejected by both
        de = (
            "Die Öffnungszeiten der Universität werden nächste Woche "
            "geändert und die Studenten wurden bereits informiert."
        )
        assert not is_probably_english(de)

    def test_third_languages_rejected(self):
        # the trigram detector must not confuse Romance languages with
        # English (their trigram distributions overlap English's heavily)
        from modern_search_engines_project_tpu.crawler.metric import (
            english_score,
            trigram_english_score,
        )

        fr = (
            "L'université est l'une des plus anciennes du pays et les "
            "étudiants sont satisfaits de la qualité des cours."
        )
        es = (
            "La universidad es una de las más antiguas del país y los "
            "estudiantes están contentos con la calidad de los cursos."
        )
        it = (
            "L'università è una delle più antiche del paese e gli "
            "studenti sono soddisfatti della qualità dei corsi."
        )
        for text in (fr, es, it):
            assert trigram_english_score(text) < 0.3, text
            # the permissive merge gate passes inconclusive=0.0, so
            # evidence-free text cannot ride the 0.3 convention value
            assert english_score(text, inconclusive=0.0) < 0.15, text

    def test_text_relevance(self):
        relevant = (
            "The University of Tuebingen is a research institute in "
            "Baden-Wuerttemberg on the Neckar river. Students enjoy punting "
            "and the campus. " * 3
        )
        irrelevant = "How to bake the best chocolate chip cookies at home. " * 5
        s_rel = tue_eng_score(relevant, "https://uni-tuebingen.de/en/research")
        s_irr = tue_eng_score(irrelevant, "https://cookies.com/recipe")
        assert s_rel > 0.5 > s_irr

    def test_depth_penalty_and_cutoff(self):
        text = "Tuebingen university research institute on the Neckar. " * 5
        url = "https://uni-tuebingen.de/en/"
        s0 = tue_eng_score(text, url, linking_depth=0)
        s4 = tue_eng_score(text, url, linking_depth=4)
        s6 = tue_eng_score(text, url, linking_depth=6)
        assert s0 > s4 > 0
        assert s6 == 0.0

    def test_url_score(self):
        assert url_score("https://www.tuebingen.de/en/rathaus") > 0.6
        assert url_score("https://example.com/a/b/c/d/e") <= 0.05


class TestFrontier:
    def test_dedup_bumps_incoming(self):
        f = Frontier()
        assert f.add("https://a.de/x", now=0.0)
        assert not f.add("https://a.de/x", now=0.0)
        assert f.meta["https://a.de/x"]["incoming"] == 2

    def test_distinct_domains_per_batch(self):
        f = Frontier()
        for i in range(5):
            f.add(f"https://a.de/{i}", now=0.0)
        f.add("https://b.de/1", now=0.0)
        batch = f.pop_due(10, now=1.0)
        domains = {u.split("/")[2] for u, _ in batch}
        assert len(batch) == 2 and domains == {"a.de", "b.de"}

    def test_scheduled_future_not_due(self):
        f = Frontier()
        f.add("https://a.de/x", when=100.0, now=0.0)
        assert f.pop_due(10, now=1.0) == []
        assert len(f.pop_due(10, now=101.0)) == 1

    def test_domain_delay_respected(self):
        f = Frontier()
        f.add("https://a.de/x", now=0.0)
        f.set_domain_delay("a.de", 50.0)
        assert f.pop_due(10, now=1.0) == []
        assert len(f.pop_due(10, now=51.0)) == 1

    def test_disallow_domain_purges(self):
        f = Frontier()
        f.add("https://a.de/1", now=0.0)
        f.add("https://a.de/2", now=0.0)
        f.add("https://b.de/1", now=0.0)
        f.disallow_domain("a.de")
        assert len(f) == 1
        assert not f.add("https://a.de/3", now=0.0)

    def test_checkpoint_roundtrip(self):
        f = Frontier()
        f.add("https://a.de/x", when=5.0, now=0.0, linking_depth=2)
        f.disallow_domain("bad.de")
        g = Frontier.from_state(f.to_state())
        assert "https://a.de/x" in g
        assert g.meta["https://a.de/x"]["linking_depth"] == 2
        assert "bad.de" in g.disallowed_domains
        assert len(g.pop_due(10, now=6.0)) == 1

    def test_deep_frontier_few_domains_no_full_drain(self, monkeypatch):
        """Scalability regression (found during the 100k-page real crawl):
        with far more due urls than domains, pop_due must stop once every
        pending domain is represented — the old code drained and
        re-pushed the ENTIRE heap every round hunting for a domain that
        does not exist (O(N log N) per ~16-page round; the loopback crawl
        decayed to ~5 pages/s at a 90k-url frontier)."""
        import heapq as real_heapq

        from modern_search_engines_project_tpu.crawler import frontier as fm

        f = Frontier()
        for i in range(10_000):
            f.add(f"https://d{i % 3}.de/p{i}", now=0.0)
        pops = {"n": 0}
        orig = real_heapq.heappop

        def counting_pop(h):
            pops["n"] += 1
            return orig(h)

        monkeypatch.setattr(fm.heapq, "heappop", counting_pop)
        batch = f.pop_due(100, now=1.0)
        assert len(batch) == 3  # one per domain
        assert pops["n"] <= 10  # NOT ~10,000
        # counts stay exact as the frontier drains
        assert f.domain_pending == {f"d{i}.de": v for i, v in
                                    enumerate([3333, 3333, 3333])} or (
            sum(f.domain_pending.values()) == 10_000 - 3
        )
        # and repeated rounds still return work for every domain
        batch2 = f.pop_due(100, now=1.0)
        assert {u.split("/")[2] for u, _ in batch2} == {
            "d0.de", "d1.de", "d2.de"
        }


class TestHtmlParser:
    HTML = """
    <html><head><title> Tübingen Castle </title>
    <script>var x = 1;</script></head>
    <body><nav><a href="/nav">Nav</a></nav>
    <main><h1>Castle</h1><p>The castle  overlooks the
    Neckar river.</p><a href="/tour">tour</a>
    <a href="https://other.de/page?x=1">other</a>
    <a href="mailto:x@y.z">mail</a>
    <a href="/sitemap.xml">sitemap</a></main>
    <footer>© 2024</footer></body></html>
    """

    def test_title_text_links(self):
        title, text, links = parse_html(self.HTML, "https://www.tuebingen.de/")
        assert title == "Tübingen Castle"
        assert "overlooks the Neckar river" in text
        assert "var x" not in text
        assert "©" not in text
        assert "https://www.tuebingen.de/tour" in links
        assert "https://other.de/page?x=1" in links
        assert not any("mailto" in l for l in links)
        assert not any("sitemap.xml" in l for l in links)

    def test_title_fallback_h1(self):
        t, _, _ = parse_html("<body><h1>Header Title</h1></body>", "https://x.de")
        assert t == "Header Title"


class TestStorage:
    def test_upsert_and_iter(self, tmp_path):
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        store.upsert_documents(
            [
                {"url": "https://a.de/1", "title": "t1", "text": "x",
                 "tue_eng_score": 0.9},
                {"url": "https://a.de/2", "title": "t2", "text": "y",
                 "tue_eng_score": 0.2},
            ]
        )
        assert store.n_documents() == 2
        docs = list(store.iter_documents(min_score=0.5))
        assert len(docs) == 1 and docs[0].url == "https://a.de/1"
        # upsert same url updates, not duplicates
        store.upsert_documents([{"url": "https://a.de/1", "title": "t1b",
                                 "text": "z", "tue_eng_score": 0.9}])
        assert store.n_documents() == 2

    def test_state_roundtrip(self, tmp_path):
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        store.save_state({"frontier": {"meta": {"u": {"incoming": 1}}}})
        st = store.load_state()
        assert st["frontier"]["meta"]["u"]["incoming"] == 1


# ---- full offline crawl ----------------------------------------------------


class FakeTransport:
    """In-memory website graph."""

    def __init__(self, pages, robots=None, statuses=None):
        self.pages = pages
        self.robots = robots or {}
        self.statuses = statuses or {}
        self.requests = []

    async def get(self, url):
        self.requests.append(url)
        if url.endswith("/robots.txt"):
            domain = url.split("/")[2]
            return 200, {}, self.robots.get(domain, "")
        if url in self.statuses:
            code, headers = self.statuses[url]
            return code, headers, ""
        if url in self.pages:
            return 200, {"content-type": "text/html"}, self.pages[url]
        return 404, {}, ""

    async def aclose(self):
        pass


def _page(title, links, extra=""):
    body = "".join(f'<a href="{l}">{l}</a>' for l in links)
    base = (
        f"<html><head><title>{title}</title></head><body><main>"
        f"Tuebingen Tuebingen Tuebingen is a university town in Germany on "
        f"the Neckar river in Baden-Wuerttemberg in the Swabian hills. The "
        f"research institute and the faculty campus host a seminar and a "
        f"lecture for every professor. Stocherkahn punting starts at the "
        f"Marktplatz. {extra} {body}</main></body></html>"
    )
    return base


@pytest.fixture()
def fake_site():
    return {
        "https://uni.de/a": _page("Uni A", ["https://uni.de/b", "https://other.de/c"]),
        "https://uni.de/b": _page("Uni B", []),
        "https://other.de/c": _page("Other C", ["https://uni.de/blocked"]),
    }


class TestCrawlE2E:
    def test_crawl_stores_and_expands(self, fake_site, tmp_path):
        transport = FakeTransport(fake_site)
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(transport), max_pages=10)
        crawler.robots.delay = lambda d: 0.0  # zero politeness for speed
        n = asyncio.run(crawler.run(seeds=["https://uni.de/a"]))
        assert n >= 3
        urls = {d.url for d in store.iter_documents()}
        assert "https://uni.de/a" in urls
        assert "https://uni.de/b" in urls
        assert "https://other.de/c" in urls

    def test_robots_disallow_respected(self, fake_site, tmp_path):
        transport = FakeTransport(
            fake_site, robots={"uni.de": "User-agent: *\nDisallow: /b\n"}
        )
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(transport), max_pages=10)
        crawler.robots.delay = lambda d: 0.0
        asyncio.run(crawler.run(seeds=["https://uni.de/a"]))
        urls = {d.url for d in store.iter_documents()}
        assert "https://uni.de/b" not in urls

    def test_robots_enforced_on_pre_enqueued_urls(self, fake_site, tmp_path):
        # ADVICE r1: a URL enqueued BEFORE its domain's robots.txt is known
        # (e.g. a second seed on the same domain) must still be dropped when
        # the fetch comes back — not parsed and stored.  The robots check in
        # _handle_response must be unconditional, not only on the response
        # that carried robots_text.
        transport = FakeTransport(
            fake_site, robots={"uni.de": "User-agent: *\nDisallow: /b\n"}
        )
        store = CrawlStore(str(tmp_path / "c.sqlite"))
        crawler = Crawler(store, Fetcher(transport), max_pages=10)
        crawler.robots.delay = lambda d: 0.0
        # seed the disallowed URL directly: it enters the frontier before any
        # robots.txt for uni.de has been seen
        asyncio.run(
            crawler.run(seeds=["https://uni.de/b", "https://uni.de/a"])
        )
        urls = {d.url for d in store.iter_documents()}
        assert "https://uni.de/b" not in urls
        assert "https://uni.de/a" in urls

    def test_resume_after_stop(self, fake_site, tmp_path):
        path = str(tmp_path / "c.sqlite")
        transport = FakeTransport(fake_site)
        store = CrawlStore(path)
        crawler = Crawler(store, Fetcher(transport), max_pages=1)
        crawler.robots.delay = lambda d: 0.0
        asyncio.run(crawler.run(seeds=["https://uni.de/a"]))
        assert store.load_state()  # checkpoint written
        # resume: new crawler on same store continues without reseeding
        store2 = CrawlStore(path)
        t2 = FakeTransport(fake_site)
        crawler2 = Crawler(store2, Fetcher(t2), max_pages=10)
        crawler2.robots.delay = lambda d: 0.0
        asyncio.run(crawler2.run(seeds=["https://ignored.de/seed"]))
        urls = {d.url for d in store2.iter_documents()}
        assert "https://other.de/c" in urls or "https://uni.de/b" in urls
        assert not any("ignored.de" in u for u in urls)
