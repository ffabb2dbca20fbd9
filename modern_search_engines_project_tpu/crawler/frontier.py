"""Priority frontier: politeness-scheduled URL queue (reference C10).

The reference keeps a ``heapdict {url: scheduled_unix_time}`` plus parallel
metadata dicts (frontierManagement.py:33-49); here it is one class around a
``heapq`` with lazy invalidation, per-domain next-allowed times, and the
disallow caches.  Selection parity: a crawl round pops at most
``max_batch`` due URLs, **all from distinct domains**
(frontierManagement.py:260-277, lstAllDifferentDomains :455-483).
"""

from __future__ import annotations

import heapq
import time
from typing import Dict, List, Optional, Set, Tuple

from modern_search_engines_project_tpu.crawler.helpers import get_domain


class Frontier:
    def __init__(self):
        self._heap: List[Tuple[float, str]] = []
        self.meta: Dict[str, dict] = {}  # url -> {depth info, incoming, ...}
        self.domain_next: Dict[str, float] = {}
        self.disallowed_urls: Set[str] = set()
        self.disallowed_domains: Set[str] = set()
        self.seen: Set[str] = set()

    def __len__(self) -> int:
        return len(self.meta)

    def __contains__(self, url: str) -> bool:
        return url in self.meta

    # --- write --------------------------------------------------------------

    def add(
        self,
        url: str,
        *,
        when: Optional[float] = None,
        incoming_score: float = 0.0,
        linking_depth: int = 0,
        domain_depth: int = 0,
        now: Optional[float] = None,
    ) -> bool:
        """Enqueue url (dedup + disallow checks); True if newly added.

        Re-adding an existing url only bumps its incoming-link evidence
        (frontierWrite dedup semantics, frontierManagement.py:119-171).
        """
        now = time.time() if now is None else now
        domain = get_domain(url)
        if (
            not domain
            or url in self.disallowed_urls
            or domain in self.disallowed_domains
        ):
            return False
        if url in self.meta:
            m = self.meta[url]
            m["incoming"] += 1
            m["incoming_score"] += incoming_score
            m["linking_depth"] = min(m["linking_depth"], linking_depth)
            m["domain_depth"] = min(m["domain_depth"], domain_depth)
            return False
        when = now if when is None else when
        self.meta[url] = {
            "incoming": 1,
            "incoming_score": incoming_score,
            "linking_depth": linking_depth,
            "domain_depth": domain_depth,
            "scheduled": when,
        }
        heapq.heappush(self._heap, (when, url))
        self.seen.add(url)
        return True

    def reschedule(self, url: str, when: float) -> None:
        if url in self.meta:
            self.meta[url]["scheduled"] = when
            heapq.heappush(self._heap, (when, url))

    def remove(self, url: str) -> Optional[dict]:
        return self.meta.pop(url, None)  # heap entry lazily invalidated

    def disallow_url(self, url: str) -> None:
        self.disallowed_urls.add(url)
        self.remove(url)

    def disallow_domain(self, domain: str) -> None:
        """Domain kill switch: drop every queued url of the domain
        (statusCodeManagement.py:311-319 effect)."""
        self.disallowed_domains.add(domain)
        for url in [u for u in self.meta if get_domain(u) == domain]:
            self.remove(url)

    def set_domain_delay(self, domain: str, next_ok: float) -> None:
        self.domain_next[domain] = max(
            self.domain_next.get(domain, 0.0), next_ok
        )

    # --- read ---------------------------------------------------------------

    def pop_due(
        self, max_batch: int = 100, now: Optional[float] = None
    ) -> List[Tuple[str, dict]]:
        """Up to max_batch due urls, all distinct domains; removed from the
        frontier (caller re-adds on retry)."""
        now = time.time() if now is None else now
        batch: List[Tuple[str, dict]] = []
        domains: Set[str] = set()
        deferred: List[Tuple[float, str]] = []
        while self._heap and len(batch) < max_batch:
            when, url = heapq.heappop(self._heap)
            m = self.meta.get(url)
            if m is None or m["scheduled"] != when:
                continue  # stale heap entry
            if when > now:
                deferred.append((when, url))
                break  # heap ordered: nothing later is due either
            domain = get_domain(url)
            if domain in self.disallowed_domains:
                self.meta.pop(url, None)
                continue
            if domain in domains or self.domain_next.get(domain, 0.0) > now:
                deferred.append((when, url))
                continue
            domains.add(domain)
            self.meta.pop(url)
            batch.append((url, m))
        for item in deferred:
            heapq.heappush(self._heap, item)
        return batch

    def next_due_time(self) -> Optional[float]:
        while self._heap:
            when, url = self._heap[0]
            m = self.meta.get(url)
            if m is None or m["scheduled"] != when:
                heapq.heappop(self._heap)
                continue
            return when
        return None

    # --- checkpoint ---------------------------------------------------------

    def to_state(self) -> dict:
        return {
            "meta": self.meta,
            "domain_next": self.domain_next,
            "disallowed_urls": sorted(self.disallowed_urls),
            "disallowed_domains": sorted(self.disallowed_domains),
            "seen": sorted(self.seen),
        }

    @classmethod
    def from_state(cls, state: dict) -> "Frontier":
        f = cls()
        f.meta = dict(state.get("meta", {}))
        f.domain_next = dict(state.get("domain_next", {}))
        f.disallowed_urls = set(state.get("disallowed_urls", []))
        f.disallowed_domains = set(state.get("disallowed_domains", []))
        f.seen = set(state.get("seen", []))
        for url, m in f.meta.items():
            heapq.heappush(f._heap, (m.get("scheduled", 0.0), url))
        return f
