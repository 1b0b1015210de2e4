"""Pure-Python single-node oracle for frontier semantics (SURVEY.md §5.2).

Replays the reference crawl loop (UrlsDbManager F1-F5 + AbstractParser §3.1)
sequentially over the same synthetic page graph, using the same pure-Python
scalar functions (canon/extract/simhash) as the Spark UDFs. At wave_size=1
this IS the reference loop (one pop per iteration); at wave_size=k it defines
the batched wave semantics the Spark engine must match exactly:

  * pop order: (weight DESC, url DESC)  [UrlsDbManager.java:389-408]
  * per-host politeness budget within a wave (north rule)
  * settle before child insertion; depth from the settled parent
    [UrlsDbManager.java:592-601]
  * existence check precedes depth check; duplicate attempts append
    referrers; NEW inserts start with empty referrers
    [UrlsDbManager.java:541-618]
  * robots disallow-prefix filtering at insert (north rule)

The Spark engine's pop sequence, final seen-set and frontier must equal this
oracle's bit-for-bit (tests/test_parity.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bingcrawler_spark.functions.canon import py_canon_url, py_host_name
from bingcrawler_spark.functions.extract import py_extract_links, py_extract_text
from bingcrawler_spark.functions.simhash import py_simhash64, to_signed64


@dataclass
class OracleRow:
    url: str
    host: str
    weight: int
    depth: int
    discovery_wave: int
    referrers: set[str] = field(default_factory=set)
    messages: dict[str, str] = field(default_factory=dict)  # F7
    status: int | None = None
    simhash: int | None = None
    settle_wave: int | None = None


class OracleCrawl:
    def __init__(
        self,
        pages: dict[str, bytes],  # url -> html
        robots: dict[str, tuple[list[str], int]] | None = None,  # host -> (prefixes, budget)
        max_depth: int | None = 3,
        default_budget: int | None = None,
        child_weight=None,  # callable url -> int
        compute_simhash: bool = True,
        redirects: dict[str, str] | None = None,  # url -> Location (S4)
        max_redirect_hops: int = 3,
    ):
        self.pages = pages
        self.redirects = redirects or {}
        self.max_redirect_hops = max_redirect_hops
        self.robots = robots or {}
        self.max_depth = max_depth
        self.default_budget = default_budget
        self.child_weight = child_weight or (lambda u: 100)
        self.compute_simhash = compute_simhash
        self.frontier: dict[str, OracleRow] = {}
        self.seen: dict[str, OracleRow] = {}
        self.pop_log: list[tuple[int, int, str]] = []  # (wave, pop_rank, url)
        self._wave = 0

    # ---- seed injection (F12) ------------------------------------------
    def bootstrap(self, seeds: list) -> None:
        for s in seeds:
            raw, w = s[0], s[1]
            msgs = dict(s[2]) if len(s) > 2 and s[2] else {}
            url = py_canon_url(raw)
            if url in self.frontier:
                continue
            row = OracleRow(url, py_host_name(url), w, 0, discovery_wave=0)
            row.messages = msgs  # F7: putMessage on the injected seed
            self.frontier[url] = row

    # ---- F1 + politeness -------------------------------------------------
    def _pop_set(self, wave_size: int) -> list[str]:
        # (weight DESC, url DESC) == sort desc by the (weight, url) tuple
        order = sorted(self.frontier.values(), key=lambda r: (r.weight, r.url), reverse=True)
        taken: list[str] = []
        per_host: dict[str, int] = {}
        for r in order:
            if len(taken) >= wave_size:
                break
            budget = None
            if r.host in self.robots:
                budget = self.robots[r.host][1]
            elif self.default_budget is not None:
                budget = self.default_budget
            if budget is not None and per_host.get(r.host, 0) >= budget:
                continue
            per_host[r.host] = per_host.get(r.host, 0) + 1
            taken.append(r.url)
        return taken

    def _disallowed(self, url: str) -> bool:
        host = py_host_name(url)
        if host not in self.robots:
            return False
        prefixes = self.robots[host][0]
        rest = url.split(host, 1)[1] if host in url else ""
        return any(rest.startswith(p) for p in prefixes)

    # ---- putUrl (F2/F3, UrlsDbManager.java:541-618) -----------------------
    def _put_url(self, raw_url: str, referrer: str, weight: int, depth: int) -> None:
        url = py_canon_url(raw_url)
        if self._disallowed(url):
            return
        if url in self.seen:  # existence check FIRST (referrer append)
            self.seen[url].referrers.add(referrer)
            return
        if url in self.frontier:
            self.frontier[url].referrers.add(referrer)
            return
        if self.max_depth is not None and depth > self.max_depth:
            return  # depth check only for brand-new inserts
        self.frontier[url] = OracleRow(
            url, py_host_name(url), weight, depth, discovery_wave=self._wave
        )  # NEW insert: empty referrers (constructor never adds one)

    # ---- S4 redirect-follow (CommonAnalysis.java:163-206) ------------------
    def _fetch(self, url: str) -> bytes | None:
        """Follow the Location chain up to max_redirect_hops; a terminal
        content row yields its html, a dangling or over-long chain None."""
        for _ in range(self.max_redirect_hops + 1):
            if url in self.redirects:
                url = self.redirects[url]
                continue
            return self.pages.get(url)
        return None

    # ---- one wave ----------------------------------------------------------
    def run_wave(self, wave_size: int) -> int:
        self._wave += 1
        popped = self._pop_set(wave_size)
        # settle all popped first (wave semantics; at k=1 == reference loop)
        parsed: list[tuple[OracleRow, list[str]]] = []
        for rank, url in enumerate(popped, start=1):
            self.pop_log.append((self._wave, rank, url))
            row = self.frontier.pop(url)
            html = self._fetch(url)
            row.status = 1 if html is not None else -1
            if html is not None and self.compute_simhash:
                row.simhash = to_signed64(py_simhash64(py_extract_text(html)))
            row.settle_wave = self._wave
            self.seen[url] = row
            links = (
                py_extract_links(html.decode("utf-8", "replace"), url)
                if html is not None
                else []
            )
            parsed.append((row, links))
        # insert children in pop order, document order within a page
        for row, links in parsed:
            for link in links:
                curl = py_canon_url(link)
                self._put_url(
                    link, row.url, self.child_weight(curl), row.depth + 1
                )
        return len(popped)

    def run(self, n_waves: int, wave_size: int) -> None:
        for _ in range(n_waves):
            if self.run_wave(wave_size) == 0:
                break

    # ---- exports for parity assertions ------------------------------------
    def seen_tuples(self) -> set[tuple]:
        return {
            (
                r.url,
                r.host,
                r.weight,
                r.depth,
                r.discovery_wave,
                tuple(sorted(r.referrers)),
                tuple(sorted(r.messages.items())),
                r.status,
                r.simhash,
                r.settle_wave,
            )
            for r in self.seen.values()
        }

    def frontier_tuples(self) -> set[tuple]:
        return {
            (
                r.url,
                r.host,
                r.weight,
                r.depth,
                r.discovery_wave,
                tuple(sorted(r.referrers)),
                tuple(sorted(r.messages.items())),
            )
            for r in self.frontier.values()
        }
