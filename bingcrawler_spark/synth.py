"""Deterministic synthetic web graph + profiles (FIXTURES.md §1-§5).

Everything is a pure function of the row index (splitmix-style integer
mixing, seed folded in) so the SAME graph can be materialized:
  * distributed — ``spark.range(n) → mapInPandas`` (no driver bottleneck;
    at 10^10 urls this is how the synthetic frontier is made), and
  * locally — the pure-Python oracle regenerates page rows on demand.

Graph shape (per FIXTURES.md §1): one hot host holding ~30% of urls (skew /
salting tests), out-degree ≤ ~12, ~1/37 of linked pages missing from the
table (fetch-failure path), some urls carry query strings whose hrefs are
``&amp;``-escaped (P3 path), some links carry ``#fragments`` (P1 path), some
are emitted relative (host-resolution path) or as ``<iframe src>``, some
land under ``/private/`` (robots path), and the reachable tree is deeper
than the depth cap 3 (AbstractParser.java:138 parity).

``text`` is ALWAYS ``py_extract_text(html)`` — the byte-identical invariant
(BASELINE.json input_hint) is true by construction and re-verified in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bingcrawler_spark.functions.extract import py_extract_text

MASK64 = (1 << 64) - 1

_EN_VOCAB = [
    "argentine", "ant", "pattern", "self", "organizing", "exploratory",
    "colony", "pheromone", "trail", "forage", "network", "distributed",
    "crawl", "frontier", "priority", "queue", "bloom", "filter", "spark",
    "shuffle", "partition", "skew", "salting", "politeness", "budget",
    "robots", "wave", "snapshot", "lineage", "metric", "academic", "paper",
    "citation", "journal", "keyword", "author", "profile", "simhash",
    "fingerprint", "hamming", "distance", "token", "lemma", "corpus",
]
_ZH_VOCAB = ["分布式", "爬虫", "队列", "优先", "指纹", "相似", "论文", "期刊", "作者", "关键词"]

_HOT_FRACTION = 3  # i % 10 < 3  → host 0 (~30% of pages)
_MISS_MOD = 37  # i % 37 == 5 → page absent from table (dead link target)
_QUERY_MOD = 11  # i % 11 == 7 → url carries ?a=1&b=2
_PRIVATE_MOD = 29  # i % 29 == 3 → path under /private/ (robots-disallowed)
_ZH_MOD = 53  # i % 53 == 11 → Chinese text row
_NEARDUP_MOD = 101  # i % 101 == 1 → near-duplicate of page i-1


def mix(*xs: int) -> int:
    """splitmix64-style deterministic mixer over any number of ints."""
    h = 0x9E3779B97F4A7C15
    for x in xs:
        h = (h ^ (x & MASK64)) & MASK64
        h = (h * 0xBF58476D1CE4E5B9) & MASK64
        h ^= h >> 27
        h = (h * 0x94D049BB133111EB) & MASK64
        h ^= h >> 31
    return h


def page_host(i: int, n_hosts: int) -> int:
    if i % 10 < _HOT_FRACTION:
        return 0
    return 1 + mix(i, 1) % (n_hosts - 1)


def page_url(i: int, n_hosts: int) -> str:
    h = page_host(i, n_hosts)
    path = f"/private/p/{i}" if i % _PRIVATE_MOD == 3 else f"/p/{i}"
    q = "?a=1&b=2" if i % _QUERY_MOD == 7 else ""
    return f"http://host{h}.example{path}{q}"


def page_exists(i: int, n_pages: int) -> bool:
    return 0 <= i < n_pages and i % _MISS_MOD != 5


def _words(i: int, salt: int, n: int, vocab: list[str]) -> list[str]:
    return [vocab[mix(i, salt, w) % len(vocab)] for w in range(n)]


def _href(url: str) -> str:
    return url.replace("&", "&amp;")


def _neardup_base(i: int) -> int:
    """Page i's content-generator seed: i-1 for near-dup rows, else i."""
    return i - 1 if i % _NEARDUP_MOD == 1 and i > 0 else i


def page_lang(i: int) -> str:
    """ONE definition of a page's language, shared by the html generator
    and the pages-table `lang` column: near-dups inherit the BASE page's
    language/vocab — deriving it from i would make the "one word differs
    from page i-1" invariant false whenever the moduli collide (first at
    i=5152, where i is a zh row but i-1 was generated from the en
    vocab), and would mislabel the text the row actually carries."""
    return "zh" if _neardup_base(i) % _ZH_MOD == 11 else "en"


def page_links(i: int, n_pages: int, n_hosts: int) -> list[tuple[str, str]]:
    """[(kind, href)] for page i — kind ∈ {'a','iframe'}; href as written in
    the html (may be relative, escaped, fragment-carrying, or dead)."""
    deg = 2 + mix(i, 2) % 11
    out: list[tuple[str, str]] = []
    for k in range(deg):
        if k % 7 == 3:  # dead link (target never in table)
            j = n_pages + mix(i, 100 + k) % max(n_pages, 1)
            out.append(("a", _href(page_url(j, n_hosts))))
            continue
        j = mix(i, 100 + k) % n_pages
        target = page_url(j, n_hosts)
        form = k % 5
        if form == 1 and page_host(j, n_hosts) == page_host(i, n_hosts):
            # relative href: resolved against the page's host_url (P4)
            out.append(("a", _href(target.split(".example", 1)[1])))
        elif form == 2:
            out.append(("a", _href(target) + f"#frag{k}"))
        elif form == 4 and k == 9:
            # k=9 satisfies both k%5==4 and the high-degree gate (deg>=10,
            # ~27% of pages), so iframe edges genuinely occur in the graph
            # — the old `k % 9 == 5` arm needed k≡14 (mod 45), impossible
            # for k <= 11, so NO synthetic page ever carried an iframe
            out.append(("iframe", _href(target)))
        else:
            out.append(("a", _href(target)))
    return out


def page_html(i: int, n_pages: int, n_hosts: int, n_words: int = 30) -> bytes:
    """n_words sizes each body paragraph — default 30 keeps the parity
    fixtures byte-stable; the bench passes hundreds to make page size (and
    therefore parse cost) realistic for Common-Crawl-style html."""
    base = _neardup_base(i)
    lang = page_lang(i)
    vocab = _ZH_VOCAB if lang == "zh" else _EN_VOCAB
    title = " ".join(_words(base, 7, 5, vocab))
    p1 = " ".join(_words(base, 8, n_words, vocab))
    p2 = " ".join(_words(base, 9, n_words, vocab))
    if base != i:  # near-duplicate: one word differs from page i-1
        p2 = p2 + " variant"
    links_html = "".join(
        f'<a class="lnk" href="{href}">link {n}</a>'
        if kind == "a"
        else f'<iframe width="1" src="{href}"></iframe>'
        for n, (kind, href) in enumerate(page_links(i, n_pages, n_hosts))
    )
    html = (
        f'<html><head><meta charset="utf-8"><title>Page {i} {title}</title>'
        f'<script type="text/javascript">var i={i};</script>'
        f"<style>body {{ color: #000; }}</style></head>"
        f"<body><h1>Page {i} {title}</h1><p>{p1}</p><p>{p2}</p>"
        f'<a href="#top">top</a><a href="javascript:void(0)">js</a>'
        f"{links_html}</body></html>"
    )
    return html.encode("utf-8")


def page_row(i: int, n_pages: int, n_hosts: int, n_words: int = 30) -> dict:
    html = page_html(i, n_pages, n_hosts, n_words)
    return {
        "url": page_url(i, n_hosts),
        "warc_ts": pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(seconds=i),
        "html": html,
        "text": py_extract_text(html),  # invariant by construction
        "lang": page_lang(i),
    }


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def synth_pages_df(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 8,
    partitions: int | None = None,
    n_words: int = 30,
) -> DataFrame:
    """Distributed materialization: range → mapInPandas (scales linearly;
    the generator never touches the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf["id"] if page_exists(int(i), n_pages)]
            if not ids:
                continue
            yield pd.DataFrame([page_row(i, n_pages, n_hosts, n_words) for i in ids])

    if partitions is None:
        # size partitions by OUTPUT bytes, not core count: each generated
        # page is ~8 bytes/word of html, and a whole partition's rows pass
        # through one Arrow batch pipeline — 32 fat tasks of a 480k x 1000w
        # corpus exceed the JVM's direct-memory pool.  Cap ~64 MB per task
        # (the spark.sql.files.maxPartitionBytes convention).
        est_bytes = n_pages * max(n_words, 1) * 8
        partitions = max(
            spark.sparkContext.defaultParallelism, est_bytes // (64 << 20) + 1
        )
    rng = spark.range(0, n_pages, 1, partitions)
    return rng.mapInPandas(gen, PAGES_SCHEMA)


def synth_pages_local(n_pages: int, n_hosts: int = 8) -> list[dict]:
    """Same rows, driver-side (oracle + tiny tests only)."""
    return [page_row(i, n_pages, n_hosts) for i in range(n_pages) if page_exists(i, n_pages)]


# ------------------------------------------------------------------ seeds


def seed_urls(n_pages: int, n_hosts: int, n_seeds: int = 3) -> list[tuple[str, int]]:
    """(url, weight): first seed is a 'search seed' at 110, rest default 100
    (BingParser.java:98 / CrawlUrl.java:12). Seeds always exist in the table."""
    out = []
    i, k = 0, 0
    while len(out) < n_seeds and i < n_pages:
        if page_exists(i, n_pages) and i % _PRIVATE_MOD != 3:
            out.append((page_url(i, n_hosts), 110 if k == 0 else 100))
            k += 1
        i += 1 + mix(7, len(out)) % 13
    return out


# ------------------------------------------------------------------ robots


def robots_rows(n_hosts: int) -> list[dict]:
    """Per-host rules (north-rule addition, FIXTURES.md §4): every host
    disallows /private/; the hot host gets a tighter per-wave budget."""
    return [
        {
            "host": f"host{h}.example",
            "disallow_prefixes": ["/private/"],
            "crawl_budget": 8 if h == 0 else 16,
        }
        for h in range(n_hosts)
    ]


ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_budget", T.IntegerType(), True),
    ]
)


def robots_df(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    return spark.createDataFrame(robots_rows(n_hosts), ROBOTS_SCHEMA)


# ------------------------------------------------------------- redirects

_REDIR_MOD = 17  # i % 17 == 4 → a redirect stub url /r/{i} exists


def redirect_stub_url(i: int, n_hosts: int) -> str:
    return f"http://host{page_host(i, n_hosts)}.example/r/{i}"


def redirect_stub_row(i: int, n_pages: int, n_hosts: int) -> dict | None:
    """Redirect stub for i (when i % 17 == 4): 301/302 with a Location
    header.  ~1 in 5 stubs chains to ANOTHER stub (multi-hop path), the
    rest point at a canonical page url — whose target may be one of the
    deterministically missing pages (dangling-location path)."""
    if i % _REDIR_MOD != 4:
        return None
    j = mix(i, 57) % n_pages
    if j % _REDIR_MOD == 4 and j != i:
        loc = redirect_stub_url(j, n_hosts)
    else:
        loc = page_url(mix(i, 55) % n_pages, n_hosts)
    return {
        "url": redirect_stub_url(i, n_hosts),
        "warc_ts": pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(seconds=i),
        "html": None,
        "text": None,
        "lang": None,
        "http_status": 301 if mix(i, 56) % 2 == 0 else 302,
        "location": loc,
    }


PAGES_REDIRECT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("location", T.StringType(), True),
    ]
)


def synth_pages_with_redirects_df(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 8,
    partitions: int | None = None,
    n_words: int = 30,
) -> DataFrame:
    """The pages table extended per S4: content rows carry http_status=200;
    redirect stub rows carry 301/302 + Location and no body."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                if page_exists(i, n_pages):
                    r = page_row(i, n_pages, n_hosts, n_words)
                    r["http_status"] = 200
                    r["location"] = None
                    rows.append(r)
                stub = redirect_stub_row(i, n_pages, n_hosts)
                if stub is not None:
                    rows.append(stub)
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in PAGES_REDIRECT_SCHEMA.fields])

    rng = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGES_REDIRECT_SCHEMA)


def redirects_local(n_pages: int, n_hosts: int = 8) -> dict[str, str]:
    """url → location for every stub (oracle-side twin)."""
    out = {}
    for i in range(n_pages):
        stub = redirect_stub_row(i, n_pages, n_hosts)
        if stub is not None:
            out[stub["url"]] = stub["location"]
    return out


# ------------------------------------------------ Bing-shaped page HTML
# Deterministic generators for the P7/P8 parsers: given the FIELDS, emit a
# page shaped exactly like the DOM the reference walks (BingAnalysis.java
# inline comments quote the real markup).  parse(generate(fields)) ==
# fields is the round-trip the driver oracle checks, so the generators are
# deliberately minimal — every class/id/attribute the parser dispatches on,
# nothing else.


def bing_search_page_html(items: list[dict]) -> str:
    """items: [{profile_id, title, authors: [(name, url|None)], year,
    journal, cited_by, introduction, keywords: [(kw, url|None)]}] →
    the <ol id="b_results"> search page (BingAnalysis.java:242-398)."""
    lis = []
    for it in items:
        authors = "".join(
            f'<a href="{u}">{n}</a>' if u else f"<span>{n}</span>"
            for n, u in it["authors"]
        )
        kws = "".join(
            f'<a href="{u}">{k}</a>' if u else f"<b>{k}</b>"
            for k, u in it["keywords"]
        )
        href = f'/academic/profile?id={it["profile_id"]}&amp;encoded=0&amp;v=paper_preview'
        lis.append(
            f'<li class="aca_algo"><h2 class=""><a target="_blank" href="{href}" '
            f'h="ID=SERP,5171.1">{it["title"]}</a></h2>'
            f'<div class="aca_caption">'
            f'<div class="caption_author">{authors}</div>'
            f'<div class="caption_venue">{it["year"]} · {it["journal"]}|'
            f'Cited by:{it["cited_by"]}</div>'
            f'<div class="caption_abstract">{it["introduction"]}</div>'
            f'<div class="caption_field">{kws}</div>'
            f"</div></li>"
        )
    return (
        '<html><body><div id="b_content">'
        '<ol id="b_results" role="main" aria-label="Search Results">'
        + "".join(lis)
        + "</ol></div></body></html>"
    )


def _aca_paper_div(div_id: str, papers: list[dict]) -> str:
    rows = []
    for p in papers:
        authors = " · ".join(p.get("authors", []))
        author_li = f"<li>{authors}</li>" if authors else ""
        rows.append(
            '<tr data-exp="H;;;;;;">'
            f'<td><li><a href="{p["url"]}" h="ID=morepage">{p["title"]}</a></li></td>'
            f"<td>{author_li}</td></tr>"
        )
    return (
        f'<div class="mpage" id="{div_id}"><table>' + "".join(rows) + "</table></div>"
    )


def bing_profile_page_html(p: dict) -> str:
    """p: {title, authors: [(name, url|None)], year, journal, cited_by,
    introduction, keywords: [(kw, url|None)], references: [{title, url,
    authors}], cited_papers: [...], download_urls, source_urls} →
    the profile page (BingAnalysis.java:58-155 markup)."""

    def hpanel(label: str, content: str) -> str:
        return (
            '<div class="b_hPanel"><span class="aca_labels">'
            f'{label}</span><span class="aca_content">{content}</span></div>'
        )

    authors = "".join(
        f'<a href="{u}">{n}</a>' if u else f"<span>{n}</span>"
        for n, u in p["authors"]
    )
    kws = "".join(
        f'<a href="{u}">{k}</a>' if u else f"<b>{k}</b>" for k, u in p["keywords"]
    )
    dl = "".join(
        f'<a target="_blank" href="{u}" h="ID=SERP,5131.1">{u}</a>'
        for u in p["download_urls"]
    )
    src = "".join(
        f'<a target="_blank" href="{u}" h="ID=SERP,5147.1">{u}</a>'
        for u in p["source_urls"]
    )
    return (
        '<html><body><div id="b_content"><ol>'
        f'<li class="aca_title">{p["title"]}</li>'
        '<li class="aca_main">'
        + hpanel("Authors", authors)
        + hpanel("Year", str(p["year"]))
        + hpanel("Journal", p["journal"])
        + hpanel("Cited by", str(p["cited_by"]))
        + hpanel("Introduction", p["introduction"])
        + hpanel("Keywords", kws)
        + "</li>"
        '<li id="acapp_papers">'
        + _aca_paper_div("aca_rpaper", p["references"])
        + _aca_paper_div("aca_cpaper", p["cited_papers"])
        + "</li>"
        '<div class="aca_source">'
        '<div class="tab-head"><li role="tab">Download</li><li role="tab">Source</li></div>'
        f'<div id="tab_1_A489AD"><span>{dl}</span></div>'
        f'<div id="tab_2_A489AD"><span>{src}</span></div>'
        "</div></ol></div></body></html>"
    )


# ---------------------------------------------------------------- profiles

_JOURNALS = [f"Journal of {w.title()}" for w in _EN_VOCAB[:12]]
_AUTHORS = [f"Author {chr(65 + a)}{a}" for a in range(40)]
_KEYWORDS = _EN_VOCAB[:24]


def profile_row(i: int, n_profiles: int) -> dict:
    title = f"Paper {i}: " + " ".join(_words(i, 30, 4, _EN_VOCAB))
    n_auth = 1 + mix(i, 31) % 4
    n_kw = 1 + mix(i, 32) % 5
    refs = [f"Paper {mix(i, 33, r) % n_profiles}" for r in range(mix(i, 34) % 6)]
    cited = [f"Paper {mix(i, 35, r) % n_profiles}" for r in range(mix(i, 36) % 9)]
    return {
        "title": title,
        "url": f"http://academic.example/profile/{i}",
        "authors": sorted({_AUTHORS[mix(i, 37, a) % len(_AUTHORS)] for a in range(n_auth)}),
        "keywords": sorted({_KEYWORDS[mix(i, 38, k) % len(_KEYWORDS)] for k in range(n_kw)}),
        "year": 1980 + mix(i, 39) % 45,
        "journal": _JOURNALS[mix(i, 40) % len(_JOURNALS)],
        "cited_by": (mix(i, 41) % 100) ** 2 % 500,
        "introduction": " ".join(_words(i, 42, 25, _EN_VOCAB)),
        "references": refs,
        "cited_papers": cited,
        "download_urls": [f"http://dl.example/{i}/{d}.pdf" for d in range(mix(i, 43) % 3)],
        "source_urls": [f"http://src.example/{i}" for _ in range(mix(i, 44) % 2)],
    }


PROFILES_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("authors", T.ArrayType(T.StringType()), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("journal", T.StringType(), True),
        T.StructField("cited_by", T.IntegerType(), True),
        T.StructField("introduction", T.StringType(), True),
        T.StructField("references", T.ArrayType(T.StringType()), True),
        T.StructField("cited_papers", T.ArrayType(T.StringType()), True),
        T.StructField("download_urls", T.ArrayType(T.StringType()), True),
        T.StructField("source_urls", T.ArrayType(T.StringType()), True),
    ]
)


def synth_profiles_df(spark: SparkSession, n_profiles: int, partitions: int | None = None) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([profile_row(int(i), n_profiles) for i in pdf["id"]])

    rng = spark.range(0, n_profiles, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PROFILES_SCHEMA)


# --------------------------------------------- Tender-vertical page HTML (P9)
# Deterministic generators for the TenderParser parsers (TenderParser.java
# :191-232, :239-292, :299-352): parse(generate(fields)) == fields is the
# round-trip the p9 driver oracle checks.  Each generator includes the
# noise the parser must reject, so a green hash proves the rejections too.

TENDER_HOME_URL = "http://www.chinazbcgou.com.cn"
TENDER_TITLE_SUFFIX = "_中国招投标采购网 官网"  # Setting.java:56


def tender_home_html(items: list[tuple[int, str]]) -> str:
    """items: [(display_id, link_text)] → the tender home page.  The
    parser (TenderParser.java:330-345) keeps a[href] anchors with
    non-empty href+text whose href FULL-matches ``display.php\\?id=(.*)``.
    Noise: an off-pattern absolute link, an empty-text display link
    (dropped at :334), and a 'displayXphp' anchor exercising the
    unescaped-dot quirk of PATTERN_DISPLAY (Setting.java:58 — kept)."""
    links = "".join(f'<a href="display.php?id={i}">{t}</a>' for i, t in items)
    return (
        "<html><body><div>"
        + links
        + '<a href="http://other.example/about">about us</a>'
        + '<a href="display.php?id=999999"></a>'
        + '<a href="displayXphp?id=7">quirk row</a>'
        + "</div></body></html>"
    )


def tender_display_html(title: str) -> str:
    """Display page: <title> carries the tender title + the site suffix the
    parser strips (TenderParser.java:254-255)."""
    return (
        f"<html><head><title>{title}{TENDER_TITLE_SUFFIX}</title></head>"
        f'<body><div class="content">{title}</div></body></html>'
    )


def tender_search_html(cands: list[tuple[str, str]]) -> str:
    """cands: [(href, link_text)] → baidu-shaped search page
    (div#content_left → div.result.c-container → first a[href],
    TenderParser.java:197-203).  Each container carries a SECOND anchor to
    prove only the first is read; noise containers: a 百度快照 snapshot link
    (excluded by prefix :205), an empty-text anchor (:205), a non-result
    div, and an off-content_left ad block."""
    divs = "".join(
        f'<div class="result c-container"><a href="{h}">{t}</a>'
        f'<a href="http://second.example/ignored">second</a></div>'
        for h, t in cands
    )
    noise = (
        '<div class="result c-container">'
        '<a href="http://cache.example/snap">百度快照</a></div>'
        '<div class="result c-container">'
        '<a href="http://empty.example/e"></a></div>'
        '<div class="other-block"><a href="http://not-a-result.example/x">skip</a></div>'
    )
    return (
        '<html><body><div id="content_left">' + divs + noise + "</div>"
        '<div id="content_right"><a href="http://ad.example/a">ad</a></div>'
        "</body></html>"
    )
