"""P7/P8 — Bing academic page parsers and the nested Profile data model.

Reproduces the reference's DOM analysis (file:line cites per routine):

* P7 search page   BingAnalysis.java:238-417  ``analyzeBingAcademicSearch``:
  walk for ``<ol id="b_results" aria-label="Search Results">`` →
  ``li.aca_algo`` items → title/url from ``h2 a``, then caption divs:
  ``caption_author`` (a-nodes carry author urls; plain runs split on '·'),
  ``caption_venue`` ('|'-split, then '·'-split; a 1-4 digit full-match is
  the Year, otherwise Journal; 'Cited by:<n>' yields the Cited-by panel),
  ``caption_abstract`` (Introduction), ``caption_field`` (Keywords).
* P8 profile page  BingAnalysis.java:58-164  ``analyzeBingAcademicProfile``
  + BingAnalysisUtils.java:40-166: ``li.aca_title`` → title;
  ``li.aca_main`` → ``div.b_hPanel`` panels (label from span.aca_labels,
  snippets = minimal tag nodes of span.aca_content, href if an a-node);
  ``li#acapp_papers`` → references (div#aca_rpaper) and citedPapers
  (div#aca_cpaper) via ``analyze_aca_paper`` (tr[data-exp="H;;;;;;"] rows);
  ``div.aca_source`` → download/source urls with the reference's tab
  gating (tab_1 is Download only when BOTH tabs exist, Source when only
  Source exists, and silently dropped when only Download exists — quirk
  preserved).

Data model (Profile.java:19-26, b_hPanel.java:10-19 → SURVEY.md §1.3):
``panels: array<struct<label:string, snippets:array<map<string,string>>>>``
where each snippet map holds 'snippet' and, when present, 'url' — the
nested list-of-struct-of-map shape, materialized as real Spark types.

Quirks preserved (each tested in tests/test_bingparse.py):
* node matching is on the RAW start-tag text — ``startswith('a')`` also
  matches ``<abbr>``, exactly like ``getText().startsWith("a")``;
* href extraction is the reference's ``a.+href="(.+?)"`` on the tag text
  (non-greedy to the first quote, at least one char between 'a' and href);
* search urls are prefixed with http://www.bing.com and entity-unescaped
  with the fixed 8-entity map (BingAnalysis.java:421-431 — P3);
* reference/citedPaper urls are NOT unescaped (analyze_aca_paper:95-97);
* the journal-url lookup compares the link text against the literal string
  "_journal" (BingAnalysis.java:336) — it never matches, so Journal panels
  never carry a url;
* a missing <span> inside a downloads tab raises and voids the whole
  profile (analyze_downloads_div:50 NPE → catch at :160-163 → null).

The walk order mirrors Util.addChildrenNodesToNodeList /
extractOneNodeThatMatch (Util.java:287-311): a BFS queue where only
NON-matching nodes enqueue their children.
"""

from __future__ import annotations

import re
from collections import deque
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bingcrawler_spark.functions.canon import py_unescape_entities as _unescape

# ------------------------------------------------------------------ mini-DOM


class _Node:
    """Tag node.  ``text`` is the raw start-tag interior (htmlparser's
    ``getText()``): for ``<li class="x">`` it is ``li class="x"``."""

    __slots__ = ("text", "name", "children")

    def __init__(self, text: str, name: str):
        self.text = text
        self.name = name
        self.children: list[object] = []  # _Node | str (text node)


class _TreeBuilder(HTMLParser):
    _VOID = frozenset(
        "area base br col embed hr img input link meta param source track wbr".split()
    )

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.root = _Node("#root", "#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        raw = self.get_starttag_text()
        node = _Node(raw[1:-1].rstrip("/").rstrip(), tag)
        self.stack[-1].children.append(node)
        if tag not in self._VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        raw = self.get_starttag_text()
        self.stack[-1].children.append(_Node(raw[1:-1].rstrip("/").rstrip(), tag))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def handle_entityref(self, name):  # keep entities verbatim, like htmlparser
        self.stack[-1].children.append(f"&{name};")

    def handle_charref(self, name):
        self.stack[-1].children.append(f"&#{name};")


def _parse_tree(html: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html)
    return tb.root


def _plain_text(node) -> str:
    """toPlainTextString: concatenation of all descendant text nodes."""
    if isinstance(node, str):
        return node
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def _node_text(node) -> str:
    """htmlparser getText(): tag interior for tags, content for text."""
    return node.text if isinstance(node, _Node) else node


def _walk(seeds: list, match, with_descend: bool = True) -> Iterator[_Node]:
    """The reference's queue walk: BFS where a MATCHING node is yielded and
    not descended; a non-matching node enqueues its children (only when
    with_descend — some reference loops iterate direct children only)."""
    q = deque(seeds)
    while q:
        n = q.popleft()
        if isinstance(n, _Node) and match(n):
            yield n
        elif with_descend and isinstance(n, _Node):
            q.extend(n.children)


def _find_first(seeds: list, match) -> _Node | None:
    """extractOneNodeThatMatch (Util.java:301-311): BFS first match,
    descending even into matching nodes' siblings' subtrees."""
    q = deque(seeds)
    while q:
        n = q.popleft()
        if isinstance(n, _Node):
            if match(n):
                return n
            q.extend(n.children)
    return None


_HREF_RE = re.compile(r'a.+href="(.+?)"')
_HREF_ANCHORED_RE = re.compile(r'^a.+href="(.+?)"')
_YEAR_RE = re.compile(r"^[0-9]{1,4}$")  # Java matches() is full-match
_CITEDBY_RE = re.compile(r"Cited by:(.*)")

BING_PREFIX = "http://www.bing.com"

# the fixed 8-entity map lives in canon.py (P3, imported above as
# _unescape); BingAnalysis.java:421-431 applies the same table as
# Util.java:205-215, so one shared definition keeps P3 and P7 aligned


def _is(node: _Node, prefix: str, marker: str | None = None) -> bool:
    t = node.text
    return t.startswith(prefix) and (marker is None or marker in t)


def _add_snippet(snippets: list[dict], snippet: str | None, url: str | None) -> None:
    """b_hPanel.addSnippet (b_hPanel.java:14-20): skip empty snippets,
    include 'url' only when non-empty."""
    if not snippet:
        return
    m = {"snippet": snippet}
    if url:
        m["url"] = url
    snippets.append(m)


def _panel(label: str | None) -> dict:
    return {"label": label, "snippets": []}


# ------------------------------------------------------------ P7 search page


def py_parse_search(html: str | None) -> list[dict] | None:
    """analyzeBingAcademicSearch (BingAnalysis.java:238-417)."""
    if html is None:
        return None
    try:
        root = _parse_tree(html)
        ol = _find_first(
            [root],
            lambda n: _is(n, "ol", 'id="b_results"')
            and 'aria-label="Search Results"' in n.text,
        )
        if ol is None:
            return None
        profiles: list[dict] = []
        # direct children scan for li.aca_algo (BingAnalysis.java:251-255:
        # paperList = node.getChildren(), no descend)
        for paper in ol.children:
            if not (isinstance(paper, _Node) and _is(paper, "li", 'class="aca_algo"')):
                continue
            p = {"title": None, "url": None, "panels": []}
            # direct children only: non-matching children are appended to
            # the OUTER queue in the reference (:399) — effectively never
            # descended for this item (quirk preserved)
            for detail in paper.children:
                if not isinstance(detail, _Node):
                    continue
                if detail.text.startswith("h2"):
                    p["title"] = _plain_text(detail).strip()
                    # regex over toHtml() — the first href inside the h2;
                    # the tag texts joined preserve attribute order
                    m = _HREF_RE.search(_to_html(detail))
                    if m:
                        p["url"] = _unescape(BING_PREFIX + m.group(1))
                elif _is(detail, "div", 'class="aca_caption"'):
                    _parse_caption(detail, p)
            profiles.append(p)
        return profiles
    except Exception:
        return None


def _to_html(node: _Node) -> str:
    """Enough of toHtml() for the href regex: start tags + text in order."""
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            out.append(f"<{n.text}>")
            stack.extend(reversed(n.children))
    return "".join(out)


def _parse_caption(caption: _Node, p: dict) -> None:
    """The caption-div dispatch (BingAnalysis.java:274-397), walk descends
    through non-matching wrappers (:396)."""
    for sn in _walk(list(caption.children), lambda n: _is_caption_part(n)):
        t = sn.text
        if 'class="caption_author"' in t:
            panel = _panel("Authors")
            for a in sn.children:  # direct children (:283-301)
                txt = _node_text(a).strip()
                if not txt or txt == "·":
                    continue
                if isinstance(a, _Node) and a.text.startswith("a"):
                    m = _HREF_ANCHORED_RE.search(a.text)
                    _add_snippet(
                        panel["snippets"],
                        _plain_text(a).strip(),
                        m.group(1) if m else None,
                    )
                else:
                    for raw in _plain_text(a).split("·"):
                        _add_snippet(panel["snippets"], raw.strip(), None)
            p["panels"].append(panel)
        elif 'class="caption_venue"' in t:
            raw_line = _plain_text(sn).strip()
            for raw_part in raw_line.split("|"):
                raw_part = raw_part.strip()
                if not raw_part.startswith("Cited by"):
                    for part2 in raw_part.split("·"):
                        part2 = part2.strip()
                        if _YEAR_RE.match(part2):
                            panel = _panel("Year")
                            _add_snippet(panel["snippets"], part2, None)
                        else:
                            # journal; the reference's url lookup compares
                            # against the literal "_journal" (:336) and
                            # thus never finds one — quirk preserved
                            panel = _panel("Journal")
                            _add_snippet(panel["snippets"], part2, None)
                        p["panels"].append(panel)
                else:
                    m = _CITEDBY_RE.search(raw_part)
                    if m:
                        panel = _panel("Cited by")
                        _add_snippet(panel["snippets"], m.group(1), None)
                        p["panels"].append(panel)
        elif 'class="caption_abstract"' in t:
            panel = _panel("Introduction")
            _add_snippet(panel["snippets"], _plain_text(sn).strip(), None)
            p["panels"].append(panel)
        elif 'class="caption_field"' in t:
            panel = _panel("Keywords")
            q = deque(sn.children)
            while q:  # :380-393 — empty text nodes descend, others emit
                a = q.popleft()
                txt = _node_text(a).strip()
                if txt:
                    url = None
                    if isinstance(a, _Node) and a.text.startswith("a"):
                        m = _HREF_ANCHORED_RE.search(a.text)
                        url = m.group(1) if m else None
                    _add_snippet(panel["snippets"], _plain_text(a).strip(), url)
                elif isinstance(a, _Node):
                    q.extend(a.children)
            p["panels"].append(panel)


def _is_caption_part(n: _Node) -> bool:
    t = n.text
    return t.startswith("div") and (
        'class="caption_author"' in t
        or 'class="caption_venue"' in t
        or 'class="caption_abstract"' in t
        or 'class="caption_field"' in t
    )


# ----------------------------------------------------------- P8 profile page


def py_parse_profile(html: str | None) -> dict | None:
    """analyzeBingAcademicProfile (BingAnalysis.java:58-164)."""
    if html is None:
        return None
    try:
        root = _parse_tree(html)
        profile = {
            "title": None,
            "url": None,
            "panels": [],
            "references": [],
            "cited_papers": [],
            "download_urls": [],
            "source_urls": [],
        }

        def is_section(n: _Node) -> bool:
            return (
                _is(n, "li", 'class="aca_title"')
                or _is(n, "li", 'class="aca_main"')
                or _is(n, "li", 'id="acapp_papers"')
                or _is(n, "div", 'class="aca_source"')
            )

        for node in _walk([root], is_section):
            t = node.text
            if 'class="aca_title"' in t:
                profile["title"] = _plain_text(node).strip()
            elif 'class="aca_main"' in t:
                for panel_node in _walk(
                    list(node.children), lambda n: _is(n, "div", 'class="b_hPanel"')
                ):
                    profile["panels"].append(_analyze_b_hpanel(panel_node))
            elif 'id="acapp_papers"' in t:
                for paper_div in _walk(
                    list(node.children),
                    lambda n: _is(n, "div", 'id="aca_rpaper"')
                    or _is(n, "div", 'id="aca_cpaper"'),
                ):
                    target = (
                        "references"
                        if 'id="aca_rpaper"' in paper_div.text
                        else "cited_papers"
                    )
                    profile[target].extend(_analyze_aca_paper(paper_div))
            else:  # aca_source (BingAnalysis.java:113-155)
                has_download = has_source = False
                for item in _walk(
                    list(node.children),
                    lambda n: _is(n, "div", 'class="tab-head"')
                    or _is(n, "div", 'id="tab_1')
                    or _is(n, "div", 'id="tab_2'),
                ):
                    it = item.text
                    if 'class="tab-head"' in it:
                        for li in _walk(
                            list(item.children), lambda n: n.text.startswith("li")
                        ):
                            txt = _plain_text(li).strip()
                            if txt == "Download":
                                has_download = True
                            elif txt == "Source":
                                has_source = True
                    elif 'id="tab_1' in it:
                        if has_download and has_source:
                            profile["download_urls"].extend(_analyze_downloads(item))
                        elif not has_download and has_source:
                            profile["source_urls"].extend(_analyze_downloads(item))
                        # Download-only: dropped (reference has no branch)
                    else:  # tab_2
                        profile["source_urls"].extend(_analyze_downloads(item))
        return profile
    except Exception:
        return None  # catch-all returns null (BingAnalysis.java:160-163)


def _analyze_b_hpanel(node: _Node) -> dict:
    """analyze_b_hPanel (BingAnalysisUtils.java:120-166)."""
    panel = _panel(None)
    for span in _walk(
        list(node.children),
        lambda n: _is(n, "span", 'class="aca_labels"')
        or _is(n, "span", 'class="aca_content"'),
    ):
        if 'class="aca_labels"' in span.text:
            panel["label"] = _plain_text(span).strip()
        else:
            # minimal tag nodes: tags with no tag children (collectInto
            # over self + all descendants, :134-151 — DFS preorder, the
            # htmlparser visit order, so snippet order is document order)
            stack = [span]
            minimal: list[_Node] = []
            while stack:
                n = stack.pop()
                if isinstance(n, _Node):
                    tag_kids = [c for c in n.children if isinstance(c, _Node)]
                    if not tag_kids:
                        minimal.append(n)
                    stack.extend(reversed(n.children))
            for n in minimal:
                url = None
                if n.text.startswith("a"):
                    m = _HREF_RE.search(n.text)
                    url = m.group(1) if m else None
                _add_snippet(panel["snippets"], _plain_text(n).strip(), url)
    return panel


def _analyze_aca_paper(node: _Node) -> list[dict]:
    """analyze_aca_paper (BingAnalysisUtils.java:67-116): one mini-Profile
    per tr[data-exp="H;;;;;;"]; within it, each li either carries the
    title link or a '·'-separated authors run."""
    profiles: list[dict] = []
    for tr in _walk(
        list(node.children), lambda n: _is(n, "tr", 'data-exp="H;;;;;;"')
    ):
        p = {"title": None, "url": None, "panels": []}
        profiles.append(p)
        for li in _walk(list(tr.children), lambda n: n.text.startswith("li")):
            a = _find_first(
                [li], lambda n: n.text.startswith("a") and "href" in n.text
            )
            if a is not None:
                p["title"] = _plain_text(a).strip()
                m = _HREF_RE.search(a.text)
                if m:
                    p["url"] = m.group(1)  # NOT unescaped — quirk (:95-97)
            else:
                panel = _panel("Authors")
                for author in _plain_text(li).split("·"):
                    _add_snippet(panel["snippets"], author.strip(), None)
                p["panels"].append(panel)
    return profiles


def _analyze_downloads(node: _Node) -> list[str]:
    """analyze_downloads_div (BingAnalysisUtils.java:40-62): first span not
    marked 'aca_doc cipl'; its direct a[target=_blank] children's hrefs.
    A missing span raises — voiding the whole profile, like the NPE."""
    span = _find_first(
        [node],
        lambda n: n.text.startswith("span") and "aca_doc cipl" not in n.text,
    )
    urls: list[str] = []
    for item in span.children:  # raises AttributeError if span is None
        if (
            isinstance(item, _Node)
            and item.text.startswith("a")
            and 'target="_blank"' in item.text
        ):
            m = _HREF_RE.search(item.text)
            if m:
                urls.append(m.group(1))
    return urls


# --------------------------------------------------------------- Spark types

PANEL_TYPE = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField(
            "snippets", T.ArrayType(T.MapType(T.StringType(), T.StringType()))
        ),
    ]
)

MINI_PROFILE_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("panels", T.ArrayType(PANEL_TYPE)),
    ]
)

PROFILE_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("panels", T.ArrayType(PANEL_TYPE)),
        T.StructField("references", T.ArrayType(MINI_PROFILE_TYPE)),
        T.StructField("cited_papers", T.ArrayType(MINI_PROFILE_TYPE)),
        T.StructField("download_urls", T.ArrayType(T.StringType())),
        T.StructField("source_urls", T.ArrayType(T.StringType())),
    ]
)

SEARCH_RESULTS_TYPE = T.ArrayType(MINI_PROFILE_TYPE)


@F.pandas_udf(SEARCH_RESULTS_TYPE)
def parse_search_udf(html: pd.Series) -> pd.Series:
    """P7 as an Arrow-batched UDF: html → array of result mini-profiles."""
    return html.map(py_parse_search)


@F.pandas_udf(PROFILE_TYPE)
def parse_profile_udf(html: pd.Series) -> pd.DataFrame:
    """P8 as an Arrow-batched UDF: html → nested Profile struct."""
    out = [py_parse_profile(h) for h in html]
    return pd.DataFrame(
        [
            p
            if p is not None
            else {k.name: None for k in PROFILE_TYPE.fields}
            for p in out
        ]
    )


# ------------------------------------------------- typed accessors (columns)


def panel_items_col(panels: Column, label: str, key: str = "snippet") -> Column:
    """Profile.getPanelItems (Profile.java:122-134): items of the FIRST
    panel with the given label, keeping only maps that contain `key`;
    null when no panel matches.  Pure column expression — the nested model
    is queryable without ever leaving the JVM."""
    matching = F.filter(panels, lambda p: p["label"] == F.lit(label))
    first = matching[0]
    items = F.filter(
        F.transform(first["snippets"], lambda m: m[key]), lambda x: x.isNotNull()
    )
    return F.when(F.size(matching) > 0, items)


def first_panel_item_col(panels: Column, label: str, key: str = "snippet") -> Column:
    """Single-valued getters (getYear/getJournal/getCitedBy...)."""
    return panel_items_col(panels, label, key)[0]
