"""P7/P8 DOM-parser quirk tests (BingAnalysis.java / BingAnalysisUtils.java
semantics — each test names the reference behavior it pins)."""

from bingcrawler_spark.functions.bingparse import (
    py_parse_profile,
    py_parse_search,
)
from bingcrawler_spark.synth import bing_profile_page_html, bing_search_page_html


def _panels(p):
    return {pl["label"]: pl["snippets"] for pl in p["panels"]}


def test_search_roundtrip_and_url_unescape():
    """BingAnalysis.java:264-269: url = BING_PREFIX + href, entity-unescaped
    (:421-431); title from the h2 plain text."""
    items = [
        dict(
            profile_id=42,
            title="Paper 42: ant colony",
            authors=[("Author A", "/academic/search?q=Author+A"), ("Author B", None)],
            year=1995,
            journal="Journal of Ant",
            cited_by=123,
            introduction="deep intro text",
            keywords=[("ant", "/academic/search?q=ant"), ("colony", None)],
        )
    ]
    res = py_parse_search(bing_search_page_html(items))
    assert len(res) == 1
    r = res[0]
    assert r["title"] == "Paper 42: ant colony"
    # &amp; in the raw href came back as & with the bing prefix
    assert r["url"] == (
        "http://www.bing.com/academic/profile?id=42&encoded=0&v=paper_preview"
    )
    pans = _panels(r)
    assert [s["snippet"] for s in pans["Authors"]] == ["Author A", "Author B"]
    assert pans["Authors"][0]["url"] == "/academic/search?q=Author+A"
    assert "url" not in pans["Authors"][1]  # addSnippet skips empty urls
    assert pans["Year"] == [{"snippet": "1995"}]
    assert pans["Journal"] == [{"snippet": "Journal of Ant"}]
    assert pans["Cited by"] == [{"snippet": "123"}]
    assert pans["Introduction"] == [{"snippet": "deep intro text"}]
    assert [s["snippet"] for s in pans["Keywords"]] == ["ant", "colony"]


def test_search_author_plain_run_splits_on_dot():
    """BingAnalysis.java:294-299: a plain text run inside caption_author is
    '·'-split into individual authors with no urls."""
    html = (
        '<html><body><ol id="b_results" aria-label="Search Results">'
        '<li class="aca_algo"><h2><a href="/p?id=1">T</a></h2>'
        '<div class="aca_caption"><div class="caption_author">'
        "Eckart Zitzler · Kalyanmoy Deb · Lothar Thiele"
        "</div></div></li></ol></body></html>"
    )
    r = py_parse_search(html)[0]
    assert [s["snippet"] for s in _panels(r)["Authors"]] == [
        "Eckart Zitzler", "Kalyanmoy Deb", "Lothar Thiele",
    ]
    assert all("url" not in s for s in _panels(r)["Authors"])


def test_search_venue_variants():
    """BingAnalysis.java:307-311's own comment enumerates the shapes:
    '1995|Cited by:25325' (no journal) and a bare '2011' (year only)."""
    def page(venue):
        return (
            '<html><body><ol id="b_results" aria-label="Search Results">'
            '<li class="aca_algo"><h2><a href="/p">T</a></h2>'
            '<div class="aca_caption">'
            f'<div class="caption_venue">{venue}</div>'
            "</div></li></ol></body></html>"
        )

    pans = _panels(py_parse_search(page("1995|Cited by:25325"))[0])
    assert pans["Year"] == [{"snippet": "1995"}]
    assert pans["Cited by"] == [{"snippet": "25325"}]
    assert "Journal" not in pans

    pans = _panels(py_parse_search(page("2011"))[0])
    assert pans == {"Year": [{"snippet": "2011"}]}

    # a 5-digit number is NOT a year ([0-9]{1,4} full-match) → Journal
    pans = _panels(py_parse_search(page("20115"))[0])
    assert pans == {"Journal": [{"snippet": "20115"}]}


def test_journal_url_never_found_quirk():
    """BingAnalysis.java:336 compares link text against the literal string
    "_journal" — the journal url lookup can never match, so the Journal
    snippet carries no url even when the venue journal IS a link."""
    html = (
        '<html><body><ol id="b_results" aria-label="Search Results">'
        '<li class="aca_algo"><h2><a href="/p">T</a></h2>'
        '<div class="aca_caption"><div class="caption_venue">'
        '2002 · <a href="/journal/tec">IEEE Tr. Evol. Comp.</a>|Cited by:19475'
        "</div></div></li></ol></body></html>"
    )
    pans = _panels(py_parse_search(html)[0])
    assert pans["Journal"] == [{"snippet": "IEEE Tr. Evol. Comp."}]  # no url


def test_profile_roundtrip():
    p_in = dict(
        title="Paper 7",
        authors=[("A", "/q?a=A"), ("B", None)],
        year=1995,
        journal="J",
        cited_by=12,
        introduction="intro",
        keywords=[("k1", "/q?k=1"), ("k2", None)],
        references=[dict(title="R1", url="/academic/search?q=R1", authors=["X", "Y"])],
        cited_papers=[dict(title="C1", url="/academic/search?q=C1", authors=[])],
        download_urls=["http://dl/1.pdf", "http://dl/2.pdf"],
        source_urls=["http://src/1"],
    )
    p = py_parse_profile(bing_profile_page_html(p_in))
    assert p["title"] == "Paper 7"
    pans = _panels(p)
    assert [s["snippet"] for s in pans["Authors"]] == ["A", "B"]
    assert pans["Authors"][0]["url"] == "/q?a=A"
    assert pans["Year"] == [{"snippet": "1995"}]
    assert p["download_urls"] == ["http://dl/1.pdf", "http://dl/2.pdf"]
    assert p["source_urls"] == ["http://src/1"]
    ref = p["references"][0]
    assert (ref["title"], ref["url"]) == ("R1", "/academic/search?q=R1")
    assert [s["snippet"] for s in _panels(ref)["Authors"]] == ["X", "Y"]
    cp = p["cited_papers"][0]
    assert (cp["title"], cp["url"]) == ("C1", "/academic/search?q=C1")


def test_aca_paper_url_not_unescaped():
    """BingAnalysisUtils.java:95-97 extracts the reference url from the raw
    tag text — &amp; is NOT unescaped there (unlike search urls)."""
    html = (
        "<html><body><ol>"
        '<li id="acapp_papers"><div class="mpage" id="aca_rpaper"><table>'
        '<tr data-exp="H;;;;;;"><td><li>'
        '<a href="/academic/search?q=x&amp;mkt=zh-cn">RefT</a></li></td></tr>'
        "</table></div></li></ol></body></html>"
    )
    p = py_parse_profile(html)
    assert p["references"][0]["url"] == "/academic/search?q=x&amp;mkt=zh-cn"


def test_downloads_tab_gating():
    """BingAnalysis.java:137-152: tab_1 is Download only when BOTH tabs
    exist; Source when only Source exists; silently DROPPED when only
    Download exists; tab_2 is always Source."""
    def page(tabs, tab1_urls, tab2=None):
        lis = "".join(f"<li>{t}</li>" for t in tabs)
        t1 = "".join(f'<a target="_blank" href="{u}">x</a>' for u in tab1_urls)
        html = (
            '<html><body><ol><div class="aca_source">'
            f'<div class="tab-head">{lis}</div>'
            f'<div id="tab_1_X"><span>{t1}</span></div>'
        )
        if tab2 is not None:
            t2 = "".join(f'<a target="_blank" href="{u}">x</a>' for u in tab2)
            html += f'<div id="tab_2_X"><span>{t2}</span></div>'
        return html + "</div></ol></body></html>"

    p = py_parse_profile(page(["Download", "Source"], ["d1"], ["s1"]))
    assert (p["download_urls"], p["source_urls"]) == (["d1"], ["s1"])

    p = py_parse_profile(page(["Source"], ["s1"]))
    assert (p["download_urls"], p["source_urls"]) == ([], ["s1"])

    p = py_parse_profile(page(["Download"], ["d1"]))  # dropped — quirk
    assert (p["download_urls"], p["source_urls"]) == ([], [])


def test_downloads_missing_span_voids_profile():
    """analyze_downloads_div NPEs when the tab div holds no span; the
    profile-level catch turns that into a null profile
    (BingAnalysis.java:160-163)."""
    html = (
        '<html><body><ol><li class="aca_title">T</li>'
        '<div class="aca_source"><div class="tab-head"><li>Source</li></div>'
        '<div id="tab_1_X"><b>no span here</b></div>'
        "</div></ol></body></html>"
    )
    assert py_parse_profile(html) is None


def test_bhpanel_minimal_tagnodes():
    """analyze_b_hPanel (BingAnalysisUtils.java:134-151): snippets are the
    MINIMAL tag nodes of aca_content — tags without tag children — in
    document order; wrapper tags contribute nothing."""
    html = (
        '<html><body><ol><li class="aca_main"><div class="b_hPanel">'
        '<span class="aca_labels">Authors</span>'
        '<span class="aca_content"><div><a href="/u1">A1</a></div>'
        "<i>A2</i></span>"
        "</div></li></ol></body></html>"
    )
    p = py_parse_profile(html)
    pans = _panels(p)
    assert [s["snippet"] for s in pans["Authors"]] == ["A1", "A2"]
    assert pans["Authors"][0]["url"] == "/u1"
    assert "url" not in pans["Authors"][1]


def test_search_none_without_results_ol():
    assert py_parse_search("<html><body><p>nope</p></body></html>") is None
    assert py_parse_search(None) is None
    assert py_parse_profile(None) is None
