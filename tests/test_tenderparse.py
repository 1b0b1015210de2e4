"""P9 TenderParser quirk tests (TenderParser.java:64-453 semantics — each
test names the reference behavior it pins).  Pure-Python parser tests; the
Spark pipeline itself is certified by the p9_tender_pipeline oracle."""

from bingcrawler_spark.functions import tenderparse as TP
from bingcrawler_spark.synth import (
    tender_display_html,
    tender_home_html,
    tender_search_html,
)


def test_home_keeps_pattern_matches_and_dot_quirk():
    """:334-342 — non-empty href+text, full-match of display.php\\?id=(.*);
    Setting.java:58's unescaped '.' also admits 'displayXphp?id=7'."""
    out = TP.py_parse_home(tender_home_html([(3, "bridge tender"), (9, "road")]))
    hrefs = [o["href"] for o in out]
    assert hrefs == [
        TP.URL_TENDER_HOMEPAGE + "/display.php?id=3",
        TP.URL_TENDER_HOMEPAGE + "/display.php?id=9",
        TP.URL_TENDER_HOMEPAGE + "/displayXphp?id=7",  # quirk row
    ]
    # the empty-text display link and the absolute off-pattern link dropped
    assert all("999999" not in h and "other.example" not in h for h in hrefs)


def test_home_rejects_partial_matches():
    """Java matches() is a FULL match — a display href with a prefix path
    or trailing fragment must not pass PATTERN_DISPLAY."""
    html = (
        '<html><body><a href="/sub/display.php?id=1">a</a>'
        '<a href="display.php?id=2#frag">b</a></body></html>'
    )
    # '#' terminates nothing here — pattern (.*) eats it, so ONLY the
    # /sub-prefixed href is rejected (full-match anchors at the start)
    out = TP.py_parse_home(html)
    assert [o["href"] for o in out] == [
        TP.URL_TENDER_HOMEPAGE + "/display.php?id=2#frag"
    ]


def test_display_title_suffix_strip():
    """:254-255 — document.title() minus SUFFIX_TITLE."""
    assert (
        TP.py_parse_display_title(tender_display_html("tender-1 alpha"))
        == "tender-1 alpha"
    )
    # a title without the suffix passes through unchanged
    assert (
        TP.py_parse_display_title("<html><head><title>bare</title></head></html>")
        == "bare"
    )


def test_search_first_anchor_exclusions():
    """:197-207 — only the FIRST a[href] per result container; empty-text
    and 百度-prefixed anchors are skipped; non-result divs and blocks
    outside div#content_left never contribute."""
    out = TP.py_parse_search_candidates(
        tender_search_html([("http://r/1", "alpha beta gamma"), ("http://r/2", "x")])
    )
    assert out == [
        {"href": "http://r/1", "text": "alpha beta gamma"},
        {"href": "http://r/2", "text": "x"},
    ]


def test_search_requires_content_left():
    assert (
        TP.py_parse_search_candidates("<html><div id='x'><a href='u'>t</a></div>")
        is None
    )


def test_query_codec_roundtrip():
    """wd= codec (:144-154, :271-272): encode∘decode == identity on the
    synth alphabet; space encodes as %20 like okhttp's canonical form."""
    t = "tender-5 alpha beta"
    assert TP.query_encode(t) == "tender-5%20alpha%20beta"
    assert TP.query_decode(TP.query_encode(t)) == t


def test_classify_url_chain(spark):
    """:64-83 dispatch order over representative urls."""
    from pyspark.sql import functions as F

    rows = [
        ("http://www.chinazbcgou.com.cn", "home"),
        ("http://www.chinazbcgou.com.cn/", "home"),
        ("http://www.chinazbcgou.com.cn/display.php?id=5", "display"),
        ("https://www.baidu.com/baidu?wd=x%20y", "search"),
        ("https://www.baidu.com/other?wd=z", "search"),  # host+query only
        ("http://elsewhere.example/display.php?id=5", "other"),
        ("http://www.chinazbcgou.com.cn/else.php", "other"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = {
        r["url"]: r["t"]
        for r in df.select("url", TP.classify_url_col(F.col("url")).alias("t")).collect()
    }
    for u, want in rows:
        assert got[u] == want, (u, got[u], want)


def test_classify_result_via_message(spark):
    """isResultPage (:386-396): a title message in the F7 channel outranks
    'other' but not home/display/search."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("http://result.example/1/0", True), ("http://x.example/y", False)],
        "url string, has_msg boolean",
    )
    got = df.select(
        "url", TP.classify_url_col(F.col("url"), F.col("has_msg")).alias("t")
    ).collect()
    assert {r["url"]: r["t"] for r in got} == {
        "http://result.example/1/0": "result",
        "http://x.example/y": "other",
    }


def test_anchor_matching_is_jsoup_exact():
    """jsoup a[href] / attr("href") parity on real-world shapes the
    synthetic pages never produce: a data-href attribute before href must
    not win, and area/abbr/audio tags must not count as anchors."""
    html = (
        "<html><body>"
        '<a data-href="display.php?id=1" href="display.php?id=2">two</a>'
        '<area href="display.php?id=3">'
        '<abbr href="display.php?id=4">abbr</abbr>'
        "</body></html>"
    )
    out = TP.py_parse_home(html)
    assert [o["href"] for o in out] == [
        TP.URL_TENDER_HOMEPAGE + "/display.php?id=2"
    ]
