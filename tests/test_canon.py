"""P1/P2/P3/P16 unit vectors (FIXTURES.md §7) + Spark-column ⇔ pure-Python parity."""

import hashlib

from pyspark.sql import functions as F

from bingcrawler_spark.functions.canon import (
    canon_url_col,
    host_name_col,
    host_url_col,
    md5_col,
    py_canon_url,
    py_host_name,
    py_host_url,
    py_md5_hex,
    py_unescape_entities,
    unescape_entities_col,
)

URLS = [
    "http://www.hacg.fi/wp/23147.html#comment-62635",
    "http://a.example/p/1",
    "http://a.example/p/1#x#y",  # greedy: strips from LAST '#'
    "#onlyfrag",
    "ab#",
    "http://host0.example/private/p/3?a=1&b=2",
    "https://UPPER.example/Path",
    "ftp://x/y",
    "",
    "http://h.example/p/2#frag",
    # line-terminator-bearing URLs: Java's '.' excludes all five line
    # terminators (LF CR NEL LS PS), so Pattern.matches FAILS and the
    # fragment survives - both twins must agree
    "http://a.example/p\n/x#frag",
    "http://a.example/p/x#fr\nag",
    "http://a.example/p\r/x#frag",
    "http://a.example/p\u2028x#frag",
]


def test_py_canon_vectors():
    assert py_canon_url(URLS[0]) == "http://www.hacg.fi/wp/23147.html"
    assert py_canon_url("a#b#c") == "a#b"  # greedy = last '#'
    assert py_canon_url("#x") == "#x"
    assert py_canon_url("ab#") == "ab"
    assert py_canon_url("nofrag") == "nofrag"


def test_py_host_vectors():
    assert py_host_url("http://a.b/c/d") == "http://a.b"
    assert py_host_url("https://A.B/c") == "https://A.B"  # case preserved
    assert py_host_url("ftp://x/y") == "ftp:"  # reference quirk preserved
    assert py_host_url("") == ""
    assert py_host_name("http://host0.example/p/1") == "host0.example"


def test_py_entities():
    assert py_unescape_entities("a&amp;b&lt;c&gt;&copy;") == "a&b<c>©"


def test_md5_ascii_equals_java_char_cast():
    # Md5.java casts chars to bytes; for ASCII that equals utf-8 md5
    for u in URLS:
        assert py_md5_hex(u) == hashlib.md5(u.encode("utf-8")).hexdigest()


def test_spark_columns_match_python(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    out = df.select(
        "url",
        canon_url_col(F.col("url")).alias("canon"),
        host_url_col(F.col("url")).alias("host_url"),
        host_name_col(F.col("url")).alias("host_name"),
        unescape_entities_col(F.col("url")).alias("unesc"),
        md5_col(F.col("url")).alias("md5"),
    ).collect()
    for r in out:
        assert r["canon"] == py_canon_url(r["url"]), r["url"]
        assert r["host_url"] == py_host_url(r["url"]), r["url"]
        assert r["host_name"] == py_host_name(r["url"]), r["url"]
        assert r["unesc"] == py_unescape_entities(r["url"]), r["url"]
        assert r["md5"] == py_md5_hex(r["url"]), r["url"]


def test_f7_merge_messages(spark):
    """F7 (UrlsDbManager.java:117-236): per-URL k-v merge, update wins."""
    from pyspark.sql import functions as F

    from bingcrawler_spark.frontier import merge_messages

    state = spark.createDataFrame(
        [("u1", {"a": "1", "b": "2"}), ("u2", None), ("u3", {"x": "9"})],
        "url string, messages map<string,string>",
    )
    updates = spark.createDataFrame(
        [("u1", {"b": "20", "c": "3"}), ("u2", {"k": "v"})],
        "url string, messages map<string,string>",
    )
    out = {r.url: r.messages for r in merge_messages(state, updates).collect()}
    assert out["u1"] == {"a": "1", "b": "20", "c": "3"}
    assert out["u2"] == {"k": "v"}
    assert out["u3"] == {"x": "9"}


# ------------------------------------------------------- property fuzzing

from hypothesis import given, settings, strategies as st  # noqa: E402

_CHARS = st.text(
    alphabet=st.sampled_from(list('abcxyz09/:.#?&=%~*<>|"\\_- é学')),
    min_size=0,
    max_size=30,
)
# splice in multi-char fragments the parsers special-case
_URLISH = st.builds(
    lambda a, frag, b: a + frag + b,
    _CHARS,
    st.sampled_from(["", "&amp;", "&lt;", "http://", "#frag", "//"]),
    _CHARS,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_URLISH, min_size=1, max_size=25))
def test_column_twins_equal_python_on_fuzz(spark, raws):
    """The JVM column implementations and the pure-Python scalar twins
    (used by the oracle and the parity suite) must agree on ARBITRARY
    strings, not just the curated vectors — canon (P1), host (P2),
    entity unescape (P3), filename scrub (P15)."""
    from pyspark.sql import functions as F

    from bingcrawler_spark.functions.canon import (
        canon_url_col,
        host_name_col,
        py_canon_url,
        py_host_name,
        py_scrub_filename,
        py_unescape_entities,
        scrub_filename_col,
        unescape_entities_col,
    )

    df = spark.createDataFrame([(s,) for s in raws], "s string")
    got = df.select(
        F.col("s"),
        canon_url_col(F.col("s")).alias("canon"),
        host_name_col(F.col("s")).alias("host"),
        unescape_entities_col(F.col("s")).alias("ent"),
        scrub_filename_col(F.col("s")).alias("scrub"),
    ).collect()
    for r in got:
        assert r["canon"] == py_canon_url(r["s"]), r["s"]
        assert r["host"] == py_host_name(r["s"]), r["s"]
        assert r["ent"] == py_unescape_entities(r["s"]), r["s"]
        assert r["scrub"] == py_scrub_filename(r["s"]), r["s"]
