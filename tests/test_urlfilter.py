"""URL feature extraction: hand-pinned classifications plus the DuckDB
regex twin over a varied synthetic URL set."""

import duckdb

from bingcrawler_spark import urlfilter as UF

CASES = [
    # url, scheme, host, depth, n_params, tracking, ext_class, keep
    ("http://a.example/x/y.html", "http", "a.example", 2, 0, 0, "page", 1),
    ("https://a.example/img/logo.PNG?v=2", "https", "a.example", 2, 1, 0, "image", 0),
    ("http://a.example/app.js", "http", "a.example", 1, 0, 0, "asset", 0),
    ("http://a.example/dir/sub/", "http", "a.example", 3, 0, 0, "none", 1),
    ("http://a.example", "http", "a.example", 0, 0, 0, "none", 1),
    ("http://a.example/p?id=1&utm_source=x", "http", "a.example", 1, 2, 1, "none", 1),
    ("http://a.example/p?xutm_y=1", "http", "a.example", 1, 1, 0, "none", 1),
    ("ftp://a.example/f.html", "ftp", "a.example", 1, 0, 0, "page", 0),
    ("http://a.example/data.tar.gz", "http", "a.example", 1, 0, 0, "other", 0),
    ("http://h0.example/p.php?utm_campaign=c&x=1", "http", "h0.example", 1, 2, 1, "page", 1),
    # hash-routed SPA URL: the '?' lives INSIDE the fragment, so there is
    # no query component (RFC 3986 §3.4) — n_params/has_tracking must be 0
    ("http://a.example/page#/route?utm_source=x", "http", "a.example", 1, 0, 0, "none", 1),
    # real query AND a fragment carrying a second '?': only the pre-'#'
    # query counts
    ("http://a.example/p?id=1#frag?utm_source=x", "http", "a.example", 1, 1, 0, "none", 1),
    # scheme/host are case-insensitive (RFC 3986): mixed-case input still
    # classifies and keeps, with canonical lowercase scheme/host out
    ("HTTP://A.Example/Index.html", "http", "a.example", 1, 0, 0, "page", 1),
]


def test_url_features_pinned(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = {r["url"]: r for r in UF.url_features(df).collect()}
    for url, scheme, host, depth, n_params, tracking, ext_class, keep in CASES:
        r = got[url]
        assert r["scheme"] == scheme, url
        assert r["host"] == host, url
        assert r["path_depth"] == depth, url
        assert r["n_params"] == n_params, url
        assert r["has_tracking"] == tracking, url
        assert r["ext_class"] == ext_class, url
        assert r["keep"] == keep, url


def test_url_features_matches_duckdb(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = sorted(tuple(r) for r in UF.url_features(df).collect())
    con = duckdb.connect()
    con.register("urls", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(UF.url_features_sql("SELECT url FROM urls")).fetchall()
    )
    assert got == want


# ------------------------------------------------------- canonical collapse


def test_canon_collapse_folds_variants(spark):
    variants = [
        "http://a.example/p",
        "http://a.example/p#frag",
        "http://a.example/p?utm_source=x",
        "HTTP://A.EXAMPLE/p",
        "http://a.example:80/p",
        # different page: params survive, tracking stripped, order kept
        "http://a.example/q?id=1&utm_campaign=c&x=2",
        "http://a.example/q?id=1&x=2",
        # singleton — must NOT appear (n_variants < 2)
        "http://b.example/only",
        # malformed / non-web URLs canonicalize to '' — they must be
        # DROPPED, not aggregated into one bogus '' group
        "mailto:a@b.example",
        "javascript:void(0)",
        "/relative/path?utm_source=x",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = {r["canon_url"]: (r["n_variants"], r["n_tracking_variants"])
           for r in UF.canon_collapse(df).collect()}
    assert got == {
        "http://a.example/p": (5, 1),
        "http://a.example/q?id=1&x=2": (2, 1),
    }


def test_canon_collapse_matches_duckdb(spark):
    import duckdb

    urls = [
        f"http://h{i % 3}.example/p/{i // 2}" + dec
        for i, dec in enumerate(
            ["", "#x", "?utm_source=a", "?a=1&utm_medium=b&b=2", "?fbclid=z", ""] * 6
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = sorted(tuple(r) for r in UF.canon_collapse(df).collect())
    con = duckdb.connect()
    con.register("urls", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(UF.canon_collapse_sql("SELECT url FROM urls")).fetchall()
    )
    assert got == want


# ------------------------------------------------------- DUST alias rules

# (url, content-signature) corpus with known mining outcome per rule:
#   a.example 'sess'  — 2x type-A agree            -> alias
#   a.example 'page'  — type-A signature mismatch  -> rejected
#   a.example 'id'    — type-B impure collapse      -> rejected
#   b.example 'tok'   — one pure + one impure group -> rejected
_DUST_PAGES = [
    ("http://a.example/item?id=1", "s1"),
    ("http://a.example/item?id=1&sess=9", "s1"),
    ("http://a.example/item?id=2", "s2"),
    ("http://a.example/item?id=2&sess=7", "s2"),
    ("http://a.example/item?id=1&page=2", "s1b"),
    ("http://b.example/x?tok=1", "t1"),
    ("http://b.example/x?tok=2", "t1"),
    ("http://b.example/y?tok=3", "t2"),
    ("http://b.example/y?tok=4", "t3"),
]


def test_dust_rules_pinned(spark):
    df = spark.createDataFrame(_DUST_PAGES, "url string, sig string")
    got = {
        (r["host"], r["param"]): (r["support"], r["violations"], r["is_alias"])
        for r in UF.dust_rules(df).collect()
    }
    assert got == {
        ("a.example", "sess"): (2, 0, 1),
        ("a.example", "page"): (1, 1, 0),
        ("a.example", "id"): (1, 1, 0),
        ("b.example", "tok"): (2, 1, 0),
    }


def test_dust_rules_matches_duckdb(spark):
    df = spark.createDataFrame(_DUST_PAGES, "url string, sig string")
    got = sorted(tuple(r) for r in UF.dust_rules(df).collect())
    con = duckdb.connect()
    con.register("pages", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            UF.dust_rules_sql("SELECT url, sig FROM pages")
        ).fetchall()
    )
    assert got == want
