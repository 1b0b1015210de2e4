"""robots.txt parser + RFC 9309 gate — hand-vector semantics.

Covers: comment stripping, CRLF lines, group assignment, group SELECTION
(specific agent beats *, no merging), longest-prefix match, allow-beats-
disallow tie, empty-Disallow dropped, crawl-delay extraction, pathless
URL default, host-with-rules-but-no-match default.
"""

from bingcrawler_spark.functions import robots as RB

ROBOTS_A = (
    "# cmt\r\n"
    "User-agent: *\r\n"
    "Disallow: /private\r\n"
    "Allow: /private/ok\r\n"
    "Crawl-delay: 3\r\n"
    "Disallow:\r\n"  # empty ⇒ allow-all line, dropped
    "\r\n"
    "User-agent: BingCrawler\r\n"
    "Disallow: /p\r\n"
    "Allow: /pq  # trailing comment\r\n"
)
ROBOTS_B = "User-agent: *\nDisallow: /x\n"


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return RB.parse_robots(df)


def test_parse_robots_rows(spark):
    rows = {
        (r.host, r.agent, r.directive, r.path, r.crawl_delay)
        for r in _rules(spark).collect()
    }
    assert rows == {
        ("a.com", "*", "disallow", "/private", None),
        ("a.com", "*", "allow", "/private/ok", None),
        ("a.com", "*", "crawl-delay", None, 3),
        ("a.com", "bingcrawler", "disallow", "/p", None),
        ("a.com", "bingcrawler", "allow", "/pq", None),
        ("b.com", "*", "disallow", "/x", None),
    }


def test_robots_gate_group_selection_and_longest_match(spark):
    urls = spark.createDataFrame(
        [
            ("http://a.com/private/ok/x",),  # * group would allow — but the
            ("http://a.com/p/deep",),        # bingcrawler group is selected:
            ("http://a.com/pq/fine",),       #   /p disallow, /pq allow (tie-
            ("http://a.com/other",),         #   breaking longest match)
            ("http://a.com",),               # pathless ⇒ '/' ⇒ no rule ⇒ 1
            ("http://b.com/x/sub",),         # * group applies on b.com
            ("http://b.com/y",),             # rules exist, none match ⇒ 1
            ("http://c.com/x",),             # no robots at all ⇒ 1
        ],
        "url string",
    )
    got = {r.url: r.allowed for r in RB.robots_gate(urls, _rules(spark)).collect()}
    assert got == {
        # the * group would allow this via Allow /private/ok — but the
        # bingcrawler group is SELECTED, and its Disallow /p prefixes
        # /private/... ⇒ denied (proof the groups are not merged)
        "http://a.com/private/ok/x": 0,
        "http://a.com/p/deep": 0,
        "http://a.com/pq/fine": 1,  # /p (deny) and /pq (allow): longest wins
        "http://a.com/other": 1,
        "http://a.com": 1,
        "http://b.com/x/sub": 0,
        "http://b.com/y": 1,
        "http://c.com/x": 1,
    }


def test_robots_gate_allow_beats_disallow_on_equal_length(spark):
    txt = "User-agent: *\nDisallow: /aa\nAllow: /ab\n"
    rules = RB.parse_robots(
        spark.createDataFrame([("t.com", txt)], "host string, robots_txt string")
    )
    urls = spark.createDataFrame([("http://t.com/a",)], "url string")
    # '/a' matches neither full prefix ⇒ allowed; now same-length conflict:
    txt2 = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    rules2 = RB.parse_robots(
        spark.createDataFrame([("t.com", txt2)], "host string, robots_txt string")
    )
    got = {r.url: r.allowed for r in RB.robots_gate(urls, rules).collect()}
    assert got == {"http://t.com/a": 1}
    got2 = {r.url: r.allowed for r in RB.robots_gate(urls, rules2).collect()}
    assert got2 == {"http://t.com/a": 1}  # tie ⇒ allow wins


def test_wave_gate_wildcard_agent_case_insensitive(spark):
    txt = "USER-AGENT: BINGCRAWLER\nDISALLOW: /z\n"
    rules = RB.parse_robots(
        spark.createDataFrame([("u.com", txt)], "host string, robots_txt string")
    )
    urls = spark.createDataFrame([("http://u.com/z/1",)], "url string")
    got = RB.robots_gate(urls, rules).collect()[0]
    assert got.allowed == 0


def test_rules_table_multi_agent_group_binds_to_all(spark):
    """RFC 9309 §2.1 on the per-host rules-table parser
    (bingcrawler_spark.robots): consecutive User-agent lines — even with
    a blank line between them — form ONE group, so a Disallow under
    'badbot' + '*' applies to '*' too.  Regression: last-agent-wins state
    once dropped the '*' binding entirely."""
    from bingcrawler_spark.robots import parse_robots

    txt = (
        "User-agent: badbot\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: other\n"
        "Disallow: /other-only\n"
        "Crawl-delay: 9\n"
    )
    df = spark.createDataFrame([("g.com", txt)], "host string, robots_txt string")
    out = parse_robots(df).collect()[0]
    assert list(out["disallow_prefixes"]) == ["/private"]
    assert out["crawl_delay"] is None  # delay sits in the 'other' group


def test_full_gate_multi_agent_group(spark):
    """RFC 9309 §2.1 on the registered s8 parser/gate: consecutive
    User-agent lines share their rules, so '*' inherits the group's
    Disallow and the gate blocks the URL; the DuckDB twin folds the
    same rows."""
    import duckdb

    txt = (
        "User-agent: badbot\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: other\n"
        "Disallow: /other-only\n"
    )
    rules = RB.parse_robots(
        spark.createDataFrame([("g.com", txt)], "host string, robots_txt string")
    )
    rows = {(r.agent, r.directive, r.path) for r in rules.collect()}
    assert ("badbot", "disallow", "/private") in rows
    assert ("*", "disallow", "/private") in rows
    assert ("other", "disallow", "/other-only") in rows
    assert ("*", "disallow", "/other-only") not in rows
    urls = spark.createDataFrame(
        [("http://g.com/private/x",), ("http://g.com/other-only/x",)],
        "url string",
    )
    got = {r.url: r.allowed for r in RB.robots_gate(urls, rules).collect()}
    assert got["http://g.com/private/x"] == 0       # '*' group inherits it
    assert got["http://g.com/other-only/x"] == 1    # other group only
    # twin parity over the same text
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE robots AS SELECT 'g.com' AS host, ? AS robots_txt", [txt]
    )
    ref = sorted(
        tuple(r)
        for r in con.execute(
            RB.parse_robots_sql("SELECT host, robots_txt FROM robots")
        ).fetchall()
    )
    assert ref == sorted(tuple(r) for r in rules.collect())
