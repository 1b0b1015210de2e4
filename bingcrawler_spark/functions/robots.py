"""robots.txt parsing and URL gating, Spark-first.

The reference crawler drives a live browser and never consults robots.txt
(`AbstractParser.java` fetch loop has no robots handling); a batch crawl
engine needs it, so this implements the RFC 9309 core as DataFrame
operators:

* ``parse_robots`` — robots.txt text → ordered rule rows
  (host, group user-agent, allow/disallow, path prefix, crawl-delay).
  Pure column expressions: split to lines, lateral position explode, a
  cumulative-count-of-group-starts window assigns each line to its
  ``User-agent`` group; CONSECUTIVE User-agent lines form one group per
  RFC 9309 §2.1, and a rule row is emitted per (rule, agent) pair so a
  shared group binds its rules to every listed agent.
* ``robots_gate`` — URLs × rules → allowed flag per URL under
  longest-prefix-match-wins, allow-beats-disallow-on-ties (the published
  Googlebot tie-break), no-matching-rule ⇒ allowed.

Scale shape: robots.txt documents are tiny and one-per-host — the parsed
rule table for even 10^8 hosts is a few billion short rows, partitioned
by host exactly like the frontier, so the gate is a host-co-located
equi-join followed by a per-URL max_by fold (partial-aggregatable, no
window over the URL table).  Nothing here touches Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from bingcrawler_spark.indexing import sql_lit

_LINE_SPLIT = r"\r?\n"
# directive matcher: captures (directive, value), comments stripped first
_DIRECTIVE_RE = r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$"


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt text → (host, rule_id, agent, directive, path, crawl_delay).

    Lines are position-exploded; a running count of group STARTS (a
    ``User-agent`` line whose predecessor is not one — RFC 9309 §2.1:
    consecutive User-agent lines form ONE group) is the group id; each
    Allow/Disallow/Crawl-delay line joins EVERY agent of its group, so a
    rule under ``User-agent: a`` + ``User-agent: *`` emits one row per
    agent.  Empty-path Disallow (``Disallow:``) means allow-all per
    RFC 9309 and is dropped at the source.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), _LINE_SPLIT)).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments, then normalize the directive name to lowercase
        F.regexp_replace("line", r"#.*$", "").alias("line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("directive"),
        F.regexp_extract("line", _DIRECTIVE_RE, 2).alias("value"),
    ).where(F.col("directive") != "")
    w = W.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    blk_start = is_ua & ~F.lag(is_ua, 1, False).over(w)
    grouped = parsed.withColumn("grp", F.sum(blk_start.cast("int")).over(w))
    agent_rows = (
        grouped.where(is_ua)
        .select("host", "grp", F.lower(F.col("value")).alias("agent"))
        .where(F.col("agent") != "")
        .distinct()
    )
    rules = grouped.where(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
    ).join(agent_rows, ["host", "grp"])
    return rules.select(
        "host",
        F.col("pos").cast("int").alias("rule_id"),
        "agent",
        "directive",
        F.when(F.col("directive") != "crawl-delay", F.col("value")).alias("path"),
        F.when(F.col("directive") == "crawl-delay", F.col("value").cast("int"))
        .alias("crawl_delay"),
    ).where((F.col("path") != "") | F.col("crawl_delay").isNotNull())


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "bingcrawler",
    url_col: str = "url",
) -> DataFrame:
    """Per-URL allow/deny under RFC 9309: per host, the crawler obeys its
    OWN agent group when one exists, else the ``*`` group (group
    selection, not merging); within the selected group, longest path
    prefix wins, allow beats disallow on ties; no matching rule ⇒
    allowed.  Paths are literal prefixes (``*``/``$`` wildcard rules are
    out of scope, documented)."""
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-z]+://[^/]+(/.*)$", 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    r_all = rules.where(F.col("directive").isin("allow", "disallow"))
    mine = r_all.where(F.lower(F.col("agent")) == agent.lower())
    star = r_all.where(F.col("agent") == "*").join(
        mine.select("host").distinct(), "host", "left_anti"
    )
    r = mine.unionByName(star).select(
        F.col("host").alias("r_host"),
        F.col("path").alias("rule_path"),
        (F.col("directive") == "allow").cast("int").alias("is_allow"),
    )
    # prefix match lives in the JOIN condition so a URL whose host has
    # rules but no matching prefix keeps its null row (⇒ allowed), instead
    # of being filtered out of the verdict entirely
    joined = u.join(
        r,
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("rule_path")),
        "left",
    )
    # scalar precedence key (longest prefix wins; +is_allow breaks ties in
    # allow's favor) — a struct key would be clearer but DuckDB's max_by
    # can't order by structs, and the twins must fold identically
    verdict = joined.groupBy("url").agg(
        F.coalesce(
            F.max_by(
                F.col("is_allow"),
                F.length("rule_path") * 2 + F.col("is_allow"),
            ),
            F.lit(1),
        ).alias("allowed")
    )
    return verdict.select("url", F.col("allowed").cast("int").alias("allowed"))


# ------------------------------------------------------------ SQL twins


def parse_robots_sql(
    robots_sql: str, host_col: str = "host", text_col: str = "robots_txt"
) -> str:
    return f"""
    WITH src AS ({robots_sql}),
         lines AS (
           SELECT {host_col} AS host,
                  i - 1 AS pos,
                  regexp_replace(
                    string_split_regex({text_col}, '{_LINE_SPLIT}')[i],
                    '#.*$', '') AS line
           FROM src,
                LATERAL (SELECT unnest(generate_series(
                    1, len(string_split_regex({text_col}, '{_LINE_SPLIT}'))))
                  AS i)
         ),
         parsed AS (
           SELECT host, pos,
                  lower(regexp_extract(line, '{_DIRECTIVE_RE}', 1)) AS directive,
                  regexp_extract(line, '{_DIRECTIVE_RE}', 2) AS value
           FROM lines
           WHERE regexp_extract(line, '{_DIRECTIVE_RE}', 1) != ''
         ),
         flagged AS (
           SELECT *, CASE WHEN directive = 'user-agent'
                          AND NOT coalesce(
                            lag(directive = 'user-agent')
                              OVER (PARTITION BY host ORDER BY pos),
                            FALSE)
                          THEN 1 ELSE 0 END AS blk_start
           FROM parsed
         ),
         grouped AS (
           SELECT *, sum(blk_start)
                       OVER (PARTITION BY host ORDER BY pos) AS grp
           FROM flagged
         ),
         agent_rows AS (
           SELECT DISTINCT host, grp, lower(value) AS agent
           FROM grouped
           WHERE directive = 'user-agent' AND lower(value) != ''
         )
    SELECT * FROM (
      SELECT g.host, g.pos::INT AS rule_id, a.agent, g.directive,
             CASE WHEN g.directive != 'crawl-delay' THEN g.value END AS path,
             CASE WHEN g.directive = 'crawl-delay'
                  THEN TRY_CAST(g.value AS INT) END AS crawl_delay
      FROM grouped g JOIN agent_rows a USING (host, grp)
      WHERE g.directive IN ('allow', 'disallow', 'crawl-delay')
    ) WHERE path != '' OR crawl_delay IS NOT NULL
    """


def robots_gate_sql(urls_sql: str, rules_sql: str, agent: str = "bingcrawler") -> str:
    return f"""
    WITH u AS (
      SELECT url,
             regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
             coalesce(nullif(
               regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), ''), '/') AS path
      FROM ({urls_sql})
    ),
    r_all AS (
      SELECT host, path, agent, directive FROM ({rules_sql})
      WHERE directive IN ('allow', 'disallow')
    ),
    mine AS (SELECT * FROM r_all WHERE lower(agent) = {sql_lit(agent.lower())}),
    star AS (SELECT * FROM r_all s WHERE agent = '*'
             AND NOT EXISTS (SELECT 1 FROM mine m WHERE m.host = s.host)),
    r AS (
      SELECT host, path AS rule_path, (directive = 'allow')::INT AS is_allow
      FROM (SELECT * FROM mine UNION ALL SELECT * FROM star)
    ),
    joined AS (
      SELECT u.url, r.rule_path, r.is_allow
      FROM u LEFT JOIN r ON u.host = r.host
       AND u.path LIKE r.rule_path || '%'
    )
    SELECT url,
           coalesce(max_by(is_allow, length(rule_path) * 2 + is_allow),
                    1)::INT AS allowed
    FROM joined
    GROUP BY url
    """
