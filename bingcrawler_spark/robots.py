"""robots.txt parsing → the per-host rules table the crawl consumes.

The north rule broadcasts per-host robots rules into the wave
(frontier.robots_filter / pop_wave budgets).  This module produces that
table FROM raw robots.txt bodies, so the engine owns the whole path:
fetch robots.txt → parse → broadcast-join rules.

Parse semantics (the de-facto standard subset that matters for disallow
prefixes):

* lines split on \\n; everything after '#' is comment; fields are
  case-insensitive ``User-agent:`` / ``Disallow:`` with optional space;
* a ``User-agent`` line opens a section; rules apply to the section's
  agent — we keep the ``*`` sections (the crawl identifies as generic);
* an empty ``Disallow:`` value means "allow all" and contributes no
  prefix; ``Crawl-delay`` under ``*`` maps onto the politeness budget
  hint (budget = max(1, 16 // delay) — engine-specific policy, the
  reference has a fixed thread cap instead, AbstractParser.java:136).

The whole parse is JVM-side plan logic (split / explode / window last) —
no UDF: the "which section am I in" state is last_value(agent) IGNORE
NULLS over the line order, which both Spark and DuckDB express, so the
parser is driver-oracle-checkable (rb_parse_robots)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def parse_robots(texts: DataFrame, agent: str = "*") -> DataFrame:
    """texts(host, robots_txt) → (host, disallow_prefixes array<string>,
    crawl_delay int|null).  Line-state via windows, RFC 9309 §2.1 group
    semantics: CONSECUTIVE User-agent lines (blank lines between them
    ignored) form one group, and every rule line binds to ALL agents of
    the nearest group above — not just the most recent agent line, which
    would silently drop '*' rules from multi-agent groups."""
    lines = (
        texts.select(
            "host",
            F.posexplode(F.split(F.col("robots_txt"), "\n")).alias("pos", "raw"),
        )
        .select(
            "host",
            "pos",
            # strip comments, trim
            F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("ln"),
        )
        # empty lines carry no state: dropping them here makes UA lines
        # separated only by blanks still one group (de-facto behavior)
        .where(F.col("ln") != "")
    )
    low = F.lower(F.col("ln"))
    is_ua = low.startswith("user-agent:")
    w_ord = W.partitionBy("host").orderBy("pos")
    w_cum = w_ord.rowsBetween(W.unboundedPreceding, 0)
    # a group starts at a UA line whose predecessor is NOT a UA line; the
    # running count of group starts is the section id for every line
    block_start = is_ua & ~F.lag(is_ua, 1, False).over(w_ord)
    sectioned = lines.select(
        "host",
        "pos",
        "ln",
        is_ua.alias("is_ua"),
        F.when(is_ua, F.trim(F.expr("substring(ln, 12)"))).alias("ua"),
        F.sum(block_start.cast("int")).over(w_cum).alias("blk"),
    )
    scope_blocks = (
        sectioned.where(F.col("is_ua") & (F.col("ua") == agent))
        .select("host", "blk")
        .distinct()
    )
    in_scope = sectioned.where(~F.col("is_ua")).join(
        scope_blocks, ["host", "blk"], "left_semi"
    )
    dis = in_scope.where(F.lower(F.col("ln")).startswith("disallow:")).select(
        "host",
        "pos",
        F.trim(F.expr("substring(ln, 10)")).alias("prefix"),
    ).where(F.col("prefix") != "")
    delay = (
        in_scope.where(F.lower(F.col("ln")).startswith("crawl-delay:"))
        .select(
            "host",
            F.trim(F.expr("substring(ln, 13)")).cast("int").alias("delay"),
        )
        .groupBy("host")
        .agg(F.min("delay").alias("crawl_delay"))
    )
    prefixes = dis.groupBy("host").agg(
        F.array_sort(F.collect_set("prefix")).alias("disallow_prefixes")
    )
    return (
        texts.select("host")
        .distinct()
        .join(prefixes, "host", "left")
        .join(delay, "host", "left")
        .select(
            "host",
            F.coalesce(
                "disallow_prefixes", F.array().cast("array<string>")
            ).alias("disallow_prefixes"),
            F.col("crawl_delay").cast("int"),
        )
    )


def robots_table(texts: DataFrame, default_budget: int = 16) -> DataFrame:
    """parse_robots + the politeness-budget policy: crawl_delay under the
    generic agent caps the per-wave budget at max(1, default_budget//delay)
    — the engine's ROBOTS_SCHEMA shape, ready for CrawlEngine."""
    parsed = parse_robots(texts)
    budget = F.when(
        F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
        F.greatest(F.lit(1), (F.lit(default_budget) / F.col("crawl_delay")).cast("int")),
    ).otherwise(F.lit(default_budget))
    return parsed.select(
        "host", "disallow_prefixes", budget.cast("int").alias("crawl_budget")
    )
