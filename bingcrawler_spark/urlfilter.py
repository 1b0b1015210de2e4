"""URL feature extraction for crawl-time frontier filtering.

BingCrawler filters candidate links with a handful of hard-coded string
checks before frontier insert (`BingCrawlerTask.java` link loop: scheme
prefix, host allowlist, fragment strip — SURVEY §2 F2/P1).  A web-scale
frontier classifies every discovered URL *before* it costs a fetch slot:
asset extensions (images/css/js) are skipped, tracking-parameter
duplicates (utm_*) are flagged for canonical-collapse, and path depth /
query arity feed the spider-trap budgeter (frontier.py `trap_budget`).

Everything here is per-row JVM column expressions (regexp + arithmetic,
no UDF, no shuffle): the classifier runs inside the candidate-extraction
stage's whole-stage codegen at any scale.  The same regexes are emitted
for the DuckDB oracle (`url_features_sql`), so the classification is
cross-engine hash-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# extension → class; everything else with an extension is 'other',
# extensionless paths are 'none' (crawlable directory/handler URLs)
PAGE_EXTS = ("html", "htm", "php", "asp", "jsp")
IMAGE_EXTS = ("jpg", "jpeg", "png", "gif", "webp", "ico")
ASSET_EXTS = ("css", "js", "woff", "woff2", "svg", "map")

# scheme letters are case-insensitive per RFC 3986 §3.1 (mixed-case
# schemes are routine in scraped href attributes); the extracted
# scheme/host are lowercased below so downstream gates and groupings see
# the canonical form — canon_collapse in this module does the same.
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)?"
# query = text after the FIRST '?' that precedes any '#': '[^#]*?' cannot
# cross a '#', so a '?' inside the fragment (hash-routed SPA URLs like
# /page#/route?utm_source=x) is NOT a query component (RFC 3986 §3.4)
_QUERY_RE = r"^[^#]*?\?([^#]*)"
_EXT_RE = r"\.([a-zA-Z0-9]+)$"


def _ext_class(ext: Column) -> Column:
    low = F.lower(ext)
    return (
        F.when(ext == "", F.lit("none"))
        .when(low.isin(*PAGE_EXTS), F.lit("page"))
        .when(low.isin(*IMAGE_EXTS), F.lit("image"))
        .when(low.isin(*ASSET_EXTS), F.lit("asset"))
        .otherwise(F.lit("other"))
    )


def url_features(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(url) → (url, scheme, host, path_depth, n_params, has_tracking,
    ext_class, keep) — `keep` is the frontier-insert gate: crawlable
    content (page/none extension class) with a known scheme.

    path_depth counts '/' in the path component; n_params counts '&'+1
    in a non-empty query; has_tracking flags utm_* parameters (the
    URL-canonicalization dup class: the same page under N campaign tags
    must collapse to one frontier entry, or 10^10-URL frontiers fill
    with tracking mirrors)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    ext = F.regexp_extract(path, _EXT_RE, 1)
    path_depth = (
        F.length(path) - F.length(F.regexp_replace(path, r"/", ""))
    ).cast("int")
    n_params = (
        F.when(query == "", F.lit(0)).otherwise(
            F.length(query) - F.length(F.regexp_replace(query, r"&", "")) + 1
        )
    ).cast("int")
    has_tracking = (
        query.rlike(r"(^|&)utm_[a-z]+=")
    ).cast("int")
    ext_class = _ext_class(ext)
    keep = (
        scheme.isin("http", "https") & ext_class.isin("page", "none")
    ).cast("int")
    return urls.select(
        u.alias("url"),
        scheme.alias("scheme"),
        F.lower(F.regexp_extract(u, _HOST_RE, 1)).alias("host"),
        path_depth.alias("path_depth"),
        n_params.alias("n_params"),
        has_tracking.alias("has_tracking"),
        ext_class.alias("ext_class"),
        keep.alias("keep"),
    )


def url_features_sql(urls_sql: str, url_col: str = "url") -> str:
    """DuckDB twin — identical regexes (RE2 syntax common to both)."""
    page = ", ".join(f"'{e}'" for e in PAGE_EXTS)
    image = ", ".join(f"'{e}'" for e in IMAGE_EXTS)
    asset = ", ".join(f"'{e}'" for e in ASSET_EXTS)
    return f"""
    WITH parts AS (
      SELECT {url_col} AS url,
             lower(regexp_extract({url_col}, '{_SCHEME_RE}', 1)) AS scheme,
             lower(regexp_extract({url_col}, '{_HOST_RE}', 1)) AS host,
             regexp_extract({url_col}, '{_PATH_RE}', 1) AS path,
             regexp_extract({url_col}, '^[^#]*?\\?([^#]*)', 1) AS query
      FROM ({urls_sql})
    ), feats AS (
      SELECT url, scheme, host,
             (len(path) - len(replace(path, '/', '')))::INT AS path_depth,
             CASE WHEN query = '' THEN 0
                  ELSE len(query) - len(replace(query, '&', '')) + 1
             END::INT AS n_params,
             CASE WHEN regexp_matches(query, '(^|&)utm_[a-z]+=')
                  THEN 1 ELSE 0 END::INT AS has_tracking,
             CASE WHEN regexp_extract(path, '\\.([a-zA-Z0-9]+)$', 1) = ''
                    THEN 'none'
                  WHEN lower(regexp_extract(path, '\\.([a-zA-Z0-9]+)$', 1))
                    IN ({page}) THEN 'page'
                  WHEN lower(regexp_extract(path, '\\.([a-zA-Z0-9]+)$', 1))
                    IN ({image}) THEN 'image'
                  WHEN lower(regexp_extract(path, '\\.([a-zA-Z0-9]+)$', 1))
                    IN ({asset}) THEN 'asset'
                  ELSE 'other' END AS ext_class
      FROM parts
    )
    SELECT url, scheme, host, path_depth, n_params, has_tracking, ext_class,
           CASE WHEN scheme IN ('http', 'https')
                 AND ext_class IN ('page', 'none')
                THEN 1 ELSE 0 END::INT AS keep
    FROM feats
    """


# ------------------------------------------------------- canonical collapse


def canon_collapse(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Tracking-aware URL canonicalization + collapse report: strip
    fragments and utm_* / fbclid / gclid parameters, lowercase scheme
    and host, drop default ports and trailing '?', then group by the
    canonical form — the frontier-side dedup that keeps N campaign-
    tagged mirrors of one page from costing N fetches (complements P1's
    reference-parity canon_url, which preserves queries verbatim).

    Output: one row per canonical URL that collapsed ≥ 2 raw variants
    (canon_url, n_variants, n_tracking_variants).  Pure regexp + one
    groupBy on the canonical key; at 10^10 URLs the shuffle carries
    (canon_url, two counts)."""
    u = F.col(url_col)
    # strip fragment
    nofrag = F.regexp_replace(u, r"#.*$", "")
    # lowercase scheme://host (group 1), keep the rest (group 2)
    lowered = F.concat(
        F.lower(F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)),
        F.regexp_extract(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$", 1),
    )
    # default ports
    noport = F.regexp_replace(
        F.regexp_replace(lowered, r"^(http://[^/?#]+):80(/|\?|$)", r"$1$2"),
        r"^(https://[^/?#]+):443(/|\?|$)",
        r"$1$2",
    )
    had_tracking = noport.rlike(r"[?&](utm_[a-z]+|fbclid|gclid)=")
    # split the query into params, drop the tracking ones, reassemble —
    # regex-on-the-whole-string approaches mangle separator bookkeeping
    base = F.regexp_extract(noport, r"^([^?]*)", 1)
    query = F.regexp_extract(noport, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(r"^(utm_[a-z]+|fbclid|gclid)="),
    )
    canon = F.concat(
        base,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )
    # URLs with no scheme://host prefix (relative links, mailto:,
    # javascript:) canonicalize to '' — drop them rather than emit one
    # bogus group aggregating every malformed URL as "variants"
    return (
        urls.select(canon.alias("canon_url"), had_tracking.cast("long").alias("trk"))
        .where(F.col("canon_url") != "")
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.sum("trk").cast("long").alias("n_tracking_variants"),
        )
        .where(F.col("n_variants") >= 2)
    )


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    sig_col: str = "sig",
    min_support: int = 2,
) -> DataFrame:
    """DUST-style URL alias-rule mining: learn, per host, which query
    parameters never change page content (Bar-Yossef et al., "Do Not
    Crawl in the DUST", WWW 2007).  BingCrawler hard-codes its URL
    normalization (`Util.java` getStandardUrl strips fragments only;
    SURVEY §2 P1); a web-scale frontier instead LEARNS rules like
    "sessionid on host X is content-irrelevant" from already-crawled
    (url, content-signature) pairs and collapses future candidates
    before they cost a fetch slot.

    Evidence per (host, param): strip the param from every URL that has
    it, then
      * type A — the stripped form was itself crawled: compare the two
        signatures (equi-join on the stripped URL);
      * type B — >=2 URLs collapse to the same stripped form (they
        differ only in that param's value): the group must be
        signature-pure.
    A rule holds when every piece of evidence agrees (violations = 0)
    and support >= min_support.

    Scale shape: explode factor = #distinct param names per URL (small,
    bounded); both evidence paths shuffle only (host, param, stripped,
    sig) — signatures are short hashes, page text never moves.  The
    type-A join is an equi-join on the stripped URL; no similarity
    cross-product anywhere.

    Output: (host, param, support, violations, is_alias)."""
    u = F.col(url_col)
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    names = F.array_distinct(
        F.transform(params, lambda p: F.regexp_extract(p, r"^([^=]*)", 1))
    )
    parsed = pages.select(
        u.alias("url"),
        F.col(sig_col).alias("sig"),
        F.lower(F.regexp_extract(u, _HOST_RE, 1)).alias("host"),
        base.alias("base"),
        params.alias("params"),
        names.alias("names"),
    )
    ex = parsed.select(
        "sig", "host", "base", "params", F.explode("names").alias("param")
    )
    kept = F.filter(
        F.col("params"),
        lambda q: F.regexp_extract(q, r"^([^=]*)", 1) != F.col("param"),
    )
    stripped = F.concat(
        F.col("base"),
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )
    ev = ex.select("host", "param", stripped.alias("stripped"), "sig")
    ev_b = (
        ev.groupBy("host", "param", "stripped")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("sig").alias("n_sigs"),
        )
        .where(F.col("n") >= 2)
        .select(
            "host", "param", (F.col("n_sigs") > 1).cast("long").alias("viol")
        )
    )
    corpus = parsed.select(
        F.col("url").alias("stripped"), F.col("sig").alias("sig2")
    )
    ev_a = ev.join(corpus, "stripped").select(
        "host", "param", (F.col("sig") != F.col("sig2")).cast("long").alias("viol")
    )
    return (
        ev_a.unionByName(ev_b)
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("support"),
            F.sum("viol").cast("long").alias("violations"),
        )
        .withColumn(
            "is_alias",
            (
                (F.col("violations") == 0) & (F.col("support") >= min_support)
            ).cast("int"),
        )
    )


def dust_rules_sql(
    pages_sql: str,
    url_col: str = "url",
    sig_col: str = "sig",
    min_support: int = 2,
) -> str:
    """DuckDB twin of :func:`dust_rules` — identical parse regexes and
    evidence rules, so the mined rule set is cross-engine hash-checked."""
    return f"""
    WITH parsed AS (
      SELECT {url_col} AS url, {sig_col} AS sig,
             lower(regexp_extract({url_col}, '{_HOST_RE}', 1)) AS host,
             regexp_extract({url_col}, '^([^?#]*)', 1) AS base,
             list_filter(
               string_split(regexp_extract({url_col}, '^[^#]*?\\?([^#]*)', 1), '&'),
               p -> p <> ''
             ) AS params
      FROM ({pages_sql})
    ), ex AS (
      SELECT sig, host, base, params,
             unnest(list_distinct(
               list_transform(params, p -> regexp_extract(p, '^([^=]*)', 1))
             )) AS param
      FROM parsed
    ), ev AS (
      SELECT host, param, sig,
             base || CASE WHEN len(kept) > 0
                          THEN '?' || array_to_string(kept, '&')
                          ELSE '' END AS stripped
      FROM (
        SELECT *, list_filter(
                 params, q -> regexp_extract(q, '^([^=]*)', 1) <> param
               ) AS kept
        FROM ex
      )
    ), ev_b AS (
      SELECT host, param,
             CASE WHEN count(DISTINCT sig) > 1 THEN 1 ELSE 0 END AS viol
      FROM ev GROUP BY host, param, stripped HAVING count(*) >= 2
    ), ev_a AS (
      SELECT e.host, e.param,
             CASE WHEN e.sig <> c.sig THEN 1 ELSE 0 END AS viol
      FROM ev e JOIN parsed c ON e.stripped = c.url
    ), allev AS (
      SELECT * FROM ev_a UNION ALL SELECT * FROM ev_b
    )
    SELECT host, param, count(*)::BIGINT AS support,
           sum(viol)::BIGINT AS violations,
           CASE WHEN sum(viol) = 0 AND count(*) >= {min_support}
                THEN 1 ELSE 0 END::INT AS is_alias
    FROM allev GROUP BY host, param
    """


def canon_collapse_sql(urls_sql: str, url_col: str = "url") -> str:
    return f"""
    WITH s1 AS (
      SELECT regexp_replace({url_col}, '#.*$', '') AS u FROM ({urls_sql})
    ), s2 AS (
      SELECT lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1))
             || regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$', 1)
               AS u
      FROM s1
    ), s3 AS (
      SELECT regexp_replace(
               regexp_replace(u, '^(http://[^/?#]+):80(/|\\?|$)', '\\1\\2'),
               '^(https://[^/?#]+):443(/|\\?|$)', '\\1\\2') AS u
      FROM s2
    ), s4 AS (
      SELECT u,
             CASE WHEN regexp_matches(u, '[?&](utm_[a-z]+|fbclid|gclid)=')
                  THEN 1 ELSE 0 END AS trk,
             regexp_extract(u, '^([^?]*)', 1) AS base,
             list_filter(
               string_split(regexp_extract(u, '\\?(.*)$', 1), '&'),
               p -> p <> ''
                    AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid)=')
             ) AS params
      FROM s3
    ), s5 AS (
      SELECT trk,
             base || CASE WHEN len(params) > 0
                          THEN '?' || array_to_string(params, '&')
                          ELSE '' END AS canon_url
      FROM s4
    )
    SELECT canon_url, count(*)::BIGINT AS n_variants,
           sum(trk)::BIGINT AS n_tracking_variants
    FROM s5 WHERE canon_url <> ''
    GROUP BY canon_url HAVING count(*) >= 2
    """
