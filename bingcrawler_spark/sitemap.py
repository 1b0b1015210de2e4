"""Sitemap (sitemaps.org XML) source: the seed/discovery channel real
crawlers consume beside outlink extraction — the reference seeds from a
hand-built url list (`BingCrawler.java` main seeds); a web-scale
frontier bootstraps from the hosts' published sitemaps instead.

Two directions, mirroring ``warc.py``:

* ``pack_sitemaps`` — serialize the pages corpus into one
  ``<urlset>`` XML blob per host (with ``lastmod`` / ``priority``),
  plus a single ``<sitemapindex>`` blob naming the per-host sitemaps —
  both genuine sitemaps.org documents;
* ``parse_sitemap_blobs`` — mapInPandas parser (stdlib
  ``xml.etree``, namespace-tolerant) that expands urlset AND
  sitemapindex blobs into one row per ``<url>`` entry;
* ``sitemap_seeds`` — project parsed entries onto the frontier's
  (url, weight) seed shape: weight = 100 + priority decile, so a host's
  declared priorities order its seed pops exactly like
  ``UrlNode.weight`` does in the reference pop loop.

Scale shape: blobs parse independently per task (no shuffle);
``pack_sitemaps`` shuffles one narrow (host, url, lastmod, prio)
projection once, grouped by host.  Priorities ride as ``priority_e1``
(0-10 integer deciles) — never a float — so the DuckDB oracle hashes
exactly.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bingcrawler_spark.warc import doc_date, doc_url

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def pack_sitemaps(docs: DataFrame, n_hosts: int = 32) -> DataFrame:
    """documents(doc_id) → (host int, xml binary): one <urlset> per
    host with closed-form loc/lastmod/priority, plus host = -1 carrying
    the <sitemapindex> that names every per-host sitemap."""

    def to_entries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "host": (ids % n_hosts).astype("int32"),
                    "doc_id": ids,
                    "loc": [doc_url(int(i), n_hosts) for i in ids],
                    "lastmod": [doc_date(int(i)) for i in ids],
                    "prio_e1": (ids % 10).astype("int32"),
                }
            )

    def build_xml(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{_NS}">']
        for loc, lastmod, p in zip(pdf["loc"], pdf["lastmod"], pdf["prio_e1"]):
            parts.append(
                f"<url><loc>{loc}</loc><lastmod>{lastmod}</lastmod>"
                f"<priority>0.{int(p)}</priority></url>"
            )
        parts.append("</urlset>")
        return pd.DataFrame(
            {"host": [int(key[0])], "xml": ["\n".join(parts).encode()]}
        )

    entries = docs.select("doc_id").mapInPandas(
        to_entries,
        "host int, doc_id bigint, loc string, lastmod string, prio_e1 int",
    )
    per_host = entries.groupBy("host").applyInPandas(
        build_xml, "host int, xml binary"
    )

    def build_index(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hosts = sorted({int(h) for pdf in it for h in pdf["host"]})
        parts = [
            f'<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="{_NS}">'
        ]
        for h in hosts:
            parts.append(
                f"<sitemap><loc>https://host{h}.example/sitemap.xml</loc>"
                "</sitemap>"
            )
        parts.append("</sitemapindex>")
        yield pd.DataFrame({"host": [-1], "xml": ["\n".join(parts).encode()]})

    # derive the index's host list from the cheap `entries` relation —
    # reading per_host here would execute the groupBy + XML
    # applyInPandas build a second time just to list host ids
    index = entries.select("host").distinct().coalesce(1).mapInPandas(
        build_index, "host int, xml binary"
    )
    return per_host.unionByName(index)


def parse_sitemap_blobs(blobs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(… xml binary …) → one row per <url> entry; <sitemapindex> blobs
    expand to their child sitemap locs with kind='sitemap' so a crawler
    can enqueue the next fetch level."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[xml_col]:
                try:
                    root = ET.fromstring(bytes(blob).decode("utf-8"))
                except (ET.ParseError, UnicodeDecodeError):
                    continue  # malformed sitemap (bad XML or non-UTF-8
                    # bytes): skip the blob, not the task
                tag = root.tag.split("}")[-1]
                if tag == "sitemapindex":
                    for sm in root:
                        loc = sm.find(f"{{{_NS}}}loc")
                        if loc is None:
                            loc = sm.find("loc")
                        if loc is not None and loc.text:
                            rows.append(("sitemap", loc.text.strip(), "", -1))
                elif tag == "urlset":
                    for u in root:
                        fields = {c.tag.split("}")[-1]: (c.text or "") for c in u}
                        if not fields.get("loc"):
                            continue
                        prio = fields.get("priority", "")
                        try:
                            prio_e1 = (
                                int(round(float(prio) * 10))
                                if prio.strip()
                                else -1
                            )
                        except ValueError:
                            # non-numeric <priority> ('high', locale '0,8'):
                            # degrade the field, not the task
                            prio_e1 = -1
                        rows.append(
                            (
                                "url",
                                fields["loc"].strip(),
                                fields.get("lastmod", "").strip(),
                                prio_e1,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["kind", "loc", "lastmod", "priority_e1"]
            )

    return blobs.select(xml_col).mapInPandas(
        _parse, "kind string, loc string, lastmod string, priority_e1 int"
    )


def sitemap_seeds(parsed: DataFrame) -> DataFrame:
    """Parsed url entries → frontier seed rows: weight 100 + priority
    decile (unknown priority = default 100), the reference's
    DEFAULT_WEIGHT convention (CrawlUrl.java:12)."""
    return (
        parsed.where(F.col("kind") == "url")
        .select(
            F.col("loc").alias("url"),
            (
                F.lit(100)
                + F.when(F.col("priority_e1") >= 0, F.col("priority_e1"))
                .otherwise(F.lit(0))
            ).cast("int")
            .alias("weight"),
        )
    )
