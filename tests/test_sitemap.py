"""Sitemap source: XML shape, index expansion, malformed tolerance,
seed projection."""

from pyspark.sql import functions as F

from bingcrawler_spark import sitemap as SM


def test_pack_parse_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    parsed = SM.parse_sitemap_blobs(SM.pack_sitemaps(docs)).cache()
    urls = parsed.where(F.col("kind") == "url")
    assert urls.count() == n
    assert urls.where(~F.col("priority_e1").between(0, 9)).count() == 0
    assert urls.where(F.col("lastmod") == "").count() == 0
    idx = parsed.where(F.col("kind") == "sitemap")
    hosts = docs.select((F.col("doc_id") % 32).alias("h")).distinct().count()
    assert idx.count() == hosts
    assert (
        idx.where(~F.col("loc").rlike(r"^https://host\d+\.example/sitemap\.xml$"))
        .count()
        == 0
    )


def test_malformed_blob_skipped(spark):
    blobs = spark.createDataFrame(
        [
            (b"<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
             b"<url><loc>https://a.example/1</loc></url></urlset>",),
            (b"<urlset><url><loc>https://b.example/2</loc>"
             b"<priority>0.7</priority></url></urlset>",),  # no namespace: ok
            (b"this is not xml <<<",),
            # non-UTF-8 bytes (latin-1 curly apostrophe, common in real
            # sitemaps) must skip the BLOB, not kill the task
            (b"<urlset><url><loc>https://c.example/caf\x92</loc></url></urlset>",),
        ],
        "xml binary",
    )
    got = {
        (r["loc"], r["priority_e1"])
        for r in SM.parse_sitemap_blobs(blobs).collect()
    }
    assert got == {("https://a.example/1", -1), ("https://b.example/2", 7)}


def test_seed_projection_weights(spark):
    blobs = spark.createDataFrame(
        [
            (b"<urlset><url><loc>u1</loc><priority>0.9</priority></url>"
             b"<url><loc>u2</loc></url></urlset>",),
        ],
        "xml binary",
    )
    seeds = {
        (r["url"], r["weight"])
        for r in SM.sitemap_seeds(SM.parse_sitemap_blobs(blobs)).collect()
    }
    assert seeds == {("u1", 109), ("u2", 100)}


def test_unparseable_priority_degrades_to_field_default(spark):
    """'high' or locale '0,8' in <priority> must degrade that FIELD to -1,
    not kill the task — same containment as a malformed blob."""
    blobs = spark.createDataFrame(
        [
            (b"<urlset><url><loc>u1</loc><priority>high</priority></url>"
             b"<url><loc>u2</loc><priority>0,8</priority></url>"
             b"<url><loc>u3</loc><priority>0.8</priority></url></urlset>",),
        ],
        "xml binary",
    )
    got = {
        (r["loc"], r["priority_e1"])
        for r in SM.parse_sitemap_blobs(blobs).collect()
    }
    assert got == {("u1", -1), ("u2", -1), ("u3", 8)}
