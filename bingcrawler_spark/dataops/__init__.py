"""Training-data pipeline operators over the documents/embeddings tables.

Beyond the reference's own operator set (SURVEY.md §2), these are the
operations a 100 TB web-text training pipeline needs: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding clones,
connected-component dup clusters),
approximate similarity search, text statistics (language ID, quality,
token counts, fingerprints), deterministic domain-mixture sampling,
and multimodal binary-column plumbing.

Every oracle-checked operator keeps its hashing on the cross-engine
primitives in :mod:`bingcrawler_spark.xhash` so the driver's DuckDB
compare is exact.
"""
