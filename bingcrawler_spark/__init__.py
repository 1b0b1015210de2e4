"""bingcrawler_spark — a brand-new PySpark-native analytics + crawl-frontier
engine with the query and data-processing capabilities of the reference
crawler (kelleszzz/BingCrawler), re-expressed Spark-first.

Layout (SURVEY.md §7):
  session.py        SparkSession factory tuned for local[N] and cluster use
  synth.py          deterministic synthetic web-graph / profiles generators
  functions/        scalar ops (P1..P16): canon, entities, md5, simhash, extract
  frontier.py       wave algebra (F1..F9): pop, dedup-insert, settle, reweight
  bloom.py          sharded Bloom-filter seen-set prefilter (north-rule)
  statestore.py     snapshot-versioned parquet tables (Iceberg-style commits)
  crawler.py        the wave loop (§3.1) with checkpoint/resume + metrics
  oracle.py         pure-Python single-node reference semantics (parity tests)
  analytics.py      batch analytics layer (R1..R16)
  pipeline/         training-data ops: dedup, similarity, text QA, multimodal
  streaming.py      Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
