"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog lives in :mod:`bingcrawler_spark.driver_queries` — one entry
per implemented operator from SURVEY.md §2 (frontier algebra, sources
incl. S4 redirects, parsers incl. the P7/P8 DOM walkers, analytics,
robots parsing) plus the training-data pipeline operators (dedup /
similarity / text-stats / multimodal / event windows).  Entries without
an oracle (crawl_3waves, p12_simhash64) are the genuinely
non-SQL-expressible ops — the wave loop and the Python-2-hash-clone
SimHash — checked instead by tests/test_parity.py and tests/test_simhash.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bingcrawler_spark import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a 3-wave politeness-budgeted crawl (pop log + settle
    outcomes) — the end-to-end path every SURVEY §2.1 operator feeds."""
    return DQ.crawl_3waves(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(DQ.ORACLES)
