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


# Run-order policy: queries with no CORRECTNESS_r02 row go FIRST so a
# driver-side time cap can never starve them again (VERDICT r2 task 6);
# crawl_3waves (rows-only, the wall-clock long pole, and already smoke-run
# via entry()) goes LAST.
_CHECK_FIRST = [
    "mm_decode_roundtrip",
    "p15_scrub_filename",
    "s7_pdf_text",
    "s6_download_first_hit",
    "p3_unescape_entities",
    "p6_charset_sniff",
    "ev_sessionize",
    "ev_tumbling",
    "ev_running_total",
    "agg_pricing_summary",
    "join_supply_chain",
    "window_top_orders_per_cust",
]


def _ordered(d: dict) -> dict:
    head = [k for k in _CHECK_FIRST if k in d]
    mid = [k for k in d if k not in _CHECK_FIRST and k != "crawl_3waves"]
    tail = [k for k in ("crawl_3waves",) if k in d]
    return {k: d[k] for k in head + mid + tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(DQ.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(DQ.ORACLES))
