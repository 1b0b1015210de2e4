"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir on Spark, runs the
matching ``oracle_sql()`` on DuckDB (testdata tables pre-registered as
views), and compares row count, column names, and an order-insensitive
value hash (rows sorted, columns sorted by name, values stringified).

Usage:  python tools/gatecheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bingcrawler_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # lazily-resolved oracles (literal tables precomputed from the gate
    # corpus) must read the SAME sf this gate run compares against
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    spark = get_spark("gatecheck", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            spark.catalog.clearCache()  # release per-query persists
        except Exception as ex:
            print(f"FAIL {name:28s} spark error: {str(ex).splitlines()[0][:160]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok-  {name:28s} rows-only  n={len(rows):6d}  ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name:28s} duckdb error: {str(ex).splitlines()[0][:160]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        scols = [c.lower() for c in cols]
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rows {len(rows)} vs {len(orows)}")
        if not problems:
            hs = value_hash(scols, rows)
            ho = value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"value-hash {hs} vs {ho}")
        if problems:
            print(f"FAIL {name:28s} {'; '.join(problems)}")
            failures.append(name)
        else:
            print(
                f"ok   {name:28s} n={len(rows):6d}  spark={t_spark:5.1f}s duck={t_duck:5.1f}s"
            )
    print(f"\n{n_run - len(failures)}/{n_run} passing")
    if failures:
        print("failing:", " ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
