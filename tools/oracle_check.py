"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names/order-insensitive values. Comparison is STRICTER
than any reasonable driver hash: values are stringified cell-by-cell (floats
via repr, so a single ulp difference fails) and multisets must match exactly.
If this passes, any order-insensitive value hash passes.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.schemas import (  # noqa: E402
    TESTDATA_TABLES,
)
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # Decimal, date, datetime, int, str all stringify deterministically
    return f"{type(v).__name__}:{v}"


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(normalize_cell(row[i]) for i in order) for row in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_rows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            if not spark_rows:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        ddf = con.execute(oracles[name])
        duck_cols = [d[0] for d in ddf.description]
        duck_rows = ddf.fetchall()

        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(
                f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
            )
        elif len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        else:
            sm, dm = frame_multiset(spark_cols, spark_rows), frame_multiset(
                duck_cols, duck_rows
            )
            if sm != dm:
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                problems.append(
                    f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
                )
        status = "OK" if not problems else "FAIL"
        print(f"  {name}: {status} ({len(spark_rows)} rows) [{time.time()-t0:.1f}s]")
        for p in problems:
            print(f"    !! {p}")
            failures.append((name, p))

    print(f"\n{'PASS' if not failures else 'FAIL'}: "
          f"{len(failures)} failing checks")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
