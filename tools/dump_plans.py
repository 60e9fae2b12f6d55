"""Dump the formatted physical plan of every battery query to stdout (or a
file) — the evidence artifact behind SCALING.md's plan claims.

Usage: python tools/dump_plans.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans")
    for name, q in REGISTRY.items():
        df = q.spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        print(f"{'=' * 70}\n{name}: {q.doc}\n{'=' * 70}")
        print(buf.getvalue())


if __name__ == "__main__":
    main()
