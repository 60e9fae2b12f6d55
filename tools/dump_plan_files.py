"""Write `explain formatted` for the named queries to individual files —
the before/after plan evidence for the optimization rounds.

Usage: python tools/dump_plan_files.py OUT_DIR SUFFIX [sf_dir] query...
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.plans import (  # noqa: E402
    ordered_registry,
)
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    spark = get_spark("dump-plan-files")
    reg = ordered_registry()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        q = reg[name]
        if q.prepare is not None:
            q.prepare(spark, sf_dir)
        df = q.spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
