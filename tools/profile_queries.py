"""Per-query cost decomposition for the optimization rounds (guide §1).

For every battery query (or a named subset) this runs the same protocol as
bench.py's timed region — build the DataFrame, execute to the noop sink —
but additionally records WHERE the time goes:

- ``build_s``: wall spent in ``q.spark(spark, sf_dir)`` (pure driver/py4j
  plan construction — zero cluster work);
- ``exec_s``: wall of the noop-sink write;
- ``n_jobs`` / ``n_stages`` / ``n_tasks``: scheduler work triggered by the
  noop action (via a per-query job group + statusTracker), which separates
  fixed scheduling floor from data work at tiny SF;
- ``n_exchanges`` / ``n_joins_by_kind`` / ``python_eval``: plan-shape
  counters parsed from ``explain formatted``.

Usage: python tools/profile_queries.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import json
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.operators import (  # noqa: E402
    chunking,
)
from data_engineering_task_adtech_data_pipeline_spark.plans import (  # noqa: E402
    ordered_registry,
)
from data_engineering_task_adtech_data_pipeline_spark.schemas import (  # noqa: E402
    TESTDATA_TABLES,
)
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import (  # noqa: E402
    read_table,
)


def plan_shape(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", txt)
        ),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", txt, re.M)),
        "plan_chars": len(txt),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]
    spark = get_spark("profile-queries")
    sc = spark.sparkContext

    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).count()
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.join(warm.groupBy("n_regionkey").count(), "n_regionkey").collect()

    reg = ordered_registry()
    todo = {n: reg[n] for n in names} if names else reg
    for name, q in todo.items():
        if q.prepare is not None:
            q.prepare(spark, sf_dir)

    results: dict[str, dict] = {}
    for name, q in todo.items():
        sc.setJobGroup(name, name)
        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup(name))
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        jobs = [
            j for j in sc.statusTracker().getJobIdsForGroup(name)
            if j not in before_jobs
        ]
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = sc.statusTracker().getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = sc.statusTracker().getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        shape = plan_shape(q.spark(spark, sf_dir))
        results[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
            **shape,
        }
        sc.setJobGroup(None, None)
        chunking.release_persisted()
        print(
            f"{name}: total={results[name]['total_s']:.2f}s "
            f"(build={results[name]['build_s']:.2f} exec={results[name]['exec_s']:.2f}) "
            f"jobs={len(jobs)} stages={n_stages} tasks={n_tasks} "
            f"ex={shape['exchanges']} smj={shape['smj']} bhj={shape['bhj']} "
            f"py={shape['python_eval']} plan={shape['plan_chars']}"
        )
    if out_json:
        Path(out_json).write_text(json.dumps(results, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
