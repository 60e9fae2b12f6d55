"""Interleaved same-box A/B of two checkouts (round-15, r14 VERDICT #1).

Round 14's lesson: the box's multi-core throughput swings 3-5x within
hours, so two solo bench recordings taken at different times are not
comparable even probe-normalized — the r14 judge ruled the round "flat"
because every cross-round claim needed a probe denominator. The fix is
the protocol this tool implements: ALTERNATE solo bench invocations
between the two checkouts (A, B, A, B, ...) so both sample the same box
regime, then compare per-query medians ACROSS the interleaved runs.

Each invocation is `bench.py` run solo (never concurrently) in the given
checkout with SPARK_GRAFT_BENCH_RUNS=1 — the cross-run median over N
interleaved invocations replaces bench.py's within-run median-of-3,
which is the stronger estimator here precisely because the runs
interleave with the other side's. The per-checkout BENCH_DETAIL.json
files are copied to the output dir, a median-aggregated
BENCH_DETAIL-shaped file is written per side (queries_median = cross-run
median, cpu_probe = median probe), and tools/bench_compare.py
adjudicates the pair.

Usage:
  python tools/interleaved_ab.py --a /root/r13head --b /root/repo \
      --rounds 4 --out /root/repo/plans/r15/ab_start \
      [--label-a r13 --label-b r15] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path


def run_bench(root: Path, sf_dir: str, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_RUNS"] = "1"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench in {root} rc={proc.returncode}\n{proc.stderr[-2000:]}"
        )
    detail = json.loads((root / "BENCH_DETAIL.json").read_text())
    detail["_invocation_wall_s"] = round(wall, 1)
    return detail


def aggregate(runs: list[dict]) -> dict:
    """Cross-run per-query medians in BENCH_DETAIL shape (so
    bench_compare.py --series median reads it directly)."""
    names = set()
    for r in runs:
        names.update(r.get("queries", {}))
    med = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs if n in r.get("queries", {})]
        if vals:
            med[n] = round(statistics.median(vals), 3)
    probes = [r["cpu_probe"]["procs32_s"] for r in runs if r.get("cpu_probe")]
    singles = [r["cpu_probe"]["single_s"] for r in runs if r.get("cpu_probe")]
    return {
        "metric": "battery_total_wall",
        "unit": "sec",
        "sf": runs[0].get("sf"),
        "action": runs[0].get("action"),
        "aggregation": f"per-query median across {len(runs)} interleaved solo runs",
        "queries": med,
        "queries_median": med,
        "median_total": round(sum(med.values()), 3),
        "value": round(sum(med.values()), 3),
        "cpu_probe": {
            "single_s": round(statistics.median(singles), 3) if singles else None,
            "procs32_s": round(statistics.median(probes), 3) if probes else None,
            "all_procs32_s": probes,
        },
        "per_run_totals": [round(sum(r["queries"].values()), 3) for r in runs],
        "per_run_walls": [r.get("_invocation_wall_s") for r in runs],
        "errors": {k: v for r in runs for k, v in (r.get("errors") or {}).items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (old/baseline)")
    ap.add_argument("--b", required=True, help="checkout B (new)")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    roots = {args.label_a: Path(args.a), args.label_b: Path(args.b)}
    runs: dict[str, list[dict]] = {args.label_a: [], args.label_b: []}

    for i in range(args.rounds):
        for label, root in roots.items():
            print(f"[interleaved_ab] round {i + 1}/{args.rounds} {label} "
                  f"({root})", flush=True)
            d = run_bench(root, args.sf_dir, {})
            (out / f"{label}_{i + 1}.json").write_text(
                json.dumps(d, indent=1) + "\n"
            )
            runs[label].append(d)
            tot = round(sum(d["queries"].values()), 2)
            probe = d.get("cpu_probe", {})
            print(f"[interleaved_ab]   total {tot}s  probe "
                  f"{probe.get('single_s')}/{probe.get('procs32_s')}  "
                  f"wall {d['_invocation_wall_s']}s", flush=True)

    agg_paths = {}
    for label, rs in runs.items():
        agg = aggregate(rs)
        p = out / f"{label}_median.json"
        p.write_text(json.dumps(agg, indent=1) + "\n")
        agg_paths[label] = p
        print(f"[interleaved_ab] {label}: median_total {agg['median_total']}s "
              f"(per-run totals {agg['per_run_totals']})", flush=True)
        if agg["errors"]:
            print(f"[interleaved_ab] {label} ERRORS: {agg['errors']}",
                  flush=True)

    cmp_out = out / "compare.json"
    subprocess.run(
        [sys.executable, str(Path(__file__).parent / "bench_compare.py"),
         str(agg_paths[args.label_a]), str(agg_paths[args.label_b]),
         "--series", "median", "--json", str(cmp_out)],
        check=False,
    )


if __name__ == "__main__":
    main()
