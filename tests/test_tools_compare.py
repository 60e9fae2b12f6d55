"""Unit coverage for tools/bench_compare.py's adjudication math — the
normalization rule is now load-bearing (BASELINE.md standing rule), so
its arithmetic and file-shape detection get pinned here. No Spark."""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _mod():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", TOOLS / "bench_compare.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_series_and_probe_detection():
    m = _mod()
    detail = {
        "queries": {"q1": 2.0},
        "queries_median": {"q1": 1.5},
        "legacy_count_action_queries": {"q1": 1.0},
        "cpu_probe": {"single_s": 2.0, "procs32_s": 4.0},
    }
    # _series returns (values, label-actually-used) since round 14 so an
    # adjudication records which leg it compared
    assert m._series(detail, "median", "sf1") == ({"q1": 1.5}, "median")
    assert m._series(detail, "single", "sf1") == ({"q1": 2.0}, "single")
    assert m._series(detail, "legacy", "sf1") == ({"q1": 1.0}, "legacy")
    assert m._probe(detail) == 4.0
    sf1 = {"queries": {"q1": {"sf0.1_sec": 1.0, "sf1_sec": 7.0, "ratio": 7.0}}}
    assert m._series(sf1, "median", "sf1") == ({"q1": 7.0}, "sf1-leg:sf1_sec")
    assert m._series(sf1, "median", "sf0.1") == (
        {"q1": 1.0}, "sf1-leg:sf0.1_sec"
    )
    assert m._probe(sf1) is None
    # a median request against a file with no recorded median falls back
    # to the single series AND SAYS SO in the label
    single_only = {"queries": {"q1": 2.0}}
    assert m._series(single_only, "median", "sf1") == (
        {"q1": 2.0}, "single (no median recorded)"
    )


def test_driver_wrapper_unwraps_parsed(tmp_path):
    m = _mod()
    p = tmp_path / "BENCH_rN.json"
    p.write_text(json.dumps(
        {"parsed": {"queries": {"q1": 3.0}}, "tail": "...", "rc": 0}
    ))
    d = m._load(str(p))
    assert d["queries"] == {"q1": 3.0}


def test_normalization_divides_out_box_speed(tmp_path):
    """A recording 1.5x slower on a box the probe says is 1.5x slower
    must normalize to 1.000x — the whole point of the rule."""
    old = {
        "queries": {"q1": 2.0, "q2": 4.0},
        "queries_median": {"q1": 2.0, "q2": 4.0},
        "cpu_probe": {"single_s": 1.0, "procs32_s": 2.0},
    }
    new = {
        "queries": {"q1": 3.0, "q2": 6.0},
        "queries_median": {"q1": 3.0, "q2": 6.0},
        "cpu_probe": {"single_s": 1.5, "procs32_s": 3.0},
    }
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(old))
    pb.write_text(json.dumps(new))
    out = tmp_path / "cmp.json"
    r = subprocess.run(
        [sys.executable, str(TOOLS / "bench_compare.py"),
         str(pa), str(pb), "--json", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    got = json.loads(out.read_text())
    s = got["summary"]
    assert s["normalized"] is True
    assert s["probe_ratio"] == 1.5
    assert s["total_raw_ratio"] == 1.5
    assert s["total_norm_ratio"] == 1.0
    assert s["movers_beyond_band"] == []  # normalized away
    per = {q["query"]: q for q in got["queries"]}
    assert per["q1"]["norm_ratio"] == 1.0
    assert per["q2"]["norm_ratio"] == 1.0


def test_unnormalized_flag_and_movers(tmp_path):
    old = {"queries_median": {"q1": 1.0, "q2": 1.0}, "queries": {}}
    new = {"queries_median": {"q1": 1.0, "q2": 2.0}, "queries": {}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(old))
    pb.write_text(json.dumps(new))
    out = tmp_path / "cmp.json"
    subprocess.run(
        [sys.executable, str(TOOLS / "bench_compare.py"),
         str(pa), str(pb), "--json", str(out)],
        capture_output=True, text=True, check=True,
    )
    s = json.loads(out.read_text())["summary"]
    assert s["normalized"] is False
    assert [m["query"] for m in s["movers_beyond_band"]] == ["q2"]
    assert s["movers_beyond_band"][0]["norm_ratio"] is None
