"""Unit tests for the measurement plumbing that produces the recorded
headline numbers (BENCH/query_floors.json, BENCH/cluster_runs.json).

These guard the floor-merge protocol itself: the per-query floors and the
cluster scaling-gate summary are round-over-round evidence, so a silent
merge bug (floors merging across row-count changes, across CPU configs, or
across engine fingerprints; a geometry summary mixing pairs from another
geometry or checksum era) would corrupt the recorded numbers without any
query result changing.  Pure-Python — no SparkSession.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

import bench
import bench_cluster


# ---------------------------------------------------------------- bench.py


@pytest.fixture()
def sandboxed_bench(tmp_path, monkeypatch):
    """Point bench.merge_query_floors at a throwaway BENCH dir and pin the
    engine fingerprint so tests never touch the real floor history."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "engine_fingerprint", lambda: "fp-test")
    return tmp_path / "BENCH" / "query_floors.json"


def test_floor_min_merges_within_one_key(sandboxed_bench):
    f1, meta1 = bench.merge_query_floors({"q": 2.0}, {"q": 10}, tag="t|")
    assert f1 == {"q": 2.0} and meta1["n_sessions"] == 1
    # slower session: floor holds
    f2, meta2 = bench.merge_query_floors({"q": 5.0}, {"q": 10}, tag="t|")
    assert f2 == {"q": 2.0} and meta2["n_sessions"] == 2
    # faster session: floor drops
    f3, _ = bench.merge_query_floors({"q": 1.5}, {"q": 10}, tag="t|")
    assert f3 == {"q": 1.5}


def test_floor_resets_when_rowcount_changes(sandboxed_bench):
    bench.merge_query_floors({"q": 1.0}, {"q": 10}, tag="t|")
    # same query name but different result cardinality -> different
    # workload; the old floor must NOT apply
    f, _ = bench.merge_query_floors({"q": 4.0}, {"q": 999}, tag="t|")
    assert f == {"q": 4.0}


def test_floor_keys_separate_cpu_configs(sandboxed_bench, monkeypatch):
    monkeypatch.setattr(bench, "CPUS", 32)
    bench.merge_query_floors({"q": 1.0}, {"q": 10}, tag="t|")
    monkeypatch.setattr(bench, "CPUS", 2)
    f, meta = bench.merge_query_floors({"q": 7.0}, {"q": 10}, tag="t|")
    # a local[2] session must not inherit the local[32] floor
    assert f == {"q": 7.0} and meta["n_sessions"] == 1
    overlay = sandboxed_bench.with_name("query_floors_overlay.json")
    hist = json.loads(overlay.read_text())
    assert {k.split("|")[2] for k in hist} == {"c32", "c2"}


def test_floor_keys_separate_fingerprints(sandboxed_bench, monkeypatch):
    bench.merge_query_floors({"q": 1.0}, {"q": 10}, tag="t|")
    monkeypatch.setattr(bench, "engine_fingerprint", lambda: "fp-changed")
    f, meta = bench.merge_query_floors({"q": 3.0}, {"q": 10}, tag="t|")
    # any engine change resets floors so they can never hide a regression
    assert f == {"q": 3.0} and meta["n_sessions"] == 1


def test_floor_history_survives_corrupt_file(sandboxed_bench):
    sandboxed_bench.parent.mkdir(parents=True, exist_ok=True)
    sandboxed_bench.write_text("{not json")
    f, meta = bench.merge_query_floors({"q": 2.5}, {"q": 10}, tag="t|")
    assert f == {"q": 2.5} and meta["n_sessions"] == 1
    # bench never writes the tracked file (that is merge_floors.py's job,
    # run and committed by the builder); the session lands in the overlay
    assert sandboxed_bench.read_text() == "{not json"
    overlay = sandboxed_bench.with_name("query_floors_overlay.json")
    assert json.loads(overlay.read_text())


def test_bench_runs_never_dirty_tracked_floors(sandboxed_bench):
    """The working-tree-hygiene contract: a bench session only writes the
    gitignored overlay; folding into the tracked evidence file is an
    explicit builder act (tools/merge_floors.py), after which the overlay
    is gone and a re-fold is a no-op."""
    import tools.merge_floors as mf

    bench.merge_query_floors({"q": 2.0}, {"q": 10}, tag="t|")
    bench.merge_query_floors({"q": 1.0}, {"q": 10}, tag="t|")
    assert not sandboxed_bench.exists()  # tracked untouched by sessions
    assert mf.main() == 0
    hist = json.loads(sandboxed_bench.read_text())
    (entry,) = hist.values()
    assert entry["queries"]["q"] == {"sec": 1.0, "rows": 10}
    assert entry["n_sessions"] == 2
    overlay = sandboxed_bench.with_name("query_floors_overlay.json")
    assert not overlay.exists()
    # post-fold sessions min-merge over the tracked baseline
    f, meta = bench.merge_query_floors({"q": 5.0}, {"q": 10}, tag="t|")
    assert f == {"q": 1.0} and meta["n_sessions"] == 3
    assert mf.main() == 0
    assert json.loads(sandboxed_bench.read_text())[
        next(iter(hist))
    ]["n_sessions"] == 3


# -------------------------------------------------------- bench_cluster.py


def _cfg(n_exec, cores, best_sec, checksum=111, n_turns=1_000_000):
    return {
        "n_executors": n_exec, "executor_cores": cores,
        "cores_max": n_exec * cores, "n_turns": n_turns,
        "checksum": checksum, "runs_sec": [best_sec],
        "best_sec": best_sec, "turns_per_sec": round(n_turns / best_sec, 1),
    }


def _hist(checksum=111):
    """History with a canonical 4x2 geometry (eff floor 400/(4*110)) and a
    4x1 geometry (eff floor 800/(4*210)), plus one stray pair from another
    checksum era that every summary must ignore."""
    return {
        "pairs": [
            {"geom": "4x2", "t_a": 400.0, "t_b": 110.0, "eff": 0.9,
             "ceil": 0.9, "eff_vs_ceil": 1.0, "checksum": checksum},
            {"geom": "4x2", "t_a": 420.0, "t_b": 140.0, "eff": 0.75,
             "ceil": 1.0, "eff_vs_ceil": 0.75, "checksum": checksum},
            {"geom": "4x1", "t_a": 800.0, "t_b": 210.0, "eff": 0.95,
             "ceil": 0.9, "eff_vs_ceil": 1.056, "checksum": checksum},
            {"geom": "4x2", "t_a": 1.0, "t_b": 1.0, "eff": 0.25,
             "ceil": 1.0, "eff_vs_ceil": 0.25, "checksum": 999},  # stray era
        ],
        "configs": {
            "exec1x2": _cfg(1, 2, 400.0, checksum),
            "exec4x2": _cfg(4, 2, 110.0, checksum),
            "exec1x1": _cfg(1, 1, 800.0, checksum),
            "exec4x1": _cfg(4, 1, 210.0, checksum),
        },
    }


def test_cluster_summary_floor_eff_and_geometries(tmp_path):
    hist = _hist()
    out = tmp_path / "cluster_runs.json"
    bench_cluster.summarize_and_persist(hist, out)
    s = json.loads(out.read_text())["summary"]
    # floor eff = (tps_b / tps_a) / 4 == t_a / (4 * t_b) on equal inputs
    assert s["value"] == pytest.approx(400.0 / (4 * 110.0), abs=2e-3)
    g41 = s["geometries"]["4x1"]
    assert g41["floor_eff"] == pytest.approx(800.0 / (4 * 210.0), abs=2e-3)
    assert g41["n_pairs"] == 1
    # best_geometry_eff picks the strongest qualifying N->4N reading
    assert s["best_geometry_eff"][1] == "4x1"


def test_cluster_summary_ignores_other_checksum_eras(tmp_path):
    hist = _hist()
    out = tmp_path / "cluster_runs.json"
    bench_cluster.summarize_and_persist(hist, out)
    s = json.loads(out.read_text())["summary"]
    # the stray eff=0.25 pair (checksum 999) must not reach any statistic
    assert s["n_pairs"] == 2
    assert s["paired_min"] == 0.75
    assert s["paired_median"] == pytest.approx((0.9 + 0.75) / 2)


def test_cluster_summary_median_eff_vs_ceiling(tmp_path):
    hist = _hist()
    out = tmp_path / "cluster_runs.json"
    bench_cluster.summarize_and_persist(hist, out)
    s = json.loads(out.read_text())["summary"]
    assert s["median_eff_vs_md5_ceiling"] == pytest.approx((1.0 + 0.75) / 2)


def test_cluster_summary_without_canonical_geometry_persists_raw(tmp_path):
    hist = _hist()
    del hist["configs"]["exec4x2"]
    out = tmp_path / "cluster_runs.json"
    bench_cluster.summarize_and_persist(hist, out)
    persisted = json.loads(out.read_text())
    assert "summary" not in persisted  # no canonical reading -> no summary
    assert len(persisted["pairs"]) == 4  # but nothing is lost


def test_cluster_config_merge_never_mixes_checksums():
    """main()'s config merge refuses to min-merge floors across different
    determinism checksums (different input size or engine era)."""
    hist = _hist()
    prev = hist["configs"]["exec1x2"]
    r = _cfg(1, 2, 350.0, checksum=222)
    # replicate the guard exactly as main() applies it
    assert prev.get("checksum") != r["checksum"]


def test_cluster_summary_fresh_history_without_exec1x2(tmp_path):
    """A fresh history whose first pair used a non-canonical geometry (no
    exec1x2 yet) must still persist the just-measured pair instead of
    raising KeyError on the canonical-config lookup."""
    checksum = 11405021730103455
    hist = {
        "pairs": [{"geom": "4x1", "t_a": 800.0, "t_b": 210.0, "eff": 0.95,
                   "ceil": 0.9, "eff_vs_ceil": 1.056, "checksum": checksum}],
        "configs": {
            "exec1x1": _cfg(1, 1, 800.0, checksum),
            "exec4x1": _cfg(4, 1, 210.0, checksum),
        },
    }
    out = tmp_path / "cluster_runs.json"
    bench_cluster.summarize_and_persist(hist, out)
    persisted = json.loads(out.read_text())
    assert len(persisted["pairs"]) == 1  # pair survived
    assert "summary" not in persisted  # no canonical reading yet


def test_compact_bench_line_fits_driver_capture():
    """The driver keeps only a short stdout tail: the printed JSON line must
    stay well under ~1.5 KB even with every headline query present, and must
    carry the floor totals + fingerprint while EXCLUDING the full 59-query
    sf0.01 block (inlining it is what truncated BENCH_r05 past parsing)."""
    result = {
        "metric": "asof_feature_engine_e2e",
        "value": 15.057, "value_is": "floor_total", "value_session": 16.0,
        "unit": "sec",
        "queries": {f"query_name_{i:02d}": 1.234 for i in range(11)},
        "queries_session": {f"query_name_{i:02d}": 2.0 for i in range(11)},
        "floor_protocol": {"fingerprint": "a" * 16, "n_sessions": 3},
        "sf": 0.1, "n_turns": 118966, "turns_per_sec": 34195.5,
        "turns_per_sec_session": 30000.0, "cpus": 32,
        "all_queries_sf001": {
            "queries": {f"q{i}": 0.5 for i in range(59)},
            "queries_session": {f"q{i}": 0.6 for i in range(59)},
            "total": 48.6, "total_session": 50.0,
            "floor_protocol": {"fingerprint": "a" * 16, "n_sessions": 2},
            "sf": 0.01,
        },
    }
    line = json.dumps(bench.compact(result))
    assert len(line) < 1500
    parsed = json.loads(line)
    assert parsed["allq_sf001_total"] == 48.6 and parsed["allq_sf001_n"] == 59
    assert parsed["fp"] == "a" * 16
    assert "all_queries_sf001" not in parsed  # the block that broke r5
    assert "queries_session" not in parsed
