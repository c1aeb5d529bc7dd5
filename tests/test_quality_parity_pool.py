"""_pooled_stats: win counts must be self-describing under exact ties
(round-4 ADVICE: strict inequalities silently credited ties to neither side,
so win totals could sum to less than n_seeds x n_metrics)."""

import importlib.util
import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _load_qp():
    spec = importlib.util.spec_from_file_location(
        "qp_under_test", os.path.join(REPO, "benchmarks/quality_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["qp_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pooled_stats_counts_ties_explicitly():
    qp = _load_qp()
    rows = {
        # seed 0: a wins; seed 1: exact tie; seed 2: b wins
        "ref_s0": {"SWDx1e3_avg": 1.0, "kid": 0.5},
        "ours_s0": {"SWDx1e3_avg": 2.0, "kid": 0.5},
        "ref_s1": {"SWDx1e3_avg": 3.0, "kid": 0.7},
        "ours_s1": {"SWDx1e3_avg": 3.0, "kid": 0.6},
        "ref_s2": {"SWDx1e3_avg": 5.0, "kid": 0.9},
        "ours_s2": {"SWDx1e3_avg": 4.0, "kid": 0.9},
    }
    out = qp._pooled_stats(rows, [0, 1, 2], "ref", "ours")
    wins = out["total_wins_of_all_comparisons"]
    # 3 seeds x 2 metrics = 6 comparisons, all accounted for
    assert wins["ref"] + wins["ours"] + wins["ties"] == 6
    assert wins["ties"] == 3  # SWD s1, kid s0, kid s2
    swd = out["stats"]["SWDx1e3_avg"]
    assert swd["wins"] == "ref 1 / ours 1 / tie 1"
    kid = out["stats"]["kid"]
    assert kid["wins"] == "ref 0 / ours 1 / tie 2"


def test_pooled_stats_no_tie_suffix_when_no_ties():
    qp = _load_qp()
    rows = {
        "ref_s0": {"kid": 0.1},
        "ours_s0": {"kid": 0.2},
        "ref_s1": {"kid": 0.4},
        "ours_s1": {"kid": 0.3},
    }
    out = qp._pooled_stats(rows, [0, 1], "ref", "ours")
    assert out["stats"]["kid"]["wins"] == "ref 1 / ours 1"
    assert out["total_wins_of_all_comparisons"]["ties"] == 0


def test_merge_recorded_rows_fills_only_missing(tmp_path):
    qp = _load_qp()
    jsonl = tmp_path / "eval.jsonl"
    jsonl.write_text(
        "[fid] scoring note line\n"
        '{"samples": "reals_vs_reals", "kid": 0.0}\n'
        '{"samples": "ref_s6", "kid": 0.5, "SWDx1e3_avg": 222.7}\n'
        '{"samples": "ours_s6", "kid": 0.9}\n'
        "not json at all\n")
    rows = {"ours_s6": {"kid": 0.7}}  # fresh score must win
    qp._merge_recorded_rows(rows, [str(jsonl)])
    assert rows["ref_s6"]["SWDx1e3_avg"] == 222.7  # missing side merged
    assert rows["ours_s6"]["kid"] == 0.7  # fresh row kept
    assert "reals_vs_reals" not in rows  # floor rows never merged
    # merged rows pair with fresh ones in pooled stats
    rows["ref_s7"] = {"kid": 0.4, "SWDx1e3_avg": 200.0}
    rows["ours_s7"] = {"kid": 0.6, "SWDx1e3_avg": 300.0}
    rows["ours_s6"]["SWDx1e3_avg"] = 250.0
    out = qp._pooled_stats(rows, [6, 7], "ref", "ours")
    assert out["n_paired_seeds"] == 2
