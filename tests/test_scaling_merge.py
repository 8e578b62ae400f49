"""scaling_bench.merge_previous: cross-invocation best accumulation.

Pure-python (no Spark): the merge must take per-level / per-stage /
per-workload bests for same-config same-revision reruns, and refuse to
mix different configurations or different engine revisions.
"""

import importlib.util
import json
import os

import pytest

_SB = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scaling_bench.py")


@pytest.fixture()
def sb(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("scaling_bench", _SB)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # merge_previous reads BENCH_SCALING.json from the cwd
    monkeypatch.chdir(tmp_path)
    return mod


def _result(tp_small, tp_big, sig_s, sig_b, qps_s, qps_b, head="r1"):
    return {
        "metric": "scaling_efficiency",
        "value": round(tp_big / (4 * tp_small), 3),
        "n_small": 4,
        "n_big": 16,
        "pipeline_docs": 1000,
        "docs_per_sec_small": tp_small,
        "docs_per_sec_big": tp_big,
        "pipeline_sec_small": 1000 / tp_small,
        "pipeline_sec_big": 1000 / tp_big,
        "speedup": round(tp_big / tp_small, 2),
        "stage_efficiency": {
            "pipeline_signatures": {
                "sec_small": sig_s,
                "sec_big": sig_b,
                "speedup": round(sig_s / sig_b, 2),
                "efficiency": round(sig_s / (4 * sig_b), 3),
            }
        },
        "workload_efficiency": {
            "lookup_en_qps": {
                "small": qps_s,
                "big": qps_b,
                "efficiency": round(qps_b / (4 * qps_s), 3),
            }
        },
        "reps": 2,
        "bench_reps_per_run": 3,
        "all_docs_per_sec_small": [tp_small],
        "all_docs_per_sec_big": [tp_big],
        "detail_small": {"docs_per_sec": tp_small},
        "detail_big": {"docs_per_sec": tp_big},
        "git_head": head,
    }


def test_merge_takes_per_entry_bests(sb):
    old = _result(100.0, 300.0, sig_s=10.0, sig_b=4.0, qps_s=1000, qps_b=3000)
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(old, fh)
    # new run: better big-side pipeline + stage sec_big, worse elsewhere
    new = _result(80.0, 360.0, sig_s=12.0, sig_b=3.0, qps_s=1200, qps_b=2500)
    m = sb.merge_previous(new)
    assert m["docs_per_sec_small"] == 100.0  # old best kept
    assert m["docs_per_sec_big"] == 360.0  # new best adopted
    assert m["value"] == round(360.0 / (4 * 100.0), 3)
    st = m["stage_efficiency"]["pipeline_signatures"]
    assert st["sec_small"] == 10.0 and st["sec_big"] == 3.0
    assert st["efficiency"] == round(10.0 / (4 * 3.0), 3)
    wl = m["workload_efficiency"]["lookup_en_qps"]
    assert wl["small"] == 1200 and wl["big"] == 3000
    assert m["reps"] == 4
    assert m["all_docs_per_sec_small"] == [100.0, 80.0]
    # the winning side's detail rides along with its throughput
    assert m["detail_small"]["docs_per_sec"] == 100.0
    assert m["detail_big"]["docs_per_sec"] == 360.0


def test_no_merge_across_revisions_or_configs(sb):
    old = _result(100.0, 300.0, 10.0, 4.0, 1000, 3000, head="r1")
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(old, fh)
    new = _result(80.0, 360.0, 12.0, 3.0, 1200, 2500, head="r2")
    m = sb.merge_previous(new)
    assert m == new  # different revision: fresh file
    new2 = _result(80.0, 360.0, 12.0, 3.0, 1200, 2500, head="r1")
    new2["pipeline_docs"] = 2000
    assert sb.merge_previous(new2) == new2  # different config: fresh file


def test_pipeline_only_rerun_preserves_workload_bests(sb):
    """A SCALING_PIPELINE_ONLY rerun (empty workload dict) must not
    erase the accumulated full-run per-workload bests."""
    old = _result(100.0, 300.0, 10.0, 4.0, 1000, 3000)
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(old, fh)
    new = _result(120.0, 350.0, 9.0, 3.5, 1, 1)
    new["workload_efficiency"] = {}
    m = sb.merge_previous(new)
    assert m["workload_efficiency"]["lookup_en_qps"]["small"] == 1000
    assert m["workload_efficiency"]["lookup_en_qps"]["big"] == 3000
    # and the input result was not mutated by the merge
    assert new["workload_efficiency"] == {}
    assert new["stage_efficiency"]["pipeline_signatures"]["sec_small"] == 9.0


def test_no_previous_file_is_fresh(sb):
    new = _result(80.0, 360.0, 12.0, 3.0, 1200, 2500)
    assert sb.merge_previous(new) == new


def test_disable_via_env(sb, monkeypatch):
    old = _result(100.0, 300.0, 10.0, 4.0, 1000, 3000)
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(old, fh)
    monkeypatch.setenv("SCALING_MERGE", "0")
    new = _result(80.0, 360.0, 12.0, 3.0, 1200, 2500)
    assert sb.merge_previous(new) == new
