"""Pure-Python tests of the scaling-report reduction (no Spark).

Locks the noisy-host protocol in bench_scaling._best_of: per-field minima
across repeats, and — the honesty guard — compute throughput reported as
None (rendered "≤ noise") whenever the independently-measured superstep
floor meets or exceeds the steady superstep, instead of a clamped
fabricated number.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_scaling import _best_of


def _run(pr_steady, dmid_steady, floor, edges=1000):
    def job(steady):
        return {
            "iterations": 10,
            "wall": steady * 10,
            "supersteps_per_sec": round(1 / steady, 4),
            "edges_per_sec": round(edges / steady / 10, 1),
            "steady_superstep_sec": steady,
            "steady_edges_per_sec": round(edges / steady, 1),
            "iter_secs": [steady] * 10,
        }

    return {
        "cores": 4,
        "edges": edges,
        "vertices": 10,
        "pagerank": job(pr_steady),
        "dmid_rw": job(dmid_steady),
        "superstep_floor_sec": floor,
    }


def test_best_of_takes_per_field_minima():
    out = _best_of([_run(0.5, 2.0, 0.2), _run(0.4, 2.5, 0.3)])
    assert out["superstep_floor_sec"] == 0.2
    assert out["pagerank"]["steady_superstep_sec"] == 0.4
    assert out["dmid_rw"]["steady_superstep_sec"] == 2.0
    # compute = steady - floor, measurable in both jobs here
    assert out["pagerank"]["compute_superstep_sec"] == 0.2
    assert out["pagerank"]["compute_edges_per_sec"] == 5000.0
    assert out["dmid_rw"]["compute_superstep_sec"] == 1.8
    assert out["repeats"] == 2


def test_floor_swallowing_superstep_reports_none_not_clamp():
    # floor (0.45) exceeds the pagerank steady superstep (0.4): the compute
    # term is below measurement noise and must be None, never a 1e-3 clamp
    out = _best_of([_run(0.4, 2.0, 0.45)])
    assert out["pagerank"]["compute_superstep_sec"] is None
    assert out["pagerank"]["compute_edges_per_sec"] is None
    # dmid is still measurable at the same floor
    assert out["dmid_rw"]["compute_superstep_sec"] == 1.55


def test_within_epsilon_of_floor_is_unmeasurable():
    # equal-to-floor and sub-centisecond margins are noise, not signal
    out = _best_of([_run(0.45, 0.459, 0.45)])
    assert out["pagerank"]["compute_superstep_sec"] is None
    assert out["dmid_rw"]["compute_superstep_sec"] is None
