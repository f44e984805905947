from __future__ import annotations

import numpy as np
import pytest

import oracles as O
from fixtures import (
    GOLDEN_EDGES,
    GOLDEN_N,
    directed_path,
    random_graph,
    ring_of_cliques,
    star,
    two_cliques_bridge,
)
from dmid_spark import graph as G
from dmid_spark.algorithms import dmid, rawlpa, DmidParams
from dmid_spark.algorithms.dmid import (
    disassortativity_edges,
    follower_degrees,
    global_leaders,
    influence_rows,
)
from dmid_spark.checkpoint import CheckpointManager


def vec(df, n, val="value", default=0.0):
    out = np.full(n, default)
    for r in df.collect():
        out[r["id"]] = r[val]
    return out


GRAPHS = {
    "golden": (GOLDEN_EDGES, GOLDEN_N),
    "two_cliques": two_cliques_bridge(),
    "ring": ring_of_cliques(),
    "star": star(),
    "path": directed_path(),
    "random": random_graph(n=100, seed=29),
}


def test_dis_edges_golden(spark):
    rows, n = GRAPHS["golden"]
    edges = G.edges_from_rows(spark, rows)
    w_in = G.weighted_in_degrees(edges)
    dis = disassortativity_edges(edges, w_in)
    T = O.dis_matrix(rows, n)
    got = {(r.src, r.dst): r.weight for r in dis.collect()}
    for (s, d), w in got.items():
        assert abs(w - T[s, d]) < 1e-12
    # column sums in {0, 1}
    sums = T.sum(axis=0)
    assert all(abs(s - 1) < 1e-12 or s == 0 for s in sums)


@pytest.mark.parametrize("name", list(GRAPHS))
def test_dmid_phases_match_oracle(spark, name):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    res = dmid(edges, DmidParams(tol=1e-8))
    exp = O.dmid(rows, n, tol=1e-8)

    assert np.allclose(vec(res.da, n), exp["da"], atol=1e-9), "DA"
    assert np.allclose(vec(res.ls, n), exp["ls"], atol=1e-9), "LS"

    # phases 2+3 use exact-float-equality tie semantics (reference), so
    # verify them against the oracle run on the engine's own LS values —
    # last-bit summation-order noise legitimately flips ties otherwise.
    exp23 = O.dmid_from_ls(rows, n, vec(res.ls, n), strict_gl=True)
    assert np.allclose(vec(res.fd, n), exp23["fd"], atol=1e-12), "FD"
    assert set(res.leaders) == exp23["leaders"], "global leaders"

    got_cover = {}
    for r in res.cover.collect():
        got_cover.setdefault(r["node"], {})[r["community"]] = r["degree"]
    assert got_cover == exp23["cover"], "cover"
    assert res.unassigned == len(exp23["unassigned"])


@pytest.mark.parametrize("name", ["golden", "two_cliques", "random"])
def test_dmid_leadership_variant(spark, name):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    res = dmid(edges, DmidParams(variant="leadership", tol=1e-8))
    exp = O.dmid_from_ls(rows, n, vec(res.ls, n), variant="leadership", strict_gl=True)
    got_cover = {}
    for r in res.cover.collect():
        got_cover.setdefault(r["node"], {})[r["community"]] = r["degree"]
    assert set(res.leaders) == exp["leaders"]
    assert got_cover == exp["cover"]


def test_dmid_csr_mode_matches_join(spark):
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    r_join = dmid(edges, DmidParams(tol=1e-8, mode="join"))
    r_csr = dmid(edges, DmidParams(tol=1e-8, mode="csr"))
    assert np.allclose(vec(r_join.da, n), vec(r_csr.da, n), atol=1e-12)
    assert r_join.leaders == r_csr.leaders
    c1 = sorted(map(tuple, r_join.cover.collect()))
    c2 = sorted(map(tuple, r_csr.cover.collect()))
    assert c1 == c2


def test_dmid_fixed_iteration_parity_mode(spark):
    """rw_fixed_iters=11 reproduces the Giraph fixed bound
    (supersteps 3..13, DMIDComputation.java:104)."""
    rows, n = GRAPHS["golden"]
    edges = G.edges_from_rows(spark, rows)
    res = dmid(edges, DmidParams(rw_fixed_iters=11))
    T = O.dis_matrix(rows, n)
    exp_da = O.random_walk_fixed(T, 11)
    assert res.stats["rw_iterations"] == 11
    assert np.allclose(vec(res.da, n), exp_da, atol=1e-9)


def test_dmid_star_strict_vs_gte_divergence(spark):
    """star graph: only the hub gets follower degree (FD=9, the sole nonzero
    entry), so avg==FD and the Giraph strict '>' yields NO global leaders
    (DMIDMasterCompute.java:188) while the RAWLPA '>=' elects the hub
    (RandomWalkLabelPropagationAlgorithm.java:277) — the divergence flagged
    in SURVEY.md §2.3 R5, exposed as ``strict_global_leaders``."""
    rows, n = GRAPHS["star"]
    edges = G.edges_from_rows(spark, rows)

    res = dmid(edges, DmidParams(tol=1e-8))  # Giraph parity: strict
    fd = vec(res.fd, n)
    assert fd[0] == pytest.approx(n - 1)
    assert np.allclose(fd[1:], 0.0)
    assert res.leaders == []
    assert res.cover.count() == 0
    assert res.unassigned == n

    res2 = dmid(edges, DmidParams(tol=1e-8, strict_global_leaders=False))
    assert res2.leaders == [0]
    # all leaves join the hub community in round 1 → degree 1.0
    cov = sorted(map(tuple, res2.cover.collect()))
    assert cov == [(i, 0, 1.0) for i in range(n)]
    exp = O.dmid(rows, n, tol=1e-8, strict_gl=False)
    got_cover = {}
    for r in res2.cover.collect():
        got_cover.setdefault(r["node"], {})[r["community"]] = r["degree"]
    assert got_cover == exp["cover"]


def test_dmid_two_cliques_planted_structure(spark):
    """FIXTURES.md F4 expectation (2 leaders at the bridge, all assigned)
    holds under the RAWLPA '>=' leader rule; perfectly symmetric cliques
    yield FD==avg everywhere, so Giraph strict '>' degenerates to no
    leaders (faithful reference behavior on symmetric graphs)."""
    rows, n = GRAPHS["two_cliques"]
    edges = G.edges_from_rows(spark, rows)
    res = dmid(edges, DmidParams(tol=1e-8, strict_global_leaders=False))
    assert res.leaders == [5, 6]  # the bridge endpoints
    assert res.unassigned == 0
    exp = O.dmid(rows, n, tol=1e-8, strict_gl=False)
    got_cover = {}
    for r in res.cover.collect():
        got_cover.setdefault(r["node"], {})[r["community"]] = r["degree"]
    assert got_cover == exp["cover"]


def test_dmid_cascade_checkpoint_lineage(spark, tmp_ckpt_dir):
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    ckpt = CheckpointManager(spark, tmp_ckpt_dir, "dmid")
    res = dmid(edges, DmidParams(tol=1e-8), ckpt=ckpt)
    recs = ckpt.lineage("dmid_cover")
    assert recs
    last = recs[-1]["metrics"]
    assert {"round", "threshold", "restart_count", "new_members", "unassigned"} <= set(last)
    assert last["unassigned"] == res.unassigned


@pytest.mark.parametrize("name", ["golden", "two_cliques", "path", "star"])
def test_rawlpa_matches_oracle(spark, name):
    """Full sequential-RAWLPA parity (Metrics mode 6): unweighted degrees,
    per-src normalization, '>=' leaders, Δ=0.1 wipe-and-retry cascade with
    strictly-earlier-joiner counting."""
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    res = rawlpa(edges, tol=1e-8)
    exp = O.rawlpa_full(rows, n, tol=1e-8)
    assert sorted(res.leaders) == sorted(exp["leaders"])
    got_cover = {
        (r["node"], r["community"]): r["degree"] for r in res.cover.collect()
    }
    assert set(got_cover) == set(exp["cover"])
    for key, deg in exp["cover"].items():
        assert abs(got_cover[key] - deg) < 1e-9, key


def test_rawlpa_fixed_iteration_parity(spark):
    """rw_fixed_iters=100 reproduces the reference's fixed random-walk bound
    (RandomWalkLabelPropagationAlgorithm.java:35)."""
    rows, n = GRAPHS["two_cliques"]
    edges = G.edges_from_rows(spark, rows)
    res = rawlpa(edges, fixed_iters=100)
    exp = O.rawlpa_full(rows, n, fixed_iters=100)
    got_da = vec(res.da, n)
    assert np.allclose(got_da, exp["da"], atol=1e-9)
    assert sorted(res.leaders) == sorted(exp["leaders"])


def test_dmid_no_broadcast_escape_hatch_matches_default(spark):
    # at ~1e9 vertices the O(V) broadcast of ls/out_deg/non-leader tables
    # stops fitting; broadcast_state=False must be a working configuration
    # (sort-merge plans) with bit-identical results
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    r_def = dmid(edges, DmidParams(tol=1e-8))
    r_off = dmid(edges, DmidParams(tol=1e-8, broadcast_state=False))
    assert r_def.leaders == r_off.leaders
    c1 = sorted(map(tuple, r_def.cover.collect()))
    c2 = sorted(map(tuple, r_off.cover.collect()))
    assert c1 == c2
