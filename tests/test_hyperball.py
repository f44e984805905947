"""HyperBall (algorithms/hyperball.py) vs exact BFS reachability.

The strongest check is the *exact relational identity*: the register table
after t rounds must equal ``hll_registers`` computed directly over the true
(source, reached-within-t) pair set — no estimator noise involved. The
estimator itself is then bounded against exact ball sizes.
"""

import math

import pytest

from dmid_spark.algorithms import effective_diameter, hyperball, hyperball_estimates
from dmid_spark.sketch.hll import hll_registers


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _balls(pairs, t, direction="out"):
    """Driver-side exact balls: {v: set(w reachable from v in <= t hops)}."""
    adj: dict[int, set[int]] = {}
    nodes = set()
    for s, d in pairs:
        nodes |= {s, d}
        if direction in ("out", "both"):
            adj.setdefault(s, set()).add(d)
        if direction in ("in", "both"):
            adj.setdefault(d, set()).add(s)
    balls = {v: {v} for v in nodes}
    for _ in range(t):
        balls = {
            v: b.union(*(balls[w] for w in adj.get(v, ())))
            for v, b in balls.items()
        }
    return balls


PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 1), (7, 0)]


@pytest.mark.parametrize("direction", ["out", "in", "both"])
def test_registers_equal_hll_of_exact_balls(spark, direction):
    t = 2
    state, stats = hyperball(_edges(spark, PAIRS), radius=t, p=5, direction=direction)
    balls = _balls(PAIRS, t, direction)
    pair_rows = [(v, w) for v, b in balls.items() for w in b]
    pairs_df = spark.createDataFrame(pair_rows, "id long, reached long")
    want = hll_registers(pairs_df, key_col="reached", group_cols=["id"], p=5)
    # the sketch hashes the *key value*: hll keys are reached-vertex ids on
    # both sides, so identical ball sets => identical registers, bit for bit
    assert sorted(map(tuple, state.collect())) == sorted(map(tuple, want.collect()))
    assert stats.rounds == t


def test_fixpoint_early_stop_and_monotone_nf(spark):
    # path 0->1->2->3->4: out-balls stop growing after 4 rounds
    pairs = [(i, i + 1) for i in range(4)]
    state, stats = hyperball(_edges(spark, pairs), radius=10, p=6)
    assert stats.converged and stats.rounds <= 4
    assert stats.nf == sorted(stats.nf)  # balls only grow
    balls = _balls(pairs, 10)
    want = hll_registers(
        spark.createDataFrame([(v, w) for v, b in balls.items() for w in b],
                              "id long, reached long"),
        key_col="reached", group_cols=["id"], p=6)
    assert sorted(map(tuple, state.collect())) == sorted(map(tuple, want.collect()))


def test_estimates_track_exact_ball_sizes(spark):
    # deterministic pseudo-random digraph, 150 vertices x 3 out-edges
    n = 150
    pairs = [(v, (v * 37 + k * 61 + 11) % n) for v in range(n) for k in range(3)]
    pairs = [(s, d) for s, d in pairs if s != d]
    t = 3
    state, stats = hyperball(_edges(spark, pairs), radius=t, p=8)
    exact = {v: len(b) for v, b in _balls(pairs, t).items()}
    est = {r.id: r.est for r in hyperball_estimates(state, p=8).collect()}
    # per-vertex HLL at p=8 has sigma ~6.5%; sketches share one hash fn so
    # errors are correlated — bound the mean absolute relative error
    mare = sum(abs(est[v] - exact[v]) / exact[v] for v in exact) / len(exact)
    assert mare < 0.10, mare
    nf_exact = sum(exact.values())
    assert abs(stats.nf[t] - nf_exact) / nf_exact < 0.10


def test_effective_diameter_interpolation(spark):
    assert effective_diameter([10.0, 100.0]) == pytest.approx(1.0 - 10 / 90)
    assert effective_diameter([5.0, 5.0]) == 0.0
    assert effective_diameter([2.0, 4.0, 10.0], fraction=0.5) == pytest.approx(1 + 1 / 6)
    with pytest.raises(ValueError):
        effective_diameter([])
    with pytest.raises(ValueError):
        effective_diameter([1.0], fraction=0.0)
    # end-to-end: a 5-path's out-direction nf keeps growing through t=4
    pairs = [(i, i + 1) for i in range(4)]
    _, stats = hyperball(_edges(spark, pairs), radius=10, p=10)
    ed = effective_diameter(stats.nf)
    assert 2.0 < ed <= 4.0, (ed, stats.nf)


def test_validation(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        hyperball(e, radius=-1)
    with pytest.raises(ValueError):
        hyperball(e, radius=1, direction="sideways")


def test_md5_mode_matches_xxhash_relation_shape(spark):
    # same (id, register-count) structure is NOT guaranteed across hash
    # modes, but ball-size estimates must agree within sketch noise
    state_a, _ = hyperball(_edges(spark, PAIRS), radius=2, p=8)
    state_b, _ = hyperball(_edges(spark, PAIRS), radius=2, p=8, hash_mode="md5")
    ea = {r.id: r.est for r in hyperball_estimates(state_a, 8).collect()}
    eb = {r.id: r.est for r in hyperball_estimates(state_b, 8).collect()}
    assert set(ea) == set(eb)
    for v in ea:
        assert math.isclose(ea[v], eb[v], rel_tol=0.25), (v, ea[v], eb[v])


def test_hyperball_harmonic_tracks_exact(spark):
    from dmid_spark.algorithms import harmonic_centrality
    from dmid_spark.algorithms.hyperball import hyperball_harmonic

    n = 60
    pairs = [(v, (v * 31 + k * 17 + 7) % n) for v in range(n) for k in range(2)]
    pairs = [(s, d) for s, d in pairs if s != d]
    e = _edges(spark, pairs)
    # exact: BFS from ALL vertices (X14 with the full source set)
    exact_df, _ = harmonic_centrality(e, e.sparkSession.createDataFrame(
        [(v,) for v in range(n)], "id long"))
    exact = {r.id: r.harmonic for r in exact_df.collect()}
    got_df, stats = hyperball_harmonic(e, radius=20, p=10)
    got = {r.id: r.harmonic for r in got_df.collect()}
    assert stats.converged
    assert set(got) == set(exact)
    mare = sum(
        abs(got[v] - exact[v]) / exact[v] for v in exact if exact[v] > 0
    ) / sum(1 for v in exact if exact[v] > 0)
    assert mare < 0.12, mare


def test_hyperball_harmonic_validation(spark):
    from dmid_spark.algorithms import hyperball_harmonic

    with pytest.raises(ValueError):
        hyperball_harmonic(_edges(spark, [(0, 1)]), radius=0)


def test_empty_graph_inputs(spark):
    from dmid_spark.algorithms import hyperball_harmonic, ktruss
    from dmid_spark.graph import graph_summary

    empty = spark.createDataFrame([], "src long, dst long")
    state, stats = hyperball(empty, radius=3, p=5)
    assert state.count() == 0 and stats.converged
    h, _ = hyperball_harmonic(empty.withColumn("weight", empty.src * 0.0), radius=2)
    assert h.count() == 0
    ew = spark.createDataFrame([], "src long, dst long, weight double")
    truss, kt = ktruss(ew, k=3)
    assert truss.count() == 0 and kt.converged
    row = graph_summary(ew).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0, 0)


def test_hyperball_checkpoint_resume_bit_identical(spark, tmp_path):
    from dmid_spark.checkpoint import CheckpointManager

    e = _edges(spark, PAIRS)
    full, full_stats = hyperball(e, radius=4, p=6)
    ck = CheckpointManager(spark, str(tmp_path), "hb")
    part, _ = hyperball(e, radius=2, p=6, ckpt=ck)  # "crashes" after round 2
    ck2 = CheckpointManager(spark, str(tmp_path), "hb")
    resumed, r_stats = hyperball(e, radius=4, p=6, ckpt=ck2, resume=True)
    # all-integer state: resume must be bit-identical, not just allclose
    assert sorted(map(tuple, resumed.collect())) == sorted(map(tuple, full.collect()))
    assert r_stats.nf == full_stats.nf
