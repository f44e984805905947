from __future__ import annotations

import numpy as np
import pytest

import oracles as O
from fixtures import GOLDEN_EDGES, GOLDEN_N, random_graph, two_cliques_bridge
from pyspark.sql import functions as F
from dmid_spark import graph as G
from dmid_spark.metrics import (
    community_sizes,
    extended_modularity,
    extended_modularity_npnb08,
    filter_cover_threshold,
    normalize_cover_rows,
    overlapping_nmi,
    spearman_degree_correlation,
)

COVER_SCHEMA = "node long, community long, degree double"


def cover_df(spark, cover):
    rows = [
        (int(v), int(c), float(d))
        for v, mem in cover.items()
        for c, d in mem.items()
        if d != 0
    ]
    return spark.createDataFrame(rows, COVER_SCHEMA)


def two_community_cover(n, overlap=()):
    half = n // 2
    cov = {}
    for v in range(n):
        cov[v] = {0: 1.0} if v < half else {1: 1.0}
    for v in overlap:
        cov[v] = {0: 0.5, 1: 0.5}
    return cov


@pytest.mark.parametrize("name", ["two_cliques", "golden", "random"])
def test_extended_modularity_matches_bruteforce(spark, name):
    rows, n = {
        "two_cliques": two_cliques_bridge(),
        "golden": (GOLDEN_EDGES, GOLDEN_N),
        "random": random_graph(n=40, seed=41),
    }[name]
    edges = G.edges_from_rows(spark, rows)
    cover = two_community_cover(n, overlap=(0, n - 1))
    got = extended_modularity(edges, cover_df(spark, cover))
    exp = O.extended_modularity_bruteforce(rows, n, cover)
    assert got == pytest.approx(exp, abs=1e-10)


@pytest.mark.parametrize("name", ["two_cliques", "random"])
def test_npnb08_modularity_matches_bruteforce(spark, name):
    rows, n = {
        "two_cliques": two_cliques_bridge(),
        "random": random_graph(n=40, seed=43),
    }[name]
    edges = G.edges_from_rows(spark, rows)
    cover = two_community_cover(n, overlap=(1,))
    got = extended_modularity_npnb08(edges, cover_df(spark, cover))
    exp = O.extended_modularity_npnb08_bruteforce(rows, n, cover)
    assert got == pytest.approx(exp, abs=1e-10)


def test_modularity_good_cover_beats_bad(spark):
    rows, n = two_cliques_bridge()
    edges = G.edges_from_rows(spark, rows)
    good = two_community_cover(n)
    bad = {v: {v % 2: 1.0} for v in range(n)}  # parity split: awful
    q_good = extended_modularity(edges, cover_df(spark, good))
    q_bad = extended_modularity(edges, cover_df(spark, bad))
    assert q_good > q_bad


def test_nmi_matches_bruteforce_and_bounds(spark):
    n = 12
    c1 = two_community_cover(n, overlap=(5, 6))
    c2 = {v: {0: 1.0} if v < 7 else {1: 1.0} for v in range(n)}
    got = overlapping_nmi(cover_df(spark, c1), cover_df(spark, c2), n)
    exp = O.overlapping_nmi_bruteforce(c1, c2, n)
    assert got == pytest.approx(exp, abs=1e-10)
    # identical covers → NMI 1
    same = overlapping_nmi(cover_df(spark, c1), cover_df(spark, c1), n)
    assert same == pytest.approx(1.0, abs=1e-10)


def test_nmi_full_cover_community(spark):
    """One community covering every node makes p(Y=0) = 0 — the conditional
    probabilities must guard the division (Spark 4 ANSI mode raises on
    divide-by-zero; the reference's path yields entropy 0 there). Matches
    the brute-force oracle and degenerates to 0 vs a partition of itself."""
    n = 10
    full = {v: {0: 1.0} for v in range(n)}  # single all-node community
    parts = {v: {0: 1.0} if v < 5 else {1: 1.0} for v in range(n)}
    got = overlapping_nmi(cover_df(spark, parts), cover_df(spark, full), n)
    exp = O.overlapping_nmi_bruteforce(parts, full, n)
    assert got == pytest.approx(exp, abs=1e-10)


def test_nmi_random_overlapping_matches_bruteforce(spark):
    """Randomized overlapping covers: the factorized zero-intersection fold
    (size histogram instead of the C1xC2 grid) must agree with the grid
    transliteration to float precision."""
    rng = np.random.default_rng(7)
    n = 60
    c1 = {v: {int(c): 1.0 for c in rng.choice(25, rng.integers(1, 4), replace=False)} for v in range(n)}
    c2 = {v: {int(c): 1.0 for c in rng.choice(30, rng.integers(1, 3), replace=False)} for v in range(n)}
    got = overlapping_nmi(cover_df(spark, c1), cover_df(spark, c2), n)
    exp = O.overlapping_nmi_bruteforce(c1, c2, n)
    assert got == pytest.approx(exp, abs=1e-12)


def test_nmi_many_communities_no_grid(spark):
    """10^4 x 10^4 communities: the old crossJoin grid is 10^8 entropy rows
    (minutes); the factorized form is O(|shared| + C1·distinct_sizes) and
    completes in seconds. Identical covers must still score exactly 1."""
    n_comm = 10_000
    n = 2 * n_comm  # communities of size 2: node i -> community i // 2
    nodes = spark.range(n).select(
        F.col("id").alias("node"),
        (F.col("id") / 2).cast("long").alias("community"),
        F.lit(1.0).alias("degree"),
    )
    same = overlapping_nmi(nodes, nodes, n)
    assert same == pytest.approx(1.0, abs=1e-10)
    # a shifted partition (community = (i+1)//2 mod n_comm) intersects each
    # community of the first cover in exactly 1 node; with size-2 communities
    # in a 20k-node universe the LFK normalized conditional entropy sits at
    # its ceiling, so the exact value is 0 — the point here is that the
    # non-trivial-intersection path also runs grid-free and stays in bounds
    shifted = spark.range(n).select(
        F.col("id").alias("node"),
        F.pmod((F.col("id") + 1) / 2, F.lit(n_comm)).cast("long").alias("community"),
        F.lit(1.0).alias("degree"),
    )
    mixed = overlapping_nmi(nodes, shifted, n)
    assert 0.0 <= mixed < 1.0


def test_community_sizes(spark):
    cov = cover_df(spark, {0: {0: 1.0}, 1: {0: 0.5, 1: 0.5}, 2: {1: 0.2}})
    got = {r["community"]: r["size"] for r in community_sizes(cov).collect()}
    assert got == {0: 2, 1: 2}


def test_normalize_cover_rows_with_singletons(spark):
    cov = cover_df(spark, {0: {0: 2.0, 1: 2.0}, 1: {1: 5.0}})
    verts = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    out = normalize_cover_rows(cov, verts)
    got = {(r["node"], r["community"]): r["degree"] for r in out.collect()}
    assert got[(0, 0)] == 0.5 and got[(0, 1)] == 0.5 and got[(1, 1)] == 1.0
    # uncovered nodes 2, 3 get fresh singleton communities above max id 1
    singles = {k: v for k, v in got.items() if k[0] in (2, 3)}
    assert set(singles.values()) == {1.0}
    assert {c for (_, c) in singles} == {2, 3}


def test_filter_cover_threshold(spark):
    cov = cover_df(spark, {0: {0: 0.9, 1: 0.05}, 1: {0: 0.02, 1: 0.03}})
    out = filter_cover_threshold(cov, 0.1)
    got = {(r["node"], r["community"]): r["degree"] for r in out.collect()}
    # node 0: 0.05 < min(0.9, 0.1) dropped; node 1: row max 0.03 survives
    assert got == {(0, 0): 0.9, (1, 1): 0.03}


def test_spearman_on_correlated_graph(spark):
    # chain graph: out-degree of src and in-degree of dst both constant 1 →
    # ranks are a deterministic permutation; rho well-defined
    rows, n = random_graph(n=60, seed=47)
    edges = G.edges_from_rows(spark, rows)
    rho = spearman_degree_correlation(edges)
    assert -1.0 <= rho <= 1.0
    # deterministic across runs
    assert rho == spearman_degree_correlation(edges)


@pytest.mark.parametrize("name", ["two_cliques", "golden", "random"])
def test_conductance_matches_bruteforce(spark, name):
    from dmid_spark.metrics import community_conductance

    rows, n = {
        "two_cliques": two_cliques_bridge(),
        "golden": (GOLDEN_EDGES, GOLDEN_N),
        "random": random_graph(n=40, seed=43),
    }[name]
    edges = G.edges_from_rows(spark, rows)
    cover = two_community_cover(n, overlap=(0, n - 1))
    got = {
        r["community"]: (
            r["n_nodes"],
            r["internal_w"],
            r["cut_w"],
            r["volume"],
            r["conductance"],
        )
        for r in community_conductance(edges, cover_df(spark, cover)).collect()
    }
    exp = O.conductance_bruteforce(rows, cover)
    assert set(got) == set(exp)
    for c in exp:
        en, ei, ec, ev, ephi = exp[c]
        gn, gi, gc, gv, gphi = got[c]
        assert gn == en
        assert gi == pytest.approx(ei, abs=1e-9)
        assert gc == pytest.approx(ec, abs=1e-9)
        assert gv == pytest.approx(ev, abs=1e-9)
        if ephi is None:
            assert gphi is None
        else:
            assert gphi == pytest.approx(ephi, abs=1e-12)


def test_conductance_self_loop_and_isolated_member(spark):
    from dmid_spark.metrics import community_conductance

    # community 0 = {0,1} with internal edge + self-loop on 0; community 1 =
    # {2,3} where 3 is isolated (still counted in n_nodes); community 2 =
    # {9} touches no edges and must be absent from the output.
    rows = [(0, 1, 2.0), (0, 0, 3.0), (1, 2, 1.0), (2, 3, 0.0)]
    edges = G.edges_from_rows(spark, rows)
    cover = cover_df(
        spark, {0: {0: 1.0}, 1: {0: 1.0}, 2: {1: 1.0}, 3: {1: 1.0}, 9: {2: 1.0}}
    )
    got = {
        r["community"]: (r["n_nodes"], r["internal_w"], r["cut_w"], r["volume"], r["conductance"])
        for r in community_conductance(edges, cover).collect()
    }
    exp = O.conductance_bruteforce(rows, {0: {0: 1.0}, 1: {0: 1.0}, 2: {1: 1.0}, 3: {1: 1.0}, 9: {2: 1.0}})
    assert set(got) == set(exp)
    for c in exp:
        assert got[c][:4] == pytest.approx(exp[c][:4])
    # self-loop sits inside community 0's volume, never its cut
    assert got[0] == (2, 5.0, 1.0, 11.0, got[0][4])


@pytest.mark.parametrize("overlap", [(), (0, 5, 11)])
def test_best_match_f1_matches_bruteforce(spark, overlap):
    from dmid_spark.metrics import avg_f1, best_match_f1

    _, n = two_cliques_bridge()
    cov_a = two_community_cover(n, overlap=overlap)
    # B: three arbitrary communities by residue, plus an extra membership
    cov_b = {v: {v % 3 + 10: 1.0} for v in range(n)}
    cov_b[1][13] = 0.7
    cov_b[2] = {14: 0.0}  # zero degree = non-member; community 14 empty
    a_df, b_df = cover_df(spark, cov_a), cover_df(spark, cov_b)
    got = {
        r["community"]: (r["size"], r["best_f1"], r["best_match"])
        for r in best_match_f1(a_df, b_df).collect()
    }
    exp = O.best_match_f1_bruteforce(cov_a, cov_b)
    assert set(got) == set(exp)
    for c in exp:
        assert got[c][0] == exp[c][0]
        assert got[c][1] == pytest.approx(exp[c][1], abs=1e-12)
        assert got[c][2] == exp[c][2]
    # symmetric average against the same brute force, both directions
    exp_ab = exp
    exp_ba = O.best_match_f1_bruteforce(cov_b, cov_a)
    mean = lambda d: sum(v[1] for v in d.values()) / len(d)
    assert avg_f1(a_df, b_df) == pytest.approx(
        (mean(exp_ab) + mean(exp_ba)) / 2, abs=1e-12
    )


def test_avg_f1_identical_covers_is_one(spark):
    from dmid_spark.metrics import avg_f1

    _, n = two_cliques_bridge()
    cov = two_community_cover(n)
    df = cover_df(spark, cov)
    assert avg_f1(df, df) == pytest.approx(1.0, abs=1e-12)


def test_cover_f1_both_directions_single_pass(spark):
    from dmid_spark.metrics import best_match_f1, cover_f1

    _, n = two_cliques_bridge()
    cov_a = two_community_cover(n, overlap=(2,))
    cov_b = {v: {v % 3 + 10: 1.0} for v in range(n)}
    a_df, b_df = cover_df(spark, cov_a), cover_df(spark, cov_b)
    both = {
        (r["direction"], r["community"]): (r["size"], r["best_f1"], r["best_match"])
        for r in cover_f1(a_df, b_df).collect()
    }
    ab = {
        r["community"]: (r["size"], r["best_f1"], r["best_match"])
        for r in best_match_f1(a_df, b_df).collect()
    }
    ba = {
        r["community"]: (r["size"], r["best_f1"], r["best_match"])
        for r in best_match_f1(b_df, a_df).collect()
    }
    assert {k[1]: v for k, v in both.items() if k[0] == "ab"} == ab
    assert {k[1]: v for k, v in both.items() if k[0] == "ba"} == ba


def random_overlapping_cover(n, n_comms, seed, p_extra=0.35):
    rng = np.random.default_rng(seed)
    cov = {}
    for v in range(n):
        mems = {int(rng.integers(0, n_comms)): 1.0}
        while rng.random() < p_extra:
            mems[int(rng.integers(0, n_comms))] = 1.0
        cov[v] = mems
    return cov


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_omega_matches_bruteforce(spark, seed):
    from dmid_spark.metrics import omega_index

    n = 30
    ca = random_overlapping_cover(n, 5, seed)
    cb = random_overlapping_cover(n, 4, seed + 100)
    nodes = spark.range(n).select(F.col("id").alias("node"))
    row = omega_index(cover_df(spark, ca), cover_df(spark, cb), nodes).collect()[0]
    p, agree, ou, oe, om = O.omega_bruteforce(ca, cb, range(n))
    assert row["n_pairs"] == p
    assert row["agree_pairs"] == agree
    assert row["omega_u"] == pytest.approx(ou, abs=1e-12)
    assert row["omega_e"] == pytest.approx(oe, abs=1e-12)
    if om is None:
        assert row["omega"] is None
    else:
        assert row["omega"] == pytest.approx(om, abs=1e-12)


def test_omega_identical_covers_is_one(spark):
    from dmid_spark.metrics import omega_index

    ca = random_overlapping_cover(24, 4, 3)
    df = cover_df(spark, ca)
    row = omega_index(df, df).collect()[0]
    assert row["omega_u"] == 1.0
    assert row["omega"] == pytest.approx(1.0, abs=1e-12)


def test_omega_universe_extends_beyond_members(spark):
    from dmid_spark.metrics import omega_index

    # two extra never-member nodes enlarge P; both engines' closed forms
    # must fold the all-zero pairs in analytically
    ca = {0: {0: 1.0}, 1: {0: 1.0}, 2: {1: 1.0}}
    cb = {0: {5: 1.0}, 1: {5: 1.0}, 2: {5: 1.0}}
    nodes = spark.range(5).select(F.col("id").alias("node"))
    row = omega_index(cover_df(spark, ca), cover_df(spark, cb), nodes).collect()[0]
    p, agree, ou, oe, om = O.omega_bruteforce(ca, cb, range(5))
    assert (row["n_pairs"], row["agree_pairs"]) == (p, agree)
    assert row["omega"] == pytest.approx(om, abs=1e-12)


@pytest.mark.parametrize("name", ["two_cliques", "golden", "random"])
def test_goodness_matches_bruteforce(spark, name):
    from dmid_spark.metrics import community_goodness

    rows, n = {
        "two_cliques": two_cliques_bridge(),
        "golden": (GOLDEN_EDGES, GOLDEN_N),
        "random": random_graph(n=40, seed=47),
    }[name]
    edges = G.edges_from_rows(spark, rows)
    cover = two_community_cover(n, overlap=(0, n - 1))
    got = {
        r["community"]: (
            r["n_nodes"],
            r["internal_w"],
            r["cut_w"],
            r["internal_density"],
            r["cut_ratio"],
            r["avg_odf"],
            r["flake_odf"],
        )
        for r in community_goodness(edges, cover_df(spark, cover)).collect()
    }
    exp = O.goodness_bruteforce(rows, cover, n)
    assert set(got) == set(exp)
    for c in exp:
        for gv, ev in zip(got[c], exp[c]):
            if ev is None:
                assert gv is None
            else:
                assert gv == pytest.approx(ev, abs=1e-9)


def test_goodness_self_loop_isolated_and_empty_community(spark):
    from dmid_spark.metrics import community_goodness

    rows = [(0, 1, 2.0), (0, 0, 3.0), (1, 2, 1.0), (2, 3, 0.0)]
    edges = G.edges_from_rows(spark, rows)
    cov = {0: {0: 1.0}, 1: {0: 1.0}, 2: {1: 1.0}, 3: {1: 1.0}, 9: {2: 1.0}}
    got = {
        r["community"]: r.asDict() for r in community_goodness(edges, cover_df(spark, cov)).collect()
    }
    exp = O.goodness_bruteforce(rows, cov, 5)
    assert set(got) == {0, 1, 2} == set(exp)
    # self-loop: in degree (deg(0)=2+6=8), never in internal/cut
    assert got[0]["internal_w"] == 2.0 and got[0]["cut_w"] == 1.0
    assert got[0]["avg_odf"] == pytest.approx(exp[0][5], abs=1e-12)
    # isolated member 3 counts toward size, scores odf 0
    assert got[1]["n_nodes"] == 2 and got[1]["flake_odf"] == 0.5
    # edgeless community 9 is kept (unlike conductance's inner join)
    assert got[2]["n_nodes"] == 1 and got[2]["internal_density"] is None
    assert got[2]["cut_ratio"] == 0.0 and got[2]["avg_odf"] == 0.0


# ---------------------------------------------------------------------------
# adjusted Rand index (metrics/ari.py)
# ---------------------------------------------------------------------------
def ari_oracle(la: dict, lb: dict):
    """Brute-force pair-counting ARI over the ids present in BOTH labelings
    (the operator inner-joins on id)."""
    ids = sorted(set(la) & set(lb))
    n = len(ids)
    same_a = same_b = same_both = 0
    for i in range(n):
        for j in range(i + 1, n):
            sa = la[ids[i]] == la[ids[j]]
            sb = lb[ids[i]] == lb[ids[j]]
            same_a += sa
            same_b += sb
            same_both += sa and sb
    tot = n * (n - 1) // 2
    exp = same_a * same_b / tot if tot else 0.0
    den = (same_a + same_b) / 2 - exp
    ari = (same_both - exp) / den if den != 0 else 1.0
    return n, same_both, same_a, same_b, ari


def _labels_df(spark, d):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in d.items()], "id long, label long"
    )


def _run_ari(spark, la, lb):
    from dmid_spark.metrics import adjusted_rand_index

    row = adjusted_rand_index(_labels_df(spark, la), _labels_df(spark, lb)).collect()[0]
    return (row["n_items"], row["pairs_joint"], row["pairs_a"], row["pairs_b"], row["ari"])


def test_ari_identical_partitions_is_one(spark):
    la = {i: i % 4 for i in range(40)}
    got = _run_ari(spark, la, la)
    assert got[4] == pytest.approx(1.0)


def test_ari_matches_bruteforce_on_random_labelings(spark):
    rng = np.random.RandomState(7)
    la = {i: int(rng.randint(0, 6)) for i in range(120)}
    lb = {i: int(rng.randint(0, 4)) for i in range(120)}
    n, joint, pa, pb, ari = _run_ari(spark, la, lb)
    en, ejoint, epa, epb, eari = ari_oracle(la, lb)
    assert (n, joint, pa, pb) == (en, ejoint, epa, epb)
    assert ari == pytest.approx(eari, abs=1e-9)
    # independent labelings agree at ~chance level
    assert abs(ari) < 0.1


def test_ari_hand_example(spark):
    # Hubert-Arabie style 2x2: A = {0,1,2 | 3,4,5}, B = {0,1 | 2,3,4,5}
    la = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    lb = {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1}
    n, joint, pa, pb, ari = _run_ari(spark, la, lb)
    en, ejoint, epa, epb, eari = ari_oracle(la, lb)
    assert (n, joint, pa, pb) == (en, ejoint, epa, epb) == (6, 4, 6, 7)
    assert ari == pytest.approx(eari, abs=1e-9)


def test_ari_degenerate_conventions(spark):
    # all singletons on both sides: max index == expected index == 0 -> 1.0
    la = {i: i for i in range(10)}
    assert _run_ari(spark, la, la)[4] == pytest.approx(1.0)
    # one big cluster on both sides -> denominator 0 -> 1.0
    lb = {i: 0 for i in range(10)}
    assert _run_ari(spark, lb, lb)[4] == pytest.approx(1.0)
    # one side all-singleton, other one-cluster -> ARI 0 by the formula
    n, joint, pa, pb, ari = _run_ari(spark, la, lb)
    assert (joint, pa) == (0, 0)
    assert ari == pytest.approx(0.0)


def test_ari_inner_join_on_ids(spark):
    la = {i: i % 2 for i in range(20)}          # ids 0..19
    lb = {i: i % 2 for i in range(10, 30)}      # ids 10..29
    n, joint, pa, pb, ari = _run_ari(spark, la, lb)
    en, ejoint, epa, epb, eari = ari_oracle(la, lb)
    assert n == en == 10
    assert (joint, pa, pb) == (ejoint, epa, epb)
    assert ari == pytest.approx(eari, abs=1e-9)
