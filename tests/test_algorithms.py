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
from dmid_spark.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_counts,
)


def vec(df, n, key="id", val="value", default=0.0):
    out = np.full(n, default)
    for r in df.collect():
        out[r[key]] = r[val]
    return out


GRAPHS = {
    "golden": (GOLDEN_EDGES, GOLDEN_N),
    "two_cliques": two_cliques_bridge(),
    "ring": ring_of_cliques(),
    "star": star(),
    "path": directed_path(),
    "random": random_graph(n=120, seed=23),
}


@pytest.mark.parametrize("name", ["golden", "two_cliques", "path", "random"])
@pytest.mark.parametrize("mode", ["join", "csr"])
def test_pagerank_matches_oracle(spark, name, mode):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    ranks, stats = pagerank(edges, tol=1e-8, mode=mode)
    exp, _, _ = O.pagerank(rows, n, tol=1e-8)
    got = vec(ranks, n)
    assert stats.converged
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6


def test_pagerank_modes_agree(spark):
    rows, n = random_graph(n=150, seed=31)
    edges = G.edges_from_rows(spark, rows)
    r1, _ = pagerank(edges, tol=1e-8, mode="join")
    for mode in ("csr", "csr_rdd", "jvm"):
        r2, _ = pagerank(edges, tol=1e-8, mode=mode)
        assert np.allclose(vec(r1, n), vec(r2, n), atol=1e-12), mode


@pytest.mark.parametrize("name", ["golden", "two_cliques", "ring", "star", "path", "random"])
def test_connected_components(spark, name):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    labels, stats = connected_components(edges)
    exp = O.connected_components(rows, n)
    got = vec(labels, n, val="component", default=-1).astype(int)
    assert stats.converged
    assert np.array_equal(got, exp)


def test_connected_components_multi_component(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0), (8, 9, 1.0), (9, 5, 1.0)]
    # ids 0..9 with isolated vertices via a self-referencing vertex set
    edges = G.edges_from_rows(spark, rows)
    labels, _ = connected_components(edges)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 8: 5, 9: 5}


@pytest.mark.parametrize("name", ["two_cliques", "ring", "random"])
def test_lpa_matches_oracle(spark, name):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    for iters in (1, 3):
        labels, _ = label_propagation(edges, max_iter=iters, until_fixpoint=False)
        exp = O.lpa(rows, n, iters=iters)
        got = vec(labels, n, val="label", default=-1).astype(int)
        assert np.array_equal(got, exp), f"{name} iters={iters}"


@pytest.mark.parametrize("name", ["golden", "two_cliques", "ring", "star", "random"])
@pytest.mark.parametrize("degree_ordered", [True, False])
def test_triangles(spark, name, degree_ordered):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    counts, stats = triangle_counts(edges, degree_ordered=degree_ordered)
    exp = O.triangle_counts(rows, n)
    got = vec(counts, n, val="triangles", default=-1).astype(int)
    assert np.array_equal(got, exp)
    assert stats.total == exp.sum() // 3


def test_sampled_triangle_count_doulion(spark):
    from dmid_spark.algorithms.triangles import sampled_triangle_count, total_triangles

    # dense-ish deterministic graph so the estimate has signal
    n = 40
    pairs = [(u, v) for u in range(n) for v in range(u + 1, n)
             if (u * 7 + v * 13) % 3 != 0]
    e = spark.createDataFrame(pairs, "src long, dst long")
    exact = total_triangles(e)
    out, st = sampled_triangle_count(e, keep_percent=50, seed=1)
    row = out.collect()[0]
    assert row.sampled_triangles == st.sampled_triangles
    assert 0 < st.sampled_edges < st.total_edges
    assert st.estimate == st.sampled_triangles / 0.5**3
    # p=0.5 on ~500 edges: the unbiased estimator lands within 35% here
    assert abs(st.estimate - exact) / exact < 0.35, (st.estimate, exact)
    # determinism + engine-portable mode agree with themselves
    out2, st2 = sampled_triangle_count(e, keep_percent=50, seed=1)
    assert st2.sampled_triangles == st.sampled_triangles
    md5_out, md5_st = sampled_triangle_count(e, keep_percent=50, seed=1, hash_mode="md5")
    assert 0 < md5_st.sampled_edges < st.total_edges
    import pytest as _pt

    with _pt.raises(ValueError):
        sampled_triangle_count(e, keep_percent=0)


def test_incremental_components_matches_full_rerun(spark):
    from fixtures import random_graph
    from pyspark.sql import functions as F

    from dmid_spark import graph as G
    from dmid_spark.algorithms import connected_components, incremental_components

    rows, _ = random_graph(n=60, seed=11)
    edges = G.edges_from_rows(spark, rows)
    old = edges.filter((F.col("src") + F.col("dst")) % 5 < 4)
    new = edges.filter((F.col("src") + F.col("dst")) % 5 >= 4)
    old_labels, _ = connected_components(old)
    inc, _ = incremental_components(new, old_labels)
    full, _ = connected_components(edges)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_incremental_components_empty_delta_and_new_vertices(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import connected_components, incremental_components

    edges = G.edges_from_rows(spark, [(0, 1, 1.0), (2, 3, 1.0)])
    labels, _ = connected_components(edges)

    # delta internal to an existing component: labels unchanged
    inc, st = incremental_components(
        G.edges_from_rows(spark, [(1, 0, 1.0)]), labels
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, labels.collect()))

    # delta bridging the two components + a brand-new vertex 9
    inc2, _ = incremental_components(
        G.edges_from_rows(spark, [(1, 2, 1.0), (9, 3, 1.0)]), labels
    )
    got = dict(map(tuple, inc2.collect()))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 0}

    # disconnected brand-new pair forms its own component
    inc3, _ = incremental_components(
        G.edges_from_rows(spark, [(21, 20, 1.0)]), labels
    )
    got3 = dict(map(tuple, inc3.collect()))
    assert got3[20] == 20 and got3[21] == 20 and got3[0] == 0 and got3[2] == 2


def test_seeded_lpa_frozen_and_unfrozen(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_propagation

    # path 10-11-12-13-14 symmetrized; seed classes 1 and 2 at the ends —
    # ties break toward the SMALLEST label, so the small seed classes win
    # over the unseeded vertices' own ids and split the path
    pairs = [(i, i + 1, 1.0) for i in range(10, 14)]
    edges = G.symmetrize(G.edges_from_rows(spark, pairs))
    seeds = spark.createDataFrame([(10, 1), (14, 2)], "id long, label long")
    labels, _ = label_propagation(
        edges, max_iter=10, seeds=seeds, frozen_seeds=True
    )
    got = dict(map(tuple, labels.collect()))
    assert got[10] == 1 and got[14] == 2
    # synchronous ties break toward the smallest label, so class 1 wins the
    # interior (v13 sees {12:1, 14:2} at fixpoint → tie → 1); the frozen
    # seed is the only vertex holding class 2
    assert got[11] == 1 and got[12] == 1 and got[13] == 1
    assert set(got.values()) == {1, 2}

    # unfrozen: seeds initialize but are overwritten by neighbors (vertex
    # 10's only neighbor starts as 11 → 10 adopts 11 in round 1)
    labels2, _ = label_propagation(
        edges, max_iter=1, until_fixpoint=False, seeds=seeds, frozen_seeds=False
    )
    got2 = dict(map(tuple, labels2.collect()))
    assert got2[10] == 11


def test_seeded_lpa_no_seeds_matches_plain(spark):
    from fixtures import random_graph

    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_propagation

    rows, _ = random_graph(n=40, seed=3)
    edges = G.edges_from_rows(spark, rows)
    a, _ = label_propagation(edges, max_iter=3, until_fixpoint=False)
    b, _ = label_propagation(edges, max_iter=3, until_fixpoint=False, seeds=None)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
