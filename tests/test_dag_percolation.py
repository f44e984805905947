"""Topological levels and k=3 clique percolation vs handwritten oracles."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from fixtures import two_cliques_bridge
from dmid_spark.algorithms import (
    clique_graph_edges,
    kclique_communities,
    topological_levels,
    triangle_list,
)


def _edges_df(spark, pairs, weighted=False):
    if weighted:
        return spark.createDataFrame(pairs, "src long, dst long, weight double")
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------------------
# topological levels
# ---------------------------------------------------------------------------
def _py_levels(pairs):
    verts = sorted({v for e in pairs for v in e})
    lvl = {v: 0 for v in verts}
    changed = True
    while changed:
        changed = False
        for s, d in pairs:
            if lvl[s] + 1 > lvl[d]:
                lvl[d] = lvl[s] + 1
                changed = True
    return lvl


def test_topo_levels_diamond_and_chain(spark):
    # 0→1→3, 0→2→3, 3→4: longest path to 3 is 2, to 4 is 3; plus a long
    # side chain 5→6→7→3 making level(3)=3 via the deeper route
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 6), (6, 7), (7, 3)]
    lv, stats = topological_levels(_edges_df(spark, pairs))
    got = {r.id: r.level for r in lv.collect()}
    assert got == _py_levels(pairs)
    assert stats.converged
    # depth of this DAG is 4 → exactly 5 rounds (last confirms empty frontier)
    assert stats.rounds <= 5


def test_topo_levels_every_vertex_present_and_sources_zero(spark):
    pairs = [(10, 20), (20, 30), (40, 30)]
    lv, _ = topological_levels(_edges_df(spark, pairs))
    got = {r.id: r.level for r in lv.collect()}
    assert set(got) == {10, 20, 30, 40}
    assert got[10] == 0 and got[40] == 0 and got[30] == 2


def test_topo_levels_cycle_raises(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(_edges_df(spark, pairs), max_rounds=20)


def test_topo_levels_frontier_shrinks(spark):
    # chain 0→1→…→9 with a wide fan at the root: after round 1 the
    # frontier must be the chain tip only, not the whole graph
    pairs = [(0, i) for i in range(100, 140)] + [(i, i + 1) for i in range(9)]
    lv, stats = topological_levels(_edges_df(spark, pairs))
    got = {r.id: r.level for r in lv.collect()}
    assert got == _py_levels(pairs)
    assert stats.frontier_sizes[-1] == 0
    # monotone non-increasing tail: the chain keeps exactly one vertex hot
    assert stats.frontier_sizes[-2] == 1


# ---------------------------------------------------------------------------
# triangle list / clique percolation
# ---------------------------------------------------------------------------
def _py_triangles(pairs):
    und = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = set()
    for u, v in und:
        for w in adj[u] & adj[v]:
            tris.add(tuple(sorted((u, v, w))))
    return tris


def _py_cpm(pairs):
    """Overlapping CPM k=3 communities, labeled by min triangle index in
    sorted-triple order after densification — matches the engine's
    distributed_rank labeling."""
    tris = sorted(_py_triangles(pairs))
    tid = {t: i for i, t in enumerate(tris)}
    parent = list(range(len(tris)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in combinations(tris, 2):
        if len(set(a) & set(b)) >= 2:
            ra, rb = find(tid[a]), find(tid[b])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    label = {}
    for t in tris:
        root = find(tid[t])
        label.setdefault(root, min(tid[x] for x in tris if find(tid[x]) == root))
    cover = set()
    for t in tris:
        c = label[find(tid[t])]
        for v in t:
            cover.add((v, c))
    return cover


# two triangle-communities sharing vertex 2 (overlap!), plus an isolated
# triangle and a triangle pair glued by an edge
CPM_GRAPH = [
    (0, 1), (1, 2), (0, 2),          # triangle A
    (2, 3), (3, 4), (2, 4),          # triangle B — shares only vertex 2 with A
    (10, 11), (11, 12), (10, 12),    # isolated triangle C
    (20, 21), (21, 22), (20, 22), (21, 23), (22, 23),  # D+E share edge 21-22
]


def test_triangle_list_matches_py(spark):
    got = {
        (r.v1, r.v2, r.v3) for r in triangle_list(_edges_df(spark, CPM_GRAPH)).collect()
    }
    assert got == _py_triangles(CPM_GRAPH)


def test_kclique_communities_overlap_exactly(spark):
    cover, stats = kclique_communities(_edges_df(spark, CPM_GRAPH))
    got = {(r.id, r.community) for r in cover.collect()}
    assert got == _py_cpm(CPM_GRAPH)
    # vertex 2 overlaps two communities; D+E form ONE community
    assert len({c for v, c in got if v == 2}) == 2
    assert len({c for v, c in got if v in (20, 21, 22, 23)}) == 1
    assert stats.triangles == 5 and stats.communities == 4


def test_kclique_chain_equals_allpairs_on_hot_edge(spark):
    # wheel: edge (0,1) shared by many triangles through common neighbors —
    # chaining must still glue them all into one community
    pairs = [(0, 1)] + [(0, i) for i in range(2, 12)] + [(1, i) for i in range(2, 12)]
    cover, stats = kclique_communities(_edges_df(spark, pairs))
    got = {(r.id, r.community) for r in cover.collect()}
    assert got == _py_cpm(pairs)
    assert len({c for _, c in got}) == 1


def test_clique_graph_edges_capped_and_deterministic(spark):
    pairs = [(0, 1)] + [(0, i) for i in range(2, 12)] + [(1, i) for i in range(2, 12)]
    out = clique_graph_edges(_edges_df(spark, pairs), max_per_edge=3)
    rows = {tuple(r) for r in out.collect()}
    # hot edge (0,1) has 10 triangles; cap 3 → C(3,2)=3 pairs from it, and
    # the kept triangles must be the 3 lexicographically smallest triples
    hot = {r for r in rows if (r[0], r[1]) == (0, 1) and (r[3], r[4]) == (0, 1)}
    assert len(hot) == 3
    kept = {r[:3] for r in hot} | {r[3:] for r in hot}
    assert kept == {(0, 1, 2), (0, 1, 3), (0, 1, 4)}
    with pytest.raises(ValueError):
        clique_graph_edges(_edges_df(spark, pairs), max_per_edge=1)


def test_kclique_k_not_3_raises(spark):
    with pytest.raises(NotImplementedError):
        kclique_communities(_edges_df(spark, CPM_GRAPH), k=4)


# ---------------------------------------------------------------------------
# Borůvka minimum spanning forest
# ---------------------------------------------------------------------------
def _py_kruskal(pairs):
    """(u,v,w) canonical edges → MSF edge set via Kruskal with the same
    (weight, u, v) total order the engine uses."""
    canon = {}
    for s, d, w in pairs:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        canon[(u, v)] = min(canon.get((u, v), float("inf")), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.add((u, v, w))
    return out


def test_msf_unique_weights_matches_kruskal_exactly(spark):
    import random

    from dmid_spark.algorithms import minimum_spanning_forest

    rng = random.Random(5)
    pairs = []
    seen = set()
    for _ in range(120):
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v and (min(u, v), max(u, v)) not in seen:
            seen.add((min(u, v), max(u, v)))
            pairs.append((u, v, round(rng.random() * 100, 6)))
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    mst, stats = minimum_spanning_forest(edges)
    got = {(r.u, r.v, r.weight) for r in mst.collect()}
    assert got == _py_kruskal(pairs)
    assert stats.converged
    assert stats.total_weight == pytest.approx(sum(w for _, _, w in got))


def test_msf_forest_property_with_ties_and_two_components(spark):
    from dmid_spark.algorithms import minimum_spanning_forest

    # all weights equal (worst tie case) over two disjoint cliques
    pairs = [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b, 1.0) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    mst, stats = minimum_spanning_forest(edges)
    got = [(r.u, r.v) for r in mst.collect()]
    # forest: V - #components edges, no cycles, same total weight as Kruskal
    assert len(got) == (5 - 1) + (4 - 1)
    oracle = _py_kruskal(pairs)
    assert stats.total_weight == pytest.approx(sum(w for _, _, w in oracle))
    # spanning: union-find over chosen edges connects each clique
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in got:
        ru, rv = find(u), find(v)
        assert ru != rv, "cycle in spanning forest"
        parent[max(ru, rv)] = min(ru, rv)
    assert len({find(x) for x in range(5)}) == 1
    assert len({find(x) for x in range(10, 14)}) == 1


def test_msf_empty_and_self_loop_only(spark):
    from dmid_spark.algorithms import minimum_spanning_forest

    edges = spark.createDataFrame([(3, 3, 1.0)], "src long, dst long, weight double")
    mst, stats = minimum_spanning_forest(edges)
    assert mst.count() == 0 and stats.total_weight == 0.0


def test_topo_levels_checkpoint_resume_bit_identical(spark, tmp_path):
    from dmid_spark.checkpoint import CheckpointManager
    from dmid_spark.algorithms import topological_levels

    # depth-6 chain plus a fan; full run as the reference
    pairs = [(i, i + 1) for i in range(6)] + [(0, 10), (10, 11)]
    df = _edges_df(spark, pairs)
    ref, _ = topological_levels(df)
    ref_rows = sorted(map(tuple, ref.collect()))

    # interrupted run: cap at 2 rounds (cycle guard raises AFTER the loop,
    # but rounds 1-2 are already checkpointed)
    ckpt = CheckpointManager(spark, str(tmp_path / "topo"), run_id="t")
    with pytest.raises(ValueError):
        topological_levels(df, max_rounds=2, ckpt=ckpt, ckpt_every=1)

    # resume from the round-2 state: full-width re-seed, then converge
    got, stats = topological_levels(
        df, ckpt=ckpt, ckpt_every=1, resume=True
    )
    assert sorted(map(tuple, got.collect())) == ref_rows
    assert stats.converged
    # lineage records the resumed rounds too
    names = [r["iteration"] for r in ckpt.lineage("topo_levels")]
    assert 1 in names and 2 in names and max(names) > 2


# ---------------------------------------------------------------------------
# SGC feature smoothing
# ---------------------------------------------------------------------------
def test_smooth_features_matches_numpy_sgc(spark):
    import numpy as np

    from dmid_spark.algorithms import smooth_features

    pairs = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 1.0), (3, 4, 1.0)]  # 5 nodes, node 5 isolated w/ features
    feats = [(i, [float(i + 1), float(10 - i)]) for i in range(6)]
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    fdf = spark.createDataFrame(feats, "id long, features array<float>")

    n, d = 6, 2
    A = np.zeros((n, n))
    for u, v, w in pairs:
        A[u, v] += w
        A[v, u] += w
    A += np.eye(n)
    Dm = np.diag(1.0 / np.sqrt(A.sum(axis=1)))
    # note: D = deg + 1 with the +I self loop → rowsum of A+I
    Ah = Dm @ A @ Dm
    X = np.array([f for _, f in feats], dtype=np.float64)
    for K in (0, 1, 3):
        out = smooth_features(edges, fdf, iterations=K)
        got = {(r.id, r.dim): r.value for r in out.collect()}
        ref = np.linalg.matrix_power(Ah, K) @ X
        for i in range(n):
            for j in range(d):
                assert got[(i, j)] == pytest.approx(ref[i, j], rel=1e-9), (K, i, j)


def test_smooth_features_isolated_node_is_fixed_point(spark):
    from dmid_spark.algorithms import smooth_features

    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    fdf = spark.createDataFrame(
        [(5, [2.5, -1.0])], "id long, features array<float>"
    )
    out = {(r.id, r.dim): r.value for r in smooth_features(edges, fdf, iterations=4).collect()}
    assert out[(5, 0)] == pytest.approx(2.5) and out[(5, 1)] == pytest.approx(-1.0)


def test_features_long_wide_roundtrip(spark):
    from dmid_spark.algorithms import features_long, features_wide

    fdf = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])], "id long, features array<float>"
    )
    back = {r.id: r.features for r in features_wide(features_long(fdf)).collect()}
    assert back == {1: [1.0, 2.0, 3.0], 2: [4.0, 5.0, 6.0]}


def test_features_wide_densifies_missing_dims(spark):
    from dmid_spark.algorithms import features_wide

    # id 1 misses dim 1; id 2 has only the padded dim-0 row (featureless
    # vertex out of smooth_features); id 3 has only a high dim
    long_df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 2, 3.0), (2, 0, 0.0), (3, 3, 7.0)],
        "id long, dim int, value double",
    )
    back = {r.id: r.features for r in features_wide(long_df).collect()}
    assert back == {
        1: [1.0, 0.0, 3.0, 0.0],
        2: [0.0, 0.0, 0.0, 0.0],
        3: [0.0, 0.0, 0.0, 7.0],
    }
    # explicit width overrides the observed max
    back5 = {r.id: r.features for r in features_wide(long_df, n_dims=5).collect()}
    assert back5[2] == [0.0] * 5 and back5[1] == [1.0, 0.0, 3.0, 0.0, 0.0]


# ---------------------------------------------------------------------------
# label spreading (Zhou et al. 2004)
# ---------------------------------------------------------------------------
def _spreading_oracle(rows, n, seeds, alpha, iters):
    """NumPy transliteration: F <- alpha S F + (1-alpha) Y from F0 = Y,
    S = D^-1/2 W D^-1/2 over the undirected weight-summed view."""
    import numpy as np

    # undirected weight-summed view collapses (u,v)/(v,u) duplicates first
    W2 = np.zeros((n, n))
    for s, d, w in rows:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        W2[u, v] += w
    W = W2 + W2.T
    deg = W.sum(axis=1)
    inv = np.divide(1.0, np.sqrt(deg), out=np.zeros(n), where=deg > 0)
    S = W * inv[:, None] * inv[None, :]
    classes = sorted({c for _, c in seeds})
    Y = np.zeros((n, len(classes)))
    for i, c in seeds:
        Y[i, classes.index(c)] = 1.0
    X = Y.copy()
    for _ in range(iters):
        X = alpha * (S @ X) + (1 - alpha) * Y
    return classes, X


def test_label_spreading_matches_numpy(spark):
    import numpy as np

    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_spreading

    rows, n = two_cliques_bridge()
    seeds = [(0, 7), (6, 3)]  # one labeled node per clique, arbitrary class ids
    sdf = spark.createDataFrame(seeds, "id long, label long")
    out = label_spreading(
        G.edges_from_rows(spark, rows), sdf, alpha=0.85, iterations=4
    )
    classes, X = _spreading_oracle(rows, n, seeds, alpha=0.85, iters=4)
    got = np.zeros((n, len(classes)))
    for r in out.collect():
        got[r["id"], classes.index(r["label"])] = r["score"]
    assert np.allclose(got, X, atol=1e-9)
    # diffusion assigns each clique to its seed's class
    from dmid_spark.algorithms import spread_labels

    pred = {r["id"]: r["label"] for r in spread_labels(out).collect()}
    assert all(pred[i] == 7 for i in range(6))
    assert all(pred[i] == 3 for i in range(6, 12))


def test_label_spreading_zero_iterations_is_seed_matrix(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_spreading

    rows, _ = two_cliques_bridge()
    sdf = spark.createDataFrame([(0, 1), (3, 2)], "id long, label long")
    out = label_spreading(G.edges_from_rows(spark, rows), sdf, iterations=0)
    got = {(r["id"], r["label"]): r["score"] for r in out.collect()}
    assert got == {(0, 1): 1.0, (3, 2): 1.0}


def test_label_spreading_isolated_seed_keeps_clamp_mass(spark):
    """A seed with no edges has a zero S row: its score settles at
    (1-alpha) * 1 after any iteration count >= 1."""
    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_spreading

    rows = [(0, 1, 1.0), (1, 0, 1.0)]
    edges = G.edges_from_rows(spark, rows)
    # vertex 5 exists only as a seed (not in the edge table)
    sdf = spark.createDataFrame([(5, 9)], "id long, label long")
    out = label_spreading(edges, sdf, alpha=0.8, iterations=3)
    got = {(r["id"], r["label"]): r["score"] for r in out.collect()}
    assert got[(5, 9)] == pytest.approx(0.2, abs=1e-12)


def test_label_spreading_validates_args(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import label_spreading

    rows, _ = two_cliques_bridge()
    sdf = spark.createDataFrame([(0, 1)], "id long, label long")
    with pytest.raises(ValueError):
        label_spreading(G.edges_from_rows(spark, rows), sdf, iterations=-1)
    with pytest.raises(ValueError):
        label_spreading(G.edges_from_rows(spark, rows), sdf, alpha=1.5)


# ---------------------------------------------------------------------------
# locally-heaviest matching + coarsening
# ---------------------------------------------------------------------------
def _matching_oracle(rows, max_rounds=100):
    """Round-by-round transliteration of maximal_matching."""
    live = {}
    for s, d, w in rows:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        live[k] = live.get(k, 0.0) + w
    matched = {}
    for _ in range(max_rounds):
        if not live:
            break
        best = {}
        for (u, v), w in live.items():
            for a, b in ((u, v), (v, u)):
                cur = best.get(a)
                if cur is None or (w, -b) > (cur[1], -cur[0]):
                    best[a] = (b, w)
        mutual = []
        for u, (v, w) in best.items():
            if u < v and best.get(v, (None,))[0] == u:
                mutual.append((u, v, w))
        assert mutual, "chain argument violated"
        retire = set()
        for u, v, w in mutual:
            matched[(u, v)] = w
            retire.add(u)
            retire.add(v)
        live = {
            k: w for k, w in live.items() if k[0] not in retire and k[1] not in retire
        }
    return matched


@pytest.mark.parametrize("seed", [3, 11])
def test_maximal_matching_matches_transliteration(spark, seed):
    from fixtures import random_graph
    from dmid_spark import graph as G
    from dmid_spark.algorithms import maximal_matching

    rows, n = random_graph(n=80, seed=seed)
    out, stats = maximal_matching(G.edges_from_rows(spark, rows))
    got = {(r["u"], r["v"]): r["weight"] for r in out.collect()}
    assert got == _matching_oracle(rows)
    # a matching: every vertex at most once
    seen = [x for k in got for x in k]
    assert len(seen) == len(set(seen))
    # maximal: no undirected edge has both endpoints unmatched
    und = {(min(s, d), max(s, d)) for s, d, _ in rows if s != d}
    unmatched = set(range(n)) - set(seen)
    assert not any(u in unmatched and v in unmatched for u, v in und)
    assert stats.matched_edges == len(got) and stats.rounds >= 1


def test_maximal_matching_prefers_heavy_edges(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import maximal_matching

    # path 0-1-2-3 with the middle edge dominant: matching takes {1,2}
    rows = [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 9.0), (2, 1, 9.0), (2, 3, 1.0), (3, 2, 1.0)]
    out, _ = maximal_matching(G.edges_from_rows(spark, rows))
    got = {(r["u"], r["v"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_coarsen_graph_conserves_mass_and_composes(spark):
    from pyspark.sql import functions as SF

    from fixtures import random_graph
    from dmid_spark import graph as G
    from dmid_spark.algorithms import coarsen_graph

    rows, n = random_graph(n=60, seed=4)
    e = G.edges_from_rows(spark, rows)
    coarse, labels, stats = coarsen_graph(e, levels=2)
    total_in = e.agg(SF.sum("weight")).first()[0]
    total_out = coarse.agg(SF.sum("weight")).first()[0]
    assert total_out == pytest.approx(total_in, abs=1e-9)
    lab = {r["id"]: r["label"] for r in labels.collect()}
    assert set(lab) == set(range(n))
    # representatives are fixed points and coarse vertex count shrank
    assert all(lab[l] == l for l in set(lab.values()))
    n_coarse = coarse.select(SF.col("src").alias("id")).union(
        coarse.select("dst")
    ).distinct().count()
    assert n_coarse == len(set(lab.values())) < n
    # two levels of ~halving
    assert len(stats) == 2 and all(s.matched_edges > 0 for s in stats)


# ---------------------------------------------------------------------------
# truncated hitting time (Sarkar-Moore)
# ---------------------------------------------------------------------------
def _hitting_oracle(rows, n, seeds, horizon):
    import numpy as np

    W = np.zeros((n, n))
    for s, d, w in rows:
        W[s, d] += w
    ow = W.sum(axis=1)
    P = np.divide(W, ow[:, None], out=np.zeros_like(W), where=ow[:, None] > 0)
    h = np.zeros(n)
    seeds = set(seeds)
    for _ in range(horizon):
        nh = 1.0 + P @ h
        # dangling non-seed: stuck, 1 + own previous value
        nh[ow == 0] = h[ow == 0] + 1.0
        nh[list(seeds)] = 0.0
        h = nh
    return h


def test_truncated_hitting_time_matches_numpy(spark):
    import numpy as np

    from fixtures import random_graph
    from dmid_spark import graph as G
    from dmid_spark.algorithms import truncated_hitting_time

    rows, n = random_graph(n=70, seed=13)
    seeds = [0, 7, 33]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    out = truncated_hitting_time(
        G.edges_from_rows(spark, rows), sdf, horizon=8
    )
    got = np.zeros(n)
    for r in out.collect():
        got[r["id"]] = r["hitting_time"]
    want = _hitting_oracle(rows, n, seeds, 8)
    assert np.allclose(got, want, atol=1e-9)
    assert np.all(got >= 0) and np.all(got <= 8)


def test_truncated_hitting_time_structure(spark):
    from dmid_spark import graph as G
    from dmid_spark.algorithms import truncated_hitting_time

    # path 0->1->2->3 with seed 3; plus isolated-ish dangling vertex 9 (4->9)
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (4, 9, 1.0)]
    sdf = spark.createDataFrame([(3,)], "id long")
    out = truncated_hitting_time(G.edges_from_rows(spark, rows), sdf, horizon=10)
    got = {r["id"]: r["hitting_time"] for r in out.collect()}
    assert got[3] == 0.0
    assert got[2] == 1.0 and got[1] == 2.0 and got[0] == 3.0
    # 9 is dangling non-seed: pinned at the ceiling; 4 walks into it
    assert got[9] == 10.0 and got[4] == 10.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        truncated_hitting_time(G.edges_from_rows(spark, rows), sdf, horizon=0)
