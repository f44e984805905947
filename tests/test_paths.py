"""Tests for path-based analytics: multi-source BFS distances, sampled
harmonic/closeness centrality, and deterministic random walks
(algorithms/paths.py), each against an independent NumPy/pure-Python
re-derivation on the shared fixtures."""

from __future__ import annotations

import hashlib
from collections import deque

import pytest

from fixtures import directed_path, random_graph, star, two_cliques_bridge
from dmid_spark import graph as G
from dmid_spark.algorithms import (
    bfs_distances,
    harmonic_centrality,
    random_walks,
    ranked_adjacency,
)


# ---------------------------------------------------------------------------
# Pure-Python oracles
# ---------------------------------------------------------------------------
def out_adj(rows, n):
    nbrs = [set() for _ in range(n)]
    for s, d, _ in rows:
        if s != d:
            nbrs[s].add(d)
    return nbrs


def bfs_oracle(rows, n, sources):
    """dict[(source, id)] -> hop distance, directed."""
    nbrs = out_adj(rows, n)
    dist = {}
    for s in sources:
        dist[(s, s)] = 0
        q = deque([(s, 0)])
        while q:
            v, d = q.popleft()
            for u in nbrs[v]:
                if (s, u) not in dist:
                    dist[(s, u)] = d + 1
                    q.append((u, d + 1))
    return dist


def harmonic_oracle(rows, n, sources):
    dist = bfs_oracle(rows, n, sources)
    out = {}
    for v in range(n):
        ds = [d for (s, u), d in dist.items() if u == v and d > 0]
        out[v] = (
            len(ds),
            sum(1.0 / d for d in ds),
            (len(ds) / sum(ds)) if ds else 0.0,
        )
    return out


def md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def walks_oracle(rows, n, walk_length, seed):
    """dict[(walk_id, step)] -> node, md5 hash mode."""
    nbrs = out_adj(rows, n)
    ranked = {v: sorted(nbrs[v]) for v in range(n) if nbrs[v]}
    out = {}
    for w in sorted(ranked):
        cur = w
        out[(w, 0)] = w
        for t in range(1, walk_length + 1):
            if cur not in ranked:
                break
            pick = md5_60bit(f"{w}:{t}:{seed}") % len(ranked[cur])
            cur = ranked[cur][pick]
            out[(w, t)] = cur
    return out


# ---------------------------------------------------------------------------
# BFS distances
# ---------------------------------------------------------------------------
def test_bfs_distances_random(spark):
    rows, n = random_graph(n=120, seed=23)
    sources = [0, 7, 40, 111]
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    dist, stats = bfs_distances(G.edges_from_rows(spark, rows), src_df)
    got = {(r["source"], r["id"]): r["dist"] for r in dist.collect()}
    assert got == bfs_oracle(rows, n, sources)
    assert stats.converged
    assert stats.frontier_sizes[-1] == 0


def test_bfs_depth_cap_prefix(spark):
    """A depth cap returns exactly the ≤cap prefix of the full table."""
    rows, n = directed_path(8)
    src_df = spark.createDataFrame([(0,)], "id long")
    e = G.edges_from_rows(spark, rows)
    full, full_stats = bfs_distances(e, src_df)
    capped, capped_stats = bfs_distances(e, src_df, max_depth=3)
    want = {
        (r["source"], r["id"]): r["dist"] for r in full.collect() if r["dist"] <= 3
    }
    got = {(r["source"], r["id"]): r["dist"] for r in capped.collect()}
    assert got == want
    assert not capped_stats.converged and full_stats.converged
    # a cap at/above the eccentricity equals the fixpoint
    over, over_stats = bfs_distances(e, src_df, max_depth=20)
    assert sorted(over.collect()) == sorted(full.collect())
    assert over_stats.converged


def test_bfs_no_broadcast_matches(spark):
    rows, n = two_cliques_bridge()
    src_df = spark.createDataFrame([(0,), (6,)], "id long")
    e = G.edges_from_rows(spark, rows)
    a, _ = bfs_distances(e, src_df, broadcast_frontier=True)
    b, _ = bfs_distances(e, src_df, broadcast_frontier=False)
    assert sorted(a.collect()) == sorted(b.collect())


# ---------------------------------------------------------------------------
# Harmonic / closeness centrality
# ---------------------------------------------------------------------------
def test_harmonic_centrality_random(spark):
    rows, n = random_graph(n=120, seed=23)
    sources = list(range(0, 120, 10))
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    out, _ = harmonic_centrality(G.edges_from_rows(spark, rows), src_df)
    exp = harmonic_oracle(rows, n, sources)
    got = {r["id"]: (r["n_reached"], r["harmonic"], r["closeness"]) for r in out.collect()}
    assert set(got) == {v for v in range(n)}
    for v, (nr, h, c) in got.items():
        env, eh, ec = exp[v]
        assert nr == env
        assert h == pytest.approx(eh, abs=1e-12)
        assert c == pytest.approx(ec, abs=1e-12)


def test_harmonic_star(spark):
    """Undirected star sampled at the leaves: the hub is 1 hop from every
    sampled leaf; each leaf is 2 hops from the other 8 samples."""
    rows, n = star(n_leaves=9)
    src_df = spark.createDataFrame([(i,) for i in range(1, 10)], "id long")
    out, _ = harmonic_centrality(G.edges_from_rows(spark, rows), src_df)
    got = {r["id"]: (r["n_reached"], r["harmonic"], r["closeness"]) for r in out.collect()}
    assert got[0] == (9, pytest.approx(9.0), pytest.approx(1.0))
    for leaf in range(1, 10):
        assert got[leaf] == (8, pytest.approx(4.0), pytest.approx(0.5))


# ---------------------------------------------------------------------------
# Random walks
# ---------------------------------------------------------------------------
def test_ranked_adjacency(spark):
    rows, n = random_graph(n=60, seed=5)
    nbr = ranked_adjacency(G.edges_from_rows(spark, rows)).collect()
    adj = out_adj(rows, n)
    got = {}
    for r in nbr:
        got.setdefault(r["src"], []).append((r["rank"], r["dst"], r["outdeg"]))
    for v, lst in got.items():
        lst.sort()
        assert [d for _, d, _ in lst] == sorted(adj[v])
        assert [k for k, _, _ in lst] == list(range(len(adj[v])))
        assert all(od == len(adj[v]) for _, _, od in lst)


def test_random_walks_md5_oracle(spark):
    rows, n = random_graph(n=80, seed=11)
    out, stats = random_walks(
        G.edges_from_rows(spark, rows), walk_length=5, seed=7, hash_mode="md5"
    )
    got = {(r["walk_id"], r["step"]): r["node"] for r in out.collect()}
    assert got == walks_oracle(rows, n, walk_length=5, seed=7)
    assert stats.walkers == len({s for s, d, _ in rows if s != d})


def test_random_walks_sink_stops(spark):
    """On a directed path every walker slides to the sink and stops —
    walker w emits exactly the steps that keep it on the path."""
    rows, n = directed_path(5)
    out, _ = random_walks(G.edges_from_rows(spark, rows), walk_length=10)
    got = {(r["walk_id"], r["step"]): r["node"] for r in out.collect()}
    exp = {}
    for w in range(4):  # vertex 4 is the sink: no walker starts there
        for t in range(0, 5 - w):
            exp[(w, t)] = w + t
    assert got == exp


def test_random_walks_deterministic_across_parallelism(spark):
    rows, _ = random_graph(n=60, seed=3)
    e = G.edges_from_rows(spark, rows)
    a, _ = random_walks(e, walk_length=4, seed=9)
    b, _ = random_walks(e.repartition(13), walk_length=4, seed=9)
    assert sorted(a.collect()) == sorted(b.collect())


def test_random_walks_custom_starts_and_no_broadcast(spark):
    rows, _ = random_graph(n=60, seed=3)
    e = G.edges_from_rows(spark, rows)
    starts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    a, sa = random_walks(e, walk_length=3, starts=starts, broadcast_state=True)
    b, sb = random_walks(e, walk_length=3, starts=starts, broadcast_state=False)
    assert sa.walkers == 3
    assert sorted(a.collect()) == sorted(b.collect())
    assert {r["walk_id"] for r in a.collect()} <= {1, 2, 3}


def test_paths_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    src_df = spark.createDataFrame([(0,)], "id long")
    dist, stats = bfs_distances(empty, src_df)
    assert [(r["source"], r["id"], r["dist"]) for r in dist.collect()] == [(0, 0, 0)]
    assert stats.converged
    cent, _ = harmonic_centrality(empty, src_df)
    assert cent.collect() == []
    walks, wstats = random_walks(empty, walk_length=3)
    assert walks.collect() == []
    assert wstats.walkers == 0


# ---------------------------------------------------------------------------
# Sampled betweenness (Brandes)
# ---------------------------------------------------------------------------
def brandes_oracle(rows, n, sources):
    """Directed, unnormalized, source-sampled Brandes."""
    nbrs = out_adj(rows, n)
    bc = [0.0] * n
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds = {s: []}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_sample_random(spark):
    from dmid_spark.algorithms import betweenness_sample

    rows, n = random_graph(n=100, seed=17)
    sources = [0, 13, 42, 77]
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    out, stats = betweenness_sample(G.edges_from_rows(spark, rows), src_df)
    exp = brandes_oracle(rows, n, sources)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v
    assert stats.converged


def test_betweenness_directed_path(spark):
    # path 0→1→2→3→4 from source 0: interior vertex v lies on paths to the
    # (4 - v) vertices beyond it → delta = 4 - v - ... = standard values
    from dmid_spark.algorithms import betweenness_sample

    rows, n = directed_path(5)
    src_df = spark.createDataFrame([(0,)], "id long")
    out, _ = betweenness_sample(G.edges_from_rows(spark, rows), src_df)
    got = {r["id"]: r["betweenness"] for r in out.collect()}
    exp = brandes_oracle(rows, n, [0])
    assert got == {v: pytest.approx(exp[v]) for v in range(n)}
    # sanity: vertex 1 is on the s→2, s→3, s→4 paths
    assert got[1] == pytest.approx(3.0)


def test_betweenness_no_broadcast_matches(spark):
    from dmid_spark.algorithms import betweenness_sample

    rows, n = two_cliques_bridge()
    src_df = spark.createDataFrame([(0,), (7,)], "id long")
    e = G.edges_from_rows(spark, rows)
    a, _ = betweenness_sample(e, src_df, broadcast_frontier=True)
    b, _ = betweenness_sample(e, src_df, broadcast_frontier=False)
    ga = {r["id"]: r["betweenness"] for r in a.collect()}
    gb = {r["id"]: r["betweenness"] for r in b.collect()}
    assert set(ga) == set(gb)
    for v in ga:
        assert ga[v] == pytest.approx(gb[v], abs=1e-12)


def test_betweenness_empty_graph(spark):
    from dmid_spark.algorithms import betweenness_sample

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    src_df = spark.createDataFrame([(0,)], "id long")
    out, _ = betweenness_sample(empty, src_df)
    assert out.collect() == []


# ---------------------------------------------------------------------------
# Weighted shortest paths (Bellman-Ford)
# ---------------------------------------------------------------------------
def dijkstra_oracle(rows, sources):
    import heapq

    adj = {}
    for s, d, w in rows:
        if s != d:
            adj.setdefault(s, {})
            adj[s][d] = min(adj[s].get(d, float("inf")), float(w))
    out = {}
    for s in sources:
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            dv, v = heapq.heappop(pq)
            if dv > dist.get(v, float("inf")):
                continue
            for u, w in adj.get(v, {}).items():
                nd = dv + w
                if nd < dist.get(u, float("inf")):
                    dist[u] = nd
                    heapq.heappush(pq, (nd, u))
        for v, d in dist.items():
            out[(s, v)] = d
    return out


def test_sssp_weighted_random(spark):
    from dmid_spark.algorithms import sssp

    rows, n = random_graph(n=100, seed=29, weighted=True)
    sources = [0, 11, 55]
    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    dist, stats = sssp(G.edges_from_rows(spark, rows), src_df)
    got = {(r["source"], r["id"]): r["dist"] for r in dist.collect()}
    exp = dijkstra_oracle(rows, sources)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k
    assert stats.converged


def test_sssp_prefers_cheap_long_path(spark):
    # 0→1→2 costs 1+1=2; the direct 0→2 edge costs 5 — weighted SSSP must
    # pick the longer-hop cheaper route (where BFS would pick 1 hop)
    from dmid_spark.algorithms import sssp

    rows = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)]
    src_df = spark.createDataFrame([(0,)], "id long")
    dist, _ = sssp(G.edges_from_rows(spark, rows), src_df)
    got = {r["id"]: r["dist"] for r in dist.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_sssp_round_cap_and_noop_past_fixpoint(spark):
    from dmid_spark.algorithms import sssp

    rows, n = random_graph(n=60, seed=13, weighted=True)
    src_df = spark.createDataFrame([(0,)], "id long")
    e = G.edges_from_rows(spark, rows)
    full, fs = sssp(e, src_df)
    assert fs.converged
    over, os_ = sssp(e, src_df, max_rounds=fs.levels + 5)
    assert sorted(full.collect()) == sorted(over.collect())
    short, ss = sssp(e, src_df, max_rounds=1)
    assert not ss.converged


# ---------------------------------------------------------------------------
# Double-sweep diameter lower bound
# ---------------------------------------------------------------------------
def test_diameter_double_sweep_path(spark):
    # 0→1→…→4: forward sweep finds u=4 (ecc 4); backward from 4 sees every
    # vertex at its true distance → lb = 4 = the exact directed diameter
    from dmid_spark.algorithms import diameter_double_sweep

    rows, n = directed_path(5)
    out, _ = diameter_double_sweep(G.edges_from_rows(spark, rows), start_id=0)
    r = out.first()
    assert (r["start"], r["peripheral"], r["ecc_start"], r["diameter_lb"]) == (0, 4, 4, 4)


def test_diameter_double_sweep_is_valid_lower_bound(spark):
    from dmid_spark.algorithms import diameter_double_sweep

    rows, n = random_graph(n=80, seed=31)
    out, _ = diameter_double_sweep(G.edges_from_rows(spark, rows), start_id=0)
    r = out.first()
    # exact directed diameter over the reachable pairs via the BFS oracle
    dist = bfs_oracle(rows, n, list(range(n)))
    true_diam = max(dist.values())
    assert 0 < r["diameter_lb"] <= true_diam
    # ecc_start matches the oracle's eccentricity of vertex 0
    assert r["ecc_start"] == max(d for (s, v), d in dist.items() if s == 0)


def test_sssp_rejects_negative_weights(spark):
    from dmid_spark.algorithms import sssp

    rows = [(0, 1, 1.0), (1, 0, -2.0)]
    src_df = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="non-negative"):
        sssp(G.edges_from_rows(spark, rows), src_df)


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _n2v_oracle(pairs, walk_length, p, q, seed):
    """Transliteration of node2vec_walks' integer draw math (md5 mode)."""
    from dmid_spark.algorithms.paths import N2V_BIAS_SCALE

    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    edge = {(s, d) for s, ds in adj.items() for d in ds}
    b_ret = max(1, round(N2V_BIAS_SCALE / p))
    b_far = max(1, round(N2V_BIAS_SCALE / q))
    rows = []
    for start in sorted(adj):
        node, prev = start, None
        rows.append((start, 0, start))
        for t in range(1, walk_length + 1):
            ns = adj.get(node)
            if not ns:
                break
            if t == 1:
                pick = ns[_md5_60(f"{start}:1:{seed}") % len(ns)]
            else:
                ws = [b_ret if d == prev else
                      (N2V_BIAS_SCALE if (prev, d) in edge else b_far) for d in ns]
                r = _md5_60(f"{start}:{t}:{seed}") % sum(ws)
                cum, pick = 0, ns[-1]
                for d, w in zip(ns, ws):
                    cum += w
                    if cum > r:
                        pick = d
                        break
            prev, node = node, pick
            rows.append((start, t, node))
    return sorted(rows)


def test_node2vec_walks_match_transliterated_oracle(spark):
    from dmid_spark.algorithms.paths import node2vec_walks

    n = 30
    pairs = [(v, (v * 11 + k * 7 + 3) % n) for v in range(n) for k in range(3)]
    pairs = sorted({(s, d) for s, d in pairs if s != d})
    e = spark.createDataFrame(pairs, "src long, dst long")
    for p, q in ((0.25, 4.0), (1.0, 1.0), (4.0, 0.5)):
        out, stats = node2vec_walks(e, walk_length=5, p=p, q=q, seed=7, hash_mode="md5")
        got = sorted((r.walk_id, r.step, r.node) for r in out.collect())
        assert got == _n2v_oracle(pairs, 5, p, q, 7), (p, q)
    assert stats.walkers == len({s for s, _ in pairs})


def test_node2vec_bias_pulls_walks_back(spark):
    from dmid_spark.algorithms.paths import node2vec_walks

    # triangle + tail: strong return bias (tiny p) revisits prev often;
    # strong explore bias (tiny q) never returns when alternatives exist
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (2, 3), (3, 2)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    back, _ = node2vec_walks(e, walk_length=6, p=0.001, q=1000.0, seed=3, hash_mode="md5")
    rows = {(r.walk_id, r.step): r.node for r in back.collect()}
    returns = sum(
        1 for (w, t), v in rows.items()
        if t >= 2 and rows.get((w, t - 2)) == v
    )
    total = sum(1 for (w, t) in rows if t >= 2)
    assert returns / total > 0.9, (returns, total)


def test_node2vec_sink_stop_and_validation(spark):
    from dmid_spark.algorithms.paths import node2vec_walks

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out, _ = node2vec_walks(e, walk_length=9, seed=1)
    by_walk = {}
    for r in out.collect():
        by_walk.setdefault(r.walk_id, []).append((r.step, r.node))
    # walker 0: 0->1->2 then sink; walker 1: 1->2 sink
    assert sorted(by_walk[0]) == [(0, 0), (1, 1), (2, 2)]
    assert sorted(by_walk[1]) == [(0, 1), (1, 2)]
    with pytest.raises(ValueError):
        node2vec_walks(e, walk_length=0)
    with pytest.raises(ValueError):
        node2vec_walks(e, walk_length=2, p=0.0)


def test_embed_walks_clusters_planted_communities(spark):
    from dmid_spark.algorithms.paths import embed_walks, node2vec_walks

    # two 6-cliques joined by one bridge: walks stay inside cliques, so
    # within-community embedding similarity must beat cross-community
    pairs = []
    for c in range(2):
        b = c * 6
        pairs += [(b + x, b + y) for x in range(6) for y in range(6) if x != y]
    pairs += [(5, 6), (6, 5)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    walks, _ = node2vec_walks(e, walk_length=8, p=1.0, q=0.5, seed=11)
    emb = embed_walks(walks, dim=16, max_iter=3, seed=7)
    vecs = {r.id: r.vector for r in emb.collect()}
    assert set(vecs) == set(range(12))

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return d / (na * nb)

    within = [cos(a, b) for a in range(6) for b in range(a + 1, 6)]
    across = [cos(a, b) for a in range(4) for b in range(7, 12)]
    assert sum(within) / len(within) > sum(across) / len(across) + 0.1


# ---------------------------------------------------------------------------
# GraphSAGE-style neighbor fan-out sampling
# ---------------------------------------------------------------------------


def _ns_transliteration(rows, fanouts, roots, seed=42):
    """Python replica of neighbor_sample (md5 mode): per-hop shared
    neighbor sample by (md5long(src:dst:seed:hop) % 1000003, dst), then
    frontier expansion from the distinct (root, node) set."""
    import hashlib

    def md5l(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    adj = {}
    for s, d, _ in rows:
        adj.setdefault(s, []).append(d)
    out = []
    frontier = {(r, r) for r in roots}
    for h, f in enumerate(fanouts, start=1):
        sampled = {
            s: sorted(ds, key=lambda d: (md5l(f"{s}:{d}:{seed}:{h}") % 1_000_003, d))[:f]
            for s, ds in adj.items()
        }
        hop_edges = set()
        for root, node in frontier:
            for d in sampled.get(node, []):
                hop_edges.add((root, h, node, d))
        out.extend(sorted(hop_edges))
        frontier = {(r, d) for r, _, _, d in hop_edges}
    return sorted(out)


def test_neighbor_sample_matches_transliteration(spark):
    from dmid_spark.algorithms import neighbor_sample

    rows, n = random_graph(n=60, avg_deg=5, seed=3)
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    roots = [i for i in range(n) if i % 7 == 0]
    roots_df = spark.createDataFrame([(r,) for r in roots], "id long")
    got = sorted(
        (r["root"], r["hop"], r["src"], r["dst"])
        for r in neighbor_sample(
            df, fanouts=(3, 2), roots=roots_df, hash_mode="md5"
        ).collect()
    )
    assert got == _ns_transliteration(rows, (3, 2), roots)
    # fan-out bound: per (root, src, hop) at most fanout_h edges
    from collections import Counter

    c = Counter((r, h, s) for r, h, s, _ in got)
    for (_, h, _), cnt in c.items():
        assert cnt <= (3 if h == 1 else 2)


def test_neighbor_sample_shared_and_deterministic(spark):
    from dmid_spark.algorithms import neighbor_sample, sampled_adjacency

    rows, n = random_graph(n=50, avg_deg=6, seed=9)
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    # shared sampling: two roots reaching the same node at the same hop
    # see identical sampled neighbors
    all_roots = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = neighbor_sample(df, fanouts=(4,), roots=all_roots).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], set()).add(r["dst"])
    adj1 = sampled_adjacency(df, 4, hop=1).collect()
    exp = {}
    for r in adj1:
        exp.setdefault(r["src"], set()).add(r["dst"])
    for s, ds in by_src.items():
        assert ds == exp[s]
    # partition invariance + broadcast opt-out equivalence
    r1 = sorted(map(tuple, neighbor_sample(
        df.repartition(1), fanouts=(3, 2), broadcast_frontier=True
    ).collect()))
    r7 = sorted(map(tuple, neighbor_sample(
        df.repartition(7), fanouts=(3, 2), broadcast_frontier=False
    ).collect()))
    assert r1 == r7
    # a different seed draws a different sample somewhere
    r_seed = sorted(map(tuple, neighbor_sample(
        df, fanouts=(3, 2), seed=43
    ).collect()))
    assert r_seed != r1


def test_neighbor_sample_validations_and_hop_chain(spark):
    import pytest as _pt

    from dmid_spark.algorithms import neighbor_sample, sampled_adjacency

    rows, n = random_graph(n=40, avg_deg=4, seed=5)
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    with _pt.raises(ValueError, match="non-empty"):
        neighbor_sample(df, fanouts=())
    with _pt.raises(ValueError, match="fanout"):
        sampled_adjacency(df, 0)
    out = neighbor_sample(df, fanouts=(2, 2)).collect()
    # every hop-2 source appears as a hop-1 destination for that root
    h1 = {(r["root"], r["dst"]) for r in out if r["hop"] == 1}
    for r in out:
        if r["hop"] == 2:
            assert (r["root"], r["src"]) in h1


# ---------------------------------------------------------------------------
# Sampled EDGE betweenness (Girvan-Newman edge scores)
# ---------------------------------------------------------------------------
_EB_GRAPHS = {
    "two_cliques": two_cliques_bridge(),
    "path": directed_path(),
    "random": random_graph(n=100, seed=17),
}


def brandes_edge_oracle(rows, n, sources):
    """Directed, unnormalized, source-sampled Brandes — edge form."""
    nbrs = out_adj(rows, n)
    eb = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds = {s: []}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for v in preds[w]:
                c = sigma[v] / sigma[w] * (1 + delta[w])
                eb[(v, w)] = eb.get((v, w), 0.0) + c
                delta[v] += c
    return eb


@pytest.mark.parametrize(
    "name,srcs",
    [("two_cliques", [0, 6]), ("path", [0]), ("random", [0, 10, 50, 90])],
)
def test_edge_betweenness_matches_oracle(spark, name, srcs):
    from dmid_spark.algorithms import edge_betweenness_sample

    rows, n = _EB_GRAPHS[name]
    src_df = spark.createDataFrame([(s,) for s in srcs], "id long")
    out, _ = edge_betweenness_sample(G.edges_from_rows(spark, rows), src_df)
    got = {(r["src"], r["dst"]): r["betweenness"] for r in out.collect()}
    want = brandes_edge_oracle(rows, n, srcs)
    # every distinct directed edge appears exactly once, zeros filled
    assert len(got) == len({(s, d) for s, d, *_ in rows})
    for k, v in got.items():
        assert v == pytest.approx(want.get(k, 0.0), abs=1e-9), k


def test_edge_betweenness_bridge_edge_dominates(spark):
    """The bridge between two cliques carries every cross-clique shortest
    path — the Girvan-Newman signal."""
    from dmid_spark.algorithms import edge_betweenness_sample

    rows, n = two_cliques_bridge()
    src_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out, _ = edge_betweenness_sample(G.edges_from_rows(spark, rows), src_df)
    got = {(r["src"], r["dst"]): r["betweenness"] for r in out.collect()}
    bridge = max(got, key=got.get)
    # the bridge connects the two cliques (5-6 in this fixture's layout)
    assert set(bridge) == {5, 6}
    # and its score strictly dominates every intra-clique edge
    intra = max(v for k, v in got.items() if set(k) != {5, 6})
    assert got[bridge] > intra


def test_edge_betweenness_consistent_with_vertex_version(spark):
    """Summing a vertex's outgoing DAG-edge scores recovers its vertex
    dependency: bc(v) = sum over edges (v, w) of eb(v, w) for non-source
    v (Brandes' recursion), checked on the random fixture."""
    from dmid_spark.algorithms import betweenness_sample, edge_betweenness_sample

    rows, n = _EB_GRAPHS["random"]
    srcs = [0, 30, 60]
    src_df = spark.createDataFrame([(s,) for s in srcs], "id long")
    e = G.edges_from_rows(spark, rows)
    vout, _ = betweenness_sample(e, src_df)
    eout, _ = edge_betweenness_sample(e, src_df)
    vb = {r["id"]: r["betweenness"] for r in vout.collect()}
    out_sum = {}
    for r in eout.collect():
        out_sum[r["src"]] = out_sum.get(r["src"], 0.0) + r["betweenness"]
    for v in range(n):
        if v in srcs:
            continue
        assert out_sum.get(v, 0.0) == pytest.approx(vb[v], abs=1e-9), v
