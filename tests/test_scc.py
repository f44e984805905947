"""Tests for strongly connected components (algorithms/scc.py) against an
iterative-Tarjan NumPy oracle with min-id labels."""

from __future__ import annotations

import pytest

from fixtures import directed_path, random_graph, two_cliques_bridge
from dmid_spark import graph as G
from dmid_spark.algorithms import strongly_connected_components


# ---------------------------------------------------------------------------
# oracle: iterative Tarjan, labels = min vertex id per SCC
# ---------------------------------------------------------------------------
def scc_oracle(rows, n):
    adj = [[] for _ in range(n)]
    present = set()
    for s, d, _ in rows:
        present.add(s)
        present.add(d)
        if s != d:
            adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in sorted(present):
        if v not in index:
            strongconnect(v)
    return out


def run(spark, rows):
    labels, stats = strongly_connected_components(G.edges_from_rows(spark, rows))
    return {r["id"]: r["scc"] for r in labels.collect()}, stats


def test_scc_directed_path_all_singletons(spark):
    rows, n = directed_path()
    got, stats = run(spark, rows)
    assert stats.converged
    assert got == {v: v for v in range(n)}
    # a pure DAG must resolve by trimming alone — no coloring supersteps
    assert stats.color_rounds == 0


def test_scc_single_cycle(spark):
    n = 7
    rows = [(i, (i + 1) % n, 1.0) for i in range(n)]
    got, stats = run(spark, rows)
    assert stats.converged
    assert got == {v: 0 for v in range(n)}


def test_scc_two_cycles_dag_bridge(spark):
    # cycle A {0,1,2} -> cycle B {10,11,12}; bridge is one-way
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
            (10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0),
            (2, 10, 1.0)]
    got, stats = run(spark, rows)
    assert stats.converged
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_scc_symmetric_graph_matches_undirected_cc(spark):
    # on a symmetric graph every weakly connected component is one SCC
    rows, n = two_cliques_bridge()
    got, stats = run(spark, rows)
    assert stats.converged
    assert got == scc_oracle(rows, n)
    assert set(got.values()) == {0}


def test_scc_self_loop_is_singleton(spark):
    rows = [(0, 0, 1.0), (0, 1, 1.0), (1, 2, 1.0)]
    got, stats = run(spark, rows)
    assert got == {0: 0, 1: 1, 2: 2}


@pytest.mark.parametrize("seed,avg_deg", [(3, 2), (11, 3), (29, 5)])
def test_scc_random_graphs_match_tarjan(spark, seed, avg_deg):
    rows, n = random_graph(n=120, avg_deg=avg_deg, seed=seed)
    got, stats = run(spark, rows)
    assert stats.converged
    assert got == scc_oracle(rows, n)


def test_scc_per_phase_budgets_and_capped_phase_raises(spark):
    # two 3-cycles chained by DAG edges: resolving the second cycle takes a
    # second outer round. Per-PHASE inner budgets must not shrink across
    # outer rounds — with a budget big enough for any single phase (but far
    # smaller than the old cumulative counters would need), both rounds run.
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
            (2, 3, 1.0),
            (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0)]
    edges = G.edges_from_rows(spark, rows)
    labels, stats = strongly_connected_components(edges, max_inner=6)
    got = {r["id"]: r["scc"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    assert stats.converged
    # a coloring/marking phase that cannot reach its fixpoint within the
    # budget must raise (a silent cap would emit a split SCC), never return
    long_cycle = [(i, (i + 1) % 12, 1.0) for i in range(12)]
    with pytest.raises(RuntimeError, match="max_inner"):
        strongly_connected_components(
            G.edges_from_rows(spark, long_cycle), max_inner=3
        )
