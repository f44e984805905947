from __future__ import annotations

import numpy as np
import pytest

import oracles as O
from fixtures import GOLDEN_EDGES, GOLDEN_N, random_graph, sparse_ids_graph
from dmid_spark import graph as G


def vec_from_df(df, n, key="id", val="w_in", default=0.0):
    out = np.full(n, default)
    for r in df.collect():
        out[r[key]] = r[val]
    return out


def test_weighted_in_degrees_golden(spark):
    edges = G.edges_from_rows(spark, GOLDEN_EDGES)
    got = vec_from_df(G.weighted_in_degrees(edges), GOLDEN_N)
    exp = O.weighted_in_degrees(GOLDEN_EDGES, GOLDEN_N)
    # FIXTURES.md golden values
    assert np.allclose(exp, [4, 4, 6, 8, 8])
    assert np.allclose(got, exp)


def test_weighted_in_degrees_random(spark):
    rows, n = random_graph(n=100, seed=3)
    edges = G.edges_from_rows(spark, rows)
    got = vec_from_df(G.weighted_in_degrees(edges), n)
    assert np.allclose(got, O.weighted_in_degrees(rows, n))


def test_out_degrees(spark):
    rows, n = random_graph(n=80, seed=5)
    edges = G.edges_from_rows(spark, rows)
    got = vec_from_df(G.out_degrees(edges), n, val="out_deg")
    assert np.array_equal(got.astype(int), O.out_degrees(rows, n))


def test_densify_ids(spark):
    rows = sparse_ids_graph()
    edges = G.edges_from_rows(spark, rows)
    dense, id_map = G.densify_ids(edges)
    mapping = {r["orig_id"]: r["dense_id"] for r in id_map.collect()}
    # deterministic: ascending original-id order
    assert mapping == {3: 0, 17: 1, 42: 2, 1000000007: 3}
    got = sorted((r.src, r.dst, r.weight) for r in dense.collect())
    exp = sorted((mapping[s], mapping[d], w) for s, d, w in rows)
    assert got == exp


def test_symmetrize_and_self_loops(spark):
    rows = [(0, 1, 2.0), (1, 0, 1.0), (2, 2, 5.0), (1, 2, 3.0)]
    edges = G.edges_from_rows(spark, rows)
    sym = G.symmetrize(G.drop_self_loops(edges))
    got = sorted((r.src, r.dst, r.weight) for r in sym.collect())
    assert got == [(0, 1, 2.0), (1, 0, 2.0), (1, 2, 3.0), (2, 1, 3.0)]


def test_contract_graph_aggregates_by_label(spark):
    e = G.edges_from_rows(
        spark,
        [(0, 1, 2.0), (1, 0, 1.0), (0, 2, 1.0), (2, 3, 4.0), (3, 2, 1.0), (1, 3, 1.0)],
    )
    labels = spark.createDataFrame([(0, 10), (1, 10), (2, 20), (3, 20)], "id long, label long")
    got = {(r.src, r.dst): r.weight for r in G.contract_graph(e, labels).collect()}
    assert got == {(10, 10): 3.0, (10, 20): 2.0, (20, 20): 5.0}
    no_self = {(r.src, r.dst): r.weight
               for r in G.contract_graph(e, labels, drop_self=True).collect()}
    assert no_self == {(10, 20): 2.0}
    par = {(r.src, r.dst): r.weight
           for r in G.contract_graph(e, labels, broadcast_labels=False).collect()}
    assert par == got


def test_graph_summary_exact_counts(spark):
    e = G.edges_from_rows(
        spark,
        [(0, 1, 1.0), (1, 0, 1.0), (2, 2, 1.0), (2, 0, 1.0), (3, 0, 1.0), (2, 1, 1.0)],
    )
    row = G.graph_summary(e).collect()[0]
    assert row.n_vertices == 4 and row.n_edges == 6
    assert row.n_self_loops == 1
    # reciprocal: 0<->1 both ways (2 edges) + the self-loop's reverse is itself
    assert row.n_reciprocal == 3
    assert row.max_in_deg == 3  # vertex 0 from 1, 2, 3
    assert row.max_out_deg == 3  # vertex 2 -> 2, 0, 1


def test_transition_edges_matches_sequential(spark):
    from pyspark.sql import functions as F

    from dmid_spark.graph import transition_edges

    # two users; u1 has a same-timestamp pair disambiguated by event_id
    rows = [
        (1, 100, 10, "a"), (2, 200, 10, "b"), (3, 200, 10, "c"), (4, 300, 10, "a"),
        (5, 100, 20, "b"), (6, 150, 20, "b"),
    ]
    ev = spark.createDataFrame(
        [(e, float(t), u, k) for e, t, u, k in rows],
        "event_id long, ts double, user_id long, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type")
    got = {
        (r["src_type"], r["dst_type"]): r["transitions"]
        for r in transition_edges(ev).collect()
    }
    # u10: a->b (ts100->200), b->c (same ts, event_id order), c->a; u20: b->b
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1, ("b", "b"): 1}


def test_disparity_backbone_matches_transliteration(spark):
    from dmid_spark.graph import disparity_backbone

    # hub 0 with one dominant edge + uniform noise; a pendant pair aside
    pairs = [(0, i, 1.0) for i in range(1, 9)] + [(0, 9, 50.0), (20, 21, 5.0)]
    edges = spark.createDataFrame(pairs, "src long, dst long, weight double")
    got = {
        (r.u, r.v): (r.weight, r.alpha_min)
        for r in disparity_backbone(edges, alpha=0.05).collect()
    }

    # transliteration: untestable (k<2) sides skipped, both-untestable pass
    und = {}
    for s, d, w in pairs:
        und[(min(s, d), max(s, d))] = und.get((min(s, d), max(s, d)), 0.0) + w
    stren, deg = {}, {}
    for (u, v), w in und.items():
        for x in (u, v):
            stren[x] = stren.get(x, 0.0) + w
            deg[x] = deg.get(x, 0) + 1
    expect = {}
    for (u, v), w in und.items():
        sides = [
            (1.0 - w / stren[x]) ** (deg[x] - 1) for x in (u, v) if deg[x] >= 2
        ]
        am = round(min(sides), 6) if sides else None
        if am is None or am < 0.05:
            expect[(u, v)] = (w, am)
    assert got == expect
    # the dominant hub edge survives, the uniform noise edges do not
    assert (0, 9) in got and (0, 1) not in got
    # both-endpoints-untestable edges pass with NULL alpha
    assert got[(20, 21)] == (5.0, None)


def test_disparity_backbone_validates_alpha(spark):
    import pytest as _pytest

    from dmid_spark.graph import disparity_backbone

    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    with _pytest.raises(ValueError):
        disparity_backbone(edges, alpha=1.5)


def test_pmi_weights_matches_math(spark):
    import math

    import pytest

    from dmid_spark.graph import pmi_weights

    rows = [(0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 3, 0.0)]
    e = G.edges_from_rows(spark, rows)
    got = {
        (r["src"], r["dst"]): (r["weight"], r["pmi"], r["npmi"])
        for r in pmi_weights(e).collect()
    }
    assert (3, 3) not in got  # weight <= 0 dropped
    W = 8.0
    wu = {0: 5.0, 1: 2.0, 2: 1.0}
    wv = {1: 4.0, 2: 3.0, 0: 1.0}
    for (s, d, w) in [(0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0)]:
        pmi = math.log(w * W / (wu[s] * wv[d]))
        npmi = pmi / -math.log(w / W)
        assert got[(s, d)][1] == pytest.approx(pmi, abs=1e-12)
        assert got[(s, d)][2] == pytest.approx(npmi, abs=1e-12)
    # PPMI keeps only pmi > 0
    pos = pmi_weights(e, positive_only=True).collect()
    assert {(r["src"], r["dst"]) for r in pos} == {
        k for k, v in got.items() if v[1] > 0
    }
    # degenerate single-edge graph: weight == W → self-information 0 → npmi NULL
    single = G.edges_from_rows(spark, [(0, 1, 3.0)])
    r = pmi_weights(single).collect()[0]
    assert r["pmi"] == pytest.approx(0.0, abs=1e-12) and r["npmi"] is None


def test_rich_club_matches_bruteforce(spark):
    import pytest

    from dmid_spark.graph import rich_club

    rows, n = random_graph(n=40, seed=46)
    # add a self-loop and a reverse duplicate: both must not distort counts
    rows = rows + [(5, 5, 1.0), (rows[0][1], rows[0][0], 2.0)]
    e = G.edges_from_rows(spark, rows)
    # brute force on the undirected simple graph
    und = {(min(s, d), max(s, d)) for s, d, _ in rows if s != d}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(e).collect()
    }
    assert set(got) == set(deg.values())
    for k in got:
        nodes = {v for v, d in deg.items() if d > k}
        ek = sum(1 for a, b in und if a in nodes and b in nodes)
        nk = len(nodes)
        phi = 2.0 * ek / (nk * (nk - 1)) if nk >= 2 else None
        assert got[k][0] == nk and got[k][1] == ek
        if phi is None:
            assert got[k][2] is None
        else:
            assert got[k][2] == pytest.approx(phi, abs=1e-12)
    # the densest core must be at least as clubby as the whole graph
    ks = sorted(got)
    assert got[ks[-1]][0] < got[ks[0]][0]


def test_power_law_alpha_matches_bruteforce(spark):
    import math

    import pytest

    from dmid_spark.graph import power_law_alpha

    rows, n = random_graph(n=40, seed=47)
    rows = rows + [(7, 7, 1.0), (rows[0][1], rows[0][0], 2.0)]  # loop + reverse dup
    e = G.edges_from_rows(spark, rows)
    und = {(min(s, d), max(s, d)) for s, d, _ in rows if s != d}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {
        r["k_min"]: (r["n_tail"], r["alpha"])
        for r in power_law_alpha(e).collect()
    }
    assert set(got) == set(deg.values())
    for k in got:
        tail = [d for d in deg.values() if d >= k]
        alpha = 1.0 + len(tail) / sum(math.log(d / (k - 0.5)) for d in tail)
        assert got[k][0] == len(tail)
        assert got[k][1] == pytest.approx(alpha, rel=1e-12)


def test_reciprocity_hand_computed(spark):
    import pytest

    from dmid_spark.graph import reciprocity

    # 1<->2 mutual (3 vs 1), 1->3 one-way (2), 3->3 self loop (ignored),
    # plus a parallel 1->2 row that must collapse by sum (3 = 2 + 1)
    e = G.edges_from_rows(
        spark, [(1, 2, 2.0), (1, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0), (3, 3, 9.0)]
    )
    r = reciprocity(e).first()
    assert r["n_edges"] == 3 and r["n_recip"] == 2
    assert r["edge_reciprocity"] == pytest.approx(2 / 3, abs=1e-12)
    # min-mass: min(3,1) + min(1,3) + min(2,0) = 2 over total 3+1+2 = 6
    assert r["weight_reciprocity"] == pytest.approx(2 / 6, abs=1e-12)


def test_reciprocity_symmetric_graph_is_one(spark):
    rows, _ = random_graph(n=20, seed=48)
    from dmid_spark.graph import reciprocity, symmetrize

    e = symmetrize(G.edges_from_rows(spark, rows))
    r = reciprocity(e).first()
    assert r["n_edges"] == r["n_recip"]
    assert r["edge_reciprocity"] == 1.0 and r["weight_reciprocity"] == 1.0


def test_negative_samples_deterministic_and_clean(spark):
    import hashlib

    from dmid_spark.graph import negative_samples

    rows, _ = random_graph(n=30, seed=51)
    e = G.edges_from_rows(spark, rows)
    out = negative_samples(e, n_neg=3, seed=7, hash_mode="md5").collect()

    edge_set = {(s, d) for s, d, _ in rows}
    verts = sorted({v for s, d, _ in rows for v in (s, d)})
    rank_of = {r: v for r, v in enumerate(verts)}

    def md5l(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = set()
    for s, d in edge_set:
        for i in range(3):
            neg = rank_of[md5l(f"{s}:{d}:{i}:7") % len(verts)]
            if neg not in (s, d) and (s, neg) not in edge_set:
                expected.add((s, d, neg, i))
    got = {(r["src"], r["dst"], r["neg"], r["draw"]) for r in out}
    assert got == expected
    assert len(out) == len(got)  # no duplicate rows
    # every emitted negative is a genuine non-edge distinct from both ends
    for s, d, n, _ in got:
        assert (s, n) not in edge_set and n != s and n != d
    # drops are the exception, not the rule, on a sparse graph
    assert len(got) > 2 * len(edge_set)


# ---------------------------------------------------------------------------
# categorical attribute mixing / assortativity (Newman PRE 2003)
# ---------------------------------------------------------------------------
def _attr_assort_oracle(edge_rows, attr, weighted=False):
    """Transliteration: mixing matrix fractions -> r."""
    from collections import defaultdict

    cells = defaultdict(float)
    for s, d, w in edge_rows:
        if s in attr and d in attr:
            cells[(attr[s], attr[d])] += w if weighted else 1.0
    tot = sum(cells.values())
    e = {k: v / tot for k, v in cells.items()}
    cats = {c for k in e for c in k}
    a = {c: sum(v for (i, _), v in e.items() if i == c) for c in cats}
    b = {c: sum(v for (_, j), v in e.items() if j == c) for c in cats}
    trace = sum(v for (i, j), v in e.items() if i == j)
    sum_ab = sum(a.get(c, 0.0) * b.get(c, 0.0) for c in cats)
    r = None if (1.0 - sum_ab) == 0.0 else (trace - sum_ab) / (1.0 - sum_ab)
    return e, trace, sum_ab, r


def test_attribute_mixing_matches_oracle(spark):
    from dmid_spark.graph import attribute_assortativity, attribute_mixing

    rows, n = random_graph(n=60, seed=5)
    attr = {i: f"c{i % 4}" for i in range(n)}
    edges = G.edges_from_rows(spark, rows)
    attrs = spark.createDataFrame(list(attr.items()), "id long, attr string")
    for weighted in (False, True):
        e, trace, sum_ab, r = _attr_assort_oracle(rows, attr, weighted)
        got_e = {
            (x["attr_src"], x["attr_dst"]): x["fraction"]
            for x in attribute_mixing(edges, attrs, weighted=weighted).collect()
        }
        assert set(got_e) == set(e)
        assert all(abs(got_e[k] - e[k]) < 1e-12 for k in e)
        row = attribute_assortativity(edges, attrs, weighted=weighted).first()
        assert row["trace"] == pytest.approx(trace, abs=1e-12)
        assert row["agreement"] == pytest.approx(sum_ab, abs=1e-12)
        assert row["r"] == pytest.approx(r, abs=1e-9)


def test_attribute_assortativity_extremes(spark):
    from dmid_spark.graph import attribute_assortativity

    # perfectly assortative: edges only within categories -> r = 1
    rows = [(0, 1, 1.0), (1, 0, 1.0), (2, 3, 1.0), (3, 2, 1.0)]
    attrs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "id long, attr string"
    )
    r1 = attribute_assortativity(G.edges_from_rows(spark, rows), attrs).first()
    assert r1["r"] == pytest.approx(1.0)
    # perfectly disassortative 2-category bipartite -> r = -1
    rows2 = [(0, 2, 1.0), (2, 0, 1.0), (1, 3, 1.0), (3, 1, 1.0)]
    r2 = attribute_assortativity(G.edges_from_rows(spark, rows2), attrs).first()
    assert r2["r"] == pytest.approx(-1.0)
    # single category -> undefined (NULL), trace carried
    attrs_one = spark.createDataFrame(
        [(i, "only") for i in range(4)], "id long, attr string"
    )
    r3 = attribute_assortativity(G.edges_from_rows(spark, rows), attrs_one).first()
    assert r3["r"] is None and r3["trace"] == pytest.approx(1.0)
    # edges with an attribute-less endpoint are dropped
    attrs_partial = spark.createDataFrame(
        [(0, "a"), (1, "a")], "id long, attr string"
    )
    r4 = attribute_assortativity(G.edges_from_rows(spark, rows), attrs_partial).first()
    assert r4["n_categories"] == 1 and r4["trace"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# snapshot diff / churn
# ---------------------------------------------------------------------------
def test_snapshot_diff_and_summary(spark):
    from dmid_spark.graph import snapshot_churn_summary, snapshot_diff

    a = spark.createDataFrame(
        [(1, 2, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 4, 5.0)],
        "src long, dst long, weight double",
    )
    b = spark.createDataFrame(
        [(1, 2, 4.0), (2, 3, 1.0), (5, 6, 1.0)],
        "src long, dst long, weight double",
    )
    d = {(r["src"], r["dst"]): r for r in snapshot_diff(a, b).collect()}
    assert d[(1, 2)]["status"] == "kept" and d[(1, 2)]["weight_delta"] == 1.0
    assert d[(2, 3)]["status"] == "kept" and d[(2, 3)]["weight_delta"] == 0.0
    assert d[(3, 4)]["status"] == "removed" and d[(3, 4)]["weight_b"] == 0.0
    assert d[(5, 6)]["status"] == "added" and d[(5, 6)]["weight_a"] == 0.0
    s = snapshot_churn_summary(a, b).first()
    assert (s["n_added"], s["n_removed"], s["n_kept"]) == (1, 1, 2)
    assert s["abs_weight_delta"] == 1.0 + 0.0 + 5.0 + 1.0
    assert s["edge_jaccard"] == pytest.approx(2 / 4)
