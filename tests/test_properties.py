"""Property-based invariants (SURVEY.md §5 item 3) over random graphs.

Hypothesis generates small seeded digraphs; each property is an invariant
the reference semantics guarantee regardless of topology. Example counts
are kept low — every example spins Spark jobs."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dmid_spark import graph as G
from dmid_spark.algorithms import connected_components, label_propagation, pagerank
from dmid_spark.algorithms.dmid import disassortativity_edges

import oracles as O

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def digraphs(draw, max_n=14):
    n = draw(st.integers(min_value=3, max_value=max_n))
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(0, n - 1), st.integers(0, n - 1)
            ).filter(lambda p: p[0] != p[1]),
            min_size=2,
            max_size=min(40, n * (n - 1)),
        )
    )
    weights = draw(
        st.lists(
            st.integers(1, 5), min_size=len(pairs), max_size=len(pairs)
        )
    )
    rows = [(s, d, float(w)) for (s, d), w in zip(sorted(pairs), weights)]
    return rows, n


@SET
@given(g=digraphs())
def test_pagerank_is_a_distribution(spark, g):
    rows, n = g
    edges = G.edges_from_rows(spark, rows)
    ranks, stats = pagerank(edges, tol=1e-9, max_iter=300)
    vals = np.array([r["value"] for r in ranks.collect()])
    assert stats.converged
    assert (vals >= 0).all()
    assert abs(vals.sum() - 1.0) < 1e-6


@SET
@given(g=digraphs())
def test_dis_norm_column_sums_are_zero_or_one(spark, g):
    rows, n = g
    edges = G.edges_from_rows(spark, rows)
    dis = disassortativity_edges(edges, G.weighted_in_degrees(edges))
    from pyspark.sql import functions as F

    sums = [
        r["s"] for r in dis.groupBy("dst").agg(F.sum("weight").alias("s")).collect()
    ]
    assert all(abs(s - 1.0) < 1e-9 or abs(s) < 1e-12 for s in sums)


@SET
@given(g=digraphs())
def test_cc_labels_are_component_minima_and_fixpoint(spark, g):
    rows, n = g
    edges = G.edges_from_rows(spark, rows)
    labels, stats = connected_components(edges)
    got = {r["id"]: r["component"] for r in labels.collect()}
    exp = O.connected_components(rows, n)
    assert stats.converged
    for v, lbl in got.items():
        assert lbl == exp[v]  # min-id labeling, exact
    # fixpoint: every edge's endpoints share a label
    for s, d, _ in rows:
        assert got[s] == got[d]


@SET
@given(g=digraphs())
def test_lpa_labels_come_from_vertex_ids(spark, g):
    rows, n = g
    edges = G.edges_from_rows(spark, rows)
    labels, _ = label_propagation(edges, max_iter=4, until_fixpoint=False)
    ids = {r["id"] for r in G.vertices(edges).collect()}
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert set(got) == ids
    assert set(got.values()) <= ids  # labels are always existing vertex ids
