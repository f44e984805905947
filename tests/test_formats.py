from __future__ import annotations

from fixtures import GOLDEN_EDGES, GOLDEN_N
from dmid_spark import graph as G
from dmid_spark.io import (
    cover_from_doca_lines,
    read_cover_json,
    read_dmid_adjacency,
    read_snap_edge_list,
    write_cover_json_lines,
    write_dmid_adjacency_lines,
)

GOLDEN_DMID_LINES = [
    "[0,[[1,1],[3,3]]]",
    "[1,[[0,1],[2,2],[3,1]]]",
    "[2,[[1,2],[4,4]]]",
    "[3,[[0,3],[1,1],[4,4]]]",
    "[4,[[3,4],[2,4]]]",
]


def lines_df(spark, lines):
    return spark.createDataFrame([(x,) for x in lines], "value string")


def test_read_dmid_adjacency_golden(spark):
    edges, verts = read_dmid_adjacency(spark, lines_df(spark, GOLDEN_DMID_LINES))
    got = sorted((r.src, r.dst, r.weight) for r in edges.collect())
    assert got == sorted(GOLDEN_EDGES)
    assert verts.count() == GOLDEN_N


def test_dmid_adjacency_roundtrip_with_isolated_vertex(spark):
    edges = G.edges_from_rows(spark, GOLDEN_EDGES)
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")  # 5 isolated
    out_lines = write_dmid_adjacency_lines(edges, verts)
    edges2, verts2 = read_dmid_adjacency(spark, out_lines)
    assert sorted(map(tuple, edges2.collect())) == sorted(GOLDEN_EDGES)
    assert verts2.count() == 6  # isolated vertex survives the roundtrip


def test_read_snap_edge_list(spark):
    lines = [
        "# Nodes: 4 Edges: 5",
        "0\t1",
        "1\t2",
        "2\t2",  # self-loop dropped
        "2\t3",
        "0\t1",  # duplicate dropped
    ]
    e_dir = read_snap_edge_list(spark, lines_df(spark, lines), directed=True)
    assert sorted((r.src, r.dst) for r in e_dir.collect()) == [(0, 1), (1, 2), (2, 3)]
    e_und = read_snap_edge_list(spark, lines_df(spark, lines), directed=False)
    assert e_und.count() == 6


def test_cover_json_roundtrip_drops_zero(spark):
    cover = spark.createDataFrame(
        [(0, 10, 0.5), (0, 11, 0.0), (1, 10, 1.0)],
        "node long, community long, degree double",
    )
    lines = write_cover_json_lines(cover)
    back = read_cover_json(spark, lines)
    got = sorted(map(tuple, back.collect()))
    assert got == [(0, 10, 0.5), (1, 10, 1.0)]  # zero entry gone


def test_cover_from_doca(spark):
    lines = lines_df(spark, ["0 1 2", "2 3"])
    cov = cover_from_doca_lines(lines)
    got = sorted((r.node, r.degree) for r in cov.collect())
    assert got == [(0, 1.0), (1, 1.0), (2, 1.0), (2, 1.0), (3, 1.0)]
    # node 2 is in both communities (overlap preserved)
    n2 = cov.filter("node = 2").select("community").distinct().count()
    assert n2 == 2


def test_read_ucinet(spark):
    """S6 (Main.java:546-586): 2-line records, directed flag, self-loop
    drop, id densification from 0."""
    from dmid_spark.io import read_ucinet

    text = "\n".join(
        [
            "dl n=4",
            "  directed 0",
            "    source 10",
            "    target 30",
            "    source 30",
            "    target 99",
            "    source 10",
            "    target 10",  # self-loop dropped
        ]
    )
    lines = spark.createDataFrame([(l,) for l in text.split("\n")], "value string")
    edges, id_map = read_ucinet(spark, lines)
    m = {r["orig_id"]: r["dense_id"] for r in id_map.collect()}
    assert m == {10: 0, 30: 1, 99: 2}
    got = sorted((r["src"], r["dst"], r["weight"]) for r in edges.collect())
    # undirected → symmetrized
    assert got == [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 1, 1.0)]


def test_read_cover_and_graph_degrees(spark):
    from dmid_spark.io import read_cover_and_graph

    graph_lines = spark.createDataFrame(
        [("[0,[[1,1.0],[2,2.0]]]",), ("[1,[[2,1.0]]]",), ("[2,[]]",)],
        "value string",
    )
    cover_lines = spark.createDataFrame(
        [("[0,[[0,1.0]]]",), ("[1,[[0,0.5],[2,0.5]]]",), ("[2,[[2,1.0]]]",)],
        "value string",
    )
    cover, edges, degrees = read_cover_and_graph(spark, cover_lines, graph_lines)
    assert cover.count() == 4
    d = {r["id"]: (r["out_deg"], r["in_deg"]) for r in degrees.collect()}
    assert d == {0: (2, 0), 1: (1, 1), 2: (0, 2)}


def test_read_ground_truth_cover_remap(spark):
    """M8 (Main.java:281-376): broken-id remap + dense community re-index."""
    from dmid_spark import graph as G
    from dmid_spark.io import read_ground_truth_cover

    raw_edges = G.edges_from_rows(spark, [(10, 30, 1.0), (30, 99, 1.0)])
    _, id_map = G.densify_ids(raw_edges)
    cover_lines = spark.createDataFrame(
        [("[10,[[7,1.0]]]",), ("[30,[[7,0.25],[42,0.75]]]",), ("[99,[[42,1.0]]]",)],
        "value string",
    )
    got = sorted(
        (r["node"], r["community"], r["degree"])
        for r in read_ground_truth_cover(spark, cover_lines, id_map).collect()
    )
    # ids 10/30/99 → 0/1/2; communities 7/42 → 0/1
    assert got == [(0, 0, 1.0), (1, 0, 0.25), (1, 1, 0.75), (2, 1, 1.0)]
