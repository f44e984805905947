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
