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



# ---------------------------------------------------------------------------
# R-MAT generator (io/generators.py)
# ---------------------------------------------------------------------------
def test_rmat_matches_transliteration(spark):
    import hashlib

    from dmid_spark.io import rmat_edges

    scale, n, seed = 5, 200, 9
    a, b, c = 0.6, 0.15, 0.15
    a_ppm, b_ppm, c_ppm = 600000, 150000, 150000

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = []
    for i in range(n):
        src = dst = 0
        for lvl in range(scale):
            h = h60(f"rmat:{seed}:{i}:{lvl}") % 1_000_000
            if h < a_ppm:
                q = 0
            elif h < a_ppm + b_ppm:
                q = 1
            elif h < a_ppm + b_ppm + c_ppm:
                q = 2
            else:
                q = 3
            bit = 1 << (scale - 1 - lvl)
            if q >= 2:
                src += bit
            if q % 2 == 1:
                dst += bit
        want.append((src, dst, 1.0))
    got = sorted(
        map(tuple, rmat_edges(
            spark, scale=scale, n_edges=n, a=a, b=b, c=c, seed=seed,
            hash_mode="md5",
        ).collect())
    )
    assert got == sorted(want)


def test_rmat_parallelism_invariant(spark):
    from dmid_spark.io import rmat_edges

    one = sorted(map(tuple, rmat_edges(
        spark, scale=8, n_edges=500, seed=3, num_partitions=1
    ).collect()))
    many = sorted(map(tuple, rmat_edges(
        spark, scale=8, n_edges=500, seed=3, num_partitions=13
    ).collect()))
    assert one == many and len(one) == 500


def test_rmat_skew_and_flags(spark):
    from pyspark.sql import functions as SF

    from dmid_spark.io import rmat_edges

    e = rmat_edges(spark, scale=10, n_edges=20_000, seed=1)
    degs = sorted(
        (r["c"] for r in e.groupBy("src").agg(SF.count("*").alias("c")).collect()),
        reverse=True,
    )
    n_src = len(degs)
    # Graph500 parameters concentrate mass: the top 1% of sources hold far
    # more than 1% of edges (uniform would give ~= 1%)
    top = sum(degs[: max(1, n_src // 100)])
    assert top / 20_000 > 0.05
    # flags
    loops = rmat_edges(spark, scale=6, n_edges=2000, seed=2)
    no_loops = rmat_edges(spark, scale=6, n_edges=2000, seed=2, drop_self_loops=True)
    assert no_loops.filter("src = dst").count() == 0
    assert loops.count() == 2000 and no_loops.count() <= 2000
    coll = rmat_edges(spark, scale=6, n_edges=2000, seed=2, collapse_duplicates=True)
    tot = coll.agg(SF.sum("weight").alias("s")).first()["s"]
    assert tot == 2000.0 and coll.count() < 2000  # scale 6 forces collisions


def test_rmat_validates_args(spark):
    import pytest as _pytest

    from dmid_spark.io import rmat_edges

    with _pytest.raises(ValueError):
        rmat_edges(spark, scale=0)
    with _pytest.raises(ValueError):
        rmat_edges(spark, scale=5, a=0.9, b=0.2, c=0.2)
