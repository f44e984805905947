"""Tests for Luby MIS / greedy coloring (algorithms/mis.py), square
counting (algorithms/triangles.py), and z-order layout (io/layout.py) —
each against an independent Python re-derivation on the shared fixtures,
plus parallelism-invariance and the layout's file-pruning payoff."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from fixtures import random_graph, ring_of_cliques, star, two_cliques_bridge
from dmid_spark.algorithms import greedy_coloring, luby_mis, square_counts
from dmid_spark.algorithms.triangles import SquareStats
from dmid_spark.io import write_zordered, zorder_key


def edges_df(spark, rows):
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in rows],
        "src long, dst long, weight double",
    )


def und_pairs(rows):
    und = set()
    for s, d, _ in rows:
        if s != d:
            und.add((min(s, d), max(s, d)))
    return und


def nbr_map(rows):
    nbrs: dict[int, set[int]] = {}
    for u, v in und_pairs(rows):
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    return nbrs


# ---------------------------------------------------------------------------
# Luby MIS
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "rows_n",
    [
        two_cliques_bridge(6),
        ring_of_cliques(4, 5),
        star(9),
        random_graph(150, 6, seed=3),
    ],
    ids=["bridge", "ring", "star", "random"],
)
def test_luby_mis_invariants(spark, rows_n):
    rows, _ = rows_n
    res, stats = luby_mis(edges_df(spark, rows), seed=42)
    got = {r.id: (r.in_mis, r.round_decided) for r in res.collect()}
    nbrs = nbr_map(rows)
    assert set(got) == set(nbrs)  # every vertex decided, exactly once
    mis = {i for i, (m, _) in got.items() if m}
    # independence: no edge inside the MIS
    for u, v in und_pairs(rows):
        assert not (u in mis and v in mis)
    # maximality: every outsider has a MIS neighbour
    for i in got:
        if i not in mis:
            assert nbrs[i] & mis
    assert stats.mis_size == len(mis)
    assert sum(stats.decided_per_round) == len(got)


def test_luby_mis_parallelism_invariant(spark):
    """Content-addressed draws: the MIS (not just its size) is identical
    regardless of input partitioning."""
    rows, _ = random_graph(200, 8, seed=11)
    e = edges_df(spark, rows)
    a, _ = luby_mis(e.repartition(1), seed=5)
    b, _ = luby_mis(e.repartition(16), seed=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_luby_mis_md5_mode_same_invariants(spark):
    rows, _ = two_cliques_bridge(5)
    res, _ = luby_mis(edges_df(spark, rows), seed=42, hash_mode="md5")
    got = {r.id: r.in_mis for r in res.collect()}
    mis = {i for i, m in got.items() if m}
    for u, v in und_pairs(rows):
        assert not (u in mis and v in mis)


def test_luby_mis_isolated_vertices_join(spark):
    """A vertex whose neighbours are all decided joins the MIS (NULL
    min-neighbour branch); with `vertices` covering ids not in any edge,
    the isolated ids all land in the MIS in round 1."""
    rows = [(0, 1, 1.0)]
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    res, stats = luby_mis(edges_df(spark, rows), seed=1, vertices=verts)
    got = {r.id: (r.in_mis, r.round_decided) for r in res.collect()}
    assert set(got) == set(range(5))
    for i in (2, 3, 4):
        assert got[i] == (True, 1)
    assert (got[0][0], got[1][0]).count(True) == 1  # exactly one endpoint


# ---------------------------------------------------------------------------
# greedy coloring
# ---------------------------------------------------------------------------
def test_greedy_coloring_proper_and_deterministic(spark):
    rows, _ = random_graph(120, 7, seed=2)
    e = edges_df(spark, rows)
    col, stats = greedy_coloring(e, seed=9)
    cmap = {r.id: r.color for r in col.collect()}
    nbrs = nbr_map(rows)
    assert set(cmap) == set(nbrs)
    for u, v in und_pairs(rows):
        assert cmap[u] != cmap[v]
    assert stats.colors == max(cmap.values())
    # color classes are numbered densely from 1
    assert set(cmap.values()) == set(range(1, stats.colors + 1))
    col2, _ = greedy_coloring(e.repartition(13), seed=9)
    assert sorted(map(tuple, col2.collect())) == sorted(map(tuple, col.collect()))


def test_greedy_coloring_clique_needs_k_colors(spark):
    rows, n = two_cliques_bridge(6)
    col, stats = greedy_coloring(edges_df(spark, rows), seed=3)
    # a 6-clique forces ≥ 6 colors; iterated MIS on it yields exactly 6
    assert stats.colors >= 6


def test_greedy_coloring_max_colors_guard(spark):
    rows, _ = two_cliques_bridge(6)
    with pytest.raises(RuntimeError):
        greedy_coloring(edges_df(spark, rows), seed=3, max_colors=2)


# ---------------------------------------------------------------------------
# square counting
# ---------------------------------------------------------------------------
def squares_oracle(rows):
    nbrs = nbr_map(rows)
    per = dict.fromkeys(nbrs, 0)
    total = 0
    for a, c in itertools.combinations(sorted(nbrs), 2):
        common = nbrs[a] & nbrs[c]
        k = len(common)
        total += k * (k - 1) // 2
        for ctr in common:
            if k >= 2:
                per[ctr] += k - 1
    assert total % 2 == 0
    return per, total // 2


@pytest.mark.parametrize(
    "rows",
    [
        two_cliques_bridge(5)[0],
        ring_of_cliques(3, 4)[0],
        star(8)[0],
        random_graph(100, 6, seed=17)[0],
    ],
    ids=["bridge", "ring", "star", "random"],
)
def test_square_counts_vs_oracle(spark, rows):
    per, total = squares_oracle(rows)
    counts, stats = square_counts(edges_df(spark, rows))
    got = {r.id: r.squares for r in counts.collect()}
    assert got == per
    assert stats.total == total
    assert stats.capped_centers == 0


def test_square_counts_star_has_none(spark):
    rows = star(8)[0]
    _, stats = square_counts(edges_df(spark, rows))
    assert stats.total == 0


def test_square_counts_center_cap_reports_drops(spark):
    """Capping below the star hub's degree removes the hub from wedge
    generation — squares through it vanish and the drop is reported."""
    rows = random_graph(80, 8, seed=23)[0]
    _, full = square_counts(edges_df(spark, rows))
    counts, capped = square_counts(edges_df(spark, rows), max_center_degree=4)
    assert capped.capped_centers > 0
    assert capped.total <= full.total


def test_sampled_square_count_full_sample_is_exact(spark):
    from dmid_spark.algorithms.triangles import sampled_square_count

    rows = random_graph(100, 6, seed=17)[0]
    _, exact = square_counts(edges_df(spark, rows))
    out, st = sampled_square_count(edges_df(spark, rows), keep_percent=100)
    assert st.sampled_squares == exact.total
    assert st.estimate == float(exact.total)
    assert st.sampled_edges == st.total_edges


def test_sampled_square_count_deterministic(spark):
    from dmid_spark.algorithms.triangles import sampled_square_count

    rows = random_graph(150, 8, seed=5)[0]
    e = edges_df(spark, rows)
    _, a = sampled_square_count(e.repartition(2), keep_percent=30, seed=9)
    _, b = sampled_square_count(e.repartition(11), keep_percent=30, seed=9)
    assert (a.sampled_edges, a.sampled_squares) == (b.sampled_edges, b.sampled_squares)
    assert 0 < a.sampled_edges < a.total_edges


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------
def zorder_oracle(rows, bits):
    """rows: list of (id, x, y)."""
    n = len(rows)
    rx = {r[0]: i for i, r in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))}
    ry = {r[0]: i for i, r in enumerate(sorted(rows, key=lambda r: (r[2], r[0])))}
    out = {}
    for i, _, _ in rows:
        b0 = (rx[i] << bits) // n
        b1 = (ry[i] << bits) // n
        z = 0
        for b in range(bits):
            z |= ((b0 >> b) & 1) << (2 * b)
            z |= ((b1 >> b) & 1) << (2 * b + 1)
        out[i] = z
    return out


def test_zorder_key_matches_integer_oracle(spark):
    rows = [(i, (i * 37) % 101, float((i * 53) % 97)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    got = {
        r.id: r.zkey
        for r in zorder_key(df, ["x", "y"], id_col="id", bits=8).collect()
    }
    assert got == zorder_oracle(rows, 8)


def test_zorder_key_parallelism_invariant(spark):
    rows = [(i, (i * 11) % 64, (i * 29) % 64) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    a = {r.id: r.zkey for r in zorder_key(df.repartition(1), ["x", "y"], "id").collect()}
    b = {r.id: r.zkey for r in zorder_key(df.repartition(16), ["x", "y"], "id").collect()}
    assert a == b


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 2)], "id long, x long")
    with pytest.raises(ValueError):
        zorder_key(df, [], id_col="id")
    with pytest.raises(ValueError):
        zorder_key(df, ["x"] * 4, id_col="id", bits=16)


def test_write_zordered_prunes_files(spark, tmp_path):
    """The payoff test: on a 64×64 grid written as 16 files, a small
    rectangle query touches strictly fewer files under z-order layout than
    under single-column sort layout (parquet file-level locality —
    the stand-in for row-group min/max pruning at scale)."""
    rows = [(i, i % 64, i // 64) for i in range(64 * 64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], id_col="id", bits=6, num_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def files_touched(path):
        # a slab on y — the column the naive layout did NOT sort by
        return (
            spark.read.parquet(path)
            .filter((F.col("y") >= 8) & (F.col("y") < 16))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    nz, ns = files_touched(zpath), files_touched(spath)
    assert ns == 16  # x-sorted layout: every file holds every y
    assert nz < ns, (nz, ns)
    assert nz <= 8  # z-order confines the slab to a minority of files
    # and the data round-trips intact
    assert spark.read.parquet(zpath).count() == 64 * 64
