"""Synchronous Louvain refinement (algorithms/louvain.py) vs a
transliterated oracle, plus modularity sanity on known structures."""

import pytest

from dmid_spark.algorithms.louvain import louvain_refine, partition_modularity


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in pairs], "src long, dst long, weight double"
    )


def _oracle_round(pairs, labels):
    """One synchronous move phase, NumPy-free transliteration (9dp gains,
    smaller-community tiebreak, stay unless gain > 0)."""
    adj: dict[int, dict[int, float]] = {}
    for s, d, w in pairs:
        if s == d:
            continue
        adj.setdefault(s, {})[d] = adj.setdefault(s, {}).get(d, 0.0) + w
        adj.setdefault(d, {})[s] = adj.setdefault(d, {}).get(s, 0.0) + w
    k = {v: sum(ws.values()) for v, ws in adj.items()}
    m = sum(k.values()) / 2.0
    tot: dict[int, float] = {}
    for v, c in labels.items():
        tot[c] = tot.get(c, 0.0) + k.get(v, 0.0)
    new = dict(labels)
    for v, ws in adj.items():
        c = labels[v]
        kvc: dict[int, float] = {}
        for d, w in ws.items():
            kvc[labels[d]] = kvc.get(labels[d], 0.0) + w
        k_own = kvc.get(c, 0.0)
        best = (0.0, -c)  # the stay option
        for nc, w in kvc.items():
            if nc == c:
                continue
            g = round((w - k_own) / m - k[v] * (tot[nc] - (tot[c] - k[v])) / (2 * m * m), 9)
            if (g, -nc) > best:
                best = (g, -nc)
        if best[0] > 0:
            new[v] = -best[1]
    return new


def _oracle_modularity(pairs, labels):
    adj = {}
    for s, d, w in pairs:
        if s == d:
            continue
        adj[(s, d)] = adj.get((s, d), 0.0) + w
    k: dict[int, float] = {}
    for (s, d), w in adj.items():
        k[s] = k.get(s, 0.0) + w
        k[d] = k.get(d, 0.0) + w
    two_m = sum(k.values())
    s_in: dict[int, float] = {}
    tot: dict[int, float] = {}
    for v, kv in k.items():
        tot[labels[v]] = tot.get(labels[v], 0.0) + kv
    for (s, d), w in adj.items():
        if labels[s] == labels[d]:
            s_in[labels[s]] = s_in.get(labels[s], 0.0) + 2 * w
    return sum(s_in.get(c, 0.0) / two_m - (t / two_m) ** 2 for c, t in tot.items())


TWO_CLIQUES = (
    [(a, b, 1) for a in range(4) for b in range(a + 1, 4)]
    + [(a, b, 1) for a in range(4, 8) for b in range(a + 1, 8)]
    + [(3, 4, 1)]  # one bridge
)


def test_partition_modularity_matches_oracle(spark):
    e = _edges(spark, TWO_CLIQUES)
    good = {v: (0 if v < 4 else 1) for v in range(8)}
    lab = spark.createDataFrame(list(good.items()), "id long, label long")
    q = partition_modularity(e, lab)
    assert q == pytest.approx(_oracle_modularity(TWO_CLIQUES, good), abs=1e-12)
    # the two-clique split beats the everything-in-one-community partition
    one = spark.createDataFrame([(v, 0) for v in range(8)], "id long, label long")
    assert q > partition_modularity(e, one)


def test_refine_round_matches_transliterated_oracle(spark):
    # scrambled start: vertex 3 parked in the wrong clique's community,
    # vertex 7 in its own singleton
    start = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1, 7: 9}
    e = _edges(spark, TWO_CLIQUES)
    lab = spark.createDataFrame(list(start.items()), "id long, label long")
    got_df, stats = louvain_refine(e, lab, rounds=1)
    got = {r.id: r.label for r in got_df.collect()}
    assert got == _oracle_round(TWO_CLIQUES, start)
    assert stats.moved[0] > 0
    # and the move phase did not decrease modularity on this graph
    assert stats.modularity >= partition_modularity(e, lab) - 1e-12


def test_refine_converges_and_improves_two_cliques(spark):
    start = {v: v for v in range(8)}  # singletons
    e = _edges(spark, TWO_CLIQUES)
    lab = spark.createDataFrame(list(start.items()), "id long, label long")
    out, stats = louvain_refine(e, lab, rounds=6)
    q0 = partition_modularity(e, lab)
    assert stats.modularity > q0
    # early-stop on a no-move round
    assert stats.moved[-1] == 0 or stats.rounds == 6


def test_refine_validation_and_isolated_vertices(spark):
    e = _edges(spark, [(0, 1, 1)])
    lab = spark.createDataFrame([(0, 0), (1, 1), (99, 5)], "id long, label long")
    out, _ = louvain_refine(e, lab, rounds=1)
    got = {r.id: r.label for r in out.collect()}
    assert got[99] == 5  # isolated id keeps its community
    assert set(got) == {0, 1, 99}
    with pytest.raises(ValueError):
        louvain_refine(e, lab, rounds=0)


def test_multilevel_louvain_finds_planted_cliques(spark):
    from dmid_spark.algorithms.louvain import louvain

    # three 5-cliques joined by single bridges
    pairs = []
    for c in range(3):
        base = c * 5
        pairs += [(base + a, base + b, 1) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(4, 5, 1), (9, 10, 1)]
    e = _edges(spark, pairs)
    out, stats = louvain(e, max_levels=3)
    got = {r.id: r.label for r in out.collect()}
    comms = {}
    for v, c in got.items():
        comms.setdefault(c, set()).add(v)
    assert sorted(sorted(m) for m in comms.values()) == [
        list(range(0, 5)), list(range(5, 10)), list(range(10, 15))
    ]
    # the planted partition is the modularity optimum here
    truth = spark.createDataFrame([(v, v // 5) for v in range(15)], "id long, label long")
    assert stats.modularity == pytest.approx(partition_modularity(e, truth), abs=1e-12)


def test_modularity_counts_self_loop_mass(spark):
    # coarse-graph shape: two nodes with heavy self-loops (internal mass)
    # and one weak bridge; merging them must be modularity-NEGATIVE
    from dmid_spark.algorithms.louvain import louvain_refine

    e = _edges(spark, [(0, 0, 10), (1, 1, 10), (0, 1, 1)])
    split = spark.createDataFrame([(0, 0), (1, 1)], "id long, label long")
    merged = spark.createDataFrame([(0, 0), (1, 0)], "id long, label long")
    q_split = partition_modularity(e, split)
    q_merged = partition_modularity(e, merged)
    # hand calc: 2m = 42, split Q = 20/42 + 20/42 - (21/42)^2*2 = 0.452...
    assert q_split == pytest.approx(40 / 42 - 2 * (21 / 42) ** 2, abs=1e-12)
    assert q_merged == pytest.approx(42 / 42 - 1.0, abs=1e-12)
    assert q_split > q_merged
    # and refine must therefore REFUSE the merge
    out, st = louvain_refine(e, split, rounds=2)
    assert {r.id: r.label for r in out.collect()} == {0: 0, 1: 1}
    assert st.moved[0] == 0


def test_louvain_parquet_rebase_path_flat_walls(spark, tmp_path):
    from dmid_spark.algorithms.louvain import louvain

    # rebase_limit=0 forces EVERY coarse level through the parquet
    # round-trip (the big-coarse path). Results must match the driver
    # re-base path exactly, and per-level wall times must stay flat —
    # the stacked-localCheckpoint pathology this replaces grew 3-5x per
    # extra generation.
    # hierarchical fixture so MULTIPLE coarse levels run: 9 5-cliques
    # (weight 10) in 3 super-groups (cliques tied pairwise at weight 3),
    # super-groups tied by single weight-1 bridges. Level 1 merges
    # vertices into cliques; level 2 merges cliques into super-groups.
    pairs = []
    for c in range(9):
        base = c * 5
        pairs += [(base + a, base + b, 10) for a in range(5) for b in range(a + 1, 5)]
    for g in range(3):
        cs = [g * 3, g * 3 + 1, g * 3 + 2]
        for i in range(3):
            for j in range(i + 1, 3):
                pairs += [(cs[i] * 5, cs[j] * 5, 3), (cs[i] * 5 + 1, cs[j] * 5 + 1, 3)]
    pairs += [(0, 15, 1), (15, 30, 1)]
    e = _edges(spark, pairs)
    out_small, st_small = louvain(e, max_levels=3)
    out_big, st_big = louvain(
        e, max_levels=3, rebase_limit=0, rebase_dir=str(tmp_path)
    )
    assert sorted(map(tuple, out_big.collect())) == sorted(
        map(tuple, out_small.collect())
    )
    assert st_big.modularity == pytest.approx(st_small.modularity, abs=1e-12)
    # flat per-level wall: later levels (smaller graphs!) must not blow up.
    # The generation pathology measured 0.6 -> 6.2 -> 33.9s on 2-row rounds;
    # allow generous host noise while still catching any 3x+ growth trend.
    assert len(st_big.levels_wall) >= 2
    assert st_big.levels_wall[-1] < 3.0 * st_big.levels_wall[0] + 1.0
