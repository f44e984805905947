"""Tests for the mergeable sketches (sketch/hll.py, sketch/cms.py):
register/counter construction against a pure-Python transliteration of the
same hash math, merge = split-then-merge equivalence, and estimation
accuracy against exact counts."""

from __future__ import annotations

import hashlib

import pytest

from dmid_spark.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    hll_distinct_counts,
    hll_estimate,
    hll_registers,
    merge_registers,
)

HASH_BITS = 60


def md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hll_oracle(keys, p):
    """(register, rho) dict via the same md5 hash math."""
    regs = {}
    rem_bits = HASH_BITS - p
    for k in keys:
        h = md5_60bit(str(k))
        reg = h >> rem_bits
        rem = h & ((1 << rem_bits) - 1)
        rho = rem_bits + 1 if rem == 0 else rem_bits - rem.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def cms_oracle(keys, depth, width, seed):
    grid = {}
    for k in keys:
        for d in range(depth):
            w = md5_60bit(f"{d}:{seed}:{k}") % width
            grid[(d, w)] = grid.get((d, w), 0) + 1
    return grid


def kv_df(spark, n=500, mod=97):
    rows = [(i, f"user{i % mod}", f"t{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, "event_id long, user string, typ string")


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------
def test_hll_registers_match_oracle_md5(spark):
    df = kv_df(spark)
    got = {
        r["register"]: r["rho"]
        for r in hll_registers(df, "user", p=6, hash_mode="md5").collect()
    }
    assert got == hll_oracle({f"user{i}" for i in range(97)}, p=6)


def test_hll_registers_grouped_and_bounded(spark):
    df = kv_df(spark)
    regs = hll_registers(df, "user", ["typ"], p=4).collect()
    per_group = {}
    for r in regs:
        per_group.setdefault(r["typ"], set()).add(r["register"])
    assert set(per_group) == {"t0", "t1", "t2"}
    for s in per_group.values():
        assert len(s) <= 16 and all(0 <= x < 16 for x in s)


def test_hll_estimate_accuracy(spark):
    # p=8 → expected relative error ~1.04/sqrt(256) ≈ 6.5%
    df = kv_df(spark, n=6000, mod=1500)
    est = hll_distinct_counts(df, "user", p=8)[()]
    assert est == pytest.approx(1500, rel=0.15)


def test_hll_merge_equals_whole(spark):
    df = kv_df(spark, n=1000, mod=211)
    a = hll_registers(df.filter("event_id % 2 = 0"), "user", p=6, hash_mode="md5")
    b = hll_registers(df.filter("event_id % 2 = 1"), "user", p=6, hash_mode="md5")
    merged = {(r["register"], r["rho"]) for r in merge_registers(a, b).collect()}
    whole = {
        (r["register"], r["rho"])
        for r in hll_registers(df, "user", p=6, hash_mode="md5").collect()
    }
    assert merged == whole


def test_hll_estimate_small_range_exactish(spark):
    # linear-counting regime: tiny cardinality, many empty registers
    df = kv_df(spark, n=200, mod=7)
    est = hll_distinct_counts(df, "user", p=8)[()]
    assert est == pytest.approx(7, abs=1.0)


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------
def test_cms_grid_matches_oracle_md5(spark):
    df = kv_df(spark, n=300, mod=23)
    got = {
        (r["d"], r["w"]): r["count"]
        for r in cms_build(df, "user", depth=3, width=32, hash_mode="md5").collect()
    }
    keys = [f"user{i % 23}" for i in range(300)]
    assert got == cms_oracle(keys, depth=3, width=32, seed=42)


def test_cms_estimate_bounds(spark):
    n, mod = 2000, 150
    df = kv_df(spark, n=n, mod=mod)
    sk = cms_build(df, "user", depth=4, width=256)
    keys = df.select("user").distinct()
    est = {r["key"]: r["estimate"] for r in
           cms_estimate(sk, keys, "user", depth=4, width=256).collect()}
    true = {f"user{i}": len(range(i, n, mod)) for i in range(mod)}
    assert set(est) == set(true)
    for k, e in est.items():
        assert e >= true[k]  # CMS never underestimates
        assert e <= true[k] + (2.72 / 256) * n * 3  # loose e/w·N bound
    # with width >> distinct keys, most estimates are exact
    exact = sum(1 for k in est if est[k] == true[k])
    assert exact / len(est) > 0.5


def test_cms_merge_equals_whole(spark):
    df = kv_df(spark, n=400, mod=31)
    a = cms_build(df.filter("event_id < 200"), "user", depth=3, width=64)
    b = cms_build(df.filter("event_id >= 200"), "user", depth=3, width=64)
    merged = {(r["d"], r["w"]): r["count"] for r in cms_merge(a, b).collect()}
    whole = {(r["d"], r["w"]): r["count"]
             for r in cms_build(df, "user", depth=3, width=64).collect()}
    assert merged == whole


def test_bloom_no_false_negatives_bounded_fp(spark):
    from dmid_spark.sketch import bloom_bits, bloom_might_contain, bloom_fp_rate

    inserted = spark.range(300).selectExpr("concat('key-', id) AS k")
    bits = bloom_bits(inserted, "k", m=2048, k=4)
    assert bits.count() <= 2048
    disjoint = spark.range(1000).selectExpr("concat('other-', id) AS k")
    probes = inserted.unionByName(disjoint)
    res = {r["k"]: r["might_contain"] for r in
           bloom_might_contain(bits, probes, "k", m=2048, k=4).collect()}
    # no false negatives, ever
    assert all(res[f"key-{i}"] for i in range(300))
    # false positives on disjoint probes track the standard estimate
    fp = sum(res[f"other-{i}"] for i in range(1000))
    assert fp <= max(10, 3 * bloom_fp_rate(300, 2048, 4) * 1000)


def test_bloom_merge_and_groups(spark):
    from dmid_spark.sketch import bloom_bits, bloom_might_contain

    a = spark.range(50).selectExpr("concat('a-', id) AS k", "'g1' AS grp")
    b = spark.range(50).selectExpr("concat('b-', id) AS k", "'g2' AS grp")
    whole = bloom_bits(a.unionByName(b), "k", group_cols=["grp"], m=512, k=3)
    merged = (
        bloom_bits(a, "k", group_cols=["grp"], m=512, k=3)
        .unionByName(bloom_bits(b, "k", group_cols=["grp"], m=512, k=3))
        .distinct()
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    # group separation: a g1 key probed against g2's filter is (almost
    # surely) absent; against its own group it is always present
    res = {
        (r["grp"], r["k"]): r["might_contain"]
        for r in bloom_might_contain(
            whole,
            spark.createDataFrame([("a-0", "g1"), ("a-0", "g2")], "k string, grp string"),
            "k", group_cols=["grp"], m=512, k=3,
        ).collect()
    }
    assert res[("g1", "a-0")] is True


def test_bloom_validation():
    import pytest as _pt

    from dmid_spark.sketch import bloom_fp_rate
    from dmid_spark.sketch.bloom import bloom_bits as bb

    assert 0.0 < bloom_fp_rate(100, 1024, 4) < 1.0
    with _pt.raises(ValueError):
        bb(None, "k", m=1)
    with _pt.raises(ValueError):
        bb(None, "k", k=0)


def test_hll_distinct_counts_guards_driver_fanin(spark):
    """The convenience dict path is O(groups * 2^p) on the driver: above
    max_groups it must refuse and point at the distributed register table."""
    import pytest as _pt

    df = spark.range(40).selectExpr(
        "id as event_id", "cast(id as string) as user", "cast(id % 20 as string) as typ"
    )
    with _pt.raises(ValueError, match="hll_registers"):
        hll_distinct_counts(df, "user", group_cols=["typ"], p=5, max_groups=10)
    # under the cap the path still works
    got = hll_distinct_counts(df, "user", group_cols=["typ"], p=5, max_groups=20)
    assert len(got) == 20


def test_sketches_empty_input(spark):
    empty = spark.createDataFrame([], "event_id long, user string, typ string")
    assert hll_registers(empty, "user", p=5).collect() == []
    assert hll_distinct_counts(empty, "user", p=5) == {}
    assert cms_build(empty, "user").collect() == []


def test_cms_rejects_degenerate_shape(spark):
    df = kv_df(spark, n=10)
    with pytest.raises(ValueError, match="depth, width"):
        cms_build(df, "user", depth=0, width=16)


def test_group_quantiles_exact_and_sketch(spark):
    import numpy as np

    from dmid_spark.sketch.quantiles import group_quantiles

    vals = [(g, float((i * 37 + ord(g) * 11) % 1000))
            for g in ("a", "b") for i in range(500)]
    d = spark.createDataFrame(vals, "g string, v double")
    out = {r.g: (r.q_0_5, r.q_0_9) for r in
           group_quantiles(d, "v", ["g"], [0.5, 0.9]).collect()}
    for g in ("a", "b"):
        arr = np.array([v for gg, v in vals if gg == g])
        # numpy 'linear' interpolation == Spark percentile's (n-1)p definition
        assert out[g][0] == pytest.approx(np.percentile(arr, 50), abs=1e-9)
        assert out[g][1] == pytest.approx(np.percentile(arr, 90), abs=1e-9)
    approx = {r.g: (r.q_0_5, r.q_0_9) for r in
              group_quantiles(d, "v", ["g"], [0.5, 0.9], exact=False).collect()}
    for g in ("a", "b"):
        assert abs(approx[g][0] - out[g][0]) <= 20  # GK bound at this accuracy
    with pytest.raises(ValueError):
        group_quantiles(d, "v", ["g"], [])
    with pytest.raises(ValueError):
        group_quantiles(d, "v", ["g"], [1.5])


# ---------------------------------------------------------------------------
# HLL pairwise overlap (audience overlap via inclusion-exclusion)
# ---------------------------------------------------------------------------
def test_hll_pairwise_overlap_accuracy(spark):
    from dmid_spark.sketch import hll_pairwise_overlap, hll_registers

    rows = (
        [("A", u) for u in range(1000)]
        + [("B", u) for u in range(500, 1500)]
        + [("C", u) for u in range(10_000, 10_400)]
    )
    df = spark.createDataFrame(rows, "grp string, user long")
    regs = hll_registers(df, "user", ["grp"], p=10)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in hll_pairwise_overlap(regs, "grp", p=10).collect()
    }
    ab = got[("A", "B")]
    # p=10 -> ~3.3% relative error on sizes; inclusion-exclusion compounds
    assert ab["est_a"] == pytest.approx(1000, rel=0.1)
    assert ab["est_union"] == pytest.approx(1500, rel=0.1)
    assert ab["est_intersection"] == pytest.approx(500, rel=0.35)
    assert 0.15 < ab["est_jaccard"] < 0.55  # true 1/3
    ac = got[("A", "C")]  # disjoint
    assert ac["est_intersection"] < 0.15 * ac["est_union"]
    assert ac["est_union"] == pytest.approx(1400, rel=0.1)


def test_hll_pairwise_overlap_matches_driver_estimator(spark):
    """est_a/est_b/est_union from the relational expressions equal
    hll_estimate() on the same (collected) registers."""
    from dmid_spark.sketch import hll_estimate, hll_pairwise_overlap, hll_registers

    rows = [("X", u) for u in range(300)] + [("Y", u * 3) for u in range(400)]
    df = spark.createDataFrame(rows, "grp string, user long")
    regs = hll_registers(df, "user", ["grp"], p=8)
    row = hll_pairwise_overlap(regs, "grp", p=8).collect()[0]
    by_grp = {}
    for r in regs.collect():
        by_grp.setdefault(r["grp"], []).append((r["register"], r["rho"]))
    assert row["est_a"] == pytest.approx(hll_estimate(by_grp["X"], p=8), abs=1e-9)
    assert row["est_b"] == pytest.approx(hll_estimate(by_grp["Y"], p=8), abs=1e-9)
    from pyspark.sql import functions as SF

    # union registers across the two groups = register-wise max ignoring grp
    u2 = regs.groupBy("register").agg(SF.max("rho").alias("rho"))
    est_u = hll_estimate([(r["register"], r["rho"]) for r in u2.collect()], p=8)
    assert row["est_union"] == pytest.approx(est_u, abs=1e-9)
