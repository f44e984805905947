from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import oracles as O
from fixtures import GOLDEN_EDGES, GOLDEN_N, random_graph
from dmid_spark import graph as G
from dmid_spark import kernel as K
from dmid_spark.checkpoint import CheckpointManager


def state_df(spark, x):
    return spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(x)], schema=K.STATE_SCHEMA
    )


def vec(df, n, default=0.0):
    out = np.full(n, default)
    for r in df.collect():
        out[r["id"]] = r["value"]
    return out


def test_spmv_join_matches_oracle(spark):
    rows, n = random_graph(n=60, seed=11)
    edges = G.edges_from_rows(spark, rows)
    x = np.linspace(0.1, 1.0, n)
    W = O.adj_matrix(rows, n)
    exp = x @ W
    got = vec(K.spmv_join_step(edges, state_df(spark, x)), n)
    assert np.allclose(got, exp)


def test_spmv_csr_matches_join(spark):
    rows, n = random_graph(n=60, seed=13)
    edges = G.edges_from_rows(spark, rows)
    x = np.linspace(0.5, 2.0, n)
    buckets = K.build_csr_buckets(edges, n, num_buckets=4)
    got_csr = K.spmv_csr_collect(buckets, x)
    exp = x @ O.adj_matrix(rows, n)
    assert np.allclose(got_csr, exp)
    buckets.bucketed.unpersist()


def test_spmv_rdd_and_jvm_match_join(spark):
    rows, n = random_graph(n=60, seed=13)
    edges = G.edges_from_rows(spark, rows)
    x = np.linspace(0.5, 2.0, n)
    exp = x @ O.adj_matrix(rows, n)
    blocks = K.build_csr_rdd(edges, n, num_parts=4)
    got_rdd = K.spmv_rdd_collect(blocks, x)
    blocks.unpersist()
    assert np.allclose(got_rdd, exp)
    jv = K.build_jvm_edges(edges, n, num_parts=4)
    got_jvm = K.spmv_jvm_collect(jv, x)
    jv.unpersist()
    assert np.allclose(got_jvm, exp)


def test_iterate_converges_and_checkpoints(spark, tmp_ckpt_dir):
    rows, n = GOLDEN_EDGES, GOLDEN_N
    edges = G.edges_from_rows(spark, rows)
    verts = G.vertices(edges)
    T = O.dis_matrix(rows, n)
    exp, exp_iters, _ = O.random_walk(T, tol=1e-6)

    # build dis-normalized edges via oracle for this kernel-only test
    dis_rows = [
        (s, d, float(T[s, d])) for s, d, _ in rows if T[s, d] != 0
    ]
    dis = G.edges_from_rows(spark, dis_rows)

    def step(x, i):
        return K.complete_vector(
            K.spmv_join_step(dis, x), verts
        )

    ckpt = CheckpointManager(spark, tmp_ckpt_dir, "rw")
    x0 = state_df(spark, np.full(n, 1.0 / n))
    xf, stats = K.iterate(x0, step, tol=1e-6, max_iter=200, ckpt=ckpt, ckpt_every=5, name="da")
    assert stats.converged
    assert stats.iterations == exp_iters
    assert np.allclose(vec(xf, n), exp, atol=1e-9)
    # lineage records exist with per-partition manifests + metrics
    recs = ckpt.lineage("da")
    assert recs and all(r["partitions"] for r in recs)
    assert "l1_delta" in recs[-1]["metrics"]


def test_iterate_resume_bit_identical(spark, tmp_ckpt_dir):
    rows, n = random_graph(n=40, seed=17)
    edges = G.edges_from_rows(spark, rows)
    verts = G.vertices(edges)
    # PageRank-ish contraction so it converges
    odeg = G.out_degrees(edges).select(F.col("id").alias("oid"), "out_deg")
    norm = edges.join(odeg, edges.src == F.col("oid")).select(
        "src", "dst", (F.lit(0.85) / F.col("out_deg")).alias("weight")
    )

    def step(x, i):
        y = K.spmv_join_step(norm, x)
        return K.complete_vector(y, verts).select(
            "id", (F.col("value") + (1 - 0.85) / n).alias("value")
        )

    x0 = state_df(spark, np.full(n, 1.0 / n))
    ckpt_a = CheckpointManager(spark, tmp_ckpt_dir, "a")
    xf_full, st_full = K.iterate(x0, step, tol=1e-9, max_iter=30, ckpt=ckpt_a, ckpt_every=5, name="pr")

    # interrupted run: stop at 10 iterations, then resume from checkpoint
    ckpt_b = CheckpointManager(spark, tmp_ckpt_dir, "b")
    K.iterate(x0, step, tol=1e-9, max_iter=10, ckpt=ckpt_b, ckpt_every=5, name="pr")
    xf_res, st_res = K.iterate(
        x0, step, tol=1e-9, max_iter=30, ckpt=ckpt_b, ckpt_every=5, name="pr", resume=True
    )
    a, b = vec(xf_full, n), vec(xf_res, n)
    assert np.array_equal(a, b)  # bit-identical
    assert st_res.iterations == st_full.iterations


def test_deterministic_sum_is_layout_proof(spark):
    import math

    import pandas as pd
    import pytest

    rng = np.random.default_rng(3)
    vals = rng.random(5000) * 1e-3
    pdf = pd.DataFrame({"id": np.arange(5000, dtype=np.int64), "value": vals})
    df = spark.createDataFrame(pdf)
    a = K.deterministic_sum(df, "id", "value")
    b = K.deterministic_sum(df.repartition(17), "id", "value")
    c = K.deterministic_sum(df.repartition(3).sortWithinPartitions(F.desc("value")), "id", "value")
    assert a == b == c  # bit-identical across layouts
    assert a == pytest.approx(math.fsum(vals), rel=1e-12)
    # empty input
    empty = spark.createDataFrame([], "id long, value double")
    assert K.deterministic_sum(empty, "id", "value") == 0.0


def test_distributed_cumsum_matches_sequential(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cs"]
        for r in K.distributed_cumsum(df, ["id"], "v", out_col="cs").collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows):
        want[i] = acc
        acc += v
    assert got == want
