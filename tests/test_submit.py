"""End-to-end spark-submit --py-files launch (the north_star launch mode):
package the engine, submit the PageRank job against a real parquet edge
table in a fresh JVM, read back the written ranks."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    from pyspark.sql import functions as F

    from fixtures import random_graph
    from dmid_spark import graph as G
    import oracles as O

    rows, n = random_graph(n=80, seed=5)
    edges_path = str(tmp_path / "edges")
    G.edges_from_rows(spark, rows).write.parquet(edges_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    assert zip_path.endswith("dmid_spark.zip") and os.path.exists(zip_path)

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.modules["pyspark"].__file__)),
        "pyspark", "bin", "spark-submit",
    )
    out_path = str(tmp_path / "ranks")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "pagerank", "--edges", edges_path, "--output", out_path,
            "--tol", "1e-8", "--mode", "csr_rdd",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo root: --py-files must provide the pkg
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["converged"] is True

    got_rows = spark.read.parquet(out_path).collect()
    got = np.zeros(n)
    for row in got_rows:
        got[row["id"]] = row["value"]
    exp, _, _ = O.pagerank(rows, n, tol=1e-8)
    assert np.allclose(got, exp, atol=1e-6)


def test_spark_submit_scc_job(spark, tmp_path):
    """The job-runner dispatch for the round-2 operators, driven through a
    real spark-submit (two cycles joined by a one-way bridge)."""
    from dmid_spark import graph as G

    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
            (10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0),
            (2, 10, 1.0)]
    edges_path = str(tmp_path / "edges")
    G.edges_from_rows(spark, rows).write.parquet(edges_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.modules["pyspark"].__file__)),
        "pyspark", "bin", "spark-submit",
    )
    out_path = str(tmp_path / "scc")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "scc", "--edges", edges_path, "--output", out_path,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["converged"] is True
    got = {row["id"]: row["scc"] for row in spark.read.parquet(out_path).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_spark_submit_pyfiles_random_walks(spark, tmp_path):
    """The session-3 runner dispatch (walks) through the full packaged
    launch: results must equal the in-process operator bit-for-bit (the
    seeded draws are parallelism-independent)."""
    from fixtures import random_graph
    from dmid_spark import graph as G
    from dmid_spark.algorithms import random_walks

    rows, n = random_graph(n=60, seed=9)
    edges_df = G.edges_from_rows(spark, rows)
    edges_path = str(tmp_path / "edges")
    edges_df.write.parquet(edges_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.modules["pyspark"].__file__)),
        "pyspark", "bin", "spark-submit",
    )
    out_path = str(tmp_path / "walks")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "walks", "--edges", edges_path, "--output", out_path,
            "--walk-length", "4", "--seed", "11",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["job"] == "walks" and report["walkers"] > 0

    got = {(x["walk_id"], x["step"], x["node"])
           for x in spark.read.parquet(out_path).collect()}
    exp_df, _ = random_walks(edges_df, walk_length=4, seed=11)
    exp = {(x["walk_id"], x["step"], x["node"]) for x in exp_df.collect()}
    assert got == exp


def test_spark_submit_hyperball_job(spark, tmp_path):
    """Session-4 dispatch: hyperball through a real spark-submit — the nf
    fixpoint on a 4-path must report effective diameter within the hop
    count and converge."""
    from dmid_spark import graph as G

    rows = [(i, i + 1, 1.0) for i in range(4)]
    edges_path = str(tmp_path / "edges")
    G.edges_from_rows(spark, rows).write.parquet(edges_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.modules["pyspark"].__file__)),
        "pyspark", "bin", "spark-submit",
    )
    out_path = str(tmp_path / "hb")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "hyperball", "--edges", edges_path, "--output", out_path,
            "--hll-p", "10",
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["converged"] is True and report["rounds"] <= 4
    assert 0 < report["effective_diameter_90"] <= 4
    assert spark.read.parquet(out_path).count() > 0


def test_spark_submit_spectral_and_matching_jobs(spark, tmp_path):
    """Round-5 job dispatch through a real spark-submit: spectral-embed
    (with eigenvalue report) and matching on the same edge table, plus the
    rmat generator writing straight to parquet."""
    from fixtures import ring_of_cliques
    from dmid_spark import graph as G

    rows, n = ring_of_cliques(k=3, size=4)
    edges_path = str(tmp_path / "edges")
    G.edges_from_rows(spark, rows).write.parquet(edges_path)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.modules["pyspark"].__file__)),
        "pyspark", "bin", "spark-submit",
    )

    emb_path = str(tmp_path / "emb")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "spectral-embed", "--edges", edges_path, "--output", emb_path,
            "--k-dims", "3", "--iterations", "8",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["k"] == 3 and len(report["eigenvalues"].split(",")) == 3
    assert spark.read.parquet(emb_path).count() == n * 3

    m_path = str(tmp_path / "matching")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "matching", "--edges", edges_path, "--output", m_path,
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert report["matched_edges"] >= n // 2 - 2
    matched = spark.read.parquet(m_path).collect()
    seen = [x for row in matched for x in (row["u"], row["v"])]
    assert len(seen) == len(set(seen))

    g_path = str(tmp_path / "rmat")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "run_job.py"),
            "rmat", "--output", g_path, "--scale", "8", "--n-edges", "3000",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    g = spark.read.parquet(g_path)
    assert report["edges"] == g.count() > 0
    from pyspark.sql import functions as SF

    assert g.agg(SF.sum("weight")).first()[0] == 3000.0
