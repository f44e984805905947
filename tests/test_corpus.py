from __future__ import annotations

from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

from dmid_spark import corpus as C


def small_corpus(spark):
    return C.generate_corpus(spark, n_repos=20, n_commits=60, n_clusters=4, seed=7)


def test_corpus_shape_and_determinism(spark):
    c1 = small_corpus(spark)
    assert c1.columns == C.CORPUS_COLUMNS
    rows1 = sorted(map(tuple, c1.collect()))
    rows2 = sorted(map(tuple, small_corpus(spark).collect()))
    assert rows1 == rows2  # fully deterministic
    assert len(rows1) > 60
    langs = {r[3] for r in rows1}
    assert langs <= {"py", "java", "go", "rs"}


def test_sha256_invariant_holds_and_detects_tamper(spark):
    c = small_corpus(spark)
    assert C.verify_sha256(c) == 0
    tampered = c.withColumn(
        "content",
        F.when(F.col("repo") == "repo0001", F.concat(F.col("content"), F.lit("x"))).otherwise(
            F.col("content")
        ),
    )
    n_bad = C.verify_sha256(tampered)
    n_repo1 = c.filter("repo = 'repo0001'").count()
    assert n_bad == n_repo1 > 0


def test_cooccurrence_edges_match_bruteforce(spark):
    c = small_corpus(spark)
    edges, dropped = C.cooccurrence_edges(c, max_fanout=32)
    assert dropped == 0
    got = {(r.src, r.dst): r.weight for r in edges.collect()}
    # brute-force recomputation in Python
    touched = {}
    for r in c.select("commit", "repo").distinct().collect():
        touched.setdefault(r["commit"], set()).add(int(r["repo"][4:]))
    exp = Counter()
    for repos in touched.values():
        for a, b in combinations(sorted(repos), 2):
            exp[(a, b)] += 1
            exp[(b, a)] += 1
    assert got == {k: float(v) for k, v in exp.items()}
    # symmetric, no self-loops
    assert all(s != d for s, d in got)
    assert all((d, s) in got for s, d in got)


def test_fanout_cap_reports_dropped(spark):
    c = small_corpus(spark)
    edges_all, d0 = C.cooccurrence_edges(c, max_fanout=32)
    edges_cap, d1 = C.cooccurrence_edges(c, max_fanout=3)
    assert d0 == 0 and d1 > 0
    assert edges_cap.count() < edges_all.count()


def test_import_edges_match_bruteforce(spark):
    c = small_corpus(spark)
    got = {(r.src, r.dst): r.weight for r in C.import_edges(c).collect()}
    exp = Counter()
    for r in c.select("repo", "content").collect():
        src = int(r["repo"][4:])
        for line in r["content"].splitlines():
            if line.startswith("import repo"):
                dst = int(line[len("import repo"):])
                if dst != src:
                    exp[(src, dst)] += 1
    assert got == {k: float(v) for k, v in exp.items()}


def test_build_edges_union(spark):
    c = small_corpus(spark)
    edges, info = C.build_edges(c)
    assert info["dropped_commits"] == 0
    cooc = {(r.src, r.dst): r.weight for r in C.cooccurrence_edges(c)[0].collect()}
    imp = {(r.src, r.dst): r.weight for r in C.import_edges(c).collect()}
    got = {(r.src, r.dst): r.weight for r in edges.collect()}
    keys = set(cooc) | set(imp)
    assert got == {k: cooc.get(k, 0.0) + imp.get(k, 0.0) for k in keys}
    # hub repo 0 should be high-degree (skew planted)
    from collections import defaultdict
    deg = defaultdict(int)
    for s, _ in got:
        deg[s] += 1
    assert deg[0] == max(deg.values())
