"""Source-code corpus → link-graph edge table (SURVEY.md §2.1 S11).

The BASELINE.json ``input_hint`` mandates the engine's raw input shape:
an Iceberg-style table ``(repo, path, commit, lang, content)`` of source-code
repositories. This module provides

- a deterministic synthetic corpus generator (FIXTURES.md F1) with planted
  overlapping clusters and a hub repo (skew driver), built entirely from
  Spark column expressions (xxhash64-seeded, no per-row Python, reproducible
  at any scale and parallelism);
- the co-occurrence edge builder: repos sharing a commit, plus explicit
  ``import repoNNNN`` references in file contents;
- the ingest invariant: ``sha2(content, 256)`` equality against the source
  table (BASELINE.json north_star).

At 100 TB the corpus table dominates; the builder only ever touches the
narrow projection (repo, commit) / (repo, content) and aggregates early, so
column pruning reaches the scan. The commit self-join is capped by
``max_fanout`` (a commit touching k files yields O(k²) pairs — SURVEY.md §7
hazard (e)); dropped commits are counted and reported, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content", "content_sha"]
_LANGS = ["py", "java", "go", "rs"]


def _h(*cols):
    """Deterministic non-negative pseudo-random stream from column values."""
    return F.abs(F.xxhash64(*cols))


def generate_corpus(
    spark: SparkSession,
    n_repos: int = 100,
    n_commits: int = 400,
    n_clusters: int = 5,
    seed: int = 42,
    hub_fraction: int = 5,  # 1/hub_fraction of commits touch the hub repo
    cross_pct: int = 5,  # % of slots landing outside the commit's cluster
    popularity_skew: bool = False,
) -> DataFrame:
    """Deterministic synthetic corpus (FIXTURES.md F1).

    Repos are grouped into ``n_clusters`` contiguous blocks; each commit
    touches 2-8 repos drawn (mostly) from one cluster, so the derived
    co-occurrence graph has planted community structure. Repo 0 is a hub
    appearing in ~1/hub_fraction of commits (exercises degree skew).
    Contents embed ``import repoNNNN`` lines (the import-edge driver).

    ``popularity_skew=True`` draws the within-cluster repo index as the
    scaled product of two uniforms (min-biased), giving each cluster a
    heavy-tailed popularity profile instead of uniform touch counts — a
    heterogeneous degree distribution so DMID's random walk has real
    structure to converge over (non-degenerate bench graphs). Default off:
    every existing fixture and oracle-verified result is byte-identical.
    """
    cluster_size = max(1, n_repos // n_clusters)
    commits = (
        spark.range(n_commits)
        .withColumn("commit", F.format_string("c%08x", _h(F.col("id"), F.lit(seed)) % 2**31))
        .withColumn("cluster", (_h("id", F.lit(seed + 1)) % n_clusters).cast("int"))
        .withColumn("fanout", (2 + _h("id", F.lit(seed + 2)) % 7).cast("int"))
        .withColumn("is_hub", (_h("id", F.lit(seed + 3)) % hub_fraction) == 0)
    )
    slots = commits.select(
        "id", "commit", "cluster", "is_hub", F.explode(F.sequence(F.lit(0), F.col("fanout") - 1)).alias("slot")
    )
    slot_h = _h("id", "slot", F.lit(seed + 4))
    if popularity_skew:
        # product of two uniforms over [0, c) scaled back to [0, c):
        # min-biased → heavy-tailed per-repo popularity within the cluster
        local = (
            (slot_h % cluster_size) * (_h("id", "slot", F.lit(seed + 13)) % cluster_size)
        ) / F.lit(cluster_size)
        in_cluster = F.col("cluster") * cluster_size + F.floor(local)
    else:
        in_cluster = F.col("cluster") * cluster_size + (slot_h % cluster_size)
    anywhere = _h("id", "slot", F.lit(seed + 5)) % n_repos
    rows = slots.withColumn(
        "repo_id",
        F.when(_h("id", "slot", F.lit(seed + 6)) % 100 < cross_pct, anywhere).otherwise(in_cluster).cast("long"),
    )
    hub_rows = commits.filter("is_hub").select(
        "id", "commit", "cluster", "is_hub", F.lit(-1).alias("slot"), F.lit(0).cast("long").alias("repo_id")
    )
    rows = rows.select("id", "commit", "cluster", "is_hub", "slot", "repo_id").unionByName(hub_rows).dropDuplicates(
        ["commit", "repo_id"]
    )
    # imports: each file references 2 repos from the same cluster block
    imp1 = (F.col("repo_id") - (F.col("repo_id") % cluster_size)) + (_h("id", "slot", F.lit(seed + 7)) % cluster_size)
    imp2 = (F.col("repo_id") - (F.col("repo_id") % cluster_size)) + (_h("id", "slot", F.lit(seed + 8)) % cluster_size)
    corpus = rows.select(
        F.format_string("repo%04d", F.col("repo_id")).alias("repo"),
        F.format_string(
            "src/m%d/f%d.py", _h("id", "slot", F.lit(seed + 9)) % 4, _h("id", "slot", F.lit(seed + 10)) % 20
        ).alias("path"),
        F.col("commit"),
        F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (_h("repo_id") % 4 + 1).cast("int")).alias("lang"),
        F.format_string(
            "import repo%04d\nimport repo%04d\n\ndef body_%d():\n    return %d\n",
            imp1,
            imp2,
            _h("id", "slot", F.lit(seed + 11)) % 10**6,
            _h("id", "slot", F.lit(seed + 12)) % 10**9,
        ).alias("content"),
    ).withColumn("content_sha", F.sha2("content", 256))
    return corpus


def verify_sha256(ingested: DataFrame) -> int:
    """Ingest invariant: recomputed sha2(content, 256) must equal the
    source-recorded ``content_sha`` on every row. Returns the number of
    violating rows (0 = invariant holds)."""
    return ingested.filter(F.sha2("content", 256) != F.col("content_sha")).count()


def repo_id(col) -> F.Column:
    """Node id for a repo name 'repoNNNN' → NNNN."""
    return F.regexp_extract(col, r"repo(\d+)", 1).cast("long")


def cooccurrence_edges(
    corpus: DataFrame, max_fanout: int = 32
) -> tuple[DataFrame, int]:
    """Repo-level co-occurrence via shared commits.

    Weight(a, b) = number of distinct commits touching both repos. Emitted
    symmetric (both directions), self-loops excluded. Commits touching more
    than ``max_fanout`` distinct repos are excluded from pairing (quadratic
    blow-up cap, SURVEY.md §7(e)); the count of dropped commits is returned
    alongside — never silently.
    """
    touched = corpus.select("commit", repo_id(F.col("repo")).alias("node")).distinct()
    fanout = touched.groupBy("commit").agg(F.count("*").alias("fanout"))
    dropped = fanout.filter(F.col("fanout") > max_fanout).count()
    ok = touched.join(
        fanout.filter(F.col("fanout") <= max_fanout).select("commit"), "commit"
    )
    a = ok.select("commit", F.col("node").alias("src"))
    b = ok.select("commit", F.col("node").alias("dst"))
    pairs = (
        a.join(b, "commit")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return sym, dropped


def import_edges(corpus: DataFrame) -> DataFrame:
    """Directed import references: repo a → repo b when a file of a contains
    ``import repoNNNN`` (b). Weight = number of referencing files.
    Self-imports excluded."""
    refs = corpus.select(
        repo_id(F.col("repo")).alias("src"),
        F.explode(F.expr(r"regexp_extract_all(content, 'import (repo\\d+)', 1)")).alias("ref"),
    )
    return (
        refs.select("src", repo_id(F.col("ref")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def build_edges(
    corpus: DataFrame, max_fanout: int = 32, include_imports: bool = True
) -> tuple[DataFrame, dict]:
    """Full S11 edge build: co-occurrence ∪ imports, weights summed.
    Returns (edges, info) with info = {'dropped_commits': int}."""
    cooc, dropped = cooccurrence_edges(corpus, max_fanout=max_fanout)
    edges = cooc
    if include_imports:
        edges = edges.unionByName(import_edges(corpus))
    edges = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    return edges, {"dropped_commits": dropped}
