"""SLPA (SURVEY.md §2.4) and winnowing fingerprint tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmid_spark import graph as G
from dmid_spark.algorithms import slpa, slpa_memories, slpa_post_process
from dmid_spark.text import document_fingerprints, fingerprint_overlap_pairs

from fixtures import two_cliques_bridge


@pytest.fixture(scope="module")
def cliques(spark):
    rows, n = two_cliques_bridge(size=5)
    return G.edges_from_rows(spark, rows), n


class TestSlpa:
    def test_memory_totals_and_determinism(self, spark, cliques):
        edges, n = cliques
        mem1, stats = slpa_memories(edges, iterations=5, seed=7)
        rows1 = sorted(map(tuple, mem1.collect()))
        # memory totals: every node spoke-or-echoed once per iteration
        totals = mem1.groupBy("node").agg(F.sum("cnt").alias("t")).collect()
        assert all(r["t"] == 6 for r in totals)
        assert len({r["node"] for r in totals}) == n
        # reruns are bit-identical (seeded hash draws, no Python RNG)
        mem2, _ = slpa_memories(edges, iterations=5, seed=7)
        assert rows1 == sorted(map(tuple, mem2.collect()))
        # a different seed must change at least something
        mem3, _ = slpa_memories(edges, iterations=5, seed=8)
        assert rows1 != sorted(map(tuple, mem3.collect()))

    def test_communities_align_with_cliques(self, spark, cliques):
        edges, n = cliques
        cover, _ = slpa(edges, iterations=20, r=0.3, seed=42)
        rows = cover.collect()
        # every node gets at least one label above threshold
        assert {r["node"] for r in rows} == set(range(n))
        # dominant label of each clique stays inside that clique's id range
        for block in (range(0, 5), range(5, 10)):
            labels = {r["community"] for r in rows if r["node"] in block}
            assert any(l in block for l in labels)

    def test_post_process_threshold(self, spark, cliques):
        edges, _ = cliques
        mem, _ = slpa_memories(edges, iterations=4, seed=1)
        all_rows = slpa_post_process(mem, r=0.0).collect()
        strict = slpa_post_process(mem, r=0.6).collect()
        assert len(strict) <= len(all_rows)
        assert all(r["degree"] >= 0.6 for r in strict)
        # degrees are probabilities: per-node sums ≤ 1 (r=0 ⇒ exactly 1)
        sums = {}
        for r in all_rows:
            sums[r["node"]] = sums.get(r["node"], 0.0) + r["degree"]
        assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


class TestFingerprint:
    def _docs(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        return spark.createDataFrame(
            [
                (0, base),
                (1, base),  # exact copy
                (2, base + " with a tail of different words at the end"),
                (3, "completely unrelated content about spark engines"),
                (4, ""),
                (5, "short"),
            ],
            "doc_id long, text string",
        )

    def test_winnowing_basics(self, spark):
        docs = self._docs(spark)
        fps = document_fingerprints(docs, ngram=3, window=4)
        rows = fps.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        # identical docs → identical fingerprint sets
        assert by_doc[0] == by_doc[1]
        # shared prefix → overlapping but not identical sets
        assert by_doc[0] & by_doc[2]
        assert by_doc[0] != by_doc[2]
        # unrelated → disjoint
        assert not (by_doc[0] & by_doc[3])
        # empty/short docs yield no fingerprints
        assert 4 not in by_doc and 5 not in by_doc

    def test_md5_mode_matches_duckdb(self, spark):
        import duckdb

        docs = self._docs(spark)
        fps = document_fingerprints(docs, ngram=2, window=3, hash_mode="md5")
        got = sorted((r["doc_id"], r["fp"]) for r in fps.collect())
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(
            map(
                tuple,
                con.execute(
                    """
WITH toks AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ts
  FROM documents WHERE trim(text) <> ''
),
grams AS (
  SELECT doc_id, i AS pos, md5(ts[i] || ' ' || ts[i+1]) AS h
  FROM toks, LATERAL unnest(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
)
SELECT DISTINCT doc_id,
  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fp
FROM grams
""").fetchall(),
            )
        )
        assert got == want

    def test_overlap_pairs(self, spark):
        docs = self._docs(spark)
        fps = document_fingerprints(docs, ngram=3, window=4)
        pairs = {(r["doc_a"], r["doc_b"]): r["shared_fps"] for r in fingerprint_overlap_pairs(fps, min_shared=1).collect()}
        assert (0, 1) in pairs  # exact copies share everything
        assert (0, 2) in pairs  # prefix overlap
        assert (0, 3) not in pairs
