"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2) over
the driver's TPC-H-ish parquet tables; ``oracle_sql()`` gives the DuckDB
twin for every SQL-expressible operator. Graph-shaped inputs are derived
deterministically in-query (FIXTURES.md F7): lineitem → edge table via
``src = l_orderkey % 1000, dst = l_partkey % 1000, weight = count(*)``,
self-loops dropped — so the identical derivation runs on both engines.

Floating-point outputs are rounded (6-9 dp) on BOTH sides: Spark and DuckDB
aggregate in different orders, so unrounded doubles differ in the last bits
and would break the driver's value hash despite being equal to 1e-12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MOD = 1000


# ---------------------------------------------------------------------------
# shared derivations (Spark side)
# ---------------------------------------------------------------------------
def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            (F.col("l_orderkey") % MOD).alias("src"),
            (F.col("l_partkey") % MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# SQL CTE prefix shared by the graph oracles — the same derivation as _edges
_G = f"""
WITH edges AS (
  SELECT CAST(l_orderkey % {MOD} AS BIGINT) AS src,
         CAST(l_partkey % {MOD} AS BIGINT) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM lineitem
  WHERE (l_orderkey % {MOD}) <> (l_partkey % {MOD})
  GROUP BY 1, 2
),
verts AS (SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges),
win AS (
  SELECT v.id, CAST(COALESCE(s.w, 0) AS DOUBLE) AS w_in
  FROM verts v LEFT JOIN (SELECT dst, SUM(weight) AS w FROM edges GROUP BY dst) s
    ON v.id = s.dst
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
dis AS (
  SELECT e.src, e.dst, ABS(wd.w_in - ws.w_in) AS d
  FROM edges e JOIN win ws ON e.src = ws.id JOIN win wd ON e.dst = wd.id
),
disn AS (
  SELECT d.src, d.dst,
         CASE WHEN s.s <> 0 THEN d.d / s.s ELSE 0.0 END AS dis_norm
  FROM dis d JOIN (SELECT dst, SUM(d) AS s FROM dis GROUP BY dst) s ON d.dst = s.dst
),
da1 AS (
  SELECT v.id, CAST(COALESCE(x.v, 0) AS DOUBLE) AS da
  FROM verts v LEFT JOIN (
    SELECT d.dst AS id, SUM(dis_norm / nn.n) AS v FROM disn d CROSS JOIN nn GROUP BY d.dst
  ) x ON v.id = x.id
),
ls AS (
  -- quantized once: Spark and DuckDB sum da in different orders, so the
  -- strict '>' comparisons downstream (g6-g8) must run on identical doubles
  SELECT w.id, ROUND(w.w_in * d.da, 9) AS ls FROM win w JOIN da1 d ON w.id = d.id
)
"""


def _w_in_df(spark, sf_dir):
    from dmid_spark import graph as G

    return G.weighted_in_degrees(_edges(spark, sf_dir))


def _dis_df(spark, sf_dir):
    from dmid_spark import graph as G
    from dmid_spark.algorithms.dmid import disassortativity_edges

    e = _edges(spark, sf_dir)
    return disassortativity_edges(e, G.weighted_in_degrees(e))


def _ls_df(spark, sf_dir):
    """One-RW-step leadership (fixed single iteration, SQL-expressible)."""
    from dmid_spark import graph as G
    from dmid_spark import kernel as K

    e = _edges(spark, sf_dir)
    verts = G.vertices(e)
    n = verts.count()
    dis = _dis_df(spark, sf_dir)
    x0 = verts.select("id", F.lit(1.0 / n).alias("value"))
    da1 = K.complete_vector(K.spmv_join_step(dis, x0), verts)
    w_in = G.weighted_in_degrees(e)
    # quantized (see the ls CTE note in _G): downstream strict comparisons
    # must see identical doubles on both engines
    return w_in.join(da1, "id").select(
        "id", F.round(F.col("w_in") * F.col("value"), 9).alias("ls")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def q_g2(spark, sf_dir):
    return _w_in_df(spark, sf_dir).select("id", F.round("w_in", 6).alias("w_in"))


def q_g3(spark, sf_dir):
    return _dis_df(spark, sf_dir).select(
        "src", "dst", F.round("weight", 9).alias("dis_norm")
    )


def q_g4(spark, sf_dir):
    from dmid_spark import graph as G
    from dmid_spark import kernel as K

    e = _edges(spark, sf_dir)
    verts = G.vertices(e)
    n = verts.count()
    dis = _dis_df(spark, sf_dir)
    x0 = verts.select("id", F.lit(1.0 / n).alias("value"))
    da1 = K.complete_vector(K.spmv_join_step(dis, x0), verts)
    return da1.select("id", F.round("value", 9).alias("da"))


def q_g5(spark, sf_dir):
    return _ls_df(spark, sf_dir).select("id", F.round("ls", 9).alias("ls"))


def q_g6(spark, sf_dir):
    from dmid_spark.algorithms.dmid import influence_rows

    e = _edges(spark, sf_dir)
    ls = _ls_df(spark, sf_dir).withColumnRenamed("ls", "value")
    return influence_rows(e, ls).select(
        "follower", "candidate", F.round("influence", 9).alias("influence")
    )


def q_g7(spark, sf_dir):
    from dmid_spark.algorithms.dmid import follower_degrees, influence_rows

    e = _edges(spark, sf_dir)
    ls = _ls_df(spark, sf_dir).withColumnRenamed("ls", "value")
    fd = follower_degrees(influence_rows(e, ls))
    return fd.select("id", F.round("value", 9).alias("fd"))


def q_g8(spark, sf_dir):
    from dmid_spark.algorithms.dmid import follower_degrees, global_leaders, influence_rows

    e = _edges(spark, sf_dir)
    ls = _ls_df(spark, sf_dir).withColumnRenamed("ls", "value")
    fd = follower_degrees(influence_rows(e, ls))
    return global_leaders(fd, strict=True).select("id")


def q_s11(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count("*").cast("long").alias("weight"))
    )


def q_pagerank5(spark, sf_dir):
    from dmid_spark.algorithms import pagerank

    ranks, _ = pagerank(_edges(spark, sf_dir), tol=-1.0, max_iter=5, mode="join")
    return ranks.select("id", F.round("value", 9).alias("pr"))


def q_cc(spark, sf_dir):
    from dmid_spark.algorithms import connected_components

    labels, _ = connected_components(_edges(spark, sf_dir))
    return labels.select("id", F.col("component").cast("long").alias("component"))


def q_lpa1(spark, sf_dir):
    from dmid_spark.algorithms import label_propagation

    labels, _ = label_propagation(
        _edges(spark, sf_dir), max_iter=1, until_fixpoint=False
    )
    return labels.select("id", F.col("label").cast("long").alias("label"))


def q_triangles(spark, sf_dir):
    from dmid_spark.algorithms import triangle_counts

    counts, _ = triangle_counts(_edges(spark, sf_dir))
    return counts.select("id", F.col("triangles").cast("long").alias("triangles"))


def q_modularity(spark, sf_dir):
    from dmid_spark.metrics import extended_modularity

    e = _edges(spark, sf_dir)
    cover = q_lpa1(spark, sf_dir).select(
        F.col("id").alias("node"), F.col("label").alias("community"), F.lit(1.0).alias("degree")
    )
    q = extended_modularity(e, cover)
    return spark.createDataFrame([(round(q, 6),)], "modularity double")


def q_community_sizes(spark, sf_dir):
    from dmid_spark.metrics import community_sizes

    cover = q_lpa1(spark, sf_dir).select(
        F.col("id").alias("node"), F.col("label").alias("community"), F.lit(1.0).alias("degree")
    )
    return community_sizes(cover).select(
        "community", F.col("size").cast("long").alias("size")
    )


def q_spearman(spark, sf_dir):
    from dmid_spark.metrics import spearman_degree_correlation

    rho = spearman_degree_correlation(_edges(spark, sf_dir))
    return spark.createDataFrame([(round(rho, 6),)], "rho double")


def q_dedup_exact(spark, sf_dir):
    from dmid_spark.text import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select(
        "doc_id", "canonical_id", F.col("cluster_size").cast("long").alias("cluster_size")
    )


def q_ngram_jaccard(spark, sf_dir):
    from dmid_spark.text import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _docs(spark, sf_dir), shingle_n=1, threshold=0.8, max_doc_freq=10**9
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_text_quality(spark, sf_dir):
    from dmid_spark.text import quality_scores

    out = quality_scores(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


def q_lang_id(spark, sf_dir):
    from dmid_spark.text import language_id

    return language_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang_pred", F.col("lang_hits").cast("long").alias("lang_hits")
    )


def q_token_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = F.when(F.trim("text") == "", 0).otherwise(F.size(F.split(F.trim("text"), r"\s+")))
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


def q_ann_topk(spark, sf_dir):
    from dmid_spark.sim import brute_force_topk

    emb = _emb(spark, sf_dir)
    out = brute_force_topk(emb, emb.filter("vec_id < 5"), k=10)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
        F.round("cosine", 6).alias("cosine"),
    )


def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select("user_id", F.col("ts").cast("timestamp").cast("long").alias("t"))
    w = Window.partitionBy("user_id").orderBy("t")
    s = ev.withColumn("pt", F.lag("t").over(w)).withColumn(
        "brk", F.when(F.col("pt").isNull() | (F.col("t") - F.col("pt") > 1800), 1).otherwise(0)
    )
    return s.groupBy("user_id").agg(
        F.sum("brk").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


def q_tumbling(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            F.floor(F.col("ts").cast("timestamp").cast("long") / 300).cast("long").alias("win"),
            "event_type",
            "value",
        )
        .groupBy("win", "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 6).alias("total"))
    )


def q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


# --- non-SQL-expressible (rows-only checks): full iterative pipelines -----
def q_pagerank_conv(spark, sf_dir):
    from dmid_spark.algorithms import pagerank

    ranks, _ = pagerank(_edges(spark, sf_dir), tol=1e-6, mode="join")
    return ranks.select("id", F.round("value", 9).alias("pr"))


def q_dmid_cover(spark, sf_dir):
    from dmid_spark.algorithms import dmid, DmidParams

    res = dmid(_edges(spark, sf_dir), DmidParams(tol=1e-6))
    return res.cover.select("node", "community", F.round("degree", 9).alias("degree"))


def q_minhash_lsh(spark, sf_dir):
    from dmid_spark.text import minhash_lsh_candidates, minhash_signatures

    sigs = minhash_signatures(_docs(spark, sf_dir), shingle_n=3, num_hashes=32)
    out = minhash_lsh_candidates(sigs, bands=8)
    return out.select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_simhash_neardup(spark, sf_dir):
    from dmid_spark.text import simhash, simhash_near_duplicates

    sims = simhash(_docs(spark, sf_dir).filter("text <> ''"))
    return simhash_near_duplicates(sims, max_hamming=10).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_ann_ivf(spark, sf_dir):
    from dmid_spark.sim import ivf_build, ivf_topk

    emb = _emb(spark, sf_dir)
    assigned, cents = ivf_build(emb, n_centroids=8)
    out = ivf_topk(assigned, cents, emb.filter("vec_id < 5"), k=10, n_probe=3)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
        F.round("cosine", 6).alias("cosine"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 lineitem → edge table → PageRank to 1e-6."""
    return q_pagerank_conv(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "g2_weighted_indegree": q_g2,
        "g3_dis_norm": q_g3,
        "g4_spmv_step": q_g4,
        "g5_leadership": q_g5,
        "g6_influence_filter": q_g6,
        "g7_follower_degree": q_g7,
        "g8_global_leaders": q_g8,
        "s11_cooccurrence_pairs": q_s11,
        "x1_pagerank_5iter": q_pagerank5,
        "x1_pagerank_converged": q_pagerank_conv,
        "x2_connected_components": q_cc,
        "x3_lpa_1iter": q_lpa1,
        "x4_triangle_counts": q_triangles,
        "m1_extended_modularity": q_modularity,
        "m4_spearman_degree_corr": q_spearman,
        "m5_community_sizes": q_community_sizes,
        "dmid_cover": q_dmid_cover,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_minhash_lsh": q_minhash_lsh,
        "dedup_simhash": q_simhash_neardup,
        "text_quality": q_text_quality,
        "text_lang_id": q_lang_id,
        "text_token_stats": q_token_stats,
        "ann_cosine_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf,
        "events_sessionize": q_sessionize,
        "events_tumbling_window": q_tumbling,
        "tpch_q1": q_tpch_q1,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------
def _lang_hits_sql(words: list[str]) -> str:
    pads = " ' ' || lower(text) || ' ' "
    terms = [
        f"CAST((length({pads}) - length(replace({pads}, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in words
    ]
    return " + ".join(terms)


def _pagerank5_sql() -> str:
    """5 unrolled PageRank iterations with dangling-mass redistribution."""
    steps = []
    prev = "pr0"
    steps.append(
        "pr0 AS (SELECT v.id, 1.0/nn.n AS pr FROM verts v CROSS JOIN nn)"
    )
    for i in range(1, 6):
        steps.append(f"""
dang{i} AS (
  SELECT COALESCE(SUM(p.pr), 0) AS dm FROM {prev} p
  WHERE p.id NOT IN (SELECT DISTINCT src FROM edges)
),
pr{i} AS (
  SELECT v.id,
         (1 - 0.85)/nn.n + 0.85 * (COALESCE(c.contrib, 0) + d.dm/nn.n) AS pr
  FROM verts v CROSS JOIN nn CROSS JOIN dang{i} d
  LEFT JOIN (
    SELECT e.dst AS id, SUM(p.pr / od.o) AS contrib
    FROM edges e
    JOIN {prev} p ON e.src = p.id
    JOIN (SELECT src, CAST(COUNT(*) AS DOUBLE) AS o FROM edges GROUP BY src) od
      ON e.src = od.src
    GROUP BY e.dst
  ) c ON v.id = c.id
)""")
        prev = f"pr{i}"
    return ",\n".join(steps) + f"\nSELECT id, ROUND(pr, 9) AS pr FROM {prev}"


def oracle_sql() -> dict[str, str]:
    sw = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
          "that", "for", "on", "with", "as", "at", "by", "this"]
    langs = {
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "la", "de", "que", "los"],
        "de": ["der", "die", "und", "das", "ist"],
        "fr": ["le", "la", "les", "et", "est"],
    }
    hits_cols = ",\n".join(
        f"{_lang_hits_sql(ws)} AS hits_{lang}" for lang, ws in langs.items()
    )
    best = "GREATEST(hits_de, hits_en, hits_es, hits_fr)"
    lang_case = (
        f"CASE WHEN hits_de = {best} AND {best} > 0 THEN 'de' "
        f"WHEN hits_en = {best} AND {best} > 0 THEN 'en' "
        f"WHEN hits_es = {best} AND {best} > 0 THEN 'es' "
        f"WHEN hits_fr = {best} AND {best} > 0 THEN 'fr' ELSE 'und' END"
    )
    stop_hits = _lang_hits_sql(sw)

    return {
        "g2_weighted_indegree": _G + "SELECT id, ROUND(w_in, 6) AS w_in FROM win",
        "g3_dis_norm": _G + "SELECT src, dst, ROUND(dis_norm, 9) AS dis_norm FROM disn",
        "g4_spmv_step": _G + "SELECT id, ROUND(da, 9) AS da FROM da1",
        "g5_leadership": _G + "SELECT id, ROUND(ls, 9) AS ls FROM ls",
        "g6_influence_filter": _G + """
, inf AS (
  SELECT e.src AS follower, e.dst AS candidate, e.weight * lv.ls AS influence
  FROM edges e
  JOIN ls lv ON e.dst = lv.id
  JOIN ls lu ON e.src = lu.id
  LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
  WHERE r.src IS NULL OR e.weight * lv.ls > r.weight * lu.ls
)
SELECT follower, candidate, ROUND(influence, 9) AS influence FROM inf""",
        "g7_follower_degree": _G + """
, inf AS (
  SELECT e.src AS follower, e.dst AS candidate, e.weight * lv.ls AS influence
  FROM edges e
  JOIN ls lv ON e.dst = lv.id
  JOIN ls lu ON e.src = lu.id
  LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
  WHERE r.src IS NULL OR e.weight * lv.ls > r.weight * lu.ls
),
mx AS (SELECT follower, MAX(influence) AS m FROM inf GROUP BY follower),
winners AS (
  SELECT i.follower, i.candidate FROM inf i JOIN mx ON i.follower = mx.follower AND i.influence = mx.m
),
ks AS (SELECT follower, COUNT(*) AS k FROM winners GROUP BY follower)
SELECT w.candidate AS id, ROUND(SUM(1.0 / ks.k), 9) AS fd
FROM winners w JOIN ks ON w.follower = ks.follower GROUP BY w.candidate""",
        "g8_global_leaders": _G + """
, inf AS (
  SELECT e.src AS follower, e.dst AS candidate, e.weight * lv.ls AS influence
  FROM edges e
  JOIN ls lv ON e.dst = lv.id
  JOIN ls lu ON e.src = lu.id
  LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
  WHERE r.src IS NULL OR e.weight * lv.ls > r.weight * lu.ls
),
mx AS (SELECT follower, MAX(influence) AS m FROM inf GROUP BY follower),
winners AS (
  SELECT i.follower, i.candidate FROM inf i JOIN mx ON i.follower = mx.follower AND i.influence = mx.m
),
ks AS (SELECT follower, COUNT(*) AS k FROM winners GROUP BY follower),
fd AS (
  SELECT w.candidate AS id, SUM(1.0 / ks.k) AS fd
  FROM winners w JOIN ks ON w.follower = ks.follower GROUP BY w.candidate
),
avgfd AS (SELECT SUM(fd)/COUNT(*) AS a FROM fd WHERE fd <> 0)
SELECT id FROM fd CROSS JOIN avgfd WHERE fd > a""",
        "s11_cooccurrence_pairs": """
SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2""",
        "x1_pagerank_5iter": _G + ", " + _pagerank5_sql(),
        "x2_connected_components": _G.replace("WITH edges", "WITH RECURSIVE edges") + """
, sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
  SELECT id AS node, id AS lbl FROM verts
  UNION
  SELECT s.dst AS node, r.lbl FROM reach r JOIN sym s ON s.src = r.node
)
SELECT node AS id, CAST(MIN(lbl) AS BIGINT) AS component FROM reach GROUP BY node""",
        "x3_lpa_1iter": _G + """
, counts AS (
  SELECT e.dst AS v, e.src AS label_src, COUNT(*) AS c
  FROM edges e GROUP BY e.dst, e.src
),
agg AS (SELECT v, label_src AS label, c FROM counts),
best AS (
  SELECT v, label FROM (
    SELECT v, label, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn FROM agg
  ) WHERE rn = 1
)
SELECT v.id, CAST(COALESCE(b.label, v.id) AS BIGINT) AS label
FROM verts v LEFT JOIN best b ON v.id = b.v""",
        "x4_triangle_counts": _G + """
, und AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges GROUP BY 1, 2
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
),
pv AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v.id, CAST(COALESCE(t.c, 0) AS BIGINT) AS triangles
FROM verts v LEFT JOIN (SELECT id, COUNT(*) AS c FROM pv GROUP BY id) t ON v.id = t.id""",
        "m1_extended_modularity": _G + """
, counts AS (SELECT e.dst AS v, e.src AS label, COUNT(*) AS c FROM edges e GROUP BY 1, 2),
best AS (
  SELECT v, label FROM (
    SELECT v, label, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn FROM counts
  ) WHERE rn = 1
),
cover AS (
  SELECT v.id AS node, CAST(COALESCE(b.label, v.id) AS BIGINT) AS community, 1.0 AS degree
  FROM verts v LEFT JOIN best b ON v.id = b.v
),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM edges),
ec AS (
  SELECT cu.community, SUM(cu.degree * cv.degree) AS e_c
  FROM edges e
  JOIN cover cu ON e.src = cu.node
  JOIN cover cv ON e.dst = cv.node AND cv.community = cu.community
  GROUP BY cu.community
),
degs AS (
  SELECT c.community,
         SUM(c.degree * COALESCE(od.o, 0)) AS s_out,
         SUM(c.degree * COALESCE(idg.i, 0)) AS s_in,
         SUM(c.degree) AS norm1
  FROM cover c
  LEFT JOIN (SELECT src, COUNT(*) AS o FROM edges GROUP BY src) od ON c.node = od.src
  LEFT JOIN (SELECT dst, COUNT(*) AS i FROM edges GROUP BY dst) idg ON c.node = idg.dst
  GROUP BY c.community
)
SELECT ROUND(SUM(COALESCE(ec.e_c, 0) - d.norm1 * d.norm1 * d.s_out * d.s_in
  / (nn.n * nn.n * m.m)) / ANY_VALUE(m.m), 6) AS modularity
FROM degs d LEFT JOIN ec ON d.community = ec.community CROSS JOIN nn CROSS JOIN m""",
        "m4_spearman_degree_corr": _G + """
, e2 AS (
  SELECT e.src, e.dst,
         CAST(od.o AS DOUBLE) AS x, CAST(idg.i AS DOUBLE) AS y
  FROM edges e
  JOIN (SELECT src, COUNT(*) AS o FROM edges GROUP BY src) od ON e.src = od.src
  JOIN (SELECT dst, COUNT(*) AS i FROM edges GROUP BY dst) idg ON e.dst = idg.dst
),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY x, src, dst) AS DOUBLE) AS rx,
         CAST(ROW_NUMBER() OVER (ORDER BY y, src, dst) AS DOUBLE) AS ry
  FROM e2
)
SELECT ROUND(corr(rx, ry), 6) AS rho FROM ranked""",
        "m5_community_sizes": _G + """
, counts AS (SELECT e.dst AS v, e.src AS label, COUNT(*) AS c FROM edges e GROUP BY 1, 2),
best AS (
  SELECT v, label FROM (
    SELECT v, label, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn FROM counts
  ) WHERE rn = 1
),
cover AS (
  SELECT v.id AS node, CAST(COALESCE(b.label, v.id) AS BIGINT) AS community
  FROM verts v LEFT JOIN best b ON v.id = b.v
)
SELECT community, CAST(COUNT(DISTINCT node) AS BIGINT) AS size FROM cover GROUP BY community""",
        "dedup_exact": """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
c AS (SELECT h, MIN(doc_id) AS canonical_id, COUNT(*) AS cluster_size FROM h GROUP BY h)
SELECT h.doc_id, c.canonical_id, CAST(c.cluster_size AS BIGINT) AS cluster_size
FROM h JOIN c ON h.h = c.h WHERE c.cluster_size >= 2""",
        "dedup_ngram_jaccard": """
WITH toks AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM toks a JOIN toks b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8""",
        "text_quality": f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split(trim(text), ' ')) END AS BIGINT) AS n_tokens,
  ROUND(length(text) / GREATEST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split(trim(text), ' ')) END, 1), 6) AS mean_token_len,
  ROUND(({stop_hits}) / GREATEST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split(trim(text), ' ')) END, 1), 6) AS stopword_ratio
FROM documents""",
        "text_lang_id": f"""
WITH scored AS (SELECT doc_id, {hits_cols} FROM documents)
SELECT doc_id, {lang_case} AS lang_pred, CAST({best} AS BIGINT) AS lang_hits FROM scored""",
        "text_token_stats": """
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split(trim(text), ' ')) END) AS BIGINT) AS total_tokens,
  ROUND(AVG(length(text)), 6) AS avg_chars
FROM documents GROUP BY source""",
        "ann_cosine_topk": """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (
  SELECT q.qid, c.nid,
         list_dot_product(qv, cv) /
         GREATEST(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)), 1e-12) AS cos
  FROM q CROSS JOIN c WHERE q.qid <> c.nid
),
r AS (SELECT qid, nid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(nid AS BIGINT) AS neighbor_id,
       CAST(rn AS BIGINT) AS rank, ROUND(cos, 6) AS cosine
FROM r WHERE rn <= 10""",
        "events_sessionize": """
WITH ev AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
l AS (SELECT user_id, t, LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM ev),
s AS (SELECT user_id, CASE WHEN pt IS NULL OR t - pt > 1800 THEN 1 ELSE 0 END AS brk FROM l)
SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions, CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id""",
        "events_tumbling_window": """
SELECT CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 300.0) AS BIGINT) AS win, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 6) AS total
FROM events GROUP BY 1, 2""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        # x1_pagerank_converged, dmid_cover, dedup_minhash_lsh, dedup_simhash,
        # ann_ivf_topk: iterative-to-convergence / hash-seeded / ANN-recall
        # operators — intentionally no SQL twin (driver rows-only check);
        # exactness is covered by the NumPy-oracle pytest suite instead.
    }
