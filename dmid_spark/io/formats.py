"""Graph / cover text-format converters (SURVEY.md §2.1 S1-S8).

These are test-utility fidelity shims around the engine's native parquet
edge tables — the formats the reference reads/writes:

- DMID adjacency JSON: one vertex per line, ``[id,[[dst,w],...]]``
  (README.md:312; DMID/io/formats/DMIDVertexInputFormat.java:40-90;
  Metrics Main.readDMIDInputFormat, Main.java:785-843 — isolated vertices,
  i.e. lines with empty edge arrays, are kept).
- DMID cover JSON: ``[node,[[community,degree],...]]`` with zero-degree
  entries dropped (DMIDVertexOutputFormat.java:34-69).
- SNAP edge list: ``src<TAB>dst`` with ``#`` comments; self-loops dropped;
  undirected inputs symmetrized (Main.readGraph, Main.java:588-649).
- DOCA cover: one community per line as a whitespace-separated node list
  (Main.formatCoverFromDOCAtoDMID, Main.java:387-455).

All parsing happens JVM-side via from_json/split — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ADJ_SCHEMA = "array<array<double>>"


def read_dmid_adjacency(spark: SparkSession, path_or_df) -> tuple[DataFrame, DataFrame]:
    """Parse DMID adjacency JSON lines → (edges(src,dst,weight),
    vertices(id)). Vertices includes isolated ids (empty adjacency)."""
    lines = (
        path_or_df
        if isinstance(path_or_df, DataFrame)
        else spark.read.text(path_or_df)
    )
    parsed = lines.select(
        F.get_json_object("value", "$[0]").cast("long").alias("id"),
        F.from_json(F.get_json_object("value", "$[1]"), ADJ_SCHEMA).alias("adj"),
    ).filter(F.col("id").isNotNull())
    verts = parsed.select("id").distinct()
    edges = (
        parsed.select("id", F.explode("adj").alias("e"))
        .select(
            F.col("id").alias("src"),
            F.col("e")[0].cast("long").alias("dst"),
            F.col("e")[1].cast("double").alias("weight"),
        )
    )
    return edges, verts


def write_dmid_adjacency_lines(edges: DataFrame, verts: DataFrame | None = None) -> DataFrame:
    """Edges → DMID adjacency JSON lines (one per vertex); isolated vertices
    emit empty adjacency arrays. Returns a single-column 'value' DataFrame
    (write with .write.text)."""
    adj = edges.groupBy(F.col("src").alias("id")).agg(
        F.to_json(
            F.array_sort(F.collect_list(F.array(F.col("dst").cast("double"), F.col("weight"))))
        ).alias("adj_json")
    )
    if verts is not None:
        adj = verts.join(adj, "id", "left").fillna("[]", subset=["adj_json"])
    return adj.select(
        F.format_string("[%d,%s]", F.col("id"), F.col("adj_json")).alias("value")
    )


def read_snap_edge_list(
    spark: SparkSession, path_or_df, directed: bool = True
) -> DataFrame:
    """SNAP ``src\\tdst`` lines (``#`` comments) → edges with unit weight;
    self-loops dropped; both directions added when undirected."""
    lines = (
        path_or_df
        if isinstance(path_or_df, DataFrame)
        else spark.read.text(path_or_df)
    )
    rows = (
        lines.filter(~F.col("value").startswith("#") & (F.trim("value") != ""))
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("src"),
            F.col("p")[1].cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if not directed:
        rows = (
            rows.unionByName(
                rows.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            ).distinct()
        )
    return rows


def write_cover_json_lines(cover: DataFrame) -> DataFrame:
    """Cover → DMID cover JSON lines, zero-degree entries dropped
    (DMIDVertexOutputFormat.java:53-62)."""
    return (
        cover.filter(F.col("degree") != 0)
        .groupBy(F.col("node"))
        .agg(
            F.to_json(
                F.array_sort(
                    F.collect_list(F.array(F.col("community").cast("double"), F.col("degree")))
                )
            ).alias("mem_json")
        )
        .select(F.format_string("[%d,%s]", F.col("node"), F.col("mem_json")).alias("value"))
    )


def read_cover_json(spark: SparkSession, path_or_df) -> DataFrame:
    """DMID cover JSON lines → cover(node, community, degree)."""
    lines = (
        path_or_df
        if isinstance(path_or_df, DataFrame)
        else spark.read.text(path_or_df)
    )
    parsed = lines.select(
        F.get_json_object("value", "$[0]").cast("long").alias("node"),
        F.from_json(F.get_json_object("value", "$[1]"), ADJ_SCHEMA).alias("mem"),
    ).filter(F.col("node").isNotNull())
    return parsed.select("node", F.explode("mem").alias("m")).select(
        "node",
        F.col("m")[0].cast("long").alias("community"),
        F.col("m")[1].cast("double").alias("degree"),
    )


def read_ucinet(spark: SparkSession, path_or_df) -> tuple[DataFrame, DataFrame]:
    """UCINET DL text → dense-id edge table (SURVEY.md §2.1 S6;
    Main.formatGraphUCINETtoDMID, Main.java:546-586): an ``  directed <0|1>``
    header toggles symmetrization, each ``    source <id>`` line plus its
    following target line contributes one unit-weight edge, self-loops are
    dropped, and ids are densified from 0 (``cleanBrokenIDs(graph, 0)``).
    The format is inherently sequential (2-line records), so it parses on a
    single partition exactly like the reference's BufferedReader — a test
    utility, not a scale path. Returns (edges, id_map)."""
    from .. import graph as G

    lines = (
        path_or_df if isinstance(path_or_df, DataFrame) else spark.read.text(path_or_df)
    )
    # order-guaranteed line numbering: zipWithIndex over the single
    # partition indexes rows in iterator order (= file order for a text
    # scan), unlike monotonically_increasing_id which only promises
    # monotonicity, not file-order row layout after future split changes
    numbered = (
        lines.coalesce(1)
        .rdd.zipWithIndex()
        .map(lambda t: (t[0]["value"], t[1]))
        .toDF(["value", "ln"])
    )
    last_int = F.regexp_extract("value", r"(\d+)\s*$", 1)
    directed_row = (
        numbered.filter(F.col("value").startswith("  directed "))
        .select(last_int.cast("int").alias("d"))
        .first()
    )
    directed = bool(directed_row and directed_row["d"] == 1)
    srcs = numbered.filter(F.col("value").startswith("    source ")).select(
        F.col("ln"), last_int.cast("long").alias("src")
    )
    nxt = numbered.select((F.col("ln") - 1).alias("ln"), last_int.cast("long").alias("dst"))
    pairs = (
        srcs.join(nxt, "ln")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if not directed:
        pairs = pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    edges = pairs.withColumn("weight", F.lit(1.0))
    return G.densify_ids(edges)


def read_cover_and_graph(
    spark: SparkSession, cover_lines, graph_lines
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S9 (Main.readCoverAndGraph, Main.java:651-783): read a DMID cover and
    its graph together, annotating per-node in/out degrees. Returns
    (cover, edges, degrees(id, in_deg, out_deg))."""
    from .. import graph as G

    cover = read_cover_json(spark, cover_lines)
    edges, verts = read_dmid_adjacency(spark, graph_lines)
    out_d = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    degrees = (
        verts.join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .fillna(0, subset=["out_deg", "in_deg"])
    )
    return cover, edges, degrees


def read_ground_truth_cover(
    spark: SparkSession, path_or_df, id_map: DataFrame | None = None
) -> DataFrame:
    """M8 (Main.java:281-376): ground-truth cover reader — broken node ids
    remapped through the ``densify_ids`` dictionary (the BrokenNodeList
    analog) and community ids re-indexed densely from 0 in ascending
    community-id order (the reference's growing-matrix column allocation).
    The community re-index uses the distributed zipWithIndex rank (distinct
    community ids can be O(V) on fine-grained ground truths — no
    single-partition window on a reader path)."""
    from .. import kernel as _K

    cover = read_cover_json(spark, path_or_df)
    if id_map is not None:
        m = F.broadcast(id_map)
        cover = cover.join(m, cover.node == m.orig_id).select(
            F.col("dense_id").alias("node"), "community", "degree"
        )
    remap = _K.distributed_rank(
        cover.select("community").distinct(), ["community"], out_col="community_idx"
    )
    return cover.join(F.broadcast(remap), "community").select(
        "node", F.col("community_idx").alias("community"), "degree"
    )


def cover_from_doca_lines(lines: DataFrame) -> DataFrame:
    """DOCA format (one community per line, whitespace-separated node ids)
    → cover(node, community, degree=1.0); community id = 0-based line
    order by first appearance (deterministic via monotonic line ids is not
    stable across partitions, so the input must carry a 'community' column
    or be single-partition text — matching the reference's sequential read)."""
    numbered = lines.coalesce(1).withColumn(
        "community", F.monotonically_increasing_id()
    )
    return (
        numbered.filter(F.trim("value") != "")
        .select("community", F.explode(F.split(F.trim("value"), r"\s+")).alias("tok"))
        .select(
            F.col("tok").cast("long").alias("node"),
            F.col("community").cast("long").alias("community"),
            F.lit(1.0).alias("degree"),
        )
    )
