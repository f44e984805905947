"""Edge-table primitives: the engine's working graph representation.

The graph is one DataFrame ``edges(src: long, dst: long, weight: double)``
(directed; weight > 0). This replaces the reference's per-vertex adjacency
records (DMID/io/formats/DMIDVertexInputFormat.java:28-47) and jgrapht object
graphs (Metrics/src/ocd/metrics/Main.java:588-649): sparsity is free
relationally (absent row = 0) and every per-superstep "message exchange"
becomes a join + aggregation that Catalyst can plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def edges_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Build an edge DataFrame from (src, dst, weight) triples."""
    rows = [(int(s), int(d), float(w)) for (s, d, w) in rows]
    return spark.createDataFrame(rows, schema=EDGE_SCHEMA)


def vertices(edges: DataFrame) -> DataFrame:
    """All vertex ids appearing as source or target: ``(id: long)``."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def num_vertices(edges: DataFrame) -> int:
    return vertices(edges).count()


def drop_self_loops(edges: DataFrame) -> DataFrame:
    """Reference drops self-loops on read (Main.java:627-636)."""
    return edges.filter(F.col("src") != F.col("dst"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Add the reverse of every edge (undirected graphs are stored as both
    directions, matching the reference SNAP reader, Main.java:633-635).
    Duplicate (src, dst) pairs keep the max weight (idempotent on already-
    symmetric inputs)."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
    )
    return (
        edges.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )


def densify_ids(
    edges: DataFrame, broadcast_map: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Re-map arbitrary vertex ids onto dense ``[0, N)``.

    Relational analog of the reference's ``cleanBrokenIDs`` + BrokenNodeList
    mapping file (Metrics/src/ocd/metrics/Main.java:911-980): returns
    ``(edges_dense, id_map(orig_id, dense_id))``. Deterministic: dense ids
    are assigned in ascending original-id order. The id dictionary is tiny
    relative to the edge table (|V| << |E|), so the two rewrite joins
    broadcast at any realistic scale; ``broadcast_map=False`` is the
    ≳10⁹-vertex escape hatch (shuffle joins instead — same knob as
    components.py ``broadcast_mins``).
    """
    from . import kernel as _K

    ids = vertices(edges)
    # distributed zipWithIndex-style rank over distinct ids (|V| rows, one
    # skinny column): range-partition + per-partition offsets, no
    # single-partition window sort on the mandatory ingest path.
    id_map = _K.distributed_rank(ids, ["id"], out_col="dense_id").withColumnRenamed(
        "id", "orig_id"
    )
    m = F.broadcast(id_map) if broadcast_map else id_map
    dense = (
        edges.join(m, edges.src == m.orig_id)
        .select(F.col("dense_id").alias("src"), "dst", "weight")
        .join(m, F.col("dst") == m.orig_id)
        .select("src", F.col("dense_id").alias("dst"), "weight")
    )
    return dense, id_map


def weighted_in_degrees(edges: DataFrame) -> DataFrame:
    """``w_in(v) = sum of incoming edge weights`` — DMID superstep 1
    (DMID/DMIDComputation.java:177-206). Vertices with no in-edges get 0.
    Returns ``(id, w_in)``."""
    indeg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum("weight").alias("w_in")
    )
    return (
        vertices(edges)
        .join(indeg, "id", "left")
        .select("id", F.coalesce("w_in", F.lit(0.0)).alias("w_in"))
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-edge count per vertex (= Giraph ``vertex.getNumEdges()``,
    BasicDMIDComputation.java:56). Returns ``(id, out_deg)``; vertices with
    no out-edges get 0."""
    odeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    return (
        vertices(edges)
        .join(odeg, "id", "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"))
    )


def partition_edges(edges: DataFrame, by: str = "dst", n: int | None = None) -> DataFrame:
    """Hash-partition the edge table on a join key so every per-iteration
    join/aggregation in the superstep loop reuses one co-located layout
    instead of reshuffling the (large) edge side each iteration."""
    if n is None:
        n = edges.sparkSession.sparkContext.defaultParallelism
    return edges.repartition(n, by)


def contract_graph(
    edges: DataFrame,
    labels: DataFrame,
    drop_self: bool = False,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Community contraction: relabel both endpoints by their community and
    sum parallel edge weights — the coarse graph a multi-level pipeline
    (cluster → contract → recurse) runs on next. ``labels`` is
    ``(id, label)``; output is ``(src, dst, weight)`` in label space, with
    intra-community mass kept as self-edges unless ``drop_self``.

    Scale: two joins against the O(V) label map (broadcast by default —
    disable at ≳10⁹ vertices, the components.py escape hatch) + one
    map-side-combining groupBy on the coarse keys. Weight sums of
    integer-valued doubles are exact in any order, so results are
    engine/layout-independent."""
    lm = labels.select("id", "label")
    if broadcast_labels:
        lm = F.broadcast(lm)
    out = (
        edges.join(lm.select(F.col("id").alias("src"), F.col("label").alias("_ls")), "src")
        .join(lm.select(F.col("id").alias("dst"), F.col("label").alias("_ld")), "dst")
        .groupBy(F.col("_ls").alias("src"), F.col("_ld").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    if drop_self:
        out = out.filter(F.col("src") != F.col("dst"))
    return out


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Markov transition edge table from an event stream: one weighted edge
    ``(src_type, dst_type, transitions)`` per consecutive event-type pair
    within each user's timeline — the bridge from the events table into the
    graph engine (relabel types to ids via densify_ids and any algorithm
    runs on it: PageRank gives steady-state type importance, components
    give behavioral clusters).

    Ordering is total per user — (ts, tiebreak_col) — so the result is
    deterministic and engine-portable (a bare ts would leave same-timestamp
    pairs ambiguous). The lag window is PARTITIONED by user (bounded by a
    user's event count, never a global sort); the aggregation map-side
    combines on the tiny type×type key space."""
    from pyspark.sql import Window

    order = [F.col(ts_col).cast("timestamp").cast("long")]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = events.select(
        F.col(user_col),
        F.col(type_col).alias("dst_type"),
        F.lag(type_col).over(w).alias("src_type"),
    ).filter(F.col("src_type").isNotNull())
    return pairs.groupBy("src_type", "dst_type").agg(
        F.count("*").cast("long").alias("transitions")
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row global shape summary of the directed simple graph:
    ``(n_vertices, n_edges, n_self_loops, n_reciprocal, max_in_deg,
    max_out_deg)`` — n_reciprocal counts directed edges whose reverse is
    also present (reciprocity = n_reciprocal / n_edges). All-integer
    output, exact at any parallelism. One self-join on the edge key + two
    degree aggregates — scan-scale, no O(V^2) anywhere."""
    e = edges.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").count()
    base = e.agg(
        F.count("*").alias("n_edges"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_self_loops"),
    ).collect()[0]
    n_verts = num_vertices(edges)
    max_in = e.groupBy("dst").count().agg(F.max("count")).collect()[0][0] or 0
    max_out = e.groupBy("src").count().agg(F.max("count")).collect()[0][0] or 0
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_verts, int(base["n_edges"]), int(base["n_self_loops"] or 0),
          int(recip), int(max_in), int(max_out))],
        "n_vertices long, n_edges long, n_self_loops long, n_reciprocal long, "
        "max_in_deg long, max_out_deg long",
    )


def disparity_backbone(
    edges: DataFrame, alpha: float = 0.05, min_degree: int = 2
) -> DataFrame:
    """Multiscale backbone extraction (Serrano, Boguñá & Vespignani,
    "Extracting the multiscale backbone of complex weighted networks",
    PNAS 2009): keep an edge when its weight is statistically significant
    against the null model of uniformly split strength at EITHER endpoint
    — ``α_ij = (1 − w_ij / s_i)^(k_i − 1) < alpha``.

    The standard de-noising step before community detection on
    co-occurrence graphs (hairball → backbone): global thresholds kill all
    weak-strength vertices' edges, the disparity filter keeps locally
    dominant ones at every scale. An endpoint with degree < ``min_degree``
    is untestable (k=1 makes α ≡ 1) and is SKIPPED: the edge is judged at
    its testable endpoint(s); an edge with no testable endpoint passes
    (``alpha_min`` NULL) — pruning it would disconnect every pendant.

    Pure column arithmetic over the undirected view plus one
    degree/strength join — scan-stage cost. Returns canonical
    ``(u, v, weight, alpha_min)`` (6dp, engine-portable) for surviving
    edges."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    und = (
        drop_self_loops(edges)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("u", "v")
        .agg(F.sum("weight").alias("weight"))
    )
    both = und.select("u", "v", "weight").unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"), "weight")
    )
    stren = both.groupBy(F.col("u").alias("id")).agg(
        F.sum("weight").alias("s"), F.count("*").alias("k")
    )
    su = stren.select(F.col("id").alias("u"), F.col("s").alias("su"), F.col("k").alias("ku"))
    sv = stren.select(F.col("id").alias("v"), F.col("s").alias("sv"), F.col("k").alias("kv"))
    # untestable side → NULL; least() skips NULLs, both-NULL → NULL (pass)
    a_u = F.when(
        F.col("ku") >= min_degree,
        F.pow(1.0 - F.col("weight") / F.col("su"), F.col("ku") - 1),
    )
    a_v = F.when(
        F.col("kv") >= min_degree,
        F.pow(1.0 - F.col("weight") / F.col("sv"), F.col("kv") - 1),
    )
    return (
        und.join(su, "u")
        .join(sv, "v")
        .withColumn("alpha_min", F.round(F.least(a_u, a_v), 6))
        .filter(F.col("alpha_min").isNull() | (F.col("alpha_min") < alpha))
        .select("u", "v", "weight", "alpha_min")
    )


def pmi_weights(edges: DataFrame, positive_only: bool = False) -> DataFrame:
    """(N)PMI re-weighting of a co-occurrence edge table — the standard
    de-noising transform between raw co-occurrence counts (corpus.py's
    ``cooccurrence_edges``) and link analysis: frequent hubs dominate raw
    counts, while PMI scores how much MORE often (src, dst) co-occur than
    their popularity predicts.

    With W = Σ weight, w_u• = Σ_dst weight(u, ·), w_•v = Σ_src weight(·, v):

        pmi(u, v)  = ln( weight(u,v) · W / (w_u• · w_•v) )
        npmi(u, v) = pmi / −ln(weight(u,v) / W)      ∈ [−1, 1]

    (npmi is NULL on the degenerate weight(u,v) = W single-edge case).
    ``positive_only=True`` keeps pmi > 0 rows (the PPMI graph). Rows with
    weight <= 0 are dropped (log undefined).

    Scale: two map-side-combined marginal aggregates + two hash joins on
    src/dst; W is a driver scalar like pagerank's dangling mass. The log is
    the only libm surface — quantize downstream for cross-engine hashes.
    """
    e = edges.filter(F.col("weight") > 0).select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    total = float(e.agg(F.sum("weight")).first()[0] or 0.0)
    if total <= 0:
        return e.select(
            "src", "dst", "weight",
            F.lit(None).cast("double").alias("pmi"),
            F.lit(None).cast("double").alias("npmi"),
        )
    mu = e.groupBy("src").agg(F.sum("weight").alias("_wu"))
    mv = e.groupBy("dst").agg(F.sum("weight").alias("_wv"))
    pmi = F.log(F.col("weight") * F.lit(total) / (F.col("_wu") * F.col("_wv")))
    self_info = -F.log(F.col("weight") / F.lit(total))
    out = (
        e.join(mu, "src")
        .join(mv, "dst")
        .select(
            "src",
            "dst",
            "weight",
            pmi.alias("pmi"),
            F.when(self_info > 0, pmi / self_info).alias("npmi"),
        )
    )
    return out.filter(F.col("pmi") > 0) if positive_only else out


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve φ(k) = 2·E_k / (N_k·(N_k−1)) for every
    degree threshold k present in the graph: N_k = nodes with total degree
    > k, E_k = undirected-pair links among them (Zhou & Mondragón 2004; the
    hub-interconnection diagnostic for co-occurrence graphs).

    Conventions: total degree = in + out edge COUNT (unweighted, parallel
    directions counted once via pair collapse); self-loops are excluded
    from both E_k and degrees' pair side. Returns ``(k, n_nodes, n_edges,
    phi)`` for each distinct degree value k where N_k ≥ 2, with phi NULL
    when N_k < 2.

    Scale: degrees are one symmetrized aggregate; E_k and N_k are SUFFIX
    COUNTS over the degree histogram and the per-edge min-endpoint-degree
    histogram — both O(distinct degrees) relations (≤ max degree rows even
    at 10^12 edges), so the suffix-sum windows run over tiny aggregates,
    never the edge table.
    """
    pairs = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("id"))
        .unionByName(pairs.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    from pyspark.sql import Window

    # two tiny histograms: node count per degree, edge count per
    # min-endpoint degree; suffix sums over their UNIFIED k-grid give
    # N_k (nodes with degree > k) and E_k (edges with min(da, db) > k)
    # simultaneously — a k in one histogram but not the other must still
    # see the other's full suffix
    dh = deg.groupBy("d").agg(F.count("*").alias("c"))
    md = (
        pairs.join(deg.withColumnRenamed("id", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("d", "db"), "b")
        .select(F.least("da", "db").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("ec"))
    )
    grid = (
        dh.select(F.col("d").alias("k"))
        .unionByName(md.select(F.col("m").alias("k")))
        .distinct()
        .join(dh.withColumnRenamed("d", "k"), "k", "left")
        .join(md.withColumnRenamed("m", "k"), "k", "left")
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(Window.unboundedPreceding, -1)
    suff = grid.select(
        "k",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("n_nodes"),
        F.coalesce(F.sum("ec").over(w), F.lit(0)).cast("long").alias("n_edges"),
        F.col("c").isNotNull().alias("_is_deg"),
    )
    phi = F.when(
        F.col("n_nodes") >= 2,
        F.col("n_edges") * 2.0 / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
    )
    return (
        suff.filter(F.col("_is_deg"))  # report at the degree values present
        .select("k", "n_nodes", "n_edges", phi.alias("phi"))
    )


def power_law_alpha(edges: DataFrame) -> DataFrame:
    """Discrete power-law exponent MLE curve over the degree distribution:
    for every candidate tail cutoff ``k_min`` present in the graph,

        alpha(k_min) = 1 + n_tail / (Σ_{d ≥ k_min} c_d·ln d − n_tail·ln(k_min − ½))

    (Clauset–Shalizi–Newman 2009, eq. 3.7's discrete approximation) — the
    standard "is this co-occurrence graph scale-free, and from which k?"
    diagnostic next to :func:`rich_club`. Returns ``(k_min, n_tail,
    alpha)`` for each distinct degree value, ``n_tail`` = tail size. The
    denominator is strictly positive whenever n_tail ≥ 1 (every tail term
    has d ≥ k_min > k_min − ½), so alpha is always defined.

    Degree convention matches :func:`rich_club`: symmetrized distinct-pair
    degree, self-loops excluded.

    Scale: one symmetrized degree aggregate, then suffix sums over the
    degree HISTOGRAM — an O(distinct degrees) relation (≤ max degree rows
    even at 10^12 edges), so the single-partition ordered window runs over
    a tiny aggregate, never the edge table. The descending-k running sums
    also pin the float fold order, making alpha deterministic across
    partitionings (and bit-comparable to an engine twin at 9 dp).
    """
    from pyspark.sql import Window

    pairs = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("id"))
        .unionByName(pairs.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    dh = deg.groupBy("d").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    suff = dh.select(
        F.col("d").alias("k_min"),
        F.sum("c").over(w).cast("long").alias("n_tail"),
        F.sum(F.col("c") * F.log(F.col("d").cast("double"))).over(w).alias("_s"),
    )
    return suff.select(
        "k_min",
        "n_tail",
        (
            1.0
            + F.col("n_tail")
            / (F.col("_s") - F.col("n_tail") * F.log(F.col("k_min") - 0.5))
        ).alias("alpha"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity: how much of the edge mass flows both
    ways. One summary row ``(n_edges, n_recip, edge_reciprocity,
    weight_reciprocity)`` over the self-loop-free directed edge table
    (parallel rows collapse by weight sum):

        edge_reciprocity   = |{(i,j): w_ij>0 ∧ w_ji>0}| / |{(i,j): w_ij>0}|
        weight_reciprocity = Σ min(w_ij, w_ji) / Σ w_ij      (Squartini 2013)

    The natural consumer is the events→transition bridge
    (:func:`transition_edges`): a high-reciprocity type graph means A→B
    flows are echoed by B→A. On the engine's symmetrized co-occurrence
    tables it is trivially 1 — the metric is for DIRECTED tables.

    Scale: one self-equi-join of the collapsed edge table on the reversed
    key (shuffle on (src, dst) both sides, no expansion), then a single
    aggregate. Weights are summed exactly when integral (counts), so the
    two ratios are single exact divisions — deterministic at 9 dp.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("_w"))
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("_w").alias("_rw")
    )
    j = e.join(rev, ["src", "dst"], "left")
    return j.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.count("_rw").cast("long").alias("n_recip"),
        (F.count("_rw") / F.count("*")).alias("edge_reciprocity"),
        (
            F.sum(F.least(F.col("_w"), F.coalesce(F.col("_rw"), F.lit(0.0))))
            / F.sum("_w")
        ).alias("weight_reciprocity"),
    )


def snapshot_diff(edges_a: DataFrame, edges_b: DataFrame) -> DataFrame:
    """Edge-level diff between two graph snapshots (A = before, B =
    after): ``(src, dst, status, weight_a, weight_b, weight_delta)`` with
    status ∈ {'added', 'removed', 'kept'} — the daily-ingest churn view
    that pairs with incremental_components (X30): the 'added' slice IS
    the delta batch. Parallel edge rows collapse by weight sum first, so
    the diff is over the canonical weighted edge relation.

    Scale: two map-side-combined collapses + one full-outer hash join on
    the edge key. One shuffle family, no driver state."""
    a = edges_a.groupBy("src", "dst").agg(F.sum("weight").alias("weight_a"))
    b = edges_b.groupBy("src", "dst").agg(F.sum("weight").alias("weight_b"))
    j = a.join(b, ["src", "dst"], "full_outer")
    return j.select(
        "src",
        "dst",
        F.when(F.col("weight_a").isNull(), "added")
        .when(F.col("weight_b").isNull(), "removed")
        .otherwise("kept")
        .alias("status"),
        F.coalesce("weight_a", F.lit(0.0)).alias("weight_a"),
        F.coalesce("weight_b", F.lit(0.0)).alias("weight_b"),
        (
            F.coalesce("weight_b", F.lit(0.0)) - F.coalesce("weight_a", F.lit(0.0))
        ).alias("weight_delta"),
    )


def snapshot_churn_summary(edges_a: DataFrame, edges_b: DataFrame) -> DataFrame:
    """One-row churn summary over :func:`snapshot_diff`: counts per
    status, total |weight delta|, and the edge-set Jaccard between the
    snapshots — the monitoring row a scheduled ingest job emits."""
    d = snapshot_diff(edges_a, edges_b)
    kept = F.sum(F.when(F.col("status") == "kept", 1).otherwise(0))
    added = F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
    removed = F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
    return d.agg(
        added.cast("long").alias("n_added"),
        removed.cast("long").alias("n_removed"),
        kept.cast("long").alias("n_kept"),
        F.sum(F.abs(F.col("weight_delta"))).alias("abs_weight_delta"),
        (kept / F.count("*")).alias("edge_jaccard"),
    )


def attribute_mixing(
    edges: DataFrame,
    attrs: DataFrame,
    id_col: str = "id",
    attr_col: str = "attr",
    weighted: bool = False,
) -> DataFrame:
    """Categorical mixing matrix (Newman, "Mixing patterns in networks",
    PRE 2003 §II): ``(attr_src, attr_dst, mass, fraction)`` — the share of
    directed edge mass flowing from category i to category j. Edges whose
    endpoint lacks an attribute row are dropped (documented; count them
    upstream if needed). ``weighted=True`` uses edge weights as mass,
    else each edge counts 1.

    Scale: two hash joins of the edge table against the O(V) attribute
    relation, then one map-side-combined (i, j) aggregate — output is
    C×C-bounded, never per-edge. The grand total joins in as a broadcast
    scalar, no driver action.
    """
    from . import kernel as _K

    a_src = attrs.select(F.col(id_col).alias("src"), F.col(attr_col).alias("attr_src"))
    a_dst = attrs.select(F.col(id_col).alias("dst"), F.col(attr_col).alias("attr_dst"))
    mass = F.col("weight").cast("double") if weighted else F.lit(1.0)
    # materialized: the C×C cell table fans out to the total scalar and the
    # final select (and assortativity's four marginal consumers) — without
    # the cut each consumer would re-run the two O(E) joins
    cells = _K.materialize(
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .groupBy("attr_src", "attr_dst")
        .agg(F.sum(mass).alias("mass"))
    )
    total = cells.agg(F.sum("mass").alias("_tot"))
    return cells.join(F.broadcast(total)).select(
        "attr_src",
        "attr_dst",
        "mass",
        (F.col("mass") / F.col("_tot")).alias("fraction"),
    )


def attribute_assortativity(
    edges: DataFrame,
    attrs: DataFrame,
    id_col: str = "id",
    attr_col: str = "attr",
    weighted: bool = False,
) -> DataFrame:
    """Newman's categorical assortativity coefficient over the mixing
    matrix e: ``r = (Σᵢ eᵢᵢ − Σᵢ aᵢ bᵢ) / (1 − Σᵢ aᵢ bᵢ)`` with
    ``aᵢ = Σⱼ eᵢⱼ`` (row sums), ``bⱼ = Σᵢ eᵢⱼ`` (column sums). One row
    ``(n_categories, trace, agreement, r)``; ``r`` is NULL when every edge
    sits in one category (denominator 0 — undefined by definition; the
    companion homophily reading is the raw ``trace``).

    Scale: everything downstream of :func:`attribute_mixing` runs on the
    C×C cell table — two C-row marginal aggregates joined back on the
    category key, then one scalar row. Nothing beyond the two O(E) joins
    of the mixing step touches the edge table.
    """
    e = attribute_mixing(edges, attrs, id_col, attr_col, weighted)
    row = e.groupBy(F.col("attr_src").alias("cat")).agg(F.sum("fraction").alias("a"))
    col = e.groupBy(F.col("attr_dst").alias("cat")).agg(F.sum("fraction").alias("b"))
    ab = (
        row.join(col, "cat", "full_outer")
        .select((F.coalesce("a", F.lit(0.0)) * F.coalesce("b", F.lit(0.0))).alias("ab"))
        .agg(F.sum("ab").alias("sum_ab"))
    )
    trace = e.filter(F.col("attr_src") == F.col("attr_dst")).agg(
        F.sum("fraction").alias("trace")
    )
    ncat = (
        e.select(F.col("attr_src").alias("cat"))
        .unionByName(e.select(F.col("attr_dst").alias("cat")))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_categories"))
    )
    return (
        ncat.join(F.broadcast(trace.select(F.coalesce("trace", F.lit(0.0)).alias("trace"))))
        .join(F.broadcast(ab))
        .select(
            "n_categories",
            "trace",
            F.col("sum_ab").alias("agreement"),
            F.when(
                F.lit(1.0) - F.col("sum_ab") != 0.0,
                (F.col("trace") - F.col("sum_ab")) / (F.lit(1.0) - F.col("sum_ab")),
            ).alias("r"),
        )
    )


def negative_samples(
    edges: DataFrame,
    n_neg: int = 2,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    broadcast_map: bool = True,
) -> DataFrame:
    """Seeded negative-edge sampling for link-prediction training sets.

    Not in the reference repo — LLM/GNN-pipeline extension: training a link
    predictor (or contrastive embedding) over the co-occurrence graph needs,
    for every positive edge, k non-edges as negatives. For each directed
    edge (src, dst) and draw index i in [0, n_neg), the candidate is the
    vertex whose dense rank is ``hash(src:dst:i:seed) mod |V|`` — a
    content-addressed coin (same device as text.sampling), so the sample is
    deterministic at any parallelism and replayable in the SQL twin.

    Degenerate draws (candidate == src or dst, or (src, candidate) is a
    real edge) are DROPPED, not redrawn: the expected loss per draw is
    (out_deg(src) + 2) / |V| — negligible at corpus scale, and dropping
    keeps the op one-pass (a redraw loop would iterate driver-side).
    Returns ``(src, dst, neg, draw)``.

    Scale shape: ranks come from kernel.distributed_rank (range-partitioned
    zipWithIndex, no global window); the O(V) rank table broadcasts into
    the draw join (``broadcast_map=False`` = the ≳10⁹-vertex shuffle-join
    escape hatch, same knob as densify_ids); the final anti-join against
    the edge table is one shuffle on (src, neg).
    """
    from . import kernel as _K
    from .text.dedup import _hash64

    rank_map = _K.distributed_rank(vertices(edges), ["id"], out_col="rk")
    n_verts = rank_map.count()
    draws = edges.select(
        "src",
        "dst",
        F.explode(F.array(*[F.lit(i) for i in range(n_neg)])).alias("draw"),
    )
    key = F.concat_ws(
        ":", F.col("src"), F.col("dst"), F.col("draw"), F.lit(str(seed))
    )
    cand = draws.withColumn(
        "cand_rk", F.pmod(_hash64(key, hash_mode), F.lit(n_verts))
    )
    m = F.broadcast(rank_map) if broadcast_map else rank_map
    cand = cand.join(m, cand.cand_rk == m.rk).select(
        "src", "dst", "draw", F.col("id").alias("neg")
    )
    cand = cand.filter((F.col("neg") != F.col("src")) & (F.col("neg") != F.col("dst")))
    pos = edges.select(F.col("src").alias("_ps"), F.col("dst").alias("_pd"))
    return cand.join(
        pos, (cand.src == pos._ps) & (cand.neg == pos._pd), "left_anti"
    ).select("src", "dst", "neg", F.col("draw").cast("long").alias("draw"))
