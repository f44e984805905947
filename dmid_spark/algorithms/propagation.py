"""Feature smoothing over the graph (SURVEY.md §2.6 ext X32): the SGC /
APPNP preprocessing step ``X ← (D^-1/2 (A + I) D^-1/2)^K · X`` (Wu et al.,
"Simplifying Graph Convolutional Networks", ICML 2019).

The bridge between the embeddings table and the link-graph engine: K hops
of symmetric-normalized neighborhood averaging turn per-node embeddings
into structure-aware ones (the no-training-GNN baseline, and the feature
prep step ahead of node classification / ANN retrieval over graph data).

Relational shape: features go long-form ``(id, dim, value)`` once
(posexplode), each hop is one edges⋈features join + a map-side-combined
``(dst, dim)`` sum — an SpMV per feature dimension sharing one shuffle.
Intermediate size is E×D rows; that IS the computation's data volume, and
it streams through hash aggregation without ever materializing a dense
matrix. For D ≫ 10³ swap the long-form joins for the CSR Arrow kernel
(kernel.py) with a matrix-valued state — same plan shape, batched columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


def features_long(features: DataFrame, id_col: str = "id", vec_col: str = "features") -> DataFrame:
    """(id, features array) → long form (id, dim, value)."""
    return features.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("dim", "value")
    ).select("id", "dim", F.col("value").cast("double").alias("value"))


def features_wide(long_df: DataFrame, n_dims: int | None = None) -> DataFrame:
    """(id, dim, value) → (id, features array) densified over the full
    dim range 0..D-1: any (id, dim) row absent from ``long_df`` becomes
    0.0 at its correct position (so a featureless vertex gets a true
    length-D zero vector, and a sparse row never shifts later values).
    D is ``n_dims`` when given, else max(dim)+1 observed over the whole
    table — one scalar aggregate broadcast-joined into the plan, no
    driver action."""
    agg = long_df.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim").cast("long"), "value"))
        ).alias("m")
    )
    if n_dims is None:
        agg = agg.join(
            F.broadcast(long_df.agg((F.max("dim") + 1).cast("long").alias("_nd")))
        )
    else:
        agg = agg.withColumn("_nd", F.lit(int(n_dims)).cast("long"))
    return agg.select(
        "id",
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.col("_nd") - 1),
            lambda d: F.coalesce(F.try_element_at("m", d), F.lit(0.0)),
        ).alias("features"),
    )


def _hop(arcs: DataFrame, x: DataFrame) -> DataFrame:
    """One propagation hop: normalized arcs ⋈ long features → map-side
    combined (dst, dim) sum. Split out so plan tests can inspect it before
    the materialization cut."""
    return (
        arcs.join(x.withColumnRenamed("id", "u"), "u")
        .groupBy(F.col("v").alias("id"), "dim")
        .agg(F.sum(F.col("nw") * F.col("value")).alias("value"))
    )


def _sym_norm_arcs(
    edges: DataFrame, self_loop: bool, verts: DataFrame | None = None
) -> DataFrame:
    """Symmetric-normalized arc list ``(u, v, nw = w / sqrt(d_u d_v))``
    over the undirected weight-summed view of ``edges``. ``self_loop=True``
    adds the +I loop of A_hat = A + I (SGC smoothing — every vertex of
    ``verts`` gets a 1/d self-arc); ``False`` is the plain
    S = D^-1/2 W D^-1/2 of label spreading (isolated vertices get no arcs
    — their S row is zero). ``verts`` overrides the degree/self-loop
    vertex set (smooth_features passes graph ∪ feature ids)."""
    sym = (
        G.drop_self_loops(edges)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    both = sym.select("u", "v", "w").unionByName(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    bonus = 1.0 if self_loop else 0.0
    if verts is None:
        verts = G.vertices(edges)
    deg = (
        verts
        .join(both.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("d")), "id", "left")
        .select("id", (F.coalesce("d", F.lit(0.0)) + F.lit(bonus)).alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    arcs = (
        both.join(du, "u").join(dv, "v")
        .select("u", "v", (F.col("w") / F.sqrt(F.col("du") * F.col("dv"))).alias("nw"))
    )
    if self_loop:
        arcs = arcs.unionByName(
            deg.select(
                F.col("id").alias("u"), F.col("id").alias("v"),
                (F.lit(1.0) / F.col("d")).alias("nw"),
            )
        )
    return arcs


def label_spreading(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.85,
    iterations: int = 5,
    id_col: str = "id",
    label_col: str = "label",
    round_dp: int | None = None,
) -> DataFrame:
    """Soft multi-class label spreading (Zhou et al., "Learning with Local
    and Global Consistency", NIPS 2004): ``F ← α·S·F + (1−α)·Y`` from
    ``F⁰ = Y``, where ``S = D^-1/2 W D^-1/2`` over the undirected
    weight-summed view of ``edges`` and ``Y`` is the one-hot seed matrix
    from ``seeds(id, label)``. The soft-score generalization of the X33
    seeded LPA: every vertex ends with a score per class, seeds stay
    anchored by the (1−α) clamp instead of a hard freeze.

    Returns the long form ``(id, label, score)``; absent rows are exact
    zeros (a vertex unreachable from any seed has no rows). ``round_dp``
    quantizes the final scores, collapsing IEEE −0.0 (engine-twin hash
    stability). Complements, not replaces, ``lpa.label_propagation``:
    this is the diffusion (harmonic-function) semantics, LPA the
    mode-of-neighbors semantics.

    Scale: per iteration one O(E·C_active) arcs⋈scores join + map-side
    combined (id, label) sum, then a full-outer join against the O(|seeds|)
    clamp table — shuffle volume bounded by edges × classes-with-mass,
    never V×C dense. Same plan family as smooth_features (X32); the twin
    unrolls exactly.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    arcs = K.materialize(_sym_norm_arcs(edges, self_loop=False))
    y = K.materialize(
        seeds.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("long").alias("label"),
            F.lit(1.0).alias("value"),
        ).distinct()
    )
    x = y
    for _ in range(iterations):
        hop = (
            arcs.join(
                x.select(F.col("id").alias("u"), "label", "value"), "u"
            )
            .groupBy(F.col("v").alias("id"), "label")
            .agg(F.sum(F.col("nw") * F.col("value")).alias("hv"))
        )
        x = K.materialize(
            hop.join(
                y.select("id", "label", F.col("value").alias("yv")),
                ["id", "label"],
                "full_outer",
            ).select(
                "id",
                "label",
                (
                    F.lit(float(alpha)) * F.coalesce("hv", F.lit(0.0))
                    + F.lit(1.0 - float(alpha)) * F.coalesce("yv", F.lit(0.0))
                ).alias("value"),
            )
        )
    if round_dp is not None:
        # +0.0 collapses IEEE -0.0 (same device as smooth_features)
        x = x.select(
            "id", "label", (F.round("value", round_dp) + F.lit(0.0)).alias("value")
        )
    return x.select("id", "label", F.col("value").alias("score"))


def spread_labels(scores: DataFrame, round_dp: int = 9) -> DataFrame:
    """Argmax decision over ``label_spreading`` output: per id the
    max-score class, ties broken toward the smaller label. Scores are
    quantized before comparison so the argmax is engine-portable (the
    tfidf/sweep-cut device). One per-id window over the C-bounded score
    rows — partitioned by id, never global."""
    from pyspark.sql import Window

    q = scores.select(
        "id", "label", (F.round("score", round_dp) + F.lit(0.0)).alias("q")
    )
    w = Window.partitionBy("id").orderBy(F.desc("q"), F.asc("label"))
    return (
        q.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "label", F.col("q").alias("score"))
    )


def truncated_hitting_time(
    edges: DataFrame,
    seeds: DataFrame,
    horizon: int = 10,
    id_col: str = "id",
    round_dp: int | None = None,
) -> DataFrame:
    """T-step truncated expected hitting time to a seed set (Sarkar &
    Moore, "A tractable approach to finding closest truncated-commute-time
    neighbors", UAI 2007): ``h_T(v) = E[min(τ_seed, T)]`` — 0 for seeds,
    else ``h_t(v) = 1 + Σ_u P(v,u) · h_{t-1}(u)`` from ``h_0 ≡ 0`` — the
    random-walk proximity behind link-prediction and who-to-recommend
    rankings. ``P`` is the out-degree-normalized walk on the directed
    weighted edge table; a non-seed vertex with NO out-edges is stuck, so
    it follows ``h_t = 1 + h_{t-1}(itself)`` and lands exactly at the
    ``horizon`` ceiling (h_t ∈ [0, t] by induction — the truncation makes
    the quantity finite everywhere). Returns ``(id, hitting_time)`` for
    every vertex.

    Scale: one out-degree normalization pass, then ``horizon`` iterations
    of one arcs⋈state join + map-side-combined vertex aggregate (the
    engine's SpMV family); seeds re-clamp each step via a broadcast-size
    join. The twin unrolls exactly.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    sdf = K.materialize(seeds.select(F.col(id_col).alias("id")).distinct())
    verts = K.materialize(G.vertices(edges))
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    outw = e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("ow"))
    arcs = K.materialize(
        e.join(outw.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
    )
    is_seed = F.col("_s").isNotNull()
    tagged = K.materialize(
        verts.join(sdf.select(F.col("id"), F.lit(1).alias("_s")), "id", "left")
    )
    # h_0 = E[min(tau, 0)] = 0 everywhere
    h = K.materialize(tagged.select("id", F.lit(0.0).alias("h")))
    for _ in range(horizon):
        nxt = (
            arcs.join(h.select(F.col("id").alias("dst"), "h"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg((F.lit(1.0) + F.sum(F.col("p") * F.col("h"))).alias("nh"))
        )
        h = K.materialize(
            tagged.join(nxt, "id", "left")
            .join(h.select("id", F.col("h").alias("hp")), "id")
            .select(
                "id",
                F.when(is_seed, F.lit(0.0))
                # dangling non-seed: stuck on itself, 1 + previous value
                .otherwise(F.coalesce("nh", F.col("hp") + 1.0))
                .alias("h"),
            )
        )
    out = h.select("id", F.col("h").alias("hitting_time"))
    if round_dp is not None:
        out = out.select(
            "id", (F.round("hitting_time", round_dp) + F.lit(0.0)).alias("hitting_time")
        )
    return out


def smooth_features(
    edges: DataFrame,
    features: DataFrame,
    iterations: int = 2,
    id_col: str = "id",
    vec_col: str = "features",
    round_dp: int | None = None,
) -> DataFrame:
    """K hops of ``D^-1/2 (A + I) D^-1/2`` over the undirected view of
    ``edges`` (weights respected; the +I self loop keeps every node's own
    signal and makes isolated nodes fixed points). Returns the long form
    ``(id, dim, value)`` — every vertex of the graph ∪ feature table, with
    missing features treated as zero vectors. ``round_dp`` quantizes the
    final values (engine-twin hash stability).

    Each hop: one join of the O(E) symmetric edge list (self loops
    included, weights pre-normalized once) against the O(V·D) long
    features, then a map-side-combined (dst, dim) sum — shuffle volume
    E·D, state V·D, nothing dense, nothing driver-side.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    verts = G.vertices(edges).unionByName(
        features.select(F.col(id_col).alias("id"))
    ).distinct()
    # A_hat = A + I normalized arcs over graph ∪ feature ids (the shared
    # helper; the +I self-loops make isolated/featureless vertices fixed
    # points)
    arcs = K.materialize(_sym_norm_arcs(edges, self_loop=True, verts=verts))
    x = K.materialize(
        verts.join(features_long(features, id_col, vec_col), "id", "left").select(
            "id", F.coalesce("dim", F.lit(0)).alias("dim"),
            F.coalesce("value", F.lit(0.0)).alias("value"),
        )
    )
    for _ in range(iterations):
        x = K.materialize(_hop(arcs, x))
    if round_dp is not None:
        # +0.0 collapses IEEE -0.0 to +0.0 so quantized output hashes
        # identically across engines (DuckDB ROUND preserves the sign bit)
        x = x.select(
            "id", "dim", (F.round("value", round_dp) + F.lit(0.0)).alias("value")
        )
    return x
