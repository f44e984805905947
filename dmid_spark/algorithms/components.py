"""Connected components via alternating small-star / large-star
(SURVEY.md §2.6 X2; Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — the published semantics BASELINE.json mandates).

Works on the undirected view of the edge table; converges in O(log n)
rounds, each round two join+aggregate passes over the (shrinking) edge set —
no state ever centralizes, so this is the 100 TB-safe formulation (vs naive
min-label propagation whose round count is the graph diameter).

Output: ``labels(id, component)`` with component = minimum vertex id in the
component (exact min-id labeling, matching the oracle).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class CCStats:
    rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0
    edge_counts: list[int] = field(default_factory=list)


def _large_star(edges: DataFrame, broadcast_mins: bool = True) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to
    m = min(Γ(u) ∪ {u}). The O(V) per-node-min table is broadcast-hinted
    (derived from checkpointed edges → no stats → Catalyst would sort-merge
    the big neighbor list every round)."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("mn")).select(
        "src", F.least(F.col("mn"), F.col("src")).alias("m")
    )
    if broadcast_mins:
        mins = F.broadcast(mins)
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, broadcast_mins: bool = True) -> DataFrame:
    """Canonicalize each edge to (hi, lo); for each hi, connect all its
    lo-neighbors and hi itself to m = min of them."""
    canon = edges.select(
        F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
    ).filter(F.col("hi") != F.col("lo")).distinct()
    mins = canon.groupBy("hi").agg(F.min("lo").alias("m"))
    joined = canon.join(F.broadcast(mins) if broadcast_mins else mins, "hi")
    to_min = joined.select(F.col("lo").alias("src"), F.col("m").alias("dst"))
    self_edge = mins.select(F.col("hi").alias("src"), F.col("m").alias("dst"))
    return (
        to_min.unionByName(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bounded per-row hash so the sum can't overflow ANSI long arithmetic
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_rounds: int = 50, broadcast_mins: bool = True
) -> tuple[DataFrame, CCStats]:
    """Returns (labels(id, component), stats). ``broadcast_mins`` hints the
    O(V) min tables in both star operations; disable at ≳10^9 vertices."""
    t0 = time.time()
    stats = CCStats()
    verts = K.materialize(G.vertices(edges))
    cur = K.materialize(
        G.drop_self_loops(edges.select("src", "dst")).distinct()
    )
    prev_sum = None
    for r in range(1, max_rounds + 1):
        cur = K.materialize(
            _small_star(_large_star(cur, broadcast_mins), broadcast_mins)
        )
        chk = _checksum(cur)
        stats.rounds = r
        stats.edge_counts.append(chk[0])
        if chk == prev_sum:
            stats.converged = True
            break
        prev_sum = chk
    # at fixpoint every surviving edge points a node at its component min
    comp = cur.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("component"))
    labels = (
        verts.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    stats.wall_sec = time.time() - t0
    return labels, stats


def incremental_components(
    new_edges: DataFrame,
    old_labels: DataFrame,
    max_rounds: int = 50,
    broadcast_mins: bool = True,
) -> tuple[DataFrame, CCStats]:
    """Update a component labeling with a batch of NEW edges without
    re-solving the old graph — the daily-ingest shape (companion to
    text.dedup.dedup_against): yesterday's 100 TB graph is summarized by
    its ``labels(id, component)`` table; today's delta only has to connect
    component REPRESENTATIVES.

    Each new endpoint maps through ``old_labels`` (unseen vertices label
    themselves); the delta graph over those representatives — bounded by
    the new batch size, not the corpus — goes through the same
    small-star/large-star loop; the composed mapping relabels every old
    vertex whose component merged. Old components untouched by the delta
    keep their label bit-for-bit, so the result equals a full re-run on
    ``old_edges ∪ new_edges`` whenever ``old_labels`` used min-id labeling
    (both pick the component min; pytest-asserted).

    Returns ``(labels(id, component), stats)`` covering old vertices ∪ new
    endpoints; stats counts the delta-graph rounds only.
    """
    old_labels = K.materialize(old_labels.select("id", "component"))
    ends = (
        new_edges.select(F.col("src").alias("id"))
        .unionByName(new_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # endpoint → representative (its old component, or itself if unseen)
    rep = K.materialize(
        ends.join(old_labels, "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("rep")
        )
    )
    delta = (
        new_edges.join(rep.withColumnRenamed("id", "src"), "src")
        .select(F.col("rep").alias("r_src"), "dst")
        .join(rep.withColumnRenamed("id", "dst"), "dst")
        .select(F.col("r_src").alias("src"), F.col("rep").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    merged, stats = connected_components(
        delta, max_rounds=max_rounds, broadcast_mins=broadcast_mins
    )
    merged = merged.withColumnRenamed("id", "rep").withColumnRenamed(
        "component", "new_comp"
    )
    # compose: old labels re-map through the merged representative labels;
    # unseen new endpoints come in via their (identity) representative
    all_ids = (
        old_labels.select("id", F.col("component").alias("rep"))
        .unionByName(rep.select("id", "rep"))
        .groupBy("id")
        .agg(F.min("rep").alias("rep"))
    )
    labels = (
        all_ids.join(merged, "rep", "left")
        .select("id", F.coalesce("new_comp", F.col("rep")).alias("component"))
    )
    return K.materialize(labels), stats
