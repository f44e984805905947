"""Strongly connected components of the directed edge table.

Completes the components story (X2, components.py, is the *undirected*
small-star/large-star): SCC is the directed decomposition behind the web's
bow-tie structure and condensation DAGs of link graphs.

Algorithm: iterative **trim + forward-min coloring + backward containment**
— the standard BSP/MapReduce formulation (FW-BW-Trim family, cf. Slota et
al. "BFS and coloring-based parallel algorithms for strongly connected
components", IPDPS'14; Orzan's coloring):

repeat until no active vertices:

1. **Trim to fixpoint**: a vertex with zero in-degree or zero out-degree
   *within the active subgraph* lies on no cycle → it is its own singleton
   SCC. Peeling these repeatedly resolves every pure-DAG region without any
   propagation (each pass is two degree aggregates + a semi-join over a
   shrinking edge set — the k-core shape).
2. **Color**: propagate ``color(v) = min(v, min over in-neighbors)`` along
   forward edges to fixpoint (min-label propagation, O(color-diameter)
   rounds of one join + aggregate each).
3. **Backward containment**: every color root r (``color(r) == r``) is the
   minimum id of its SCC. Mark r, then propagate marks along *reverse*
   edges but only between same-colored endpoints, to fixpoint: the marked
   set of color c is exactly the SCC of root c (v is marked ⇔ v reaches r
   forward — it has r's color — and r reaches v backward).
4. Emit marked vertices with ``scc = color``; deactivate them; repeat.

Labels are deterministic: ``scc`` = minimum vertex id of the component
(matching the min-id convention of components.py and the test oracle).

Scale: every step is a join + aggregate over the *active* edge set, which
shrinks monotonically; per-vertex state never centralizes, and the O(V)
state sides of the iterative joins carry the same broadcast hint + escape
hatch as the rest of the engine. Honest bound: coloring is min-label
propagation, so a single phase costs O(diameter of the SCC condensation)
supersteps — unlike undirected CC there is no known simple O(log n) BSP
SCC; trimming (which needs no propagation) resolves the DAG bulk of real
link graphs first, and each outer round removes every current root SCC in
parallel.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class SccStats:
    outer_rounds: int = 0
    trim_rounds: int = 0
    color_rounds: int = 0
    mark_rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0
    active_counts: list[int] = field(default_factory=list)


def _hint(df: DataFrame, on: bool) -> DataFrame:
    return F.broadcast(df) if on else df


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 100,
    max_inner: int = 10_000,
    broadcast_state: bool = True,
) -> tuple[DataFrame, SccStats]:
    """Returns ``(labels(id, scc), stats)`` over every vertex of ``edges``;
    ``scc`` is the minimum vertex id of the component. Self-loops do not
    create multi-vertex components (a single vertex is always its own SCC).
    """
    t0 = time.time()
    stats = SccStats()
    verts = K.materialize(G.vertices(edges))
    cur = K.materialize(
        G.drop_self_loops(edges.select("src", "dst")).distinct()
    )
    done_parts: list[DataFrame] = []  # each (id, scc), materialized

    for outer in range(1, max_outer + 1):
        stats.outer_rounds = outer
        # --- 1. trim pure-DAG vertices to fixpoint ------------------------
        # Per-PHASE budgets (a fresh counter each outer round, accumulated
        # into stats): comparing the cumulative stats counter against
        # max_inner would shrink later rounds' budgets toward zero. A trim
        # cap is safe (untrimmed DAG vertices stay active and resolve in a
        # later outer round); a capped coloring or marking phase is NOT —
        # it would emit a wrongly-split component — so those raise instead.
        n_prev = n_next = cur.count()
        trim_r = 0
        while trim_r < max_inner:
            srcs = cur.select(F.col("src").alias("id")).distinct()
            dsts = cur.select(F.col("dst").alias("id")).distinct()
            keep = K.materialize(
                srcs.join(dsts, "id", "left_semi").select(F.col("id").alias("_k"))
            )
            nxt = K.materialize(
                cur.join(_hint(keep, broadcast_state), cur.src == F.col("_k"), "left_semi")
                .join(_hint(keep, broadcast_state), cur.dst == F.col("_k"), "left_semi")
            )
            n_next = nxt.count()
            trim_r += 1
            stats.trim_rounds += 1
            cur = nxt
            if n_next == n_prev or n_next == 0:
                break
            n_prev = n_next
        if n_next == 0:
            break

        active = K.materialize(
            cur.select(F.col("src").alias("id"))
            .unionByName(cur.select(F.col("dst").alias("id")))
            .distinct()
        )
        stats.active_counts.append(active.count())

        # --- 2. forward-min coloring to fixpoint --------------------------
        color = K.materialize(active.select("id", F.col("id").alias("color")))
        color_r = 0
        color_converged = False
        while color_r < max_inner:
            incoming = (
                cur.join(
                    _hint(color.select(F.col("id").alias("_s"), "color"), broadcast_state),
                    cur.src == F.col("_s"),
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("in_min"))
            )
            new_color = K.materialize(
                color.join(incoming, "id", "left").select(
                    "id",
                    F.least(F.col("color"), F.coalesce("in_min", F.col("color"))).alias(
                        "color"
                    ),
                )
            )
            changed = (
                new_color.join(color.withColumnRenamed("color", "old"), "id")
                .filter(F.col("color") != F.col("old"))
                .count()
            )
            color_r += 1
            stats.color_rounds += 1
            color = new_color
            if changed == 0:
                color_converged = True
                break
        if not color_converged:
            raise RuntimeError(
                f"scc: coloring phase hit max_inner={max_inner} before its "
                f"fixpoint (outer round {outer}); proceeding would split an "
                "SCC — raise max_inner"
            )

        # --- 3. backward containment from the color roots -----------------
        # same-color reverse edges only; marks spread dst→src
        same = K.materialize(
            cur.join(
                _hint(color.select(F.col("id").alias("_s"), F.col("color").alias("c_src")), broadcast_state),
                cur.src == F.col("_s"),
            )
            .join(
                _hint(color.select(F.col("id").alias("_d"), F.col("color").alias("c_dst")), broadcast_state),
                cur.dst == F.col("_d"),
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
        )
        marked = K.materialize(
            color.filter(F.col("id") == F.col("color")).select("id", "color")
        )
        frontier = marked
        mark_r = 0
        mark_converged = False
        while mark_r < max_inner:
            preds = (
                same.join(
                    _hint(frontier.select(F.col("id").alias("_m"), "color"), broadcast_state),
                    same.dst == F.col("_m"),
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(marked.select("id"), "id", "left_anti")
            )
            frontier = K.materialize(preds)
            mark_r += 1
            stats.mark_rounds += 1
            if frontier.count() == 0:
                mark_converged = True
                break
            marked = K.materialize(marked.unionByName(frontier))
        if not mark_converged:
            raise RuntimeError(
                f"scc: backward-containment phase hit max_inner={max_inner} "
                f"before its fixpoint (outer round {outer}); proceeding would "
                "emit a partial SCC — raise max_inner"
            )

        done_parts.append(
            K.materialize(marked.select("id", F.col("color").alias("scc")))
        )
        # --- 4. deactivate the resolved components ------------------------
        res_ids = marked.select(F.col("id").alias("_r"))
        cur = K.materialize(
            cur.join(_hint(res_ids, broadcast_state), cur.src == F.col("_r"), "left_anti")
            .join(_hint(res_ids, broadcast_state), cur.dst == F.col("_r"), "left_anti")
        )
        if cur.count() == 0:
            break

    stats.converged = cur.count() == 0
    resolved = None
    for p in done_parts:
        resolved = p if resolved is None else resolved.unionByName(p)
    if resolved is None:
        labels = verts.select("id", F.col("id").alias("scc"))
    else:
        # everything never marked (trimmed or isolated) is a singleton SCC
        labels = (
            verts.join(resolved, "id", "left")
            .select("id", F.coalesce("scc", F.col("id")).alias("scc"))
        )
    stats.wall_sec = time.time() - t0
    return labels, stats
