"""Path-based link-graph analytics: multi-source BFS distances, sampled
harmonic/closeness centrality, deterministic random-walk generation,
sampled Brandes betweenness, and weighted shortest paths.

These extend the standard-algorithm suite (X1-X12) with the traversal
operations a web-graph user runs after the per-vertex/per-edge analytics:
distance tables from a source sample (the building block of the
HyperBall-style centrality estimators on web graphs), the harmonic/
closeness/betweenness centralities derived from them, node2vec-style
walk-corpus generation for embedding pipelines, weighted reachability,
and the double-sweep diameter diagnostic (X13-X18).

All are pure DataFrame computations over ``edges(src, dst, ...)``:

- ``bfs_distances`` is frontier expansion: each level is one join of the
  (shrinking-then-shrinking) frontier against the edge table keyed by
  vertex, plus one anti-join against the settled distance set keyed by
  (source, vertex). Level count is bounded by the graph's directed
  eccentricity from the sample, never |V|. State is O(|S|·V) rows,
  distributed — nothing centralizes on the driver.
- ``harmonic_centrality`` is ``bfs_distances`` + one aggregate pass.
  With a vertex sample ``S`` it is the standard sampled estimator
  (Eppstein-Wang / HyperBall's exact twin): scores are sums over the
  sampled sources only, which is exactly what a 100 TB run does too —
  exact all-sources centrality is O(V·E) and not a thing at web scale.
- ``random_walks`` draws the step-t neighbor of walker w by
  ``hash(seed, w, t) mod outdeg(cur)`` over rank-ordered adjacency —
  fully deterministic (the same device as SLPA's seeded draws), so the
  walk corpus is reproducible across cluster sizes and hash-verifiable
  (``hash_mode='md5'`` gives a bitwise DuckDB twin). Each step is one
  broadcastable O(V) outdeg join + one equi-join on (vertex, rank):
  exactly one adjacency row matches per walker per step, so per-step cost
  is O(#walkers) shuffled rows, not O(E).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..text.dedup import _hash64


@dataclass
class BfsStats:
    levels: int = 0
    converged: bool = False
    frontier_sizes: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Directed multi-source BFS → ``(source, id, dist)`` with the shortest
    hop count from every source to every vertex it reaches (dist 0 for the
    source itself). ``sources`` is a one-column ``id`` relation.

    Levels run until every frontier is exhausted (or ``max_depth``); running
    with a depth cap ≥ the sample's eccentricity equals the fixpoint, which
    is what makes the bounded-depth recursive-CTE oracle equivalent to
    convergence.

    Scale: per level, one join frontier⋈edges keyed on the current vertex
    and one anti-join against the settled set keyed on (source, id); both
    distribute on their keys. ``broadcast_frontier`` hints the frontier into
    the edge join — right whenever |S|·|frontier| is driver-broadcastable
    (the common sampled-centrality case); disable for massive source sets.
    """
    t0 = time.time()
    stats = BfsStats()
    frontier = K.materialize(
        sources.select(F.col("id").alias("source"), "id", F.lit(0).alias("dist"))
    )
    # settled holds one MATERIALIZED frame per level; the anti-join target is
    # their lazy union — scanning L checkpointed frontiers costs the same as
    # one big table but never re-writes the O(|S|·V) settled set per level
    settled = [frontier]
    dist = frontier
    level = 0
    while max_depth is None or level < max_depth:
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            f.join(edges, f.id == edges.src)
            .select("source", F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .distinct()
            .join(dist, ["source", "id"], "left_anti")
        )
        frontier = K.materialize(nxt)
        n = frontier.count()
        level += 1
        stats.levels = level
        stats.frontier_sizes.append(n)
        if n == 0:
            stats.converged = True
            break
        settled.append(frontier)
        dist = settled[0]
        for fr in settled[1:]:
            dist = dist.unionByName(fr)
    stats.wall_sec = time.time() - t0
    return dist, stats


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Sampled harmonic + closeness centrality over directed distances from
    ``sources``: for each vertex v,

    - ``n_reached``  = |{s ∈ S, s ≠ v : s →* v}|
    - ``harmonic``   = Σ_s 1/d(s, v)   (the Eppstein-Wang estimator shape)
    - ``closeness``  = n_reached / Σ_s d(s, v)  (0.0 when unreached)

    Vertices reached by no sampled source score 0. One aggregate pass over
    the ``bfs_distances`` table plus a left join back to the vertex set.
    """
    dist, stats = bfs_distances(edges, sources, max_depth, broadcast_frontier)
    scores = (
        dist.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
            (F.count("*") / F.sum("dist")).alias("closeness"),
        )
    )
    out = (
        G.vertices(edges)
        .join(scores, "id", "left")
        .select(
            "id",
            F.coalesce("n_reached", F.lit(0).cast("long")).alias("n_reached"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
            F.coalesce("closeness", F.lit(0.0)).alias("closeness"),
        )
    )
    return out, stats


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """Deterministic rank-ordered adjacency ``(src, rank, dst, outdeg)``:
    each vertex's out-neighbors ranked 0..outdeg-1 in ascending dst order
    (duplicate (src, dst) edges collapse first, so ranks are unique).

    One shuffle keyed by src: dedup + sort happen inside the per-vertex
    aggregate (array_distinct + array_sort), replacing the distinct-then-
    window formulation's two shuffles. Per-task memory is O(max out-degree)
    — the same skew bound a src-partitioned window has, since either way
    one vertex's adjacency lands in one task."""
    arr = edges.groupBy("src").agg(
        F.array_sort(F.array_distinct(F.collect_list("dst"))).alias("ns")
    )
    return arr.select(
        "src",
        F.posexplode("ns").alias("rank", "dst"),
        F.size("ns").cast("long").alias("outdeg"),
    ).select("src", "rank", "dst", "outdeg")


@dataclass
class WalkStats:
    walkers: int = 0
    steps: int = 0
    wall_sec: float = 0.0


def random_walks(
    edges: DataFrame,
    walk_length: int,
    seed: int = 42,
    starts: DataFrame | None = None,
    hash_mode: str = "xxhash64",
    broadcast_state: bool = True,
) -> tuple[DataFrame, WalkStats]:
    """Deterministic random-walk corpus → ``(walk_id, step, node)``.

    One walker starts at every vertex with ≥1 out-edge (or at ``starts``,
    a one-column ``id`` relation) and takes ``walk_length`` steps; the
    step-t transition from node v picks the neighbor whose adjacency rank is
    ``hash64(walk_id:t:seed) mod outdeg(v)``. Walkers that reach a sink
    (no out-edges) stop early; emitted rows always include step 0 (the
    start). Deterministic for a fixed seed at any parallelism level —
    the seeded-draw device SLPA uses (slpa.py), so the corpus is
    reproducible and, under ``hash_mode='md5'``, bitwise-verifiable in any
    engine.

    Scale: the ranked adjacency is computed once (one src-keyed shuffle),
    enriched
    with each destination's out-degree so the walker state carries its
    current node's degree and the step needs no degree join. Each step is
    ONE broadcast-hash join of the O(#walkers) state into the adjacency —
    the big table never shuffles (the same broadcast-state device as
    lpa.py/components.py; ``broadcast_state=False`` is the ≳10⁹-walker
    escape hatch, falling back to a shuffled equi-join on (node, rank)).
    No Python in the loop.
    """
    t0 = time.time()
    # materialize the ranked adjacency ONCE — outdeg and the enriched nbr
    # both derive from it, and without the cut the window chain would be
    # recomputed for each derivation
    base = K.materialize(ranked_adjacency(edges))
    outdeg = base.groupBy(F.col("src").alias("node")).agg(
        F.first("outdeg").alias("node_outdeg")
    )
    # (src, rank, dst, outdeg, dst_outdeg) — dst_outdeg=0 marks a sink hop
    nbr = K.materialize(
        base.join(
            F.broadcast(outdeg.select(F.col("node").alias("dst"),
                                      F.col("node_outdeg").alias("dst_outdeg"))),
            "dst",
            "left",
        ).select(
            "src", "rank", "dst", "outdeg",
            F.coalesce("dst_outdeg", F.lit(0).cast("long")).alias("dst_outdeg"),
        )
    )
    if starts is None:
        cur = outdeg.select(
            F.col("node").alias("walk_id"), F.col("node"), F.col("node_outdeg")
        )
    else:
        cur = starts.select(F.col("id").alias("walk_id"), F.col("id").alias("node")).join(
            F.broadcast(outdeg), "node", "left"
        ).select(
            "walk_id", "node",
            F.coalesce("node_outdeg", F.lit(0).cast("long")).alias("node_outdeg"),
        )
    cur = K.materialize(cur)
    stats = WalkStats(walkers=cur.count())
    rows = [cur.select("walk_id", F.lit(0).alias("step"), "node")]
    alive = cur
    for t in range(1, walk_length + 1):
        draw = alive.filter(F.col("node_outdeg") > 0).select(
            "walk_id",
            "node",
            F.pmod(
                _hash64(
                    F.concat_ws(":", F.col("walk_id"), F.lit(t), F.lit(seed)),
                    hash_mode,
                ),
                F.col("node_outdeg"),
            ).alias("pick"),
        )
        if broadcast_state:
            draw = F.broadcast(draw)
        alive = K.materialize(
            nbr.join(
                draw, (nbr.src == draw.node) & (nbr.rank == draw.pick)
            ).select(
                "walk_id",
                F.col("dst").alias("node"),
                F.col("dst_outdeg").alias("node_outdeg"),
            )
        )
        rows.append(alive.select("walk_id", F.lit(t).alias("step"), "node"))
        stats.steps = t
        if alive.isEmpty():
            break
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    stats.wall_sec = time.time() - t0
    return out, stats


def _sigma_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None,
    broadcast_frontier: bool,
) -> tuple[DataFrame, list[DataFrame], BfsStats]:
    """Brandes forward pass shared by vertex and edge betweenness: BFS
    levels → per-level shortest-path counts ``sig[l] = (source, id,
    sigma)``. Returns ``(distinct edge table, sig levels, BFS stats)``."""
    dist, stats = bfs_distances(edges, sources, max_depth, broadcast_frontier)
    dist = K.materialize(dist)
    # BFS stats already say which levels are populated — no per-level
    # isEmpty probe jobs: frontier_sizes[l-1] is the level-l vertex count
    # (the final 0 entry marks convergence)
    n_levels = sum(1 for n in stats.frontier_sizes if n > 0)
    e = edges.select("src", "dst").distinct()
    lvl = dist.filter(F.col("dist") == 0).select(
        "source", "id", F.lit(1.0).alias("sigma")
    )
    sig_levels = [K.materialize(lvl)]
    for l in range(1, n_levels + 1):
        at_l = dist.filter(F.col("dist") == l).select("source", "id")
        prev = sig_levels[-1]
        if broadcast_frontier:
            prev = F.broadcast(prev)
        contrib = prev.join(e, prev.id == e.src).select(
            "source", F.col("dst").alias("id"), "sigma"
        )
        lvl = K.materialize(
            contrib.join(at_l, ["source", "id"], "left_semi")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        sig_levels.append(lvl)
    return e, sig_levels, stats


def betweenness_sample(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Sampled betweenness centrality (Brandes 1-5, directed, unnormalized):
    ``betweenness(v) = Σ_{s ∈ S} δ_s(v)`` where δ_s is the shortest-path
    dependency of source s — the standard source-sampled estimator
    (Brandes/Pich 2007); exact all-sources betweenness is O(V·E) and not a
    thing at web scale.

    Level-synchronous DataFrame formulation over the ``bfs_distances``
    table:

    - forward: σ(s, v) = Σ σ(s, u) over BFS-DAG predecessors u (one
      edge join + one (source, v)-keyed aggregate per level; σ exact
      shortest-path counts, kept as doubles for the δ division),
    - backward: δ(s, v) = Σ_w σ(s,v)/σ(s,w) · (1 + δ(s,w)) over DAG
      successors w, processed from the deepest level up (same per-level
      join shape).

    Level count is bounded by the sample's eccentricity; every join is
    keyed by vertex (or (source, vertex)) — nothing centralizes. Returns
    ``(betweenness(id, betweenness), stats)`` where stats are the forward
    BFS's (levels = eccentricity+1 when converged).
    """
    e, sig_levels, stats = _sigma_levels(
        edges, sources, max_depth, broadcast_frontier
    )

    # ---- backward: dependency accumulation ------------------------------
    # walk levels deepest-first; delta of the deepest level is 0
    deepest = len(sig_levels) - 1
    delta = K.materialize(
        sig_levels[deepest].select("source", "id", F.lit(0.0).alias("delta"))
    )
    acc = [delta]
    for l in range(deepest - 1, -1, -1):
        w_side = delta.join(
            sig_levels[l + 1].withColumnRenamed("sigma", "sigma_w"),
            ["source", "id"],
        ).select(
            "source", F.col("id").alias("w"),
            ((1.0 + F.col("delta")) / F.col("sigma_w")).alias("w_term"),
        )
        if broadcast_frontier:
            w_side = F.broadcast(w_side)
        contrib = w_side.join(e, w_side.w == e.dst).select(
            "source", F.col("src").alias("id"), "w_term"
        )
        sums = contrib.groupBy("source", "id").agg(F.sum("w_term").alias("t"))
        delta = K.materialize(
            sig_levels[l]
            .join(sums, ["source", "id"], "left")
            .select(
                "source", "id",
                (F.coalesce("t", F.lit(0.0)) * F.col("sigma")).alias("delta"),
            )
        )
        acc.append(delta)

    alld = acc[0]
    for d in acc[1:]:
        alld = alld.unionByName(d)
    out = (
        alld.join(sources.select(F.col("id").alias("source")), ["source"], "left_semi")
        .filter(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    full = (
        G.vertices(edges)
        .join(out, "id", "left")
        .select("id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness"))
    )
    return full, stats


def edge_betweenness_sample(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Sampled EDGE betweenness (the Girvan–Newman community-detection
    edge score, Brandes 2001 §4 edge form): for each directed edge,
    ``betweenness(u,w) = Σ_{s ∈ S} σ_s(u)/σ_s(w) · (1 + δ_s(w))`` summed
    over sources s whose BFS DAG contains (u, w) as a tree/DAG edge —
    exactly the per-edge flow the vertex backward sweep already computes
    before it aggregates by vertex. Returns ``(edge_bt(src, dst,
    betweenness), stats)`` over the distinct directed edge table (edges on
    no sampled shortest path score 0). Undirected consumers symmetrize by
    summing both orientations.

    Same plan family as :func:`betweenness_sample` (shared forward pass):
    per level one broadcast-frontier join against the edge table + one
    (source, edge)-keyed aggregate; the per-level edge contributions union
    lazily and aggregate once at the end by (src, dst) — nothing
    centralizes, level count bounded by the sample's eccentricity.
    """
    e, sig_levels, stats = _sigma_levels(
        edges, sources, max_depth, broadcast_frontier
    )
    deepest = len(sig_levels) - 1
    delta = K.materialize(
        sig_levels[deepest].select("source", "id", F.lit(0.0).alias("delta"))
    )
    edge_parts = []
    for l in range(deepest - 1, -1, -1):
        # w_term(s, w) = (1 + δ(s,w)) / σ(s,w) for level-(l+1) vertices w
        w_side = delta.join(
            sig_levels[l + 1].withColumnRenamed("sigma", "sigma_w"),
            ["source", "id"],
        ).select(
            "source", F.col("id").alias("w"),
            ((1.0 + F.col("delta")) / F.col("sigma_w")).alias("w_term"),
        )
        if broadcast_frontier:
            w_side = F.broadcast(w_side)
        # keep BOTH edge endpoints: (source, u=src, w=dst, w_term)
        contrib = w_side.join(e, w_side.w == e.dst).select(
            "source", F.col("src").alias("id"), "w", "w_term"
        )
        # restrict to DAG edges (u at level l) and attach σ(s, u)
        lvl_edges = contrib.join(sig_levels[l], ["source", "id"]).select(
            "source", "id", "w", (F.col("w_term") * F.col("sigma")).alias("c")
        )
        edge_parts.append(lvl_edges)
        sums = lvl_edges.groupBy("source", "id").agg(F.sum("c").alias("delta"))
        delta = K.materialize(
            sig_levels[l]
            .join(sums.select("source", "id", "delta"), ["source", "id"], "left")
            .select("source", "id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
        )
    if edge_parts:
        alle = edge_parts[0]
        for p_ in edge_parts[1:]:
            alle = alle.unionByName(p_)
        agg = alle.groupBy(F.col("id").alias("src"), F.col("w").alias("dst")).agg(
            F.sum("c").alias("betweenness")
        )
    else:
        agg = e.select("src", "dst", F.lit(0.0).alias("betweenness")).limit(0)
    out = e.join(agg, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    return out, stats


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Multi-source weighted shortest paths (non-negative weights) →
    ``(source, id, dist)`` by synchronous Bellman-Ford relaxation:
    each round ``dist' = min(dist, min over in-edges (dist(u) + w))``.

    Converges in ≤ hop-diameter rounds; extra rounds past the fixpoint are
    no-ops (min-relaxation is idempotent), which makes the bounded-round
    SQL oracle equal to convergence. Frontier-pruned: only vertices whose
    distance IMPROVED last round relax their out-edges, so late rounds
    touch shrinking state (the same shape as components.py's rounds).

    Scale: per round one frontier⋈edges join keyed by vertex plus one
    (source, id)-keyed min-aggregate over candidates ∪ current state.
    ``broadcast_frontier`` as in ``bfs_distances``.
    """
    t0 = time.time()
    stats = BfsStats()
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    wmin_row = e.agg(F.min("w").alias("m")).first()
    if wmin_row["m"] is not None and wmin_row["m"] < 0:
        # a negative edge on a cycle makes min-relaxation non-terminating —
        # fail loudly instead of spinning to max_rounds with garbage dists
        raise ValueError(f"sssp requires non-negative weights; min = {wmin_row['m']}")
    dist = K.materialize(
        sources.select(F.col("id").alias("source"), "id", F.lit(0.0).alias("dist"))
    )
    frontier = dist
    r = 0
    while max_rounds is None or r < max_rounds:
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        cand = f.join(e, f.id == e.src).select(
            "source", F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist")
        )
        new = K.materialize(
            dist.unionByName(cand)
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"))
        )
        improved = K.materialize(
            new.alias("n")
            .join(dist.alias("o"), ["source", "id"], "left")
            .filter(F.col("o.dist").isNull() | (F.col("n.dist") < F.col("o.dist")))
            .select("source", "id", F.col("n.dist").alias("dist"))
        )
        n_improved = improved.count()
        r += 1
        stats.levels = r
        stats.frontier_sizes.append(n_improved)
        dist = new
        frontier = improved
        if n_improved == 0:
            stats.converged = True
            break
    stats.wall_sec = time.time() - t0
    return dist, stats


def diameter_double_sweep(
    edges: DataFrame,
    start_id: int,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Directed double-sweep diameter lower bound (the classic 2-sweep
    heuristic, directed form): a forward BFS from ``start_id`` picks the
    farthest reachable vertex u (max dist, then min id — deterministic);
    a BACKWARD BFS from u (reversed edges) finds max_v d(v → u). Both
    eccentricities are true directed distances, so
    ``diameter_lb = max(ecc_start, backward ecc of u)`` lower-bounds the
    directed diameter.

    Returns a ONE-ROW DataFrame ``(start, peripheral, ecc_start,
    diameter_lb)`` — pure integers — plus the second sweep's stats. Driver
    traffic is two scalar argmax pulls; all traversal is distributed
    ``bfs_distances``."""
    spark = edges.sparkSession
    src0 = spark.createDataFrame([(int(start_id),)], "id long")
    d1, _ = bfs_distances(edges, src0, max_depth, broadcast_frontier)
    far = d1.orderBy(F.desc("dist"), F.asc("id")).select("id", "dist").first()
    u, ecc_start = int(far["id"]), int(far["dist"])
    src1 = spark.createDataFrame([(u,)], "id long")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    d2, stats = bfs_distances(rev, src1, max_depth, broadcast_frontier)
    lb_row = d2.agg(F.max("dist").alias("m")).first()
    lb = max(ecc_start, int(lb_row["m"]))
    out = spark.createDataFrame(
        [(int(start_id), u, ecc_start, lb)],
        "start long, peripheral long, ecc_start long, diameter_lb long",
    )
    return out, stats


# node2vec bias quantization: biases become integer weights so the
# cumulative-sum draw is pure int64 arithmetic — bit-portable across
# engines (no float division whose last ulp could flip a pick)
N2V_BIAS_SCALE = 1000


def node2vec_walks(
    edges: DataFrame,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
    hash_mode: str = "xxhash64",
    broadcast_state: bool = True,
) -> tuple[DataFrame, WalkStats]:
    """node2vec second-order biased walks (Grover-Leskovec 2016) →
    ``(walk_id, step, node)``. The step-t transition from ``cur`` with
    predecessor ``prev`` weighs each out-neighbor d by 1/p if d == prev
    (return), 1 if (prev, d) is an edge (stay close), 1/q otherwise
    (explore) — the return/in-out knobs behind DeepWalk-family embeddings.
    Step 1 (no predecessor) is the uniform draw of ``random_walks``.

    Determinism: biases are quantized to integers (resolution 1/1000), the
    per-walker choice is a cumulative-integer-sum draw seeded by
    ``hash64(walk_id:t:seed) mod total`` — identical at any parallelism,
    and bitwise engine-portable under ``hash_mode='md5'`` (the x15 device,
    extended to weighted choice with NO float in the pick).

    Scale: per step, walker state fans out to its candidate set (one
    broadcast join into the ranked adjacency, Σ outdeg(cur) rows), the
    (prev, d)-edge test is one equi-join against the deduped edge-pair
    relation, and the weighted pick is a per-walker window (bounded by max
    out-degree — the same skew bound as the adjacency build). Use sampled
    ``starts`` on hub-heavy graphs: candidate fan-out is walker-count ×
    degree, the documented cost of exact (non-rejection) node2vec."""
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be > 0, got p={p} q={q}")
    b_ret = max(1, round(N2V_BIAS_SCALE / p))
    b_com = N2V_BIAS_SCALE
    b_far = max(1, round(N2V_BIAS_SCALE / q))
    t0 = time.time()
    base = K.materialize(ranked_adjacency(edges))
    pairs = base.select("src", "dst")  # deduped edge relation for the (prev, d) test
    outdeg = base.groupBy(F.col("src").alias("node")).agg(
        F.first("outdeg").alias("node_outdeg")
    )
    nbr = K.materialize(
        base.join(
            F.broadcast(outdeg.select(F.col("node").alias("dst"),
                                      F.col("node_outdeg").alias("dst_outdeg"))),
            "dst",
            "left",
        ).select(
            "src", "rank", "dst", "outdeg",
            F.coalesce("dst_outdeg", F.lit(0).cast("long")).alias("dst_outdeg"),
        )
    )
    if starts is None:
        cur = outdeg.select(
            F.col("node").alias("walk_id"), F.col("node"), F.col("node_outdeg")
        )
    else:
        cur = starts.select(F.col("id").alias("walk_id"), F.col("id").alias("node")).join(
            F.broadcast(outdeg), "node", "left"
        ).select(
            "walk_id", "node",
            F.coalesce("node_outdeg", F.lit(0).cast("long")).alias("node_outdeg"),
        )
    cur = K.materialize(cur)
    stats = WalkStats(walkers=cur.count())
    rows = [cur.select("walk_id", F.lit(0).alias("step"), "node")]

    # step 1: uniform (no predecessor), the random_walks draw
    draw1 = cur.filter(F.col("node_outdeg") > 0).select(
        "walk_id", "node",
        F.pmod(
            _hash64(F.concat_ws(":", F.col("walk_id"), F.lit(1), F.lit(seed)), hash_mode),
            F.col("node_outdeg"),
        ).alias("pick"),
    )
    if broadcast_state:
        draw1 = F.broadcast(draw1)
    alive = K.materialize(
        nbr.join(draw1, (nbr.src == draw1.node) & (nbr.rank == draw1.pick)).select(
            "walk_id",
            F.col("node").alias("prev"),
            F.col("dst").alias("node"),
            F.col("dst_outdeg").alias("node_outdeg"),
        )
    )
    rows.append(alive.select("walk_id", F.lit(1).alias("step"), "node"))
    stats.steps = 1

    from pyspark.sql import Window

    w_cum = Window.partitionBy("walk_id").orderBy("rank")
    w_all = Window.partitionBy("walk_id")
    for t in range(2, walk_length + 1):
        state = alive.filter(F.col("node_outdeg") > 0)
        if broadcast_state:
            state = F.broadcast(state)
        cands = nbr.join(state, nbr.src == state.node).select(
            "walk_id", "prev", "rank", "dst", "dst_outdeg"
        )
        flagged = cands.join(
            pairs.select(F.col("src").alias("prev"), F.col("dst").alias("dst"),
                         F.lit(1).alias("_common")),
            ["prev", "dst"], "left",
        ).select(
            "walk_id", "rank", "dst", "dst_outdeg",
            F.when(F.col("dst") == F.col("prev"), F.lit(b_ret))
            .when(F.col("_common").isNotNull(), F.lit(b_com))
            .otherwise(F.lit(b_far)).cast("long").alias("w"),
        )
        scored = flagged.select(
            "walk_id", "rank", "dst", "dst_outdeg", "w",
            F.sum("w").over(w_cum).alias("cum"),
            F.sum("w").over(w_all).alias("total"),
        )
        r_draw = F.pmod(
            _hash64(F.concat_ws(":", F.col("walk_id"), F.lit(t), F.lit(seed)), hash_mode),
            F.col("total"),
        )
        hits = scored.filter(F.col("cum") > r_draw)
        first = hits.groupBy("walk_id").agg(F.min("rank").alias("rank"))
        # the NEW prev is the walker's position before this hop
        prev_of = alive.select("walk_id", F.col("node").alias("prev"))
        if broadcast_state:
            prev_of = F.broadcast(prev_of)
        alive = K.materialize(
            hits.join(first, ["walk_id", "rank"]).join(prev_of, "walk_id").select(
                "walk_id",
                "prev",
                F.col("dst").alias("node"),
                F.col("dst_outdeg").alias("node_outdeg"),
            )
        )
        rows.append(alive.select("walk_id", F.lit(t).alias("step"), "node"))
        stats.steps = t
        if alive.isEmpty():
            break
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    stats.wall_sec = time.time() - t0
    return out, stats


def embed_walks(
    walks: DataFrame,
    dim: int = 32,
    window: int = 5,
    min_count: int = 0,
    max_iter: int = 1,
    seed: int = 42,
) -> DataFrame:
    """node2vec/DeepWalk step 2: train skip-gram embeddings over the walk
    corpus with Spark ML's Word2Vec (distributed fit — the JVM-side
    implementation, no Python in the hot path). Input is the
    ``(walk_id, step, node)`` relation from random_walks/node2vec_walks;
    output is ``(id, vector array<float>)`` per visited node.

    The composition random_walks/node2vec_walks → embed_walks →
    sim.rp_near_duplicates / brute_force_topk is the full embedding
    pipeline: generate corpus, train, then similarity-search the result.
    Training is seeded but floating-point and partition-order dependent —
    embeddings are validated structurally (communities cluster), never
    byte-compared."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.sql import Window as W

    sent = (
        walks.withColumn("_s", F.col("node").cast("string"))
        .groupBy("walk_id")
        .agg(F.array_sort(F.collect_list(F.struct("step", "_s"))).alias("_ss"))
        .select(F.transform("_ss", lambda s: s["_s"]).alias("sentence"))
    )
    w2v = Word2Vec(
        vectorSize=dim, windowSize=window, minCount=min_count, maxIter=max_iter,
        seed=seed, inputCol="sentence", outputCol="_vec",
    )
    model = w2v.fit(sent)
    vecs = model.getVectors()  # (word, vector)
    from pyspark.ml.functions import vector_to_array

    return vecs.select(
        F.col("word").cast("long").alias("id"),
        vector_to_array("vector", "float32").alias("vector"),
    )


def sampled_adjacency(
    edges: DataFrame,
    fanout: int,
    hop: int = 1,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-node seeded neighbor sample: for every source keep the
    ``fanout`` neighbors with the smallest ``(hash(src:dst:seed:hop)
    mod 1000003, dst)`` draw — the content-addressed coin every sampler
    here uses (slpa.py, text/sampling.py), so the sample is a pure
    function of the edge and reproducible at any parallelism (and, under
    ``hash_mode='md5'``, in any engine). One window partitioned by src —
    per-vertex groups, never global. Returns ``(src, dst)``."""
    from pyspark.sql import Window

    if fanout < 1:
        raise ValueError(f"fanout must be >= 1, got {fanout}")
    draw = F.pmod(
        _hash64(
            F.concat_ws(
                ":", F.col("src"), F.col("dst"), F.lit(str(seed)), F.lit(str(hop))
            ),
            hash_mode,
        ),
        F.lit(1_000_003),
    )
    w = Window.partitionBy("src").orderBy(draw, "dst")
    return (
        edges.select("src", "dst")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= fanout)
        .drop("_r")
    )


def neighbor_sample(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (5, 3),
    roots: DataFrame | None = None,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """GraphSAGE-style L-hop fan-out sampling (Hamilton et al., NeurIPS
    2017) — the minibatch neighborhood extraction step of every GNN
    training pipeline, as a relational plan. Returns one row per sampled
    edge: ``(root, hop, src, dst)`` with hop 1..len(fanouts).

    Scale shape: each hop h draws its own ``sampled_adjacency`` (hop-
    salted coin, one src-partitioned window over E — never a global
    window), then expands the previous hop's DISTINCT ``(root, node)``
    frontier with ONE join into that ≤ fanout·V relation. Sampling is
    *shared* per node within a hop — all roots reaching node v at hop h
    see the same sampled neighbors (the draw is keyed by the edge, not
    the root), which is what caps the join's right side at fanout·V and
    makes the plan reusable across minibatches; resample by changing
    ``seed``. The frontier is broadcast when small
    (``broadcast_frontier``), the ≳10⁹-root escape hatch is the plain
    shuffled equi-join.

    Row growth is the product of fanouts per root — bounded by
    construction (|roots|·Πf), the quantity a GNN trainer budgets for.

    Reference parity note: the reference engine has no sampling ops;
    this serves the training-data-pipeline brief (graph learning data
    prep over the link graph).
    """
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    if roots is None:
        roots = G.vertices(edges)
    frontier = roots.select(F.col("id").alias("root"), F.col("id").alias("node"))
    out = None
    for h, f in enumerate(fanouts, start=1):
        adj = sampled_adjacency(edges, f, hop=h, seed=seed, hash_mode=hash_mode)
        fr = F.broadcast(frontier) if broadcast_frontier else frontier
        hop_edges = K.materialize(
            fr.join(adj, fr["node"] == adj["src"]).select(
                "root", F.lit(h).alias("hop"), "src", "dst"
            )
        )
        out = hop_edges if out is None else out.unionByName(hop_edges)
        frontier = hop_edges.select("root", F.col("dst").alias("node")).distinct()
    return out
