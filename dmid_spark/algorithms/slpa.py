"""SLPA — Speaker-Listener Label Propagation (SURVEY.md §2.4 L1-L3).

Reference: Metrics/src/ocd/algorithm/SLPA/SLPA.java:131-157 (main loop),
Node.java:58-89 (listen), Node.java:111-127 (speak), SLPA.java:183-218
(post-processing threshold), SLPA.java:163-177 (Fisher-Yates order).

The reference is *asynchronous*: nodes listen in a random order and each
listener sees memories already mutated earlier in the same iteration.
Exact parity is therefore impossible in a parallel engine (SURVEY.md §5
item 7); this is the standard **synchronous** variant: every listener in
iteration t samples from speaker memories as of iteration t-1. Sampling is
fully deterministic given ``seed`` — the per-(iteration, listener, speaker)
uniform draw is ``xxhash64`` of those three values, so results are
reproducible across runs, partitionings, and parallelism levels.

State is one tall DataFrame ``memory(node, label, cnt)`` (Σ cnt per node =
t+1). Each iteration is: edge⋈memory join + two window functions + a
groupBy mode — all Catalyst; no Python in the loop body. At scale the
memory table is O(V · distinct-labels-per-node) ≤ O(V·t) but in practice
collapses quickly as labels concentrate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K

_HMOD = 1 << 20  # uniform-draw resolution


@dataclass
class SlpaStats:
    iterations: int = 0
    memory_rows: int = 0
    wall_sec: float = 0.0
    distinct_labels: list[int] = field(default_factory=list)


def _draw_hash(seed: int, it: int, hash_mode: str) -> F.Column:
    """Deterministic per-(iteration, listener, speaker) draw in [0, _HMOD):
    xxhash64 by default; 'md5' uses the 60-bit md5-prefix (engine-portable,
    the DuckDB oracle twin's mode — same trick as fingerprint.py)."""
    if hash_mode == "md5":
        s = F.concat_ws(",", F.lit(seed), F.lit(it), F.col("dst"), F.col("src"))
        h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.lit(seed), F.lit(it), "dst", "src")
    return F.pmod(h, F.lit(_HMOD))


def slpa_memories(
    edges: DataFrame,
    iterations: int = 20,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    broadcast_state: bool = True,
) -> tuple[DataFrame, SlpaStats]:
    """Run the speaker-listener loop; returns (memory(node, label, cnt),
    stats). Listeners receive along *in*-edges (speaker = src, listener =
    dst), matching the reference's neighbor iteration over the undirected
    jgrapht view — feed a symmetrized edge table for undirected semantics.

    ``broadcast_state`` hints the O(V·labels) cumulative-memory table into
    the per-iteration edge join, so each superstep is a map-side join plus
    ONE shuffle (the listener groupBy) instead of re-shuffling the edge
    table every iteration; disable at the ≳10⁹-vertex regime (same escape
    hatch as lpa/components/dmid).
    """
    import time

    t0 = time.time()
    verts = K.materialize(G.vertices(edges))
    memory = K.materialize(
        verts.select(
            F.col("id").alias("node"), F.col("id").alias("label"), F.lit(1).alias("cnt")
        )
    )
    stats = SlpaStats()
    w_cum = Window.partitionBy("node").orderBy("label")
    for it in range(1, iterations + 1):
        total = it  # Σ cnt per node before this iteration
        # speaker memory with cumulative counts: pick the label whose
        # cumulative range covers the (deterministic) uniform draw
        mem_cum = memory.select(
            F.col("node").alias("speaker"),
            "label",
            (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("lo"),
            F.sum("cnt").over(w_cum).alias("hi"),
        )
        draws = edges.select(
            F.col("src").alias("speaker"),
            F.col("dst").alias("listener"),
            (
                (_draw_hash(seed, it, hash_mode) / F.lit(float(_HMOD)))
                * F.lit(float(total))
            ).alias("r"),
        )
        if broadcast_state:
            mem_cum = F.broadcast(mem_cum)
        heard = draws.join(mem_cum, "speaker").filter(
            (F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi"))
        )
        # listener takes the most frequent heard label (tie → smallest label,
        # deterministic stand-in for the reference's Random tiebreak,
        # Node.java:81-88)
        counts = heard.groupBy(F.col("listener").alias("node"), "label").agg(
            F.count("*").alias("c")
        )
        w_pick = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        picked = (
            counts.withColumn("rn", F.row_number().over(w_pick))
            .filter(F.col("rn") == 1)
            .select("node", "label", F.lit(1).alias("cnt"))
        )
        # nodes with no in-edges hear nothing and re-speak their own top
        # label (memory unchanged except the self-echo keeps totals aligned)
        silent = (
            memory.withColumn(
                "rn", F.row_number().over(Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label")))
            )
            .filter(F.col("rn") == 1)
            .join(picked.select("node"), "node", "left_anti")
            .select("node", "label", F.lit(1).alias("cnt"))
        )
        memory = K.materialize(
            memory.unionByName(picked)
            .unionByName(silent)
            .groupBy("node", "label")
            .agg(F.sum("cnt").alias("cnt"))
        )
        stats.iterations = it
    stats.memory_rows = memory.count()
    stats.wall_sec = time.time() - t0
    return memory, stats


def slpa_post_process(memory: DataFrame, r: float = 0.1) -> DataFrame:
    """Label kept iff cnt / memory-size ≥ r (SLPA.java:183-218); returns an
    overlapping cover ``(node, community, degree)`` with degree = the label
    probability. Community id = label id."""
    totals = memory.groupBy("node").agg(F.sum("cnt").alias("tot"))
    return (
        memory.join(totals, "node")
        .select(
            "node",
            F.col("label").alias("community"),
            (F.col("cnt") / F.col("tot")).alias("degree"),
        )
        .filter(F.col("degree") >= r)
    )


def slpa(
    edges: DataFrame,
    iterations: int = 20,
    r: float = 0.1,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    broadcast_state: bool = True,
) -> tuple[DataFrame, SlpaStats]:
    """Full SLPA: loop + threshold post-processing → overlapping cover."""
    memory, stats = slpa_memories(
        edges, iterations=iterations, seed=seed, hash_mode=hash_mode,
        broadcast_state=broadcast_state,
    )
    return slpa_post_process(memory, r=r), stats
