"""The shared iteration kernel.

Every phase of DMID and every standard algorithm here is an instance of one
pattern: *join vertex state to the edge table, aggregate by destination,
update state, read a scalar convergence aggregate, repeat* (SURVEY.md §7).
This module implements that kernel twice:

- **join mode** (default, unbounded scale): ``edges ⋈ state on src →
  groupBy(dst) → sum``. Pure Catalyst: whole-stage codegen, map-side partial
  aggregation (the combiner for skewed high-in-degree vertices), AQE skew
  splitting. State never leaves the cluster.

- **CSR mode** (per north_star): adjacency held as per-partition CSR blocks
  inside vectorized pandas/Arrow UDFs. The edge table is hash-range
  partitioned by ``dst`` bucket once; each superstep multiplies the blocks
  against a broadcast state vector (NumPy) — one shuffle-free Arrow pass per
  iteration. Used when the dense state vector fits in driver/executor memory
  (8 bytes/vertex ⇒ ~10^8-10^9 vertices); this mirrors — but distributes —
  the reference's dense DA aggregator (DMID/utils/DMIDMasterCompute.java:30-33),
  whose single-master residency is its scalability ceiling.

Iteration control (the MasterCompute replacement) lives in ``iterate``:
convergence on L1 delta, lineage-truncating materialization each superstep,
optional parquet checkpointing for resumability.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager

STATE_SCHEMA = "id long, value double"


# --------------------------------------------------------------------------
# join-mode SpMV
# --------------------------------------------------------------------------
def spmv_join_step(
    edges: DataFrame, x: DataFrame, weight_col: str = "weight"
) -> DataFrame:
    """``y[dst] = Σ_{src→dst} weight · x[src]``.

    One message-exchange superstep (DMID/DMIDComputation.java:270-292) as a
    join + hash aggregate. Only vertices with in-edges appear in the output
    (relational sparsity: absent row = 0).
    """
    return (
        edges.join(x, edges.src == x.id)
        .groupBy(edges.dst.alias("id"))
        .agg(F.sum(F.col(weight_col) * F.col("value")).alias("value"))
    )


def complete_vector(y: DataFrame, verts: DataFrame, default: float = 0.0) -> DataFrame:
    """Left-complete a sparse state vector over the full vertex set."""
    return verts.join(y, "id", "left").select(
        "id", F.coalesce("value", F.lit(default)).alias("value")
    )


# --------------------------------------------------------------------------
# CSR-in-Arrow-UDF SpMV
# --------------------------------------------------------------------------
@dataclass
class CsrBuckets:
    """Edge table hash-range partitioned into dst buckets, ready for
    repeated per-partition CSR multiplication."""

    bucketed: DataFrame  # (bucket, src, dst, weight), partitioned by bucket
    n: int  # number of vertices (dense ids [0, n))
    num_buckets: int


def build_csr_buckets(edges: DataFrame, n: int, num_buckets: int | None = None) -> CsrBuckets:
    """Partition edges by ``dst % num_buckets`` once; cached so every
    superstep reuses the layout with no shuffle."""
    if num_buckets is None:
        num_buckets = edges.sparkSession.sparkContext.defaultParallelism
    bounds = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"), F.max(F.greatest("src", "dst")).alias("hi")
    ).first()
    if bounds["hi"] is not None and (bounds["lo"] < 0 or bounds["hi"] >= n):
        raise ValueError(
            f"CSR mode requires dense vertex ids in [0, {n}); found id range "
            f"[{bounds['lo']}, {bounds['hi']}]. Run graph.densify_ids(edges) first."
        )
    bucketed = (
        edges.withColumn("bucket", (F.col("dst") % num_buckets).cast("int"))
        .repartition(num_buckets, "bucket")
        .persist()
    )
    bucketed.count()  # materialize
    return CsrBuckets(bucketed=bucketed, n=n, num_buckets=num_buckets)


def spmv_csr_step(buckets: CsrBuckets, x_np: np.ndarray) -> DataFrame:
    """One SpMV over the bucketed edges against a broadcast dense vector.

    Each group (one dst bucket) receives its edges as an Arrow batch,
    multiplies in NumPy (bincount == CSR row-sum over dst), and emits the
    non-zero slice of y it owns. No per-row Python anywhere.
    """
    sc = buckets.bucketed.sparkSession.sparkContext
    bx = sc.broadcast(x_np)

    def mult(pdf: pd.DataFrame) -> pd.DataFrame:
        x = bx.value
        dst = pdf["dst"].to_numpy()
        contrib = pdf["weight"].to_numpy() * x[pdf["src"].to_numpy()]
        # local CSR: compress this partition's dst ids, sum per row
        uniq, inv = np.unique(dst, return_inverse=True)
        vals = np.bincount(inv, weights=contrib, minlength=len(uniq))
        return pd.DataFrame({"id": uniq, "value": vals})

    return buckets.bucketed.groupBy("bucket").applyInPandas(mult, STATE_SCHEMA)


def spmv_csr_collect(buckets: CsrBuckets, x_np: np.ndarray) -> np.ndarray:
    """SpMV returning the dense result vector on the driver (absent rows 0).
    Used by driver loops that keep the state vector broadcast-resident."""
    rows = spmv_csr_step(buckets, x_np).collect()
    y = np.zeros(buckets.n)
    if rows:
        ids = np.fromiter((r["id"] for r in rows), dtype=np.int64, count=len(rows))
        vals = np.fromiter((r["value"] for r in rows), dtype=np.float64, count=len(rows))
        y[ids] = vals
    return y


# --------------------------------------------------------------------------
# iteration driver (MasterCompute replacement)
# --------------------------------------------------------------------------
@dataclass
class IterationStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def materialize(df: DataFrame) -> DataFrame:
    """Cut iterative lineage: eager local checkpoint (executor-resident)."""
    return df.localCheckpoint(eager=True)


def iterate(
    x0: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    tol: float = 1e-6,
    max_iter: int = 100,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
    name: str = "state",
    resume: bool = False,
) -> tuple[DataFrame, IterationStats]:
    """Iterate ``x ← step(x, i)`` until the L1 delta ``Σ|x'−x|`` < tol.

    Replaces both Giraph's fixed iteration bounds (RW_ITERATIONBOUND=10,
    DMID/DMIDComputation.java:72; RAWLPA 100 iters) with the BASELINE.json
    convergence rule. State schema must be ``(id, value)``. With a
    CheckpointManager, state + lineage + the per-iteration L1 delta land on
    disk every ``ckpt_every`` iterations and the loop can resume mid-run.
    """
    t0 = time.time()
    stats = IterationStats()
    start_it = 0
    x = None
    if resume and ckpt is not None:
        got = ckpt.latest(name)
        if got is not None:
            start_it, x, m = got
            stats.deltas = list(m.get("deltas", []))
    if x is None:
        x = materialize(x0)

    for i in range(start_it + 1, max_iter + 1):
        x_new = materialize(step(x, i))
        old = x.select("id", F.col("value").alias("_v_old"))
        new = x_new.select("id", F.col("value").alias("_v_new"))
        delta = (
            old.join(new, "id", "full")
            .select(
                F.sum(
                    F.abs(
                        F.coalesce(F.col("_v_new"), F.lit(0.0))
                        - F.coalesce(F.col("_v_old"), F.lit(0.0))
                    )
                ).alias("d")
            )
            .first()["d"]
        )
        delta = float(delta if delta is not None else 0.0)
        stats.deltas.append(delta)
        stats.iterations = i
        x = x_new
        if ckpt is not None and (i % ckpt_every == 0 or delta < tol):
            x = ckpt.save(
                x, name, i, metrics={"l1_delta": delta, "deltas": stats.deltas}
            )
        if delta < tol:
            stats.converged = True
            break
    stats.wall_sec = time.time() - t0
    return x, stats
