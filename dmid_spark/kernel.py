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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager

STATE_SCHEMA = "id long, value double"


# --------------------------------------------------------------------------
# join-mode SpMV
# --------------------------------------------------------------------------
def spmv_join_step(
    edges: DataFrame, x: DataFrame, weight_col: str = "weight",
    broadcast_state: bool = True,
) -> DataFrame:
    """``y[dst] = Σ_{src→dst} weight · x[src]``.

    One message-exchange superstep (DMID/DMIDComputation.java:270-292) as a
    join + hash aggregate. Only vertices with in-edges appear in the output
    (relational sparsity: absent row = 0).

    The state side carries an explicit broadcast hint by default:
    iterative state is localCheckpointed, so Catalyst has no size stats and
    would pick a sort-merge join that re-sorts the (large) edge side every
    superstep — measured 40+ s/superstep vs ~2 s with the hint at 77M
    edges. Disable only when the vertex state itself is too large to
    broadcast (≳10^9 vertices), where the shuffle join is the only option.
    """
    xs = F.broadcast(x) if broadcast_state else x
    return (
        edges.join(xs, edges.src == x.id)
        .groupBy(edges.dst.alias("id"))
        .agg(F.sum(F.col(weight_col) * F.col("value")).alias("value"))
    )


def complete_vector(y: DataFrame, verts: DataFrame, default: float = 0.0) -> DataFrame:
    """Left-complete a sparse state vector over the full vertex set."""
    return verts.join(y, "id", "left").select(
        "id", F.coalesce("value", F.lit(default)).alias("value")
    )


def deterministic_sum(
    df: DataFrame, key_col: str, val_col: str, buckets: int = 1024
) -> float:
    """Order-independent float sum of ``val_col`` keyed by unique ``key_col``:
    two-stage bucketed sorted-fold. Stage 1 folds each ``key % buckets``
    bucket's values in ascending key order; stage 2 folds the ≤ ``buckets``
    partials in bucket order. The physical layout of ``df`` (partitioning,
    row order — which Spark does NOT fix across e.g. a checkpoint/resume
    parquet round-trip) can never change the result, unlike a plain
    ``F.sum`` whose partial-aggregation order follows the input layout.

    Used for the per-superstep scalar reductions (dangling mass) where
    bit-identical crash/resume is promised. Distributed: per-bucket fold
    buffers hold |rows|/buckets values in expectation; raise ``buckets``
    for very large reductions."""
    k, v = F.col(key_col), F.col(val_col)
    stage1 = (
        df.select(F.pmod(k, F.lit(buckets)).alias("b"), k.alias("k"), v.alias("v"))
        .groupBy("b")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("k", "v"))),
                F.lit(0.0),
                lambda acc, s: acc + s["v"],
            ).alias("p")
        )
    )
    row = stage1.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "p"))),
            F.lit(0.0),
            lambda acc, s: acc + s["p"],
        ).alias("s")
    ).first()
    return float(row["s"] or 0.0)


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
# RDD-resident CSR blocks: the fast path for *repeated* SpMV
# --------------------------------------------------------------------------
@dataclass
class CsrRddBlocks:
    """Per-partition CSR blocks held as NumPy arrays in a persisted RDD.

    The Arrow-UDF path (``spmv_csr_step``) re-converts the cached edge rows
    to Arrow/pandas and re-sorts by bucket on EVERY superstep — measured at
    ~0.9 s/iteration for a 3.1M-edge graph regardless of core count (pure
    fixed cost). Building the blocks once (one Arrow pass via
    ``mapInPandas``) and persisting the pickled NumPy arrays drops the
    per-superstep cost to the actual multiply (~4x faster at 3M edges, far
    more at larger graphs) and makes the remaining work scale with cores.
    The multiply itself is one ``np.add.reduceat`` per partition — the
    row-compressed (dst-sorted) form of the reference's CCS multiply
    (Metrics RandomWalkLabelPropagationAlgorithm.java:99,149), distributed.
    """

    blocks: object  # RDD[(uniq_dst: int64[], starts: int64[], src: int64[], w: float64[])]
    n: int
    num_parts: int
    dst_partitioned: bool = False

    def unpersist(self):
        self.blocks.unpersist()


def build_csr_rdd(
    edges: DataFrame,
    n: int,
    num_parts: int | None = None,
    shuffle: bool = False,
    unit_weights: bool = False,
) -> CsrRddBlocks:
    """Compress each edge partition to a dst-sorted CSR block (one Arrow
    pass; no per-row Python).

    ``shuffle=False`` (default) builds blocks straight off the input's
    natural partitioning — no 77M-row exchange; correctness does not need
    dst-disjoint partitions because the driver merge *accumulates* slices.
    ``shuffle=True`` hash-partitions by dst first (useful when the input's
    partitioning is badly skewed). ``unit_weights=True`` drops the weight
    array entirely (unweighted ops: 4 bytes/edge shipped per superstep —
    src as int32 while n < 2^31). Id bounds are validated inside the build
    tasks."""
    import pickle

    spark = edges.sparkSession
    if num_parts is None:
        num_parts = spark.sparkContext.defaultParallelism
    if shuffle:
        edges = edges.repartition(num_parts, "dst")
    src_dtype = np.int32 if n < 2**31 else np.int64

    def to_payload(it):
        srcs, dsts, ws = [], [], []
        for pdf in it:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64))
            dsts.append(pdf["dst"].to_numpy(dtype=np.int64))
            if not unit_weights:
                ws.append(pdf["weight"].to_numpy(dtype=np.float64))
        if srcs:
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            lo = min(src.min(), dst.min())
            hi = max(src.max(), dst.max())
            if lo < 0 or hi >= n:
                raise ValueError(
                    f"CSR mode requires dense vertex ids in [0, {n}); found "
                    f"[{lo}, {hi}]. Run graph.densify_ids(edges) first."
                )
            w = np.concatenate(ws) if ws else None
            order = np.argsort(dst, kind="stable")
            src, dst = src[order].astype(src_dtype), dst[order]
            w = w[order] if w is not None else None
            uniq, starts = np.unique(dst, return_index=True)
            yield pd.DataFrame(
                {"payload": [pickle.dumps((uniq, starts, src, w), protocol=5)]}
            )

    payloads = edges.select("src", "dst", *([] if unit_weights else ["weight"])).mapInPandas(
        to_payload, "payload binary"
    )
    from pyspark import StorageLevel

    # MEMORY_AND_DISK: evicting a block must spill, never drop — recompute
    # replays the entire upstream plan (degree aggs + joins + normalization)
    # per superstep, which showed up as 10x superstep variance when two
    # block RDDs shared the heap
    blocks = (
        payloads.rdd.map(lambda r: pickle.loads(bytes(r.payload)))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    blocks.count()  # materialize (and validate bounds)
    return CsrRddBlocks(
        blocks=blocks, n=n, num_parts=num_parts, dst_partitioned=shuffle
    )


def spmv_rdd_collect(blocks: CsrRddBlocks, x_np: np.ndarray) -> np.ndarray:
    """One SpMV superstep: broadcast x, per-partition gather-multiply-
    reduceat, then merge.

    Merge strategy follows the block layout. ``dst_partitioned`` blocks own
    disjoint destination sets, so each task returns its sparse slice and the
    driver assembles them — one stage, O(n) total bytes. Un-partitioned
    blocks each touch most destinations; collecting their results would
    ship parts×O(n) rows per superstep (measured ~300 MB and 3-8 s on 77M
    edges / 64 partitions), so instead each task emits a dense partial and
    an executor-side ``treeReduce`` delivers ONE n-sized array to the
    driver regardless of partition count."""
    n = blocks.n
    sc = blocks.blocks.context
    bx = sc.broadcast(x_np)

    if blocks.dst_partitioned:

        def mult(it):
            for (uniq, starts, src, w) in it:
                xa = bx.value[src]
                contrib = xa if w is None else w * xa
                yield (uniq, np.add.reduceat(contrib, starts))

        parts = blocks.blocks.mapPartitions(mult).collect()
        y = np.zeros(n)
        for ids, vals in parts:
            y[ids] += vals
        bx.destroy()
        return y

    def mult_dense(it):
        y = np.zeros(n)
        empty = True
        for (uniq, starts, src, w) in it:
            empty = False
            xa = bx.value[src]
            contrib = xa if w is None else w * xa
            y[uniq] += np.add.reduceat(contrib, starts)
        if not empty:
            yield y

    # treeReduce raises on an empty RDD; an empty block set yields the zero
    # vector (parity with the dst-partitioned path). blocks is persisted, so
    # isEmpty() is a cheap cached take(1), not a recompute of the multiply.
    if blocks.blocks.isEmpty():
        bx.destroy()
        return np.zeros(n)
    partials = blocks.blocks.mapPartitions(mult_dense)
    y = partials.treeReduce(lambda a, b: a + b, depth=2)
    bx.destroy()
    return y


def out_weight_vector(edges: DataFrame, n: int, weighted: bool = True) -> np.ndarray:
    """Dense out-degree (or summed out-weight) vector — the driver-side
    normalization twin for raw-edge CSR blocks: folding 1/outw into the
    broadcast vector replaces the per-edge normalization join + 77M-row
    materialization with one map-side-combined aggregate."""
    agg = F.sum("weight") if weighted else F.count("*").cast("double")
    pdf = edges.groupBy("src").agg(agg.alias("w")).toPandas()
    out = np.zeros(n)
    out[pdf["src"].to_numpy()] = pdf["w"].to_numpy()
    return out


# --------------------------------------------------------------------------
# skew handling: salted two-stage aggregation
# --------------------------------------------------------------------------
def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "value",
    num_salts: int = 16,
) -> DataFrame:
    """Skew-tolerant sum: ``groupBy(keys, salt)`` partial → ``groupBy(keys)``
    final (the north_star's salted high-degree-vertex handling).

    Spark's hash aggregate already map-side-combines algebraic aggregates,
    so plain ``groupBy(dst).sum()`` tolerates hub vertices in the SpMV path
    — this helper is for the cases partial aggregation does NOT cover:
    (a) aggregating immediately after an exchange that clustered a hot key
    into one task (e.g. a repartition('dst') layout reused across
    supersteps), and (b) pre-reducing before a shuffle whose single hot-key
    partition would otherwise exceed a task's memory. The salt is a
    deterministic hash of the full row content (xxhash64 of all columns),
    so results are reproducible at any parallelism."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


# --------------------------------------------------------------------------
# JVM-resident SpMV: broadcast state vector, edges never leave the JVM
# --------------------------------------------------------------------------
@dataclass
class JvmEdges:
    """Edge table cached JVM-side (columnar, whole-stage codegen) for
    repeated SpMV with a driver-resident dense state vector.

    Per superstep the only cross-boundary traffic is the state vector
    itself: x ships driver→JVM as one Arrow batch (broadcast hash join
    build side), y ships back as one Arrow batch (``toPandas``). The
    21.6M-edge profile: per-iteration wall is dominated by the JVM
    scan+probe+aggregate, which scales with cores — unlike the pickled-RDD
    path, whose per-iteration block transfer saturates the local socket.
    """

    edges: DataFrame  # cached (src, dst, weight)
    n: int

    def unpersist(self):
        self.edges.unpersist()


def build_jvm_edges(edges: DataFrame, n: int, num_parts: int | None = None) -> JvmEdges:
    if num_parts is None:
        num_parts = edges.sparkSession.sparkContext.defaultParallelism
    cached = edges.repartition(num_parts, "dst").persist()
    cached.count()
    return JvmEdges(edges=cached, n=n)


def spmv_jvm_collect(j: JvmEdges, x_np: np.ndarray) -> np.ndarray:
    """y = A·x with A JVM-cached: broadcast x as the join build side, one
    scan+probe+hash-agg job, Arrow collect of the (sparse) result."""
    spark = j.edges.sparkSession
    xdf = dense_vector_df(spark, x_np)
    y_pdf = (
        j.edges.join(F.broadcast(xdf), j.edges.src == xdf.id)
        .groupBy(j.edges.dst.alias("id"))
        .agg(F.sum(F.col("weight") * F.col("value")).alias("value"))
        .toPandas()
    )
    y = np.zeros(j.n)
    if len(y_pdf):
        y[y_pdf["id"].to_numpy()] = y_pdf["value"].to_numpy()
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
    iter_secs: list[float] = field(default_factory=list)  # per-superstep wall


def dense_vector_df(spark, x_np: np.ndarray) -> DataFrame:
    """Dense NumPy state vector → (id, value) DataFrame via one Arrow batch
    (never a Python row loop)."""
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(x_np), dtype=np.int64), "value": x_np})
    )


def materialize(df: DataFrame) -> DataFrame:
    """Cut iterative lineage: eager local checkpoint (executor-resident)."""
    return df.localCheckpoint(eager=True)


def _ranged_with_mid(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + sort-within-partitions + monotonic id tag — the
    distributed (no single-partition exchange) half of ``distributed_rank``,
    split out so plan tests can inspect it before materialization."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    return (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
    )


def distributed_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 0-based rank of rows ordered by ``order_cols`` — the
    distributed replacement for ``row_number().over(Window.orderBy(...))``.

    An unpartitioned window funnels the whole relation through ONE task; this
    instead range-partitions on the order key, sorts within partitions, tags
    each row with ``monotonically_increasing_id`` (partition id in the upper
    31 bits, sequential record number in the lower 33), collects only the
    O(num_partitions) per-partition counts to the driver, and broadcasts the
    cumulative offsets back as a tiny join — zipWithIndex semantics with no
    single-partition exchange and no per-row Python.

    ``order_cols`` must define a total order (unique key) for the result to
    be deterministic — same caveat as ``row_number`` itself, but here ties
    may additionally split across range-partition boundaries.
    """
    spark = df.sparkSession
    ranged = materialize(_ranged_with_mid(df, order_cols, num_partitions))
    counts = (
        ranged.groupBy(F.shiftright("_mid", 33).alias("_pid"))
        .agg(F.count("*").alias("_cnt"))
        .collect()
    )
    # rank = (rows in earlier partitions) + local index, where
    # local index = _mid - (pid << 33); fold both into one additive term.
    adj, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        adj.append((int(r["_pid"]), acc - (int(r["_pid"]) << 33)))
        acc += int(r["_cnt"])
    adj_df = spark.createDataFrame(adj, "_pid int, _adj long")
    return (
        ranged.withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
        .join(F.broadcast(adj_df), "_pid")
        .withColumn(out_col, (F.col("_mid") + F.col("_adj")).cast("long"))
        .drop("_pid", "_mid", "_adj")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global EXCLUSIVE prefix sum of ``value_col`` over rows ordered by
    ``order_cols`` (each row gets the sum of all strictly-earlier rows) —
    the distributed replacement for ``sum().over(Window.orderBy(...))``,
    which funnels the whole relation through ONE task.

    Same machinery as :func:`distributed_rank`: range-partition on the
    order key, sort within partitions, per-partition prefix via a window
    PARTITIONED by the range-partition id (never global), collect only the
    O(num_partitions) per-partition totals, broadcast the cumulative
    offsets back. Integer values make the result bitwise engine-portable
    (the add order cannot matter). ``order_cols`` must be a unique key."""
    spark = df.sparkSession
    ranged = materialize(_ranged_with_mid(df, order_cols, num_partitions))
    tagged = ranged.withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
    totals = tagged.groupBy("_pid").agg(F.sum(value_col).alias("_t")).collect()
    adj, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        adj.append((int(r["_pid"]), acc))
        acc += int(r["_t"] or 0)
    adj_df = spark.createDataFrame(adj, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_mid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0).cast("long"))
    return (
        tagged.join(F.broadcast(adj_df), "_pid")
        .withColumn(out_col, (local + F.col("_off")).cast("long"))
        .drop("_pid", "_mid", "_off")
    )


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
        t_it = time.time()
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
        stats.iter_secs.append(time.time() - t_it)
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
