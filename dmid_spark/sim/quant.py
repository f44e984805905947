"""Scalar int8 quantization of an embedding column (per-dimension affine).

Not in the reference repo — LLM-pipeline extension: embedding tables
dominate storage in retrieval/dedup pipelines (a 100 TB corpus with
768-dim float32 vectors carries ~3 KB/doc of embeddings); per-dimension
affine int8 codes cut that 4x with near-zero recall loss and are the
standard interchange format between the offline pipeline and ANN servers
(FAISS SQ8, ScaNN). Composes with sim.ann: quantize after ivf_build's
coarse stage.

Spark-first shape — everything JVM-side, zero Python in the hot path:

- stats pass: per-dimension global min/max computed as D paired
  ``F.min/F.max(element_at(vec, d))`` aggregates in ONE scan — map-side
  combined, no explode (an N x D posexplode would shuffle the whole
  corpus to aggregate 2·D doubles).
- encode pass: codes via ``F.zip_with`` against broadcast per-dim
  literal arrays — pure JVM column expressions (higher-order functions
  evaluate outside whole-stage codegen but never leave the JVM; the
  plan has zero exchanges — verified with .explain).

Determinism: min/max are order-independent, the affine map is one
multiply+round per value — bit-identical at any parallelism, and the
DuckDB oracle twin replays it exactly (emb_quantize_int8).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class QuantModel:
    """Per-dimension affine codebook: value ~ mins[d] + code * scales[d]."""

    mins: list[float]
    maxs: list[float]
    scales: list[float]  # (max-min)/levels; 0.0 marks a constant dimension
    levels: int


def quant_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    levels: int = 255,
) -> QuantModel:
    """One-scan per-dimension min/max. ``dim`` defaults to the first
    non-null vector's length (one tiny extra action)."""
    if dim is None:
        probe = corpus.select(F.size(vec_col).alias("d")).filter("d > 0").first()
        if probe is None:
            raise ValueError("quant_fit: no non-empty vectors")
        dim = probe["d"]
    vec = F.col(vec_col).cast("array<double>")
    aggs = []
    for d in range(dim):
        aggs.append(F.min(F.element_at(vec, d + 1)).alias(f"mn{d}"))
        aggs.append(F.max(F.element_at(vec, d + 1)).alias(f"mx{d}"))
    row = corpus.agg(*aggs).collect()[0]
    mins = [float(row[f"mn{d}"]) for d in range(dim)]
    maxs = [float(row[f"mx{d}"]) for d in range(dim)]
    scales = [(mx - mn) / levels for mn, mx in zip(mins, maxs)]
    return QuantModel(mins=mins, maxs=maxs, scales=scales, levels=levels)


def quant_encode(
    corpus: DataFrame,
    model: QuantModel,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col``: int array, code_d = round((x_d - min_d)/scale_d)
    clamped to [0, levels] (constant dimensions encode 0). JVM-side
    zip_with against the broadcast literal codebook — no shuffle, no
    Python."""
    mins = F.array(*[F.lit(v) for v in model.mins])
    scales = F.array(*[F.lit(v) for v in model.scales])
    vec = F.col(vec_col).cast("array<double>")
    shifted = F.zip_with(vec, mins, lambda x, mn: x - mn)
    codes = F.zip_with(
        shifted,
        scales,
        lambda s, sc: F.when(sc == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(model.levels),
                F.greatest(F.lit(0), F.round(s / sc, 0).cast("int")),
            )
        ),
    )
    return corpus.withColumn(out_col, codes)


def quant_decode(
    df: DataFrame, model: QuantModel, codes_col: str = "codes",
    out_col: str = "decoded",
) -> DataFrame:
    """Reconstruct value ~ min_d + code_d * scale_d (the dequantized
    center used by ANN distance kernels)."""
    mins = F.array(*[F.lit(v) for v in model.mins])
    scales = F.array(*[F.lit(v) for v in model.scales])
    recon = F.zip_with(
        F.zip_with(F.col(codes_col), scales, lambda c, sc: c.cast("double") * sc),
        mins,
        lambda t, mn: t + mn,
    )
    return df.withColumn(out_col, recon)


def quant_error_stats(
    corpus: DataFrame,
    model: QuantModel,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row audit: mean/max absolute reconstruction error over all
    values — the number a pipeline owner checks before swapping the
    float column for codes. Single scan, scalar aggregates."""
    enc = quant_encode(corpus, model, vec_col=vec_col, out_col="__q")
    dec = quant_decode(enc, model, codes_col="__q", out_col="__r")
    err = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__r"),
        lambda x, r: F.abs(x - r),
    )
    return dec.select(F.explode(err).alias("e")).agg(
        F.mean("e").alias("mean_abs_err"),
        F.max("e").alias("max_abs_err"),
        F.count("e").alias("n_values"),
    )
