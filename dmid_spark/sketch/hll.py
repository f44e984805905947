"""HyperLogLog distinct-count sketch as a DataFrame aggregate.

The registers are the operator's real output: an HLL sketch over a key
column, per group, is ``2^p`` integer registers ``M[j] = max rho`` — a
tiny, MERGEABLE summary (register-wise max) that a 100 TB pipeline ships
between stages instead of exact distinct sets. Register construction is
pure integer/string column expressions (hash → bucket index + leading-zero
rank), so the driver query is bitwise-verifiable against the DuckDB twin
under ``hash_mode='md5'`` (the engine-portable 60-bit md5-prefix hash,
dedup.py::_hash64); estimation (floating point) is a driver-side function
over the collected ≤2^p rows per group, tested against exact counts.

Flajolet et al. 2007 (HyperLogLog) with the standard small-range
linear-counting correction; bias constant alpha_m per the paper.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.dedup import _hash64

# hash width in bits: md5 mode yields a 60-bit non-negative value; xxhash64
# is folded to the same width so both modes share the register math
_HASH_BITS = 60


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """HLL registers per group: ``(*group_cols, register, rho)`` with
    ``register = first p hash bits`` and ``rho = max over keys of
    (1 + leading zeros of the remaining bits)``. Only non-empty registers
    are emitted (≤ 2^p rows per group).

    Scale: one scan + one partial-aggregating groupBy keyed
    (group, register) — the sketch never exceeds 2^p rows per group, so
    downstream merges/collects are O(2^p), not O(distinct)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    gcols = list(group_cols or [])
    h = _hash64(F.col(key_col).cast("string"), hash_mode)
    if hash_mode != "md5":
        # fold the signed 64-bit xxhash into the shared 60-bit width
        h = F.pmod(h, F.lit(1 << _HASH_BITS))
    rem_bits = _HASH_BITS - p
    reg = F.shiftright(h, rem_bits).cast("int").alias("register")
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # rho = 1 + leading zeros of rem within rem_bits = position of the first
    # '1' in the zero-padded binary string (rem_bits + 1 when rem == 0).
    # Integer/string ops only — bitwise-portable across engines.
    bits = F.lpad(F.bin(rem), rem_bits, "0")
    rho = (
        F.when(rem == 0, F.lit(rem_bits + 1))
        .otherwise(F.instr(bits, "1"))
        .cast("int")
    )
    return (
        df.select(*gcols, reg, rho.alias("rho"))
        .groupBy(*gcols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def merge_registers(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two register tables (the HLL union): register-wise max."""
    gcols = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gcols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], p: int = 8) -> float:
    """Cardinality estimate from one group's (register, rho) rows —
    driver-side math over ≤ 2^p values (the sketch is tiny by design).
    Standard HLL estimator with the small-range linear-counting switch."""
    m = 1 << p
    if p >= 7:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif p == 6:
        alpha = 0.709
    elif p == 5:
        alpha = 0.697
    else:
        alpha = 0.673
    filled = {reg: rho for reg, rho in registers}
    s = sum(2.0 ** -rho for rho in filled.values()) + (m - len(filled))
    est = alpha * m * m / s
    zeros = m - len(filled)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_distinct_counts(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    hash_mode: str = "xxhash64",
    max_groups: int = 10_000,
) -> dict[tuple, float]:
    """Convenience end-to-end: registers → per-group estimates (driver-side
    dict keyed by the group tuple; () for the global group).

    DRIVER-SIDE FAN-IN: this collects O(groups · 2^p) register rows to the
    driver — the right tool for dashboards/reports over a bounded group set,
    NOT for high-cardinality groups. Raises when the group count exceeds
    ``max_groups``; at scale, keep the mergeable register TABLE from
    :func:`hll_registers` (the verified distributed artifact) and estimate
    downstream, or raise ``max_groups`` only if the driver can truly hold
    the fan-in."""
    gcols = list(group_cols or [])
    if gcols:
        n_groups = df.select(*gcols).distinct().limit(max_groups + 1).count()
        if n_groups > max_groups:
            raise ValueError(
                f"hll_distinct_counts would collect >{max_groups} groups "
                f"(x 2^{p} registers) to the driver; use hll_registers() and "
                "keep the register table distributed, or raise max_groups"
            )
    pdf = hll_registers(df, key_col, gcols, p=p, hash_mode=hash_mode).toPandas()
    out: dict[tuple, float] = {}
    if not len(pdf):
        return out
    groups = pdf.groupby(gcols) if gcols else [((), pdf)]
    for key, sub in groups:
        if gcols and not isinstance(key, tuple):
            key = (key,)
        out[key] = hll_estimate(list(zip(sub["register"], sub["rho"])), p=p)
    return out


def _est_expr(s_col, nfilled_col, p: int):
    """The hll_estimate math as column expressions (engine-portable):
    raw = alpha*m^2 / (s + zeros), linear-counting switch below 2.5m.
    ``s_col`` must be the sum of 1/2^rho over NON-EMPTY registers."""
    m = 1 << p
    if p >= 7:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif p == 6:
        alpha = 0.709
    elif p == 5:
        alpha = 0.697
    else:
        alpha = 0.673
    zeros = F.lit(float(m)) - nfilled_col
    total = s_col + zeros
    raw = F.lit(alpha * m * m) / total
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)


def _inv_rho() -> F.Column:
    """1/2^rho as an exact integer shift + power-of-two division —
    identical IEEE result in any engine (no pow() library variance);
    rho <= 61 fits the shift. (F.expr: the Python shiftleft wrapper
    requires a literal shift amount; the SQL function takes a column.)"""
    return F.expr("1.0 / shiftleft(CAST(1 AS BIGINT), rho)")


def hll_pairwise_overlap(
    registers: DataFrame,
    group_col: str,
    p: int = 8,
    round_dp: int | None = None,
) -> DataFrame:
    """Audience-overlap estimates for every unordered pair of groups from
    one :func:`hll_registers` table: ``(group_a, group_b, est_a, est_b,
    est_union, est_intersection, est_jaccard)``. The union sketch is the
    register-wise max (exact HLL merge semantics); the intersection is
    inclusion–exclusion ``est_a + est_b − est_union`` clamped at 0 (the
    standard estimator — noisier than either input, as documented in the
    HLL literature; for heavy inter/union analysis at tiny overlaps,
    prefer exact set joins on the keys).

    Scale: per-group scalar aggregates are O(groups); the pair expansion
    is groups² × ≤2^p register rows — built for a BOUNDED group set
    (event types, sources, shards), which is exactly where audience
    overlap questions live. The estimator itself is column expressions
    (1/2^rho via integer shift — no pow() library variance), so the whole
    output is engine-twin verifiable at a float rounding.
    """
    g = F.col(group_col)
    per_group = registers.groupBy(g.alias("grp")).agg(
        F.sum(_inv_rho()).alias("s"), F.count("*").alias("nf")
    )
    ga = per_group.select(
        F.col("grp").alias("group_a"), F.col("s").alias("sa"), F.col("nf").alias("na")
    )
    gb = per_group.select(
        F.col("grp").alias("group_b"), F.col("s").alias("sb"), F.col("nf").alias("nb")
    )
    # deliberate small cross join: groups are a bounded dimension here
    pairs = ga.join(gb, ga.group_a < gb.group_b)
    ra = registers.select(
        g.alias("group_a"), "register", F.col("rho").alias("rho_a")
    )
    rb = registers.select(
        g.alias("group_b"), "register", F.col("rho").alias("rho_b")
    )
    ua = pairs.select("group_a", "group_b").join(ra, "group_a")
    ub = pairs.select("group_a", "group_b").join(rb, "group_b")
    merged = ua.join(ub, ["group_a", "group_b", "register"], "full_outer").select(
        "group_a",
        "group_b",
        F.greatest(
            F.coalesce("rho_a", F.lit(0)), F.coalesce("rho_b", F.lit(0))
        ).alias("rho"),
    )
    per_pair = merged.groupBy("group_a", "group_b").agg(
        F.sum(_inv_rho()).alias("su"), F.count("*").alias("nu")
    )
    est_a = _est_expr(F.col("sa"), F.col("na"), p)
    est_b = _est_expr(F.col("sb"), F.col("nb"), p)
    est_u = _est_expr(F.col("su"), F.col("nu"), p)
    out = (
        pairs.join(per_pair, ["group_a", "group_b"])
        .select(
            "group_a",
            "group_b",
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
        )
        .select(
            "group_a",
            "group_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0.0)
            ).alias("est_intersection"),
        )
        .withColumn(
            "est_jaccard",
            F.when(
                F.col("est_union") > 0.0,
                F.col("est_intersection") / F.col("est_union"),
            ).otherwise(F.lit(0.0)),
        )
    )
    if round_dp is not None:
        for c in ("est_a", "est_b", "est_union", "est_intersection", "est_jaccard"):
            out = out.withColumn(c, F.round(c, round_dp) + F.lit(0.0))
    return out
