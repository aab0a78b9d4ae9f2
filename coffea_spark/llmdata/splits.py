"""Deterministic dataset splitting and sampling for training pipelines.

Train/val/test assignment and per-stratum sampling must be (a) stable
across runs and cluster layouts — membership is a pure function of the
row's id, never of partitioning or visit order — and (b) cheap: one
scan-stage expression, no shuffle for assignment itself.

Two hash families:

- ``portable_hash32``: Knuth multiplicative hashing on the id column
  (h = (id * 2654435761 + salt) mod 2^32). Weaker mixing than xxhash64
  but expressible in ANSI SQL, so oracle engines reproduce membership
  bit-for-bit — the correctness-gate path.
- ``xxhash64`` (Spark-native, via ``F.xxhash64``): the production path
  for arbitrary id types/content-derived keys.

Reference analogy: the reference's chunk-level determinism contract
(processor/executor.py step planning) — same inputs => same split —
applied to row-level dataset membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate, odd
_M32 = 4294967296


def portable_hash32(id_col: Column, salt: int = 0) -> Column:
    """((id + salt) * 2654435761) mod 2^32 as BIGINT — reproducible in
    any SQL engine with 64-bit integer arithmetic (ids up to ~3.4e9 stay
    inside int64 before the mod). The salt adds INSIDE the
    multiplication: an additive-outside salt would only rotate the unit
    interval by salt/2^32 and leave every assignment unchanged."""
    return F.pmod((id_col.cast("long") + F.lit(salt)) * F.lit(_KNUTH), F.lit(_M32))


def split_thresholds(fractions: dict[str, float]) -> list[int]:
    """Integer cutpoints floor(cum_fraction * 2^32) for every split but
    the last — the boundary arithmetic both engines must share.

    Cumulative fractions are accumulated with 12-decimal rounding and
    converted through exact decimal ``Fraction`` arithmetic, so a config
    like 0.8+0.1 yields the cutpoint for 0.9 exactly, never for
    0.9000000000000001 — float accumulation can land a 32-bit hash in
    the gap between the two and assign it a different split than an
    oracle that evaluates the literal 0.9."""
    from fractions import Fraction

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name in list(fractions)[:-1]:
        acc = round(acc + fractions[name], 12)
        out.append(int(Fraction(str(acc)) * _M32))
    return out


def split_column(
    id_col: Column,
    fractions: dict[str, float],
    salt: int = 0,
    portable: bool = True,
) -> Column:
    """Split-name column: h < floor(cum_fraction*2^32) compared in
    INTEGER space (``split_thresholds``) — bit-reproducible on any
    engine with 64-bit integers, no float boundary ambiguity."""
    h = (
        portable_hash32(id_col, salt)
        if portable
        else F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_M32))
    )
    expr = None
    names = list(fractions)
    for name, cut in zip(names[:-1], split_thresholds(fractions)):
        cond = h < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Assign every row to a named split. Pure scan-stage projection —
    no shuffle, no state; at any scale the split is a filter the
    optimizer pushes into the scan of downstream jobs."""
    return df.withColumn("split", split_column(F.col(id_col), fractions, salt, portable))


def sample_per_stratum(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum
    by (hash(id), id) and keep the first k. Unlike ``df.sampleBy`` this
    is reproducible across runs/executors and yields EXACTLY k rows per
    stratum (when available).

    Scale shape: one hash-partitioned sort per stratum (window). For
    very hot strata, pre-filter by a hash threshold (~k/stratum_size
    quantile) first so the sort touches a sliver — same two-phase trick
    as distributed top-k."""
    h = (
        portable_hash32(F.col(id_col), salt)
        if portable
        else F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(_M32))
    )
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row gets key u^(1/w) with u derived from the portable id hash, and
    the global top-k keys are the sample — inclusion probability
    proportional to weight, exactly one pass.

    Spark shape: the key is scan-stage column math; top-k is
    TakeOrderedAndProject (per-partition heads only — no global sort,
    no full shuffle). Deterministic and partitioning-independent: the
    same (id, salt) always draws the same u, so reruns and executors
    agree — the property df.sample cannot give. u is mapped into
    ((h+1)/(2^32+1)) in (0,1) so log(u) is finite; zero/negative
    weights are excluded (their key would be 0 = never sampled first,
    but excluding them keeps log/pow well-defined)."""
    u = (portable_hash32(F.col(id_col), salt) + 1) / F.lit(float(_M32 + 1))
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .withColumn("_skey", key)
        .orderBy(F.col("_skey").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_skey")
    )


#: lowbias32-style finalizer constants, BOTH chosen so (2^32-1) * C stays
#: inside int64 — the murmur fmix32 constants do not (0x85ebca6b * 2^32
#: overflows), which is why this variant exists
_MIX_C1 = 0x7FEB352D
_MIX_C2 = 0x735A2D97


def portable_mix32(col: Column, salt: int = 0) -> Column:
    """Full-avalanche 32-bit mix of an integer column (xor-shift +
    multiply rounds, every step reduced mod 2^32) — replayable in any
    SQL engine with int64 math and xor/shift. Use this instead of
    ``portable_hash32`` when DOWNSTREAM BITS must look random (HLL rho,
    bucket+suffix splits): Knuth multiplication alone is a bijection
    with no avalanche, and e.g. HyperLogLog over sequential ids is ~2x
    biased with it (measured) versus ~5% with this mix."""
    h = F.pmod(col.cast("long") + F.lit(salt), F.lit(_M32))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = F.pmod(h * F.lit(_MIX_C1), F.lit(_M32))
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = F.pmod(h * F.lit(_MIX_C2), F.lit(_M32))
    return h.bitwiseXOR(F.shiftright(h, 16))


def alpha_sampling_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
    budget: int | None = None,
) -> DataFrame:
    """XLM-R/mT5-style temperature sampling rates: resample groups
    (languages) with probability proportional to p_g^alpha, flattening
    the head so low-resource groups are up-weighted. Returns one row
    per group with its count and target KEEP RATE scaled to ``budget``
    total rows (default: the corpus size, i.e. pure re-balancing).
    Rates cap at 1.0 — this operator subsamples, it does not duplicate
    (pair with weighted_sample for over-sampling small groups).
    One tiny aggregation; the rate table broadcasts back."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_total"),
        F.sum(F.pow(F.col("n"), F.lit(float(alpha)))).alias("_zsum"),
    )
    b = F.lit(float(budget)) if budget is not None else F.col("_total")
    return counts.crossJoin(tot).select(
        group_col,
        "n",
        F.least(
            F.pow(F.col("n"), F.lit(float(alpha))) / F.col("_zsum") * b
            / F.col("n"),
            F.lit(1.0),
        ).alias("keep_rate"),
    )


def alpha_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.3,
    budget: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic alpha-temperature subsample: keep a row when its
    portable id-hash unit value falls under its group's keep_rate —
    reproducible under any partitioning (df.sample is not), scan-stage
    after one broadcast join of the per-group rate table."""
    rates = alpha_sampling_rates(df, group_col, alpha, budget)
    u = (portable_hash32(F.col(id_col), salt) + 1) / F.lit(float(_M32 + 1))
    return (
        df.join(F.broadcast(rates.select(group_col, "keep_rate")), group_col)
        .filter(u <= F.col("keep_rate"))
        .drop("keep_rate")
    )


def unimax_rates(
    df: DataFrame,
    group_col: str,
    budget: float,
    epochs_cap: float = 1.0,
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023: distribute a total
    training budget as UNIFORMLY as possible across groups, capping
    every group at ``epochs_cap`` repetitions of its data — fairer than
    alpha-temperature sampling for low-resource languages and the
    allocation used by the mT5-successor multilingual corpora).

    The allocation is the classic water-fill: each group's capacity is
    c_g = n_g * epochs_cap; ascending by capacity, every group receives
    min(c_g, remaining_budget / remaining_groups). Returns one row per
    group: (group, n, budget_alloc, epochs, keep_rate). ``epochs`` is
    b_g / n_g (can exceed 1 when a duplicating sampler should repeat
    the group); ``keep_rate`` caps at 1.0 for subsampling.

    Scale shape: the per-group count is ONE tiny map-combined
    aggregation; the water-fill runs driver-side over the
    group-cardinality table (languages — hundreds of rows, the same
    bounded-collect contract as IVF's quantizer training) and the rate
    table broadcasts back. Nothing corpus-sized leaves the executors."""
    rows = sorted(
        (
            (r["n"] * float(epochs_cap), r["n"], r[group_col])
            for r in df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ),
    )
    spark = df.sparkSession
    remaining = float(budget)
    out = []
    k = len(rows)
    for cap, n, g in rows:
        share = remaining / k
        b = min(cap, share)
        remaining -= b
        k -= 1
        out.append((g, int(n), float(b), float(b / n), min(1.0, b / n)))
    return spark.createDataFrame(
        out, f"{group_col} string, n long, budget_alloc double, "
        "epochs double, keep_rate double"
    )


def unimax_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    budget: float,
    epochs_cap: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic UniMax subsample: keep a row when its portable
    id-hash unit value falls under its group's water-filled keep_rate
    (same reproducible-under-any-partitioning contract as
    :func:`alpha_sample`); scan-stage after one broadcast join."""
    rates = unimax_rates(df, group_col, budget, epochs_cap)
    u = (portable_hash32(F.col(id_col), salt) + 1) / F.lit(float(_M32 + 1))
    return (
        df.join(F.broadcast(rates.select(group_col, "keep_rate")), group_col)
        .filter(u <= F.col("keep_rate"))
        .drop("keep_rate")
    )
