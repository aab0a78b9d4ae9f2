"""Bounded-memory frequency sketches (count-min) for heavy-hitter
queries over unbounded term domains.

Scale design: an exact term count (``text.term_table``) shuffles one row
per distinct term — fine until the domain explodes (URLs, n-grams,
user ids at 100 TB). A count-min sketch caps state at depth x width
counters regardless of domain size: the build is ONE shuffle whose keys
are (depth, bucket) pairs — at most d*w distinct keys, so map-side
combine collapses each partition's contribution to d*w rows before the
wire. Estimation touches only the queried terms: the d*w-row sketch is
broadcast and probed row-locally.

Hashes are the engine-portable Rabin-Karp fingerprints
(``text.rolling_hash``) with a distinct prime base per depth row, so a
DuckDB oracle reproduces the sketch bit-for-bit (unlike xxhash64).
The classic CMS guarantee holds: estimate >= true count always
(one-sided error), overshoot bounded by eps*total with
eps = e/width at the standard depth = ln(1/delta).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coffea_spark.llmdata.text import rolling_hash

# distinct prime bases, one per depth row; 257 matches rolling_hash's
# default so depth-0 agrees with other fingerprint users
CMS_BASES = (257, 263, 269, 271, 277, 281, 283, 293)


def cms_bucket(term: Column, depth: int, width: int) -> Column:
    """Bucket of ``term`` in depth row d: rolling_hash with base
    CMS_BASES[d], mod width. Pure column math."""
    return F.pmod(rolling_hash(term, base=CMS_BASES[depth]), F.lit(width))


def countmin_build(
    terms: DataFrame,
    term_col: str = "term",
    count_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch from a (term [, count]) DataFrame: returns
    (d, bucket, c) with one row per OCCUPIED counter (at most
    depth*width). Absent counters are zero — ``countmin_estimate``
    coalesces them."""
    if depth > len(CMS_BASES):
        raise ValueError(f"depth <= {len(CMS_BASES)} (distinct hash bases)")
    c = F.col(count_col) if count_col else F.lit(1)
    rows = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(F.col(term_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
        c.alias("c"),
    )
    return rows.groupBy("cell.d", "cell.bucket").agg(F.sum("c").alias("c"))


def countmin_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per queried term: min over depth rows of the
    term's counter. The sketch (<= depth*width rows) is broadcast; the
    probe is a row-local min after d broadcast-join lookups."""
    est = queries
    for d in range(depth):
        sd = sketch.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"_b{d}"), F.col("c").alias(f"_c{d}")
        )
        est = est.withColumn(f"_b{d}", cms_bucket(F.col(term_col), d, width))
        est = est.join(F.broadcast(sd), f"_b{d}", "left")
    return est.withColumn(
        "est",
        F.least(*[F.coalesce(F.col(f"_c{d}"), F.lit(0)) for d in range(depth)]),
    ).drop(*[c for d in range(depth) for c in (f"_b{d}", f"_c{d}")])


# ---------------------------------------------------------------------------
# HyperLogLog cardinality (portable)
# ---------------------------------------------------------------------------

def hll_add(df: DataFrame, hash_col: Column, p: int = 9) -> DataFrame:
    """Bucket/max-rho table of an HLL sketch over a 32-bit uniform hash
    column: m = 2^p rows at most — ONE shuffle keyed on the bucket id
    with map-side max-combine, like every sketch here. rho (position of
    the leftmost 1-bit of the (32-p)-bit suffix) is computed with an
    EXACT integer CASE chain, not floating log2, so any SQL engine
    replays it bit-for-bit."""
    m = 1 << p
    bucket = F.pmod(hash_col, F.lit(m))
    suffix = F.floor(hash_col / F.lit(m)).cast("long")
    nbits = 32 - p
    # bitlen(suffix) via power-of-two thresholds (exact integer compares;
    # built inside-out so the OUTERMOST when tests the LARGEST threshold
    # — identical to a SQL CASE listing thresholds descending)
    bitlen = F.lit(0)
    for b in range(1, nbits + 1):
        bitlen = F.when(suffix >= (1 << (b - 1)), F.lit(b)).otherwise(bitlen)
    rho = (F.lit(nbits + 1) - bitlen).alias("rho")
    return (
        df.select(bucket.alias("bucket"), rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """Flajolet et al. 2007 estimator over an ``hll_add`` table: raw
    E = alpha_m * m^2 / (sum 2^-Mj + #empty), with the small-range
    linear-counting correction (E <= 2.5m and V > 0 -> m * ln(m/V)).
    All arithmetic is written with the literal op order a SQL oracle
    states, so both engines compute the same double."""
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z_used"),
        F.count(F.lit(1)).alias("nonempty"),
    )
    z = F.col("z_used") + (F.lit(m) - F.col("nonempty"))
    v = F.lit(m) - F.col("nonempty")
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / z
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(est.alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter membership (portable)
# ---------------------------------------------------------------------------

_BLOOM_SALT = 1009


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """k bit positions for one element key (an integer fingerprint,
    e.g. a Rabin-Karp hash): position_i = mix32(key + i*SALT) mod
    m_bits. The mix must be a FULL-AVALANCHE hash (portable_mix32), not
    the Knuth multiply alone: affine hashes make all k positions fixed
    translates of each other (one lattice = effectively k=1; measured
    ~1% doc-level false positives where theory says ~1e-5). Pure
    integer math, replayable in any SQL engine."""
    from coffea_spark.llmdata.splits import portable_mix32

    return F.array(
        *[
            F.pmod(portable_mix32(key, salt=i * _BLOOM_SALT), F.lit(m_bits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: Column, m_bits: int = 1 << 13, k: int = 4
) -> DataFrame:
    """The SET BITS of a Bloom filter over the keys: at most m_bits rows
    (one per set bit) from one explode + distinct — membership state is
    corpus-size-independent, the reason Dolma-style pipelines use Bloom
    filters for web-scale dedup/decontamination membership instead of
    exact gram sets. False-positive rate ~ (1 - e^(-k*n/m))^k; false
    negatives: none (probed below as a gate invariant)."""
    return (
        df.select(F.explode(bloom_positions(key_col, m_bits, k)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: Column,
    id_col: str,
    m_bits: int = 1 << 13,
    k: int = 4,
) -> DataFrame:
    """Per-id membership flag: an id is flagged when EVERY one of its
    keys' k bit positions is set. The <= m_bits-row filter is broadcast;
    the probe is a map-side join + per-id counting — no corpus-sized
    shuffle. Returns (id, n_keys, n_hit_keys): n_hit_keys > 0 means
    some key probed fully positive. "Fully positive" is judged with
    ``min(set_flag) == 1`` — every probed bit set — NOT ``sum == k``,
    so duplicate (id, key) input rows (which would double the sum) and
    salt-collision duplicate bit positions cannot manufacture a false
    negative; the filter's no-false-negatives invariant holds on raw,
    un-deduplicated input."""
    pos = df.select(
        F.col(id_col),
        key_col.alias("_key"),
        F.explode(bloom_positions(key_col, m_bits, k)).alias("bit"),
    )
    hit = (
        pos.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(id_col, "_key")
        .agg(
            (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1)
            .cast("int")
            .alias("_full")
        )
    )
    return hit.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_full").alias("n_hit_keys"),
    )
