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
