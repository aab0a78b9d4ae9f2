"""Plan-shaping utilities: small helpers that steer Catalyst toward the
physical plan you want without leaving the DataFrame API.

The reference's equivalents are its buffer cache and dask graph reuse
(mapping/buffer_cache.py, factory.py dak_cache); in Spark most reuse is
automatic, but two gaps matter for HOF-heavy event pipelines:

1. CollapseProject inlines a projected expression into every consumer.
   For cheap scalars that's right; for a derived `array<struct>`
   collection consumed by six aggregates it multiplies the HOF work by
   six. ``barrier`` pins such columns so they are evaluated once.
2. Caching across queries leaks storage memory; prefer barriers within
   a query and explicit `.cache()`/`unpersist` only for cross-query
   sharing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BARRIER_COL = "__barrier__"


def barrier(df: DataFrame, *cols: Column) -> DataFrame:
    """Project ``cols`` (alias them first) and force them to be computed
    ONCE: a non-deterministic marker column blocks CollapseProject, so
    downstream expressions consume the materialized values instead of
    re-inlining the construction per consumer.

    Use when a derived collection feeds several sibling aggregates —
    measured 4x on the FK-roundtrip gate query at sf0.1. Costs one
    ignored long per row; removed by selecting around it."""
    return df.select(*cols, F.monotonically_increasing_id().alias(BARRIER_COL))
