"""Sinks: parquet/bucketed-table writers tuned for downstream access.

Reference sinks are ROOT files and pickled accumulators
(processor/executor.py dumps, schema.py's writeable forms). Spark-first
the interesting sink decisions are LAYOUT, because they decide whether
the NEXT job shuffles:

- ``write_partitioned``: directory partitioning for partition PRUNING
  (predicates on the partition key read only matching directories).
- ``write_bucketed``: hash-bucketed table so later joins/aggregations
  on the bucket key are EXCHANGE-FREE — the 100 TB answer to "this join
  shuffles both sides every night". Two tables bucketed the same way
  co-locate; Spark's planner drops both exchanges (verified in
  tests/test_sinks.py by asserting no Exchange in the join plan).
- ``write_sorted_runs``: maxRecordsPerFile + in-partition sort, the
  layout knob for downstream range/merge scans.

All three are thin: the value is encoding the layout contract in one
place instead of per-pipeline ad hoc writer chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet: predicates on ``partition_by``
    prune whole directories at scan time. Keep the key's cardinality in
    the hundreds/thousands — per-value directories below ~100 MB mean
    small-file pressure, the classic partitioning mistake at scale."""
    w = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (+ optionally sorted) managed table. Joins and
    groupBys on ``bucket_by`` between tables with the SAME bucketing
    skip their exchanges entirely; ``sort_by`` additionally enables
    sort-merge joins without a per-task sort. ``n_buckets`` should give
    100-500 MB per bucket at the target scale (e.g. 100 TB on a
    1000-executor cluster: tens of thousands of buckets)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (possibly bucketed) table; bucketing metadata rides
    along from the catalog, which is what lets the planner elide
    exchanges."""
    return spark.table(table)


def write_sorted_runs(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Parquet with in-partition sorted runs and bounded file sizes:
    sorted row groups give min/max statistics that parquet readers use
    to skip pages on ``sort_by`` predicates (zone-map pruning)."""
    (
        df.sortWithinPartitions(*sort_by)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
