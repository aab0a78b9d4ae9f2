"""Runner facade: apply one pipeline to many datasets and merge results.

Reference: Runner/apply_to_fileset (processor/executor.py:1165-1795,
dataset_tools/apply_processor.py:31-136) — normalize a fileset, run the
processor per chunk, monoid-merge accumulators, with retries and
checkpointing.

Spark-first the runtime shrinks to a facade: Spark owns chunking, task
retries, speculation and locality, so a "fileset" is just
{dataset: [parquet paths]}, the "processor" is a function
DataFrame -> result dict, and the merge is accumulator.accumulate.
Checkpointing = optional intermediate parquet per dataset.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coffea_spark.accumulator import accumulate


def run(
    spark: SparkSession,
    fileset: dict[str, list[str] | str],
    pipeline: Callable[[DataFrame], dict],
    with_dataset_column: bool = True,
    checkpoint_dir: str | None = None,
) -> dict:
    """Run ``pipeline`` over each dataset's files; returns
    {dataset: result} plus a merged ``"__total__"`` entry.

    ``pipeline`` receives the dataset DataFrame (with a ``dataset``
    literal column for metadata parity with events.metadata,
    methods/base.py:272-275) and returns a dict of driver-side values —
    anything accumulator.add can merge (numbers, numpy arrays, Hist1D,
    nested dicts)."""
    results: dict[str, dict] = {}
    for dataset, paths in fileset.items():
        if isinstance(paths, str):
            paths = [paths]
        df = spark.read.parquet(*paths)
        if with_dataset_column:
            df = df.withColumn("dataset", F.lit(dataset))
        if checkpoint_dir is not None:
            ckpt = os.path.join(checkpoint_dir, dataset)
            df.write.mode("overwrite").parquet(ckpt)
            df = spark.read.parquet(ckpt)
        results[dataset] = pipeline(df)
    merged = accumulate(results.values())
    out = dict(results)
    out["__total__"] = merged
    return out


# ---------------------------------------------------------------------------
# fileset manipulation (reference: dataset_tools/manipulations.py:39-371 —
# max_chunks/slice_chunks act on the uproot step lists there; in Spark the
# analogous unit is the FILE (Spark owns intra-file splits), so the chunk
# ops map to row-limits instead)
# ---------------------------------------------------------------------------

def max_files(fileset: dict, n: int | None = None) -> dict:
    """Keep at most ``n`` files per dataset (manipulations.py:181-197)."""
    if n is None:
        return fileset
    return {ds: _as_list(paths)[:n] for ds, paths in fileset.items()}


def slice_files(fileset: dict, s: slice = slice(None)) -> dict:
    """Apply ``s`` to every dataset's file list (manipulations.py:200-229)."""
    return {ds: _as_list(paths)[s] for ds, paths in fileset.items()}


def filter_files(fileset: dict, predicate=None) -> dict:
    """Keep files where ``predicate(path)`` holds; default drops none
    (manipulations.py:240-258's filter hook)."""
    if predicate is None:
        return fileset
    return {
        ds: [p for p in _as_list(paths) if predicate(p)]
        for ds, paths in fileset.items()
    }


def max_rows(df: DataFrame, n: int | None = None) -> DataFrame:
    """Row-limited view of a dataset — the Spark analog of the
    reference's max_chunks quick-look path (manipulations.py:39-57):
    ``limit`` pushes into the scan (CollectLimit), so a debug run reads
    only the first parquet row groups, like processing one chunk."""
    return df if n is None else df.limit(n)


def _as_list(paths: list[str] | str) -> list[str]:
    return [paths] if isinstance(paths, str) else list(paths)
