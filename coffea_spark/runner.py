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
