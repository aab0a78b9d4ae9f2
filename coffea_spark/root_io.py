"""ROOT file ingestion: TTree/RNTuple -> Parquet -> Spark (convert-once).

The reference's primary entry point is a direct uproot read of ROOT
files (nanoevents/factory.py:267-480 from_root; schemas/base.py:136-178
branch forms). This engine reads ROOT NATIVELY — the pure-Python
reader in :mod:`coffea_spark.root_reader` (TKey walk, basket
decompression, TStreamerInfo-typed object-class branches) distributes
(file, entry-range) scans through Spark without uproot. This module is
the complementary STORAGE-LAYER posture for repeated 100 TB querying:

    ROOT TTree --decode once--> Parquet --> spark.read

Converting once preserves everything Spark needs: jagged branches
become Parquet LIST columns (Spark array<T>), NanoAOD's flat
``Muon_pt``-style naming survives as column names, and the schema
module's ``zip_collections``/NanoAODSchemaSpec reassemble struct
collections exactly as for driver-generated parquet. The conversion is
embarrassingly parallel (one task per ROOT file, no shuffle) and runs
ONCE per dataset — every subsequent query is a parquet scan with
row-group skipping and pushdown, which a repeated ROOT decode (native
or uproot) cannot match.

The decode step prefers the native reader; uproot/awkward, when
installed, are used for anything the native reader declares unsupported
(dataless container headers, triply-nested vectors).
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# branch-form -> Spark type mapping (pure; mirrors schemas/base.py:136-178)
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "uint8": T.ShortType(),  # widen: Spark has no unsigned types
    "int16": T.ShortType(),
    "uint16": T.IntegerType(),
    "int32": T.IntegerType(),
    "uint32": T.LongType(),
    "int64": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
}


def branch_form_to_spark(form: dict[str, str]) -> T.StructType:
    """Map a flat {branch_name: form} dict (forms: ``"float32"`` for a
    per-event scalar, ``"var * float32"`` for a jagged branch — uproot's
    awkward-form spelling) to the Spark schema of the converted parquet.

    Unsigned integers widen to the next signed type (Spark has none);
    ``uint64`` becomes DECIMAL(20,0) — lossless, as the reference's
    arrow conversion also does.
    """
    fields = []
    for name, spec in form.items():
        spec = spec.strip()
        if spec.startswith("var *"):
            inner = spec[len("var *"):].strip()
            if inner not in _PRIMITIVES:
                raise ValueError(f"unsupported jagged element type {inner!r} for {name}")
            fields.append(T.StructField(name, T.ArrayType(_PRIMITIVES[inner]), True))
        else:
            if spec not in _PRIMITIVES:
                raise ValueError(f"unsupported branch type {spec!r} for {name}")
            fields.append(T.StructField(name, _PRIMITIVES[spec], True))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# conversion (import-gated: uproot/awkward are not in this environment)
# ---------------------------------------------------------------------------

def ttree_to_parquet(
    root_path: str,
    out_path: str,
    tree: str = "Events",
    branches: Iterable[str] | None = None,
    step_size: str = "100 MB",
) -> None:
    """Convert one ROOT TTree to Parquet, preserving jaggedness as LIST
    columns. One such call per input file = one independent task; run
    them with ``spark.sparkContext.parallelize(files).foreach(...)`` (or
    any job runner) for a shuffle-free distributed conversion.

    Mirrors the decode the reference performs per-chunk at query time
    (factory.py:267-480), but performed once at the storage layer.
    """
    try:
        import awkward as ak  # noqa: F401
        import uproot
    except ImportError:
        # No uproot: flat leaflist trees (all NanoAOD-family files) go
        # through the native pure-Python reader instead.
        import pyarrow.parquet as pq

        from coffea_spark.root_reader import root_to_arrow

        table = root_to_arrow(
            root_path, tree, list(branches) if branches is not None else None
        )
        pq.write_table(table, out_path, row_group_size=64 * 1024)
        return

    with uproot.open(root_path) as f:  # pragma: no cover
        t = f[tree]
        arrays = t.arrays(branches, library="ak")
        ak.to_parquet(arrays, out_path, row_group_size=64 * 1024)


def convert_fileset(
    spark: SparkSession,
    fileset: dict[str, list[str]],
    out_dir: str,
    tree: str = "Events",
) -> dict[str, str]:
    """Distribute ``ttree_to_parquet`` over a reference-style fileset
    ({dataset: [root files]}): one Spark task per file, no shuffle.
    Returns {dataset: parquet directory} for ``spark.read.parquet``."""
    jobs = [
        (path, os.path.join(out_dir, ds, f"part-{i:05d}.parquet"), tree)
        for ds, paths in fileset.items()
        for i, path in enumerate(paths)
    ]
    spark.sparkContext.parallelize(jobs, len(jobs)).foreach(
        lambda j: ttree_to_parquet(j[0], j[1], j[2])
    )
    return {ds: os.path.join(out_dir, ds) for ds in fileset}


def read_converted(
    spark: SparkSession,
    parquet_dir: str,
    collections: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Read converted NanoAOD-style parquet and reassemble struct
    collections (Muon_pt/Muon_eta/... -> Muon: array<struct>) via the
    schema module — the Spark-side half of the reference's
    NanoEventsFactory."""
    from coffea_spark.schema import zip_collections

    return zip_collections(spark.read.parquet(parquet_dir), collections)
