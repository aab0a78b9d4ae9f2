"""coffea_spark — a PySpark-native columnar analytics engine.

A brand-new engine with the query and data-processing capabilities of
scikit-hep/coffea (the reference lives at /root/reference, read-only),
re-expressed Spark-first:

- rows = events; variable-length collections = ``array<struct>`` columns
  (reference data model: nanoevents/schemas/base.py:5-80 zip_forms)
- kinematics expressed as Catalyst column expressions (reference:
  nanoevents/methods/vector.py)
- selections/cutflows as conditional aggregations (reference:
  analysis_tools.py PackedSelection)
- within-event joins as higher-order array functions — no shuffle
  (reference: methods/vector.py metric_table/nearest)
- histograms as groupBy over bucket ids (reference: hist fills in
  analysis_tools.py)

Nothing in this package is a port of the reference's execution machinery
(awkward buffers, dask graphs, executors): Spark's Catalyst/Tungsten stack
plays those roles natively (see SURVEY.md §3-4).
"""

from coffea_spark.session import get_spark
from coffea_spark.schema import (
    zip_collections,
    unzip_collection,
    infer_collection_groups,
    NanoAODSchemaSpec,
    PFNanoAODSchema,
    ScoutingNanoAODSchema,
)
from coffea_spark.hist import Hist1D, Hist2D, hist1d, hist1d_edges, hist2d
from coffea_spark.nanoevents import Collection, GenealogyView, NanoEvents, Record
from coffea_spark.rntuple import RNTupleReader
from coffea_spark.root_reader import (
    RootTreeReader,
    open_tree,
    read_events,
    read_nanoevents,
    read_root,
)
from coffea_spark.selection import PackedSelection
from coffea_spark.weights import Weights

__all__ = [
    "get_spark",
    "zip_collections",
    "unzip_collection",
    "infer_collection_groups",
    "GenealogyView",
    "NanoEvents",
    "Collection",
    "Record",
    "NanoAODSchemaSpec",
    "PFNanoAODSchema",
    "ScoutingNanoAODSchema",
    "RootTreeReader",
    "RNTupleReader",
    "open_tree",
    "read_root",
    "read_nanoevents",
    "read_events",
    "Hist1D",
    "Hist2D",
    "hist1d",
    "hist1d_edges",
    "hist2d",
    "PackedSelection",
    "Weights",
]

__version__ = "0.1.0"
