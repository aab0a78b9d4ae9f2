"""Dataset discovery, fileset preprocessing, and fileset splitting.

Reference surface: ``dataset_tools/`` — ``preprocess()``
(preprocess.py:1148, get_steps preprocess.py:33-216, parquet variant
preprocess.py:540,779), ``split_fileset`` (splitting.py:163), and the
fileset dict convention used across ``dataset_query.py``. The
Rucio/DAS-backed catalog queries themselves (dataset_query.py:109-889,
rucio_utils.py) stay out of scope — they talk to grid services this
engine does not assume; discovery here is filesystem-native
(paths/globs), which is also what a Spark cluster reads.

Spark-first posture: Spark's planner already computes splits for
parquet, and :func:`coffea_spark.root_reader.read_root` fans out
(file, entry-range) work items for ROOT — so ``preprocess`` is NOT
needed to run queries. It exists for the reference's bookkeeping
contract: a manifest of per-file ``num_entries``, step ranges, uuid and
format that analysis code can persist, diff, and resume from
(``steps`` feed read_root's ``split_rows``/entry ranges directly).

Fileset shape (the reference's uproot-style dict):

    {dataset: {"files": {path: treename_or_None}, "metadata": {...}}}

``discover_fileset`` builds it from globs; ``preprocess`` fills in the
per-file metadata and returns the (available, updated) pair with
``skip_bad_files`` semantics matching the reference.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os

__all__ = [
    "discover_fileset",
    "preprocess",
    "read_fileset",
    "split_fileset",
    "missing_files",
]


def discover_fileset(
    patterns: dict[str, "str | list[str]"],
    tree: str | None = None,
    metadata: dict | None = None,
) -> dict:
    """Build a fileset from filesystem globs: ``{dataset: glob-or-list}``
    -> the uproot-style fileset dict. Paths sort deterministically;
    datasets whose globs match nothing get an empty files dict (caller
    decides whether that is an error — reference
    ``allow_empty_datasets``)."""
    out = {}
    for dataset, pats in patterns.items():
        if isinstance(pats, str):
            pats = [pats]
        files: list[str] = []
        for p in pats:
            if any(ch in p for ch in "*?["):
                files.extend(_glob.glob(p))
            else:
                files.append(p)
        entry = {"files": {f: tree for f in sorted(set(files))}}
        if metadata:
            entry["metadata"] = dict(metadata.get(dataset, {}))
        out[dataset] = entry
    return out


def _file_uuid(path: str) -> str:
    """Stable content fingerprint: md5 of (size, first 64 KiB, last
    64 KiB). The reference records ROOT's embedded fUUID; a content hash
    serves the same change-detection purpose and also covers parquet.
    The TAIL matters: both formats keep trailing metadata (ROOT's key
    directory + fEND, parquet's footer) that changes whenever baskets or
    row groups are rewritten anywhere in the file, so a same-size rewrite
    past the head still flips the fingerprint."""
    size = os.path.getsize(path)
    h = hashlib.md5()
    h.update(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
        if size > 65536:
            f.seek(max(65536, size - 65536))
            h.update(f.read(65536))
    return h.hexdigest()


def _steps(num_entries: int, step_size: int | None, edges=None) -> list[list[int]]:
    """[start, stop) step ranges. With ``edges`` (cluster/basket/row-group
    boundaries), steps snap to the nearest boundary at or past the
    requested size — the reference's align_clusters
    (preprocess.py:33-216)."""
    if num_entries == 0:
        return []
    if step_size is None:
        return [[0, num_entries]]
    if not edges:
        return [
            [s, min(s + step_size, num_entries)]
            for s in range(0, num_entries, step_size)
        ]
    out = []
    start = 0
    for e in edges:
        e = int(e)
        if e - start >= step_size:
            out.append([start, e])
            start = e
    if start < num_entries:
        out.append([start, num_entries])
    return out


def _probe_file(path: str, tree, step_size, align_clusters) -> dict:
    """Per-file metadata: entries, steps, uuid, format."""
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        edges = None
        if align_clusters:
            edges, acc = [], 0
            for rg in range(md.num_row_groups):
                acc += md.row_group(rg).num_rows
                edges.append(acc)
        return {
            "object_path": None,
            "num_entries": md.num_rows,
            "steps": _steps(md.num_rows, step_size, edges),
            "uuid": _file_uuid(path),
            "format": "parquet",
        }
    from coffea_spark.root_reader import open_tree

    r = open_tree(path, tree)
    edges = None
    if align_clusters and hasattr(r, "basket_entry_index") and r.branches:
        # proxy for TTree cluster boundaries: the basket edges of the
        # branch with the most baskets (the finest split granularity)
        name = max(r._baskets, key=lambda n: len(r._baskets[n]))
        edges = [int(x) for x in r.basket_entry_index(name)[1:]]
    return {
        "object_path": r.tree,
        "num_entries": int(r.entries),
        "steps": _steps(int(r.entries), step_size, edges),
        "uuid": _file_uuid(path),
        "format": "root",
    }


def preprocess(
    fileset: dict,
    step_size: int | None = None,
    align_clusters: bool = False,
    skip_bad_files: bool = False,
    spark=None,
) -> tuple[dict, dict]:
    """Open every file once (metadata only) and record ``num_entries``,
    step ranges, uuid, and format — the reference's ``preprocess``
    contract (preprocess.py:1148): returns ``(available, updated)``
    where *available* holds only the files that opened successfully and
    *updated* is the full input annotated with results or ``None`` for
    failures. With a SparkSession, the per-file probes distribute
    (one task per file — exactly the reference's dask fan-out); without
    one they run in-process."""
    jobs = [
        (ds, path, spec["files"][path])
        for ds, spec in fileset.items()
        for path in spec["files"]
    ]

    def probe(job):
        ds, path, tree = job
        try:
            return ds, path, _probe_file(path, tree, step_size, align_clusters)
        except Exception as exc:  # noqa: BLE001 - skip_bad_files contract
            if not skip_bad_files:
                raise
            return ds, path, {"__error__": repr(exc)}

    if spark is not None and len(jobs) > 1:
        results = (
            spark.sparkContext.parallelize(jobs, min(len(jobs), 256))
            .map(probe)
            .collect()
        )
    else:
        results = [probe(j) for j in jobs]

    available: dict = {}
    updated: dict = {}
    for ds, spec in fileset.items():
        updated[ds] = {"files": {}, **{k: v for k, v in spec.items() if k != "files"}}
        available[ds] = {"files": {}, **{k: v for k, v in spec.items() if k != "files"}}
    for ds, path, meta in results:
        if "__error__" in meta:
            updated[ds]["files"][path] = None
        else:
            updated[ds]["files"][path] = meta
            available[ds]["files"][path] = meta
    return available, updated


def read_fileset(
    spark,
    fileset: dict,
    columns: "list[str] | None" = None,
    with_dataset_column: bool = True,
) -> dict:
    """One DataFrame per dataset from a (raw or preprocessed) fileset —
    the data half of the reference's ``apply_to_fileset``
    (dataset_tools/apply_processor.py:31-136). Parquet files scan
    natively; ``.root`` files go through the distributed native reader
    (tree name taken from preprocess metadata when present). A dataset
    mixing both formats unions by column name."""
    from pyspark.sql import functions as F

    out = {}
    for ds, spec in fileset.items():
        parquet: list[str] = []
        root_by_tree: dict = {}  # tree name (or None) -> [paths]
        for path, meta in spec["files"].items():
            fmt = (meta or {}).get("format") if isinstance(meta, dict) else None
            if fmt == "parquet" or (fmt is None and path.endswith(".parquet")):
                parquet.append(path)
            else:
                if isinstance(meta, dict) and meta.get("object_path"):
                    tree = meta["object_path"]
                elif isinstance(meta, str):
                    tree = meta
                else:
                    tree = None
                root_by_tree.setdefault(tree, []).append(path)
        parts = []
        if parquet:
            df = spark.read.parquet(*parquet)
            if columns:
                df = df.select(*columns)
            parts.append(df)
        if root_by_tree:
            from coffea_spark.root_reader import read_root

            # per-file tree names are honored by grouping — one read per
            # distinct tree, unioned below
            for tree, paths in sorted(
                root_by_tree.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
            ):
                parts.append(
                    read_root(spark, sorted(paths), tree=tree, columns=columns)
                )
        if not parts:
            continue
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        if with_dataset_column:
            df = df.withColumn("dataset", F.lit(ds))
        out[ds] = df
    return out


def split_fileset(fileset: dict, n: int) -> list[dict]:
    """Round-robin the files of every dataset across ``n`` filesets
    (reference splitting.py:163 split_fileset) — the unit for submitting
    one campaign as independent jobs."""
    if n <= 0:
        raise ValueError("n must be positive")
    parts: list[dict] = [
        {
            ds: {"files": {}, **{k: v for k, v in spec.items() if k != "files"}}
            for ds, spec in fileset.items()
        }
        for _ in range(n)
    ]
    for ds, spec in fileset.items():
        for i, (path, meta) in enumerate(sorted(spec["files"].items())):
            parts[i % n][ds]["files"][path] = meta
    return [p for p in parts if any(s["files"] for s in p.values())]


def missing_files(updated: dict, available: dict) -> dict:
    """{dataset: [paths]} that failed preprocessing — the retry list
    (reference get_failed_steps_for_fileset, manipulations.py:341)."""
    out = {}
    for ds, spec in updated.items():
        got = set(available.get(ds, {}).get("files", {}))
        miss = [p for p in spec["files"] if p not in got]
        if miss:
            out[ds] = miss
    return out
