"""``spark.read.format("root")`` — the native ROOT scan as a Spark
Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

SURVEY.md §2.1 mapped the reference's `NanoEventsFactory.from_root`
(factory.py:267-480) to "converted parquet; a custom DataSourceV2 would
be out-of-scope v1" — Spark 4's Python data source API makes the native
path practical: the SAME reader and chunk planner behind
:func:`coffea_spark.root_reader.read_root` exposed through the engine's
own source interface, so ROOT files compose with every DataFrameReader
feature (``.load`` globs, schema inspection, SQL ``CREATE TABLE ...
USING root`` in the session catalog).

Scale shape: ``partitions()`` returns the reader's (file, entry-range)
work items — one multi-GB file fans out across executors exactly like
``read_root``; each partition streams ``batch_rows``-entry Arrow record
batches with only the overlapping baskets decompressed. Column pruning
is declared via ``.option("columns", "a,b")`` (black-box Python sources
cannot be traced by Catalyst — the same explicit-projection contract as
SURVEY §2.9's column-tracing note).

Options: ``tree`` (default: most-basketed tree), ``columns``
(comma-separated; default all readable), ``batch_rows`` (64k),
``split_rows`` (512k).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RootPartition(InputPartition):
    def __init__(self, path: str, start: int, stop: int):
        self.path = path
        self.start = start
        self.stop = stop


class RootDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "root"

    def _paths(self) -> list[str]:
        from coffea_spark.root_reader import _expand

        raw = self.options.get("path")
        if not raw:
            raise ValueError("format('root') needs a path: .load('/x/*.root')")
        paths = sorted(_expand(raw))
        if not paths:
            raise ValueError(f"format('root'): no files match {raw!r}")
        return paths

    def _columns(self, head) -> list[str]:
        cols = self.options.get("columns")
        if cols:
            use = [c.strip() for c in cols.split(",") if c.strip()]
            missing = [c for c in use if c not in head.branches]
            if missing:
                raise ValueError(f"format('root'): unreadable columns {missing}")
            return use
        return sorted(head.branches)

    def schema(self):
        from coffea_spark.root_reader import open_tree, spark_schema_for

        head = open_tree(self._paths()[0], self.options.get("tree"))
        return spark_schema_for(head, self._columns(head))

    def reader(self, schema) -> "RootReader":
        return RootReader(self)


class RootReader(DataSourceReader):
    def __init__(self, source: RootDataSource):
        from coffea_spark.root_reader import open_tree

        self._paths = source._paths()
        head = open_tree(self._paths[0], source.options.get("tree"))
        self._tree = head.tree
        self._cols = source._columns(head)
        self._batch_rows = int(source.options.get("batch_rows", 65536))
        self._split_rows = int(source.options.get("split_rows", 1 << 19))

    def partitions(self):
        from coffea_spark.root_reader import plan_chunks

        return [
            RootPartition(p, s, e)
            for p, s, e in plan_chunks(self._paths, self._tree, self._split_rows)
        ]

    def read(self, partition: RootPartition):
        import pyarrow as pa

        from coffea_spark.root_reader import arrow_field_for, open_tree

        r = open_tree(partition.path, self._tree)
        r.payload_cache_size = 2 * len(self._cols) + 8
        cast_schema = pa.schema(
            [pa.field(c, arrow_field_for(r.branches[c])) for c in self._cols]
        )
        start, stop = int(partition.start), int(partition.stop)
        for b0 in range(start, stop, self._batch_rows) or [0]:
            b1 = min(b0 + self._batch_rows, stop)
            tbl = r.to_arrow(self._cols, entry_start=b0, entry_stop=b1)
            for batch in tbl.cast(cast_schema).to_batches():
                yield batch


def register_root_source(spark) -> None:
    """Idempotently register ``format("root")`` on a session."""
    spark.dataSource.register(RootDataSource)
