"""Sink layout contracts: partition pruning and exchange-free bucketed
joins — asserted on the PHYSICAL PLAN, not just results."""

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_write_partitioned_prunes(spark, tmp_path):
    from coffea_spark.sinks import write_partitioned

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_by_prio")
    write_partitioned(df, path, ["o_orderpriority"])
    back = spark.read.parquet(path).where(F.col("o_orderpriority") == "1-URGENT")
    assert back.count() == df.where(F.col("o_orderpriority") == "1-URGENT").count()
    # partition filter must appear in the scan, not a post-filter
    assert "PartitionFilters: [" in _plan(back)


def test_bucketed_join_no_exchange(spark, tmp_path):
    from coffea_spark.sinks import read_table, write_bucketed

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li, "li_b", ["l_orderkey"], 8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", ["l_orderkey"], 8
    )
    j = (
        read_table(spark, "li_b")
        .join(read_table(spark, "ord_b").hint("merge"), "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_root_writer_duplicate_attempt_commit(tmp_path, monkeypatch):
    """Tungsten-style task-commit race (datasource.py RootWriter): two
    attempts of the SAME partition (speculation / retry) must each write
    a unique temp, exactly one wins at commit(), no partial part file
    survives, and losing temps are swept. Regression test for the
    attempt-unique temp + publish-on-commit protocol."""
    import os

    import pyspark
    from pyspark.sql import types as T
    from pyspark.sql import Row

    from coffea_spark.datasource import RootWriter
    from coffea_spark.root_reader import RootTreeReader

    schema = T.StructType(
        [
            T.StructField("event", T.LongType()),
            T.StructField("pt", T.DoubleType()),
        ]
    )
    out = tmp_path / "sink"
    w = RootWriter({"path": str(out), "tree": "Events"}, schema, overwrite=False)

    class FakeCtx:
        def __init__(self, pid, attempt):
            self._pid, self._attempt = pid, attempt

        def partitionId(self):
            return self._pid

        def taskAttemptId(self):
            return self._attempt

    def rows(vals):
        return iter([Row(event=i, pt=float(v)) for i, v in enumerate(vals)])

    # attempt 7 (the eventual loser) and attempt 9 (the winner) both
    # write partition 0 concurrently-in-effect
    monkeypatch.setattr(
        pyspark.TaskContext, "get", classmethod(lambda cls: FakeCtx(0, 7))
    )
    loser = w.write(rows([1.0, 2.0]))
    monkeypatch.setattr(
        pyspark.TaskContext, "get", classmethod(lambda cls: FakeCtx(0, 9))
    )
    winner = w.write(rows([10.0, 20.0, 30.0]))

    # two DISTINCT temps exist; no final part yet (a dead task can never
    # have published)
    assert loser.temp != winner.temp
    temps = sorted(p.name for p in out.glob("_temp-part-*.root"))
    assert len(temps) == 2
    assert not list(out.glob("part-*.root"))

    # Spark delivers exactly one commit message per partition: the winner
    w.commit([winner])
    parts = list(out.glob("part-*.root"))
    assert [p.name for p in parts] == ["part-00000.root"]
    assert not list(out.glob("_temp-part-*.root"))  # loser swept
    assert (out / "_SUCCESS").exists()
    r = RootTreeReader(str(parts[0]))
    assert r.entries == 3
    assert list(r.array("pt")) == [10.0, 20.0, 30.0]

    # abort path: a fresh attempt's temp is swept, nothing published
    out2 = tmp_path / "sink2"
    w2 = RootWriter({"path": str(out2), "tree": "Events"}, schema, overwrite=False)
    monkeypatch.setattr(
        pyspark.TaskContext, "get", classmethod(lambda cls: FakeCtx(0, 3))
    )
    msg = w2.write(rows([5.0]))
    assert os.path.exists(msg.temp)
    w2.abort([msg])
    assert not list(out2.glob("*.root"))
    assert not (out2 / "_SUCCESS").exists()
