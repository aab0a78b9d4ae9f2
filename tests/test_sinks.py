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
