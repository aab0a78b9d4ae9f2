"""plans.barrier: expression materialized once, results unchanged."""

from pyspark.sql import functions as F

from coffea_spark.plans import BARRIER_COL, barrier


def test_barrier_preserves_results(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    g = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_extendedprice")).alias("items")
    )
    heavy = F.filter("items", lambda x: x["l_quantity"] > 25)
    plain = g.select(
        F.size(heavy).alias("a"),
        F.aggregate(heavy, F.lit(0.0), lambda acc, x: acc + x["l_extendedprice"]).alias("b"),
    ).agg(F.sum("a").alias("a"), F.round(F.sum("b"), 2).alias("b")).first()
    b = barrier(g, heavy.alias("h"))
    assert BARRIER_COL in b.columns
    hh = F.col("h")
    routed = b.select(
        F.size(hh).alias("a"),
        F.aggregate(hh, F.lit(0.0), lambda acc, x: acc + x["l_extendedprice"]).alias("b"),
    ).agg(F.sum("a").alias("a"), F.round(F.sum("b"), 2).alias("b")).first()
    assert plain == routed
    # the barrier plan evaluates the filter ONCE (single project node
    # carries it), the plain plan inlines it per consumer
    plan = b.select(F.size(hh), F.size(hh))._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("l_quantity > 25") <= 1
