"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 through the
driver's correctness gate (sf0.01, order-insensitive value-hash compare).
Canonicalization rules used on BOTH sides so hashes can match:

- prefer integer outputs (counts, bucket ids, epoch seconds)
- round floating aggregates: big sums -> 2 decimals, unit-scale values
  (avgs, ratios, cosines) -> 6 decimals
- any top-k is ordered by (rounded value, unique key) so ties are
  deterministic
- within-event pair metrics are symmetric (|a-b|), so collect_list
  order cannot change results

Scale notes are attached per query: the jagged queries build per-order
arrays with ONE groupBy shuffle and then stay in per-row HOFs; the joins
broadcast the dimension side; histograms/cutflows shuffle only bucket
ids / single rows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coffea_spark.hist import bucket, hist1d, hist2d
from coffea_spark.joins import combinations
from coffea_spark.selection import PackedSelection
from coffea_spark.weights import Weights


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver runs these in ITS session; pin the confs results depend
    # on (all runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which the vectorized Spark
    reader rejects. Read nanos as long (runtime conf) and truncate to
    microseconds with integer division — bit-identical to DuckDB's
    parquet ns->us conversion. (Dividing through double would lose
    precision at 1.7e18 ns; ``div`` stays integral.)"""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem reshaped to the engine's jagged data model: one row per
    order, items = array<struct> sorted by linenumber (deterministic
    array order). One shuffle; everything downstream is per-row HOFs."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_suppkey"
                )
            )
        ).alias("items")
    )


# ---------------------------------------------------------------------------
# relational core
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-side filter + 2-key hash agg (partial+final)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark, sf_dir):
    """Join + agg + deterministic top-10 (ties broken by key)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey", "o_orderpriority", "revenue")
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


SQL_TOP_REVENUE = """
SELECT o_orderkey, o_orderpriority, revenue
FROM (
  SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey
) r JOIN orders ON l_orderkey = o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join — every dimension side broadcast, fact
    table streams; one final 1-key agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def q_topk_per_group(spark, sf_dir):
    """Window ranking: top-3 line items by price per returnflag."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_returnflag", "rank", "l_orderkey", "l_linenumber",
                F.round("l_extendedprice", 2).alias("price"))
    )


SQL_TOPK_PER_GROUP = """
SELECT l_returnflag, rank, l_orderkey, l_linenumber, price
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         round(l_extendedprice, 2) AS price,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
  FROM lineitem
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# engine operator families: weights / histograms / selections
# ---------------------------------------------------------------------------

def q_weight_stats(spark, sf_dir):
    """Weights.statistics pattern (analysis_tools.py:138-193): one agg
    pass computing sumw/sumw2/min/max/n per group."""
    li = _t(spark, sf_dir, "lineitem")
    w = 1 + F.col("l_discount")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(w), 4).alias("sumw"),
        F.round(F.sum(w * w), 4).alias("sumw2"),
        F.round(F.min(w), 6).alias("minw"),
        F.round(F.max(w), 6).alias("maxw"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_WEIGHT_STATS = """
SELECT l_returnflag,
       round(sum(1 + l_discount), 4) AS sumw,
       round(sum((1 + l_discount) * (1 + l_discount)), 4) AS sumw2,
       round(min(1 + l_discount), 6) AS minw,
       round(max(1 + l_discount), 6) AS maxw,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_hist_price(spark, sf_dir):
    """1-D histogram operator: 40 uniform bins over [0, 80000), integer
    counts (+ under/overflow bins)."""
    li = _t(spark, sf_dir, "lineitem")
    return hist1d(li, "l_extendedprice", 40, 0.0, 80000.0).select("bin", "n")


SQL_HIST_PRICE = """
SELECT CASE WHEN l_extendedprice < 0 THEN -1
            WHEN l_extendedprice >= 80000 THEN 40
            ELSE CAST(floor((l_extendedprice - 0.0) / 2000.0) AS BIGINT) END AS bin,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


def q_hist2d_qty_disc(spark, sf_dir):
    """2-D histogram: quantity x discount (scaled to integer-width bins
    so bucket edges are exact in binary)."""
    li = _t(spark, sf_dir, "lineitem")
    return hist2d(
        li, F.col("l_quantity"), F.col("l_discount") * 100, 10, 0.0, 50.0, 11, 0.0, 11.0
    ).select("xbin", "ybin", "n")


SQL_HIST2D = """
SELECT CASE WHEN l_quantity < 0 THEN -1
            WHEN l_quantity >= 50 THEN 10
            ELSE CAST(floor((l_quantity - 0.0) / 5.0) AS BIGINT) END AS xbin,
       CASE WHEN l_discount * 100 < 0 THEN -1
            WHEN l_discount * 100 >= 11 THEN 11
            ELSE CAST(floor((l_discount * 100 - 0.0) / 1.0) AS BIGINT) END AS ybin,
       count(*) AS n
FROM lineitem GROUP BY 1, 2
"""


def _lineitem_selection(li) -> PackedSelection:
    sel = PackedSelection()
    sel.add("big_qty", F.col("l_quantity") > 25)
    sel.add("low_disc", F.col("l_discount") < 0.05)
    sel.add("returned", F.col("l_returnflag") == "N")
    return sel


def q_cutflow(spark, sf_dir):
    """PackedSelection.cutflow as a single conditional-aggregation pass
    (reference analysis_tools.py:2483-2608): one row out."""
    li = _t(spark, sf_dir, "lineitem")
    sel = _lineitem_selection(li)
    return li.agg(*sel.cutflow_aggs())


SQL_CUTFLOW = """
SELECT count(*) AS initial,
       sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS onecut_big_qty,
       sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS cutflow_big_qty,
       sum(CASE WHEN l_discount < 0.05 THEN 1 ELSE 0 END) AS onecut_low_disc,
       sum(CASE WHEN l_quantity > 25 AND l_discount < 0.05 THEN 1 ELSE 0 END) AS cutflow_low_disc,
       sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS onecut_returned,
       sum(CASE WHEN l_quantity > 25 AND l_discount < 0.05 AND l_returnflag = 'N' THEN 1 ELSE 0 END) AS cutflow_returned
FROM lineitem
"""


def q_nminusone(spark, sf_dir):
    """N-1 counts, one pass (reference analysis_tools.py:2386-2481)."""
    li = _t(spark, sf_dir, "lineitem")
    sel = _lineitem_selection(li)
    c1, c2, c3 = (F.col("l_quantity") > 25), (F.col("l_discount") < 0.05), (F.col("l_returnflag") == "N")
    return li.agg(
        F.count(F.lit(1)).alias("initial"),
        F.sum(F.when(c2 & c3, 1).otherwise(0)).alias("nminusone_big_qty"),
        F.sum(F.when(c1 & c3, 1).otherwise(0)).alias("nminusone_low_disc"),
        F.sum(F.when(c1 & c2, 1).otherwise(0)).alias("nminusone_returned"),
        F.sum(F.when(sel.all(), 1).otherwise(0)).alias("all_cuts"),
    )


SQL_NMINUSONE = """
SELECT count(*) AS initial,
       sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'N' THEN 1 ELSE 0 END) AS nminusone_big_qty,
       sum(CASE WHEN l_quantity > 25 AND l_returnflag = 'N' THEN 1 ELSE 0 END) AS nminusone_low_disc,
       sum(CASE WHEN l_quantity > 25 AND l_discount < 0.05 THEN 1 ELSE 0 END) AS nminusone_returned,
       sum(CASE WHEN l_quantity > 25 AND l_discount < 0.05 AND l_returnflag = 'N' THEN 1 ELSE 0 END) AS all_cuts
FROM lineitem
"""


def q_bitmask_counts(spark, sf_dir):
    """PackedSelection.bitmask: distribution of the packed cut mask
    (reference pack semantics analysis_tools.py:2219-2251)."""
    li = _t(spark, sf_dir, "lineitem")
    sel = _lineitem_selection(li)
    return li.select(sel.bitmask().alias("mask")).groupBy("mask").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_BITMASK = """
SELECT (CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END
      + CASE WHEN l_discount < 0.05 THEN 2 ELSE 0 END
      + CASE WHEN l_returnflag = 'N' THEN 4 ELSE 0 END) AS mask,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# jagged data model: per-order arrays + HOFs (the coffea core re-expressed)
# ---------------------------------------------------------------------------

def q_jagged_filter(spark, sf_dir):
    """Object-level filter inside collections (jets[jets.pt>30] analog):
    distribution of per-order counts of high-quantity items."""
    orders = _order_items(spark, sf_dir)
    nbig = F.size(F.filter(F.col("items"), lambda x: x["l_quantity"] > 25))
    return orders.select(nbig.alias("n_big")).groupBy("n_big").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


SQL_JAGGED_FILTER = """
SELECT n_big, count(*) AS n_orders
FROM (
  SELECT l_orderkey, sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS n_big
  FROM lineitem GROUP BY l_orderkey
) GROUP BY n_big
"""


def q_jagged_reduce(spark, sf_dir):
    """Inner-axis reductions (ak.sum/max axis=1 analog) via aggregate/
    array_max HOFs, then event-level aggregation."""
    orders = _order_items(spark, sf_dir)
    total_price = F.aggregate(
        F.col("items"), F.lit(0.0), lambda a, x: a + x["l_extendedprice"] * (1 - x["l_discount"])
    )
    max_qty = F.array_max(F.col("items.l_quantity"))
    return orders.select(
        F.size("items").alias("n_items"), total_price.alias("tp"), max_qty.alias("mq")
    ).groupBy("n_items").agg(
        F.round(F.sum("tp"), 2).alias("sum_order_revenue"),
        F.round(F.avg("mq"), 6).alias("avg_max_qty"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_JAGGED_REDUCE = """
SELECT n_items,
       round(sum(tp), 2) AS sum_order_revenue,
       round(avg(mq), 6) AS avg_max_qty,
       count(*) AS n_orders
FROM (
  SELECT l_orderkey, count(*) AS n_items,
         sum(l_extendedprice * (1 - l_discount)) AS tp,
         max(l_quantity) AS mq
  FROM lineitem GROUP BY l_orderkey
) GROUP BY n_items
"""


def q_combinations(spark, sf_dir):
    """n-choose-2 combinations within events (ak.combinations analog):
    pair counts and a symmetric pair metric, all shuffle-free HOFs."""
    orders = _order_items(spark, sf_dir)
    pairs = combinations(F.col("items"), 2)
    diff_supp = F.size(
        F.filter(pairs, lambda p: p["f0"]["l_suppkey"] != p["f1"]["l_suppkey"])
    )
    price_gap = F.aggregate(
        pairs, F.lit(0.0),
        lambda a, p: a + F.abs(p["f0"]["l_extendedprice"] - p["f1"]["l_extendedprice"]),
    )
    return orders.select(
        F.size(pairs).alias("np"), diff_supp.alias("nd"), price_gap.alias("pg")
    ).agg(
        F.sum("np").alias("n_pairs"),
        F.sum("nd").alias("n_diff_supp_pairs"),
        F.round(F.sum("pg"), 2).alias("sum_price_gap"),
    )


SQL_COMBINATIONS = """
-- MATERIALIZED: row_number over tied sort keys must be assigned ONCE and
-- reused on both sides of the self-join, else self-pairs appear
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_suppkey, l_extendedprice) AS rn
  FROM lineitem
)
SELECT count(*) AS n_pairs,
       sum(CASE WHEN a.l_suppkey <> b.l_suppkey THEN 1 ELSE 0 END) AS n_diff_supp_pairs,
       round(sum(abs(a.l_extendedprice - b.l_extendedprice)), 2) AS sum_price_gap
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.rn < b.rn
"""


def q_nearest(spark, sf_dir):
    """nearest-neighbour within event (methods/vector.py:519-561 analog):
    per item, the minimum |price difference| to any other item of the
    same order; event-level mean. Pure HOFs — no self-join, no shuffle."""
    orders = _order_items(spark, sf_dir)
    # positional identity, not l_linenumber (the synthetic data has
    # duplicate linenumbers within an order)
    idxd = F.transform(F.col("items"), lambda x, i: F.struct(x.alias("it"), i.alias("i")))
    best = F.transform(
        idxd,
        lambda a: F.array_min(
            F.transform(
                F.filter(idxd, lambda b: b["i"] != a["i"]),
                lambda b: F.abs(b["it"]["l_extendedprice"] - a["it"]["l_extendedprice"]),
            )
        ),
    )
    flat = orders.select(F.explode(best).alias("d")).filter(F.col("d").isNotNull())
    return flat.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.avg("d"), 6).alias("avg_min_gap"),
        F.round(F.max("d"), 6).alias("max_min_gap"),
    )


SQL_NEAREST = """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_extendedprice) AS rn
  FROM lineitem
)
SELECT count(*) AS n_matched,
       round(avg(d), 6) AS avg_min_gap,
       round(max(d), 6) AS max_min_gap
FROM (
  SELECT a.l_orderkey, a.rn,
         min(abs(a.l_extendedprice - b.l_extendedprice)) AS d
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.rn <> b.rn
  GROUP BY a.l_orderkey, a.rn
)
"""


# ---------------------------------------------------------------------------
# events table: time windows, sessions, JSON
# ---------------------------------------------------------------------------

def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming op)."""
    ev = _t(spark, sf_dir, "events")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour")
    return ev.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


SQL_EVENTS_HOURLY = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap per user (lag + running
    sum of session starts)."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("ns", new_session)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


SQL_SESSIONIZE = """
SELECT user_id, sum(ns) AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM events
) GROUP BY user_id
"""


def q_events_json(spark, sf_dir):
    """Semi-structured extraction from the JSON props column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, Query] = {
    "pricing_summary": Query(q_pricing_summary, SQL_PRICING),
    "top_revenue_orders": Query(q_top_revenue_orders, SQL_TOP_REVENUE),
    "region_revenue": Query(q_region_revenue, SQL_REGION_REVENUE),
    "topk_per_group": Query(q_topk_per_group, SQL_TOPK_PER_GROUP),
    "weight_stats": Query(q_weight_stats, SQL_WEIGHT_STATS),
    "hist_price": Query(q_hist_price, SQL_HIST_PRICE),
    "hist2d_qty_disc": Query(q_hist2d_qty_disc, SQL_HIST2D),
    "cutflow": Query(q_cutflow, SQL_CUTFLOW),
    "nminusone": Query(q_nminusone, SQL_NMINUSONE),
    "bitmask_counts": Query(q_bitmask_counts, SQL_BITMASK),
    "jagged_filter": Query(q_jagged_filter, SQL_JAGGED_FILTER),
    "jagged_reduce": Query(q_jagged_reduce, SQL_JAGGED_REDUCE),
    "combinations_pairs": Query(q_combinations, SQL_COMBINATIONS),
    "nearest_gap": Query(q_nearest, SQL_NEAREST),
    "events_hourly": Query(q_events_hourly, SQL_EVENTS_HOURLY),
    "sessionize": Query(q_sessionize, SQL_SESSIONIZE),
    "events_json": Query(q_events_json, SQL_EVENTS_JSON),
}
