"""joins.asof_join vs DuckDB's native ASOF JOIN (backward/forward,
keyed/unkeyed, tolerance)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from coffea_spark.joins import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    ev = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").cast("timestamp").cast("double").alias("t"),
            F.col("o_orderkey").alias("lid"),
        )
    )
    quotes = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(F.min("l_extendedprice").alias("px"))
        .select(
            (F.col("l_suppkey") % 50).alias("k"),
            (F.col("px") / 100.0).alias("t"),
            F.col("px").alias("val"),
        )
        .groupBy("k", "t")
        .agg(F.max("val").alias("val"))
    )
    return ev, quotes


def _oracle(direction, keyed, tolerance=None):
    op = "<=" if direction == "forward" else ">="
    key = "l.k = r.k AND" if keyed else ""
    q = f"""
    SELECT l.lid, r.t AS rt, r.val
    FROM levents l ASOF LEFT JOIN rquotes r ON {key} l.t {op} r.t
    """
    return q


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_duckdb(spark, frames, direction):
    ev, quotes = frames
    got = asof_join(
        ev, quotes, on="t", by="k", values=["val"], direction=direction
    ).select("lid", "_asof_on", "_asof_val").collect()
    con = duckdb.connect()
    con.register("levents", ev.toPandas())
    con.register("rquotes", quotes.toPandas())
    exp = {r[0]: (r[1], r[2]) for r in con.execute(_oracle(direction, True)).fetchall()}
    assert len(got) == len(exp)
    for r in got:
        e = exp[r.lid]
        assert (r._asof_on, r._asof_val) == (e[0], e[1]), (r, e)


def test_asof_tolerance(spark, frames):
    ev, quotes = frames
    tol = 50.0
    got = asof_join(
        ev, quotes, on="t", by="k", values=["val"], direction="backward",
        tolerance=tol,
    ).select("lid", "t", "_asof_on").collect()
    no_tol = {
        r.lid: r._asof_on
        for r in asof_join(
            ev, quotes, on="t", by="k", values=["val"], direction="backward"
        ).select("lid", "_asof_on").collect()
    }
    for r in got:
        base = no_tol[r.lid]
        if base is not None and r.t - base <= tol:
            assert r._asof_on == base
        else:
            assert r._asof_on is None


def test_asof_bad_direction(spark, frames):
    ev, quotes = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(ev, quotes, on="t", direction="sideways")


def test_salted_join_invariant(spark):
    """salted_join == plain join for inner and left joins."""
    from coffea_spark.joins import salted_join
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    # right side missing some keys -> exercises unmatched-left behavior
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter("o_orderkey % 3 != 0")
        .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r.k, r.l_extendedprice, r.o_orderpriority)
            for r in li.join(orders, "k", how).collect()
        )
        salted = sorted(
            (r.k, r.l_extendedprice, r.o_orderpriority)
            for r in salted_join(li, orders, "k", salt=4, how=how).collect()
        )
        assert plain == salted, how
    import pytest

    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(li, orders, "k", how="full")
