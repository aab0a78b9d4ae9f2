"""Systematics namespace + npz sinks (reference: methods/base.py:54-259,
analysis_tools.py:649-919)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from coffea_spark.selection import PackedSelection
from coffea_spark.systematics import (
    add_systematic,
    add_updown_systematic,
    systematic_names,
    variation,
)


@pytest.fixture()
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_updown_scalar(li):
    df = add_systematic(
        li, "qscale", "UpDownSystematic", "l_quantity", lambda c, d: c + 1.0 * d
    )
    r = df.agg(
        F.sum("l_quantity").alias("nom"),
        F.sum(variation(df, "qscale", "up")).alias("up"),
        F.sum(variation(df, "qscale", "down")).alias("dn"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert r.up == pytest.approx(r.nom + r.n)
    assert r.dn == pytest.approx(r.nom - r.n)


def test_multiple_and_names(li):
    df = add_updown_systematic(li, "a", "l_quantity", lambda c: c * 2, lambda c: c / 2)
    df = add_updown_systematic(df, "b", "l_discount", lambda c: c + 0.01, lambda c: c - 0.01)
    assert systematic_names(df) == ["a", "b"]
    # variations coexist and are independently addressable
    r = df.select(
        variation(df, "a", "up").alias("au"), variation(df, "b", "down").alias("bd")
    ).first()
    assert r.au is not None and r.bd is not None


def test_array_variation(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").groupBy(
        "l_orderkey"
    ).agg(F.collect_list(F.struct("l_extendedprice")).alias("items"))
    df = add_updown_systematic(
        df, "pscale", F.col("items"),
        lambda c: F.transform(c, lambda x: x["l_extendedprice"] * 1.1),
        lambda c: F.transform(c, lambda x: x["l_extendedprice"] * 0.9),
    )
    r = df.select(
        F.aggregate(F.flatten(F.array(F.col("systematics.pscale.up"))), F.lit(0.0), lambda a, x: a + x).alias("s"),
        F.aggregate("items", F.lit(0.0), lambda a, x: a + x["l_extendedprice"]).alias("n"),
    ).agg(F.sum("s").alias("s"), F.sum("n").alias("n")).first()
    assert r.s == pytest.approx(r.n * 1.1)


def test_error_paths(li):
    with pytest.raises(ValueError, match="unknown systematic kind"):
        add_systematic(li, "x", "NopeKind", "l_quantity", lambda c, d: c)
    df = add_updown_systematic(li, "a", "l_quantity", lambda c: c, lambda c: c)
    with pytest.raises(ValueError, match="direction"):
        variation(df, "a", "sideways")
    with pytest.raises(ValueError, match="unknown systematic"):
        variation(df, "zzz", "up")
    with pytest.raises(ValueError, match="no systematics"):
        variation(li, "a", "up")
    assert systematic_names(li) == []


def test_npz_sinks(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sel = PackedSelection()
    sel.add("q", F.col("l_quantity") > 25)
    sel.add("d", F.col("l_discount") > 0.03)
    cf = sel.cutflow(li, "q", "d")
    p = str(tmp_path / "cutflow.npz")
    cf.to_npz(p)
    z = np.load(p)
    assert list(z["labels"]) == ["initial", "q", "d"]
    assert z["nevcutflow"][0] == cf.initial
    n1 = sel.nminusone(li, "q", "d")
    p2 = str(tmp_path / "n1.npz")
    n1.to_npz(p2)
    z2 = np.load(p2)
    assert z2["nev"][0] == n1.initial and z2["nev"][-1] == n1.nev_all
