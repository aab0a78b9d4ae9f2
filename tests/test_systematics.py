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


def test_updown_multi_systematic(spark):
    import pyspark.sql.functions as F
    import pytest
    from coffea_spark.systematics import add_systematic, systematic_names

    df = spark.createDataFrame([(100.0, 10.0), (200.0, 20.0)], "price double, qty double")
    out = add_systematic(
        df, "shift", "UpDownMultiSystematic", ["price", "qty"],
        lambda cols, d: {"price": cols["price"] * (1.0 + 0.1 * d),
                         "qty": cols["qty"] * (1.0 - 0.05 * d)},
    )
    assert systematic_names(out) == ["shift"]
    r = out.select(
        F.col("systematics.shift.up.price").alias("pu"),
        F.col("systematics.shift.up.qty").alias("qu"),
        F.col("systematics.shift.down.price").alias("pd"),
        F.col("systematics.shift.down.qty").alias("qd"),
    ).collect()
    assert [x.pu for x in r] == pytest.approx([110.0, 220.0])
    assert [x.qu for x in r] == pytest.approx([9.5, 19.0])
    assert [x.pd for x in r] == pytest.approx([90.0, 180.0])
    assert [x.qd for x in r] == pytest.approx([10.5, 21.0])
    # single-column kind refuses a list; multi fn must cover every column
    with pytest.raises(ValueError, match="single column"):
        add_systematic(df, "x", "UpDownSystematic", ["price", "qty"], lambda c, d: c)
    with pytest.raises(ValueError, match="did not return"):
        add_systematic(df, "y", "UpDownMultiSystematic", ["price", "qty"],
                       lambda cols, d: {"price": cols["price"]})


def test_nanoaod_version_specs():
    from coffea_spark.schema import NanoAODSchemaSpec

    latest = NanoAODSchemaSpec.cross_references
    assert "FatJet_genJetAK8Idx" in latest and "Muon_fsrPhotonIdx" in latest
    v7 = NanoAODSchemaSpec.v7()
    assert "FatJet_genJetAK8Idx" in v7.cross_references
    v6 = NanoAODSchemaSpec.v6()
    assert "FatJet_genJetAK8Idx" not in v6.cross_references
    assert "Muon_fsrPhotonIdx" in v6.cross_references
    v5 = NanoAODSchemaSpec.v5()
    assert "Muon_fsrPhotonIdx" not in v5.cross_references
    assert "FsrPhoton_muonIdx" not in v5.cross_references
    assert "Muon_jetIdx" in v5.cross_references  # shared links survive
    assert v5.version == "5" and NanoAODSchemaSpec.version == "latest"
    # versioned specs keep every other behavior (mixins, synthesis rules)
    assert v5.mixins == NanoAODSchemaSpec.mixins
