"""PackedSelection / Cutflow / N-1 / Weights vs numpy oracle.

Mirrors the reference test strategy (tests/test_analysis_tools.py:445-2147).
"""

import numpy as np
import pyspark.sql.functions as F

from coffea_spark.selection import PackedSelection
from coffea_spark.weights import Weights


def _df(spark, n=2000, seed=9):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n)
    y = rng.uniform(0, 10, n)
    z = rng.integers(0, 5, n)
    w = rng.uniform(0.5, 1.5, n)
    rows = [
        {"x": float(a), "y": float(b), "z": int(c), "w": float(d)}
        for a, b, c, d in zip(x, y, z, w)
    ]
    return spark.createDataFrame(rows, "x double, y double, z int, w double"), x, y, z, w


def test_packed_selection_logic(spark):
    df, x, y, z, w = _df(spark)
    sel = PackedSelection()
    sel.add("cx", F.col("x") > 0)
    sel.add("cy", F.col("y") < 5)
    sel.add("cz", F.col("z") != 0)

    nx, ny, nz = x > 0, y < 5, z != 0

    assert df.filter(sel.all()).count() == int((nx & ny & nz).sum())
    assert df.filter(sel.any()).count() == int((nx | ny | nz).sum())
    assert df.filter(sel.allfalse()).count() == int((~(nx | ny | nz)).sum())
    assert df.filter(sel.all("cx", "cy")).count() == int((nx & ny).sum())
    assert df.filter(sel.require(cx=True, cy=False)).count() == int((nx & ~ny).sum())

    # bitmask pack matches manual pack
    got = df.select(sel.bitmask().alias("m")).toPandas()["m"].to_numpy()
    want = nx * 1 + ny * 2 + nz * 4
    assert (got == want).all()


def test_cutflow_and_nminusone(spark):
    df, x, y, z, w = _df(spark)
    sel = PackedSelection()
    sel.add("cx", F.col("x") > 0)
    sel.add("cy", F.col("y") < 5)
    sel.add("cz", F.col("z") != 0)
    nx, ny, nz = x > 0, y < 5, z != 0

    cf = sel.cutflow(df, weight=F.col("w"))
    assert cf.initial == len(x)
    assert cf.nevonecut == [int(nx.sum()), int(ny.sum()), int(nz.sum())]
    assert cf.nevcutflow == [int(nx.sum()), int((nx & ny).sum()), int((nx & ny & nz).sum())]
    assert np.isclose(cf.wevcutflow[-1], w[nx & ny & nz].sum())
    assert np.isclose(cf.wevonecut[1], w[ny].sum())

    n1 = sel.nminusone(df)
    assert n1.nev == [
        int((ny & nz).sum()),
        int((nx & nz).sum()),
        int((nx & ny).sum()),
    ]
    assert n1.nev_all == int((nx & ny & nz).sum())


def test_weights_variations(spark):
    df, x, y, z, w = _df(spark)
    weights = Weights()
    weights.add("base", F.col("w"), weightUp=F.col("w") * 1.1, weightDown=F.col("w") * 0.9)
    weights.add("flat", F.lit(2.0))

    got = df.select(
        weights.weight().alias("nom"),
        weights.weight("baseUp").alias("up"),
        weights.weight("baseDown").alias("dn"),
        weights.partial_weight(include=["base"]).alias("part"),
    ).toPandas()
    assert np.allclose(got["nom"], w * 2.0)
    assert np.allclose(got["up"], w * 1.1 * 2.0)
    assert np.allclose(got["dn"], w * 0.9 * 2.0)
    assert np.allclose(got["part"], w)

    stats = weights.statistics(df)
    assert np.isclose(stats["base"]["sumw"], w.sum())
    assert np.isclose(stats["base"]["sumw2"], (w * w).sum())
    assert stats["base"]["n"] == len(w)


def test_weights_shift_mode(spark):
    df, x, y, z, w = _df(spark)
    weights = Weights()
    weights.add(
        "s", F.col("w"),
        weightUp=F.lit(0.1), weightDown=F.lit(0.1), shift=True,
    )
    got = df.select(weights.weight("sUp").alias("up"), weights.weight("sDown").alias("dn")).toPandas()
    assert np.allclose(got["up"], w + 0.1)
    assert np.allclose(got["dn"], w - 0.1)
