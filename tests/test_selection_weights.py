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


def test_yieldhist_reports(spark, nano):
    """yieldhist packaged reports (reference analysis_tools.py:1138-1266,
    1719-1817): labels + yields consistent with result()."""
    sel = PackedSelection()
    sel.add("two_muons", F.size("Muon") >= 2)
    sel.add("has_jet", F.size("Jet") >= 1)

    cf = sel.cutflow(nano, weight=F.col("genWeight"))
    labels, one, cum = cf.yieldhist()  # defaults to weighted (has weight)
    assert labels == ["initial", "two_muons", "has_jet"]
    assert one[0] == cf.initial_w
    labels_u, one_u, cum_u = cf.yieldhist(weighted=False)
    assert one_u == [cf.initial] + cf.nevonecut
    assert all(a >= b for a, b in zip(cum_u, cum_u[1:]))  # monotone
    _, one_s, _ = cf.yieldhist(weighted=False, scale=2.0)
    assert one_s == [2 * v for v in one_u]

    n1 = sel.nminusone(nano)
    lab, nev = n1.yieldhist()
    assert lab == ["initial", "N - two_muons", "N - has_jet", "N"]
    assert nev == [n1.initial] + n1.nev + [n1.nev_all]


def test_plot_vars_single_pass(spark, nano):
    """plot_vars long report vs independently computed histograms: the
    stage-0 column equals hist1d of the variable; each stage column is
    hist1d over the cumulatively-filtered frame."""
    from coffea_spark.hist import hist1d

    sel = PackedSelection()
    sel.add("two_muons", F.size("Muon") >= 2)
    sel.add("met20", F.col("MET.pt") < 20.0)

    out = sel.plot_vars(
        nano, vars={"met": (F.col("MET.pt"), 10, 0.0, 40.0)}
    ).filter(F.col("var") == "met")
    got = {r.bin: (r.initial, r.n_two_muons, r.n_met20) for r in out.collect()}

    h0 = {r.bin: r.n for r in hist1d(nano, F.col("MET.pt"), 10, 0.0, 40.0).collect()}
    stage1 = nano.filter(F.size("Muon") >= 2)
    h1 = {r.bin: r.n for r in hist1d(stage1, F.col("MET.pt"), 10, 0.0, 40.0).collect()}
    stage2 = stage1.filter(F.col("MET.pt") < 20.0)
    h2 = {r.bin: r.n for r in hist1d(stage2, F.col("MET.pt"), 10, 0.0, 40.0).collect()}

    for b, (n0, n1, n2) in got.items():
        assert n0 == h0.get(b, 0)
        assert n1 == h1.get(b, 0)
        assert n2 == h2.get(b, 0)
    # totals conserved (flow bins kept)
    assert sum(v[0] for v in got.values()) == nano.count()
