"""Rochester scale + pileup weight vs independent numpy evaluation
(reference semantics: rochester_lookup.py:88-171)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from coffea_spark.muon_corrections import PileupWeight, RochesterCorrection


@pytest.fixture(scope="module")
def roc():
    return RochesterCorrection.from_tables(
        eta_edges=[-3.0, 0.0, 3.0],
        phi_edges=[-3.2, 0.0, 3.2],
        M_mc=[[0.99, 1.01], [1.02, 0.98]],
        M_data=[[1.01, 1.02], [1.03, 1.04]],
        A_mc=[[0.0005, -0.0005], [0.0015, -0.0015]],
        A_data=[[0.001, -0.001], [0.002, -0.002]],
        res_eta_edges=[0.0, 1.5, 3.0],
        k_res_mc=[1.0, 1.1],
        k_res_data=[1.05, 1.2],
    )


def test_k_scale_and_spread(spark, roc):
    rng = np.random.default_rng(3)
    rows = [
        (int(q), float(pt), float(eta), float(phi), float(gpt))
        for q, pt, eta, phi, gpt in zip(
            rng.choice([-1, 1], 50),
            rng.uniform(5, 100, 50),
            rng.uniform(-3, 3, 50),
            rng.uniform(-3.2, 3.2, 50),
            rng.uniform(5, 100, 50),
        )
    ]
    df = spark.createDataFrame(rows, "q int, pt double, eta double, phi double, genpt double")
    got = df.select(
        roc.k_scale_dt(F.col("q"), F.col("pt"), F.col("eta"), F.col("phi")).alias("kdt"),
        roc.k_spread_mc(
            F.col("q"), F.col("pt"), F.col("eta"), F.col("phi"), F.col("genpt")
        ).alias("ks"),
    ).collect()

    M_dt = np.array([[1.01, 1.02], [1.03, 1.04]])
    A_dt = np.array([[0.001, -0.001], [0.002, -0.002]])
    M_mc = np.array([[0.99, 1.01], [1.02, 0.98]])
    A_mc = np.array([[0.0005, -0.0005], [0.0015, -0.0015]])
    for (q, pt, eta, phi, gpt), r in zip(rows, got):
        i, j = int(eta >= 0), int(phi >= 0)
        want_dt = 1.0 / (M_dt[i][j] + q * A_dt[i][j] * pt)
        assert r.kdt == pytest.approx(want_dt, rel=1e-12)
        k = 1.0 / (M_mc[i][j] + q * A_mc[i][j] * pt)
        kd, km = (1.05, 1.0) if abs(eta) < 1.5 else (1.2, 1.1)
        x = gpt / (k * pt)
        want_ks = k * (x / (1.0 + (x - 1.0) * kd / km))
        assert r.ks == pytest.approx(want_ks, rel=1e-12)


def test_pileup_weight(spark):
    pu = PileupWeight([2, 4, 8, 2], [4, 4, 4, 4], [0.0, 5.0, 10.0, 15.0, 20.0])
    df = spark.createDataFrame([(i,) for i in range(25)], "n int")
    got = {r.n: r.w for r in df.select("n", pu(F.col("n")).alias("w")).collect()}
    for n in range(25):
        want = {0: 0.5, 1: 1.0, 2: 2.0, 3: 0.5}[min(n // 5, 3)]  # clamp above 20
        assert got[n] == pytest.approx(want, rel=1e-15)


def test_pileup_shape_mismatch():
    with pytest.raises(ValueError):
        PileupWeight([1, 2], [1, 2, 3], [0, 1, 2, 3])


def test_kspread_needs_res(spark):
    roc = RochesterCorrection.from_tables(
        [-3, 0, 3], [-3.2, 0, 3.2],
        [[1, 1], [1, 1]], [[1, 1], [1, 1]],
        [[0, 0], [0, 0]], [[0, 0], [0, 0]],
    )
    with pytest.raises(ValueError, match="k_res"):
        roc.k_spread_mc(F.lit(1), F.lit(10.0), F.lit(0.5), F.lit(0.1), F.lit(11.0))
