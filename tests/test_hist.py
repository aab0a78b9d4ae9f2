"""Histogram operator vs numpy.histogram."""

import numpy as np
import pyspark.sql.functions as F

from coffea_spark.hist import Hist1D, bucket_edges, hist1d, hist2d


def test_hist1d_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(50, 20, 5000)
    w = rng.uniform(0.5, 1.5, 5000)
    df = spark.createDataFrame(
        [{"x": float(a), "w": float(b)} for a, b in zip(x, w)], "x double, w double"
    )
    h = Hist1D.from_df(hist1d(df, "x", 40, 0.0, 100.0, weight="w"), 40, 0.0, 100.0)
    expected, _ = np.histogram(x, bins=40, range=(0.0, 100.0), weights=w)
    # right edge: numpy includes x == hi in the last bin; we overflow it.
    # Compare on strictly-in-range values.
    inrange = (x >= 0) & (x < 100)
    expected, _ = np.histogram(x[inrange], bins=40, range=(0.0, 100.0), weights=w[inrange])
    assert np.allclose(h.values, expected)
    # flow conservation: total sumw == sum of weights
    assert np.isclose(h.sumw.sum(), w.sum())


def test_hist1d_null_skipped(spark):
    df = spark.createDataFrame(
        [{"x": 1.0}, {"x": None}, {"x": 2.0}], "x double"
    )
    h = hist1d(df, "x", 4, 0.0, 4.0).collect()
    total = sum(r["n"] for r in h if r["bin"] is not None)
    assert total == 2


def test_bucket_edges_variable(spark):
    edges = [0.0, 1.0, 5.0, 10.0]
    vals = [-1.0, 0.0, 0.5, 1.0, 4.9, 5.0, 9.99, 10.0, 50.0]
    df = spark.createDataFrame([{"x": v} for v in vals], "x double")
    got = [r.b for r in df.select(bucket_edges(F.col("x"), edges).alias("b")).collect()]
    want = [-1, 0, 0, 1, 1, 2, 2, 3, 3]
    assert got == want


def test_hist2d(spark):
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 10, 2000)
    y = rng.uniform(0, 10, 2000)
    df = spark.createDataFrame(
        [{"x": float(a), "y": float(b)} for a, b in zip(x, y)], "x double, y double"
    )
    rows = hist2d(df, "x", "y", 5, 0, 10, 5, 0, 10, flow=False).collect()
    expected, _, _ = np.histogram2d(x, y, bins=(5, 5), range=((0, 10), (0, 10)))
    got = np.zeros((5, 5))
    for r in rows:
        got[r["xbin"], r["ybin"]] = r["sumw"]
    assert np.allclose(got, expected)


def test_histnd_matches_hist2d(spark):
    """histnd with 2 axes == hist2d bucket-for-bucket."""
    from coffea_spark.hist import hist2d, histnd
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    h2 = {
        (r.xbin, r.ybin): (r.sumw, r.n)
        for r in hist2d(li, "l_quantity", "l_discount", 10, 0, 50, 5, 0, 0.1).collect()
    }
    hn = {
        (r.bin0, r.bin1): (r.sumw, r.n)
        for r in histnd(li, [("l_quantity", 10, 0, 50), ("l_discount", 5, 0, 0.1)]).collect()
    }
    assert h2 == hn


def test_histnd_flow_and_by(spark):
    from coffea_spark.hist import histnd
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    h = histnd(
        li, [("l_quantity", 4, 10.0, 40.0)], by=["l_returnflag"], flow=False
    ).collect()
    assert all(0 <= r.bin0 < 4 for r in h)
    assert {r.l_returnflag for r in h} == {"A", "N", "R"}
    total_in_range = li.filter("l_quantity >= 10 and l_quantity < 40").count()
    assert sum(r.n for r in h) == total_in_range


def test_hist_categorical_scalar_and_ragged(spark):
    from coffea_spark.hist import hist_categorical

    df = spark.createDataFrame(
        [
            ("a", ["x", "y"], 2.0),
            ("a", ["x"], 3.0),
            ("b", [], 1.0),
            ("b", None, 1.0),
            ("a", ["y", None], 1.0),
        ],
        "k string, labels array<string>, w double",
    )
    out = {
        (r["category"],): (r["sumw"], r["n"])
        for r in hist_categorical(df, "labels", weight="w").collect()
    }
    # x: 2+3; y: 2+1; NULL element and NULL/empty arrays fill nothing
    assert out == {("x",): (5.0, 2), ("y",): (3.0, 2)}

    scalar = hist_categorical(df, "k").collect()
    assert {(r["category"]): r["n"] for r in scalar} == {"a": 3, "b": 2}

    by = hist_categorical(df, "labels", weight="w", by=["k"]).collect()
    assert {(r["k"], r["category"]): r["sumw"] for r in by} == {
        ("a", "x"): 5.0,
        ("a", "y"): 3.0,
    }


def test_profile1d(spark):
    """Profile histogram: per-bin weighted mean matches a hand fold;
    accumulators allow error-on-mean; flow bins controllable."""
    from coffea_spark.hist import profile1d

    rows = [(1.0, 10.0, 1.0), (1.5, 20.0, 3.0), (6.0, 30.0, 1.0), (-2.0, 5.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double, w double")
    got = {r.bin: r for r in profile1d(df, "x", "y", 2, 0.0, 10.0, weight="w").collect()}
    # bin 0: x in [0,5): means of y=10 (w=1) and y=20 (w=3) -> (10+60)/4
    assert abs(got[0].mean - 17.5) < 1e-12
    assert got[0].n == 2 and abs(got[0].sumw - 4.0) < 1e-12
    assert abs(got[1].mean - 30.0) < 1e-12
    assert -1 in got  # underflow kept with flow=True
    noflow = profile1d(df, "x", "y", 2, 0.0, 10.0, flow=False).collect()
    assert all(0 <= r.bin < 2 for r in noflow)


def test_project_2d_to_1d(spark):
    from coffea_spark.hist import hist2d, hist1d, project

    df = spark.createDataFrame(
        [(float(i % 5), float(i % 3), 1.0 + i * 0.1) for i in range(60)],
        "x double, y double, w double",
    )
    h2 = hist2d(df, "x", "y", 5, 0.0, 5.0, 3, 0.0, 3.0, weight="w")
    px = {r.xbin: r.sumw for r in project(h2, "xbin").collect()}
    h1 = {r.bin: r.sumw for r in hist1d(df, "x", 5, 0.0, 5.0, weight="w").collect()}
    assert set(px) == set(h1)
    for b in px:
        assert abs(px[b] - h1[b]) < 1e-9
    import pytest

    with pytest.raises(ValueError):
        project(h2, "zbin")


def test_hist1d_edges_matches_numpy(spark):
    """Variable-width histogram vs numpy.histogram on the in-range part
    (same edges, same weights), plus the flow-bin contract (-1 under,
    len(edges)-1 over) and totals conservation."""
    import numpy as np

    from coffea_spark.hist import hist1d_edges

    rng = np.random.default_rng(7)
    x = rng.uniform(-2.0, 14.0, size=500)
    w = rng.uniform(0.5, 1.5, size=500)
    edges = [0.0, 1.0, 3.0, 7.0, 12.0]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, w)], "x double, w double"
    )
    got = {r.bin: (r.sumw, r.n) for r in hist1d_edges(df, "x", edges, weight="w").collect()}
    ref_w, _ = np.histogram(x, bins=np.array(edges), weights=w)
    ref_n, _ = np.histogram(x, bins=np.array(edges))
    # numpy's last bin is CLOSED [12.0, ...] — no sample sits exactly on
    # 12.0 here (continuous uniform), so the conventions agree
    for i in range(len(edges) - 1):
        assert abs(got.get(i, (0.0, 0))[0] - ref_w[i]) < 1e-9
        assert got.get(i, (0.0, 0))[1] == ref_n[i]
    assert got[-1][1] == int((x < 0.0).sum())
    assert got[len(edges) - 1][1] == int((x >= 12.0).sum())
    assert sum(n for _, n in got.values()) == 500
    # flow=False drops exactly the flow bins
    noflow = hist1d_edges(df, "x", edges, weight="w", flow=False).collect()
    assert {r.bin for r in noflow} <= set(range(len(edges) - 1))
    import pytest

    with pytest.raises(ValueError):
        hist1d_edges(df, "x", [1.0, 1.0, 2.0])
    with pytest.raises(ValueError):
        hist1d_edges(df, "x", [3.0])
    # categorical `by` axis: per-category sub-histograms sum to the
    # uncategorized one
    df2 = df.withColumn(
        "cat", (F.col("x") > 5.0).cast("int").cast("string")
    )
    bycat = hist1d_edges(df2, "x", edges, weight="w", by=["cat"]).collect()
    merged = {}
    for r in bycat:
        merged[r.bin] = merged.get(r.bin, 0.0) + r.sumw
    for b, (sw, _) in got.items():
        assert abs(merged[b] - sw) < 1e-9
