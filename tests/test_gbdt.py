"""GBDT (XGBoost-JSON) scorer: loader, vectorized walk, SQL replay,
and the Spark BatchInferencer path.

Reference semantics: ml_tools/xgboost_wrapper.py:14-60 (Booster over
Arrow batches); here the model is data (official save_model JSON
layout) and evaluation is pure numpy, so everything is testable without
the xgboost wheel. The scalar reference walk below is an independent
reimplementation (per-row recursive descent) — the vectorized
level-synchronous evaluator must agree exactly on every row, including
NaN default_left routing.
"""

import json
import os

import numpy as np
import pytest

from coffea_spark.mltools import (
    gbdt_load_json,
    gbdt_margin,
    gbdt_predict,
    gbdt_sql_expr,
    gbdt_wrapper,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "coffea_spark", "data", "gbdt_demo.json"
)


def scalar_walk(tree, x):
    nid = 0
    while tree["left"][nid] != -1:
        v = x[tree["feat"][nid]]
        if np.isnan(v):
            go_left = bool(tree["default_left"][nid])
        else:
            go_left = v < tree["cond"][nid]
        nid = tree["left"][nid] if go_left else tree["right"][nid]
    return float(tree["cond"][nid])


@pytest.fixture(scope="module")
def model():
    return gbdt_load_json(FIXTURE)


def test_loader_shape(model):
    assert len(model["trees"]) == 4
    assert model["objective"] == "binary:logistic"
    assert model["num_feature"] == 3
    for t in model["trees"]:
        n = len(t["left"])
        assert all(len(t[k]) == n for k in ("right", "feat", "cond", "default_left"))
        # every non-leaf child id is in range; leaves are -1 on both sides
        leaves = t["left"] == -1
        assert (t["right"][leaves] == -1).all()
        internal = ~leaves
        assert (t["left"][internal] > 0).all() and (t["left"][internal] < n).all()


def test_vectorized_matches_scalar_walk(model):
    rng = np.random.default_rng(7)
    X = np.column_stack(
        [
            rng.uniform(0, 120, 500),
            rng.uniform(3.0, 6.0, 500),
            rng.uniform(0.2, 1.1, 500),
        ]
    )
    # sprinkle NaNs to exercise default_left on every feature
    X[rng.integers(0, 500, 60), rng.integers(0, 3, 60)] = np.nan
    got = gbdt_margin(model, X)
    want = np.array(
        [
            model["base_score"]
            + sum(scalar_walk(t, row) for t in model["trees"])
            for row in X
        ]
    )
    np.testing.assert_array_equal(got, want)


def test_threshold_boundary_goes_right(model):
    # XGBoost rule is x < cond -> left: a value exactly ON the first
    # tree's root threshold (f0 = 40.5) must take the RIGHT branch
    # (-> mean_len split -> leaf 0.25), never the left leaf (-0.40)
    t0 = model["trees"][0]
    assert scalar_walk(t0, [40.5, 4.0, 0.5]) == 0.25
    x = np.array([[40.5, 4.0, 0.5]])
    want = model["base_score"] + sum(scalar_walk(t, x[0]) for t in model["trees"])
    assert gbdt_margin(model, x)[0] == want


def test_logistic_transform(model):
    X = np.array([[30.0, 4.0, 0.5], [70.0, 4.5, 0.4]])
    m = gbdt_margin(model, X)
    np.testing.assert_allclose(gbdt_predict(model, X), 1 / (1 + np.exp(-m)))


def test_sql_expr_matches_numpy(model):
    import duckdb

    rng = np.random.default_rng(13)
    X = np.column_stack(
        [
            rng.uniform(0, 120, 200),
            rng.uniform(3.0, 6.0, 200),
            rng.uniform(0.2, 1.1, 200),
        ]
    )
    want = gbdt_predict(model, X)
    expr = gbdt_sql_expr(model, ["f0", "f1", "f2"])
    con = duckdb.connect()
    con.execute("CREATE TABLE x(i INT, f0 DOUBLE, f1 DOUBLE, f2 DOUBLE)")
    con.executemany(
        "INSERT INTO x VALUES (?, ?, ?, ?)",
        [(i, *map(float, row)) for i, row in enumerate(X)],
    )
    rows = con.sql(f"SELECT {expr} FROM x ORDER BY i").fetchall()
    np.testing.assert_allclose([r[0] for r in rows], want, rtol=0, atol=1e-15)


def test_loader_rejects_missing_file():
    with pytest.raises(FileNotFoundError):
        gbdt_load_json("/nonexistent/model.json")


def test_regression_objective_identity(tmp_path, model):
    blob = json.load(open(FIXTURE))
    blob["learner"]["objective"]["name"] = "reg:squarederror"
    blob["learner"]["learner_model_param"]["base_score"] = "1.5"
    p = tmp_path / "reg.json"
    p.write_text(json.dumps(blob))
    reg = gbdt_load_json(str(p))
    X = np.array([[30.0, 4.0, 0.5]])
    assert gbdt_predict(reg, X)[0] == pytest.approx(
        1.5 + sum(scalar_walk(t, X[0]) for t in reg["trees"])
    )
    assert "exp" not in gbdt_sql_expr(reg, ["a", "b", "c"])


def test_spark_inferencer_path(spark):
    df = spark.createDataFrame(
        [(30.0, 4.0, 0.5), (70.0, 4.5, 0.4), (50.0, 3.7, 0.7)],
        "nw double, ml double, dr double",
    )
    scorer = gbdt_wrapper(FIXTURE, name="gbdt-test")
    from pyspark.sql import functions as F

    got = sorted(
        r.s for r in df.select(scorer(F.col("nw"), F.col("ml"), F.col("dr")).alias("s")).collect()
    )
    model = gbdt_load_json(FIXTURE)
    want = sorted(
        gbdt_predict(
            model, np.array([[30.0, 4.0, 0.5], [70.0, 4.5, 0.4], [50.0, 3.7, 0.7]])
        )
    )
    np.testing.assert_allclose(got, want)
