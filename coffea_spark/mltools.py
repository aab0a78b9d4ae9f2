"""Batch ML inference wrappers.

Reference: ml_tools/helper.py:10-386 — awkward->numpy marshalling plus
lazily-constructed non-serializable model handles loaded once per worker
(nonserializable_attribute), with torch/tf/xgboost/triton front-ends.

Spark shape: an Arrow-batched pandas UDF whose closure carries only a
picklable LOADER; the model itself is constructed once per executor
process on first use and cached in a process-global — the exact
worker-side-lazy-load pattern the reference implements by hand. Framework
wrappers are import-gated: this container ships none of them, so they
raise a clear ImportError at construction, while the numpy-functional
path (and therefore the whole mechanism) is fully testable.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODEL_CACHE: dict[str, object] = {}


class BatchInferencer:
    """Vectorized inference over one or more array/scalar columns.

    ``loader() -> model`` runs once per executor process (cached by
    ``name``); ``predict(model, *numpy_arrays) -> numpy_array`` runs per
    Arrow batch. Columns of ArrayType arrive as object-dtype Series of
    lists and are stacked to 2-D; scalar columns pass through 1-D.
    """

    def __init__(
        self,
        name: str,
        loader: Callable[[], object],
        predict: Callable[..., np.ndarray],
        output_type: T.DataType = T.DoubleType(),
    ):
        self.name = name
        self.loader = loader
        self.predict = predict
        self.output_type = output_type

    def udf(self):
        name, loader, predict = self.name, self.loader, self.predict

        @F.pandas_udf(self.output_type)
        def infer(*cols: pd.Series) -> pd.Series:
            model = _MODEL_CACHE.get(name)
            if model is None:
                model = loader()
                _MODEL_CACHE[name] = model
            arrays = []
            for s in cols:
                if len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
                    arrays.append(np.stack(s.map(np.asarray).to_numpy()))
                else:
                    arrays.append(s.to_numpy())
            out = predict(model, *arrays)
            out = np.asarray(out)
            if out.ndim > 1:
                return pd.Series(list(out))
            return pd.Series(out)

        return infer

    def __call__(self, *cols: Column) -> Column:
        return self.udf()(*cols)


def numpy_mlp_wrapper(model_path: str, name: str = "numpy-mlp") -> BatchInferencer:
    """A REAL model artifact through the real loader path: a pure-numpy
    MLP (relu hidden + sigmoid head) whose weights live in an ``.npz``
    file — ``W1 (d,h)``, ``b1 (h)``, ``W2 (h)``, ``b2 ()``. Exercises
    the same load-once-per-executor mechanism as the framework wrappers
    (reference ml_tools/helper.py:10-386 nonserializable_attribute;
    torch/xgboost need their runtimes, this one needs only numpy), so
    inference-by-loaded-weights is tested live, not just import-gated."""

    def load():
        z = np.load(model_path)
        return z["W1"], z["b1"], z["W2"], z["b2"]

    def predict(model, X):
        W1, b1, W2, b2 = model
        h = np.maximum(X @ W1 + b1, 0.0)
        return 1.0 / (1.0 + np.exp(-(h @ W2 + float(b2))))

    return BatchInferencer(name, load, predict)


def _import_gate(module: str, extra: str):
    def loader_factory(*a, **k):
        raise ImportError(
            f"{module} is not installed in this environment; install it to use "
            f"{extra} (the BatchInferencer mechanism itself works without it — "
            "see tests/test_streaming_ml_runner.py)"
        )

    return loader_factory


def torch_wrapper(model_path: str, name: str = "torch-model") -> BatchInferencer:
    """Reference: ml_tools/torch_wrapper.py:14."""
    try:
        import torch  # noqa: F401
    except ImportError:
        raise ImportError(
            "torch not installed; torch_wrapper mirrors BatchInferencer with "
            "loader=torch.jit.load(model_path)"
        )
    return BatchInferencer(
        name,
        lambda: __import__("torch").jit.load(model_path),
        lambda m, *xs: m(*[__import__("torch").from_numpy(x) for x in xs]).detach().numpy(),
    )


def xgboost_wrapper(model_path: str, name: str = "xgb-model") -> BatchInferencer:
    """Reference: ml_tools/xgboost_wrapper.py:14."""
    try:
        import xgboost  # noqa: F401
    except ImportError:
        raise ImportError(
            "xgboost not installed; xgboost_wrapper mirrors BatchInferencer "
            "with loader=xgboost.Booster(model_file=model_path)"
        )
    import xgboost as xgb

    def load():
        booster = xgb.Booster()
        booster.load_model(model_path)
        return booster

    return BatchInferencer(
        name, load, lambda m, x: m.predict(xgb.DMatrix(x))
    )


def triton_wrapper(url: str, model: str, name: str = "triton-model") -> BatchInferencer:
    """Reference: ml_tools/triton_wrapper.py:19 (remote inference server).
    Requires tritonclient; the UDF would POST Arrow batches to the server."""
    raise ImportError(
        "tritonclient not installed; triton_wrapper would wrap BatchInferencer "
        "with an HTTP predict callable against " + url + "/" + model
    )


def gbdt_load_json(model_path: str) -> dict:
    """Load an XGBoost-format JSON model dump (the official
    ``Booster.save_model("*.json")`` layout, public schema
    doc/model.schema) into plain numpy arrays — no xgboost wheel needed.

    Reads ``learner.gradient_booster.model.trees[*]`` flat node arrays:
    ``left_children`` / ``right_children`` (-1 marks a leaf),
    ``split_indices`` (feature id), ``split_conditions`` (threshold for
    internal nodes; the node's OUTPUT VALUE for leaves — XGBoost stores
    both in one union field), ``default_left`` (missing-value routing).
    ``learner_model_param.base_score`` is treated as a raw-margin bias
    and ``objective.name`` selects the output transform
    (``binary:logistic`` -> sigmoid, anything else -> identity).

    Reference semantics: ml_tools/xgboost_wrapper.py:14-60 wraps a live
    Booster; this loader covers the standard quality-classifier
    inference stage (GBDT over cheap text statistics) with the model as
    data, evaluated as vectorized numpy in the same BatchInferencer
    Arrow path.
    """
    import json

    with open(model_path) as fh:
        blob = json.load(fh)
    learner = blob["learner"]
    trees = []
    for t in learner["gradient_booster"]["model"]["trees"]:
        trees.append(
            {
                "left": np.asarray(t["left_children"], dtype=np.int64),
                "right": np.asarray(t["right_children"], dtype=np.int64),
                "feat": np.asarray(t["split_indices"], dtype=np.int64),
                "cond": np.asarray(t["split_conditions"], dtype=np.float64),
                "default_left": np.asarray(t["default_left"], dtype=bool),
            }
        )
    return {
        "trees": trees,
        "base_score": float(learner["learner_model_param"]["base_score"]),
        "objective": learner["objective"]["name"],
        "num_feature": int(learner["learner_model_param"]["num_feature"]),
    }


def gbdt_margin(model: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized ensemble evaluation: every row walks every tree with
    numpy level-synchronous descent (one vector step per tree LEVEL,
    not per row — depth-d trees finish in d vector ops regardless of
    batch size). Missing features (NaN) route via ``default_left``;
    the decision rule is XGBoost's ``x < threshold -> left``."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    out = np.full(n, model["base_score"], dtype=np.float64)
    rows = np.arange(n)
    for t in model["trees"]:
        left, right = t["left"], t["right"]
        feat, cond, dleft = t["feat"], t["cond"], t["default_left"]
        nid = np.zeros(n, dtype=np.int64)
        while True:
            internal = left[nid] != -1
            if not internal.any():
                break
            x = X[rows, feat[nid]]
            miss = np.isnan(x)
            go_left = np.where(miss, dleft[nid], x < cond[nid])
            nxt = np.where(go_left, left[nid], right[nid])
            nid = np.where(internal, nxt, nid)
        out += cond[nid]  # leaf value lives in the split_conditions union
    return out


def gbdt_predict(model: dict, X: np.ndarray) -> np.ndarray:
    """Margin + output transform (sigmoid for binary:logistic)."""
    m = gbdt_margin(model, X)
    if model["objective"] == "binary:logistic":
        return 1.0 / (1.0 + np.exp(-m))
    return m


def gbdt_wrapper(model_path: str, name: str = "gbdt-model") -> BatchInferencer:
    """GBDT inference as a BatchInferencer: the JSON dump is loaded ONCE
    per executor process (the reference's nonserializable_attribute
    pattern, ml_tools/helper.py:10-386), each Arrow batch of feature
    columns is column-stacked and scored with :func:`gbdt_margin` —
    pure numpy, no xgboost runtime on the workers."""

    def predict(model, *cols):
        X = np.column_stack([np.asarray(c, dtype=np.float64) for c in cols])
        return gbdt_predict(model, X)

    return BatchInferencer(name, lambda: gbdt_load_json(model_path), predict)


def gbdt_sql_expr(model: dict, feature_exprs: list[str]) -> str:
    """ANSI-SQL replay of the ensemble (oracle/codegen path): one nested
    CASE chain per tree, summed with the base margin; sigmoid for
    binary:logistic. ``feature_exprs[i]`` is the SQL text of feature i.
    NULL features propagate NULL (the numpy path's NaN routing has no
    SQL twin — oracle callers feed non-null features)."""

    def case(t, nid: int) -> str:
        if t["left"][nid] == -1:
            return repr(float(t["cond"][nid]))
        f = feature_exprs[int(t["feat"][nid])]
        c = repr(float(t["cond"][nid]))
        l = case(t, int(t["left"][nid]))
        r = case(t, int(t["right"][nid]))
        return f"(CASE WHEN ({f}) < ({c}) THEN {l} ELSE {r} END)"

    margin = " + ".join(case(t, 0) for t in model["trees"])
    margin = f"(({margin}) + ({model['base_score']!r}))"
    if model["objective"] == "binary:logistic":
        return f"(1.0 / (1.0 + exp(-{margin})))"
    return margin


def logreg_train(
    df,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 3,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch logistic-regression training, Spark-first: each
    gradient-descent step is ONE narrow aggregation — per-row gradient
    components (sigmoid(w.x) - y) * x_j summed map-side, a single
    (1 + n_features)-value row reaching the driver, weights fed back as
    literals into the next step's expression. The classic distributed
    linear-model recipe (Spark MLlib's own LogisticRegression trains
    exactly this way via treeAggregate); the corpus is scanned `iters`
    times, so cache the feature projection for multi-pass training.

    This is the training half of the fasttext-style quality-classifier
    stage in LLM data pipelines (GPT-3/CCNet-style quality filtering) —
    inference over the trained weights is a pure column expression.
    Returns [w_bias, w_1, ..., w_n] as Python floats.

    Rows with a null label or any null feature are dropped BEFORE the
    row count, so the gradient divisor matches exactly the rows the
    sums saw (a null row silently vanishes from ``F.sum`` but would
    still inflate ``count()``, deflating every gradient); an empty
    training set raises instead of ZeroDivisionError.
    """
    feats = [F.col(c).cast("double") for c in feature_cols]
    notnull = F.col(label_col).isNotNull()
    for c in feature_cols:
        notnull = notnull & F.col(c).isNotNull()
    df = df.filter(notnull)
    n = df.count()
    if n == 0:
        raise ValueError(
            "logreg_train: no rows with non-null label and features "
            f"(label={label_col!r}, features={feature_cols!r})"
        )
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        z = F.lit(w[0])
        for wi, x in zip(w[1:], feats):
            z = z + F.lit(wi) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = p - F.col(label_col).cast("double")
        row = df.agg(
            F.sum(r).alias("g0"),
            *[F.sum(r * x).alias(f"g{j + 1}") for j, x in enumerate(feats)],
        ).collect()[0]
        w = [
            wj - lr * (float(gj) / n + l2 * wj)
            for wj, gj in zip(w, row)
        ]
    return w


def logreg_predict(w: list[float], feature_cols: list[str]) -> Column:
    """P(y=1 | x) for logreg_train weights as a pure column expression
    (scan-stage inference, no UDF)."""
    z = F.lit(float(w[0]))
    for wi, c in zip(w[1:], feature_cols):
        z = z + F.lit(float(wi)) * F.col(c).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
