"""Binned-table lookups — the generic "correction from histogram" operator.

Reference: lookup_tools/dense_lookup.py:8-60 (N-dim searchsorted with
clamp-to-edge), dispatch lookup_tools/lookup_base.py:75-138;
dense_evaluated_lookup.py (per-bin formula evaluation).

Two execution strategies, chosen by table size:

- small tables (the common case: correction maps are KBs): the bin edges
  and values become LITERAL arrays and the lookup compiles to pure column
  expressions — runs inside whole-stage codegen, zero Python, zero
  shuffle, replicated to every task for free.
- large tables: the numpy arrays ride a Spark broadcast variable and the
  lookup is an Arrow-batched pandas UDF doing vectorized
  ``np.searchsorted`` — one broadcast, no shuffle.

Both clamp out-of-range coordinates to the edge bins, exactly like the
reference (`np.clip(searchsorted(...)-1, 0, n-2)`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EXPR_SIZE_LIMIT = 4096  # values above this go through the broadcast-UDF path


def _bin_index_expr(x: Column, edges: np.ndarray) -> Column:
    """searchsorted(edges, x, 'right')-1 clamped to [0, nbins-1] as a
    column expression (edges literal)."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    raw = F.size(F.filter(arr, lambda e: e <= x)) - 1
    return F.greatest(F.least(raw, F.lit(len(edges) - 2)), F.lit(0))


class DenseLookup:
    """N-dimensional binned lookup: ``lookup(x, y, ...) -> Column``.

    Parameters mirror the reference's dense_lookup: ``values`` with shape
    (len(bins[0])-1, len(bins[1])-1, ...), ``bins`` a list of 1-D edge
    arrays (finite edges; +/-inf edges are clamped by construction).
    """

    def __init__(self, values: np.ndarray, bins: list[np.ndarray] | np.ndarray):
        if isinstance(bins, np.ndarray) and bins.ndim == 1:
            bins = [bins]
        self.bins = [np.asarray(b, dtype=float) for b in bins]
        self.values = np.asarray(values, dtype=float)
        expected = tuple(len(b) - 1 for b in self.bins)
        if self.values.shape != expected:
            raise ValueError(
                f"values shape {self.values.shape} != bins shape {expected}"
            )

    # -- expression path ---------------------------------------------------

    def _expr_call(self, *coords: Column) -> Column:
        flat = self.values.ravel()
        values_lit = F.array(*[F.lit(float(v)) for v in flat])
        strides = [int(s) for s in np.array(self.values.strides) // self.values.itemsize]
        idx = F.lit(0)
        for c, edges, stride in zip(coords, self.bins, strides):
            # replace inf edges with huge finite sentinels for literal math
            e = np.nan_to_num(edges, posinf=1e300, neginf=-1e300)
            idx = idx + _bin_index_expr(c, e) * F.lit(stride)
        return F.element_at(values_lit, idx + F.lit(1))

    # -- broadcast UDF path ------------------------------------------------

    def _udf_call(self, spark: SparkSession, *coords: Column) -> Column:
        bins = self.bins
        values = self.values
        bc = spark.sparkContext.broadcast((bins, values))

        @F.pandas_udf(T.DoubleType())
        def lookup_udf(*cols: pd.Series) -> pd.Series:
            b, v = bc.value
            idxs = []
            for s, edges in zip(cols, b):
                i = np.searchsorted(edges, s.to_numpy(dtype=float), side="right") - 1
                idxs.append(np.clip(i, 0, len(edges) - 2))
            return pd.Series(v[tuple(idxs)])

        return lookup_udf(*coords)

    def __call__(self, *coords: Column, spark: SparkSession | None = None) -> Column:
        if len(coords) != len(self.bins):
            raise ValueError(f"expected {len(self.bins)} coordinates")
        if self.values.size <= _EXPR_SIZE_LIMIT or spark is None:
            return self._expr_call(*coords)
        return self._udf_call(spark, *coords)


class FormulaLookup:
    """Per-bin formula evaluation (reference: dense_evaluated_lookup /
    jme_standard_function): bins select a formula; the formula is a Spark
    SQL expression string in the variable ``x`` (e.g. ``"2.0*x + 1.0"``),
    compiled into a CASE chain of native expressions."""

    def __init__(self, formulas: list[str], bins: np.ndarray):
        self.bins = np.asarray(bins, dtype=float)
        if len(formulas) != len(self.bins) - 1:
            raise ValueError("need len(bins)-1 formulas")
        self.formulas = formulas

    def __call__(self, coord: Column, x: Column) -> Column:
        idx = _bin_index_expr(coord, np.nan_to_num(self.bins, posinf=1e300, neginf=-1e300))
        result = F.lit(None).cast("double")
        for i, formula in enumerate(self.formulas):
            compiled = _substitute(formula, x)
            result = F.when(idx == F.lit(i), compiled).otherwise(result)
        return result


_BINOPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
}

_FUNCS = {
    "sqrt": F.sqrt,
    "log": F.log,
    "log10": F.log10,
    "exp": F.exp,
    "abs": F.abs,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "atan": F.atan,
    "pow": lambda a, b: F.pow(a, b),
    "least": F.least,
    "greatest": F.greatest,
}


def _substitute(formula: str, x: Column | None = None, variables: dict[str, Column] | None = None) -> Column:
    """Tiny recursive-descent evaluator for arithmetic formulas —
    produces a pure Column tree (TFormula-lite; the reference parses ROOT
    TFormula strings the same way, lookup_tools/jme_standard_function.py).

    ``x`` names the single formula variable (FormulaLookup's contract);
    ``variables`` maps additional names (``y``, ``p0``...) to Columns for
    the multi-variable JME formulas in correction_files.py.
    """
    import ast

    env: dict[str, Column] = dict(variables or {})
    if x is not None:
        env["x"] = x

    def build(node):
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.BinOp):
            op = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/"}.get(type(node.op))
            if op is None:
                if isinstance(node.op, ast.Pow):
                    return F.pow(build(node.left), build(node.right))
                raise ValueError(f"unsupported operator {node.op}")
            return _BINOPS[op](build(node.left), build(node.right))
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                return -build(node.operand)
            raise ValueError("unsupported unary op")
        if isinstance(node, ast.Num):  # pragma: no cover (py<3.8 style)
            return F.lit(float(node.n))
        if isinstance(node, ast.Constant):
            return F.lit(float(node.value))
        if isinstance(node, ast.Name):
            if node.id in env:
                return env[node.id]
            raise ValueError(f"unknown variable {node.id}")
        if isinstance(node, ast.Call):
            fname = node.func.id
            if fname not in _FUNCS:
                raise ValueError(f"unknown function {fname}")
            return _FUNCS[fname](*[build(a) for a in node.args])
        raise ValueError(f"unsupported syntax: {ast.dump(node)}")

    return build(ast.parse(formula.replace("^", "**"), mode="eval"))


def extractor(path: str):
    """Load correction tables into lookup objects, dispatching on the
    file extension (reference: lookup_tools.extractor:153-189 dispatches
    the same way on `.json` / `.csv` / `.txt` inputs).

    - ``*.btag.csv[.gz]`` / ``*.csv[.gz]`` -> {name: BTagSFTable}
    - ``*.jec.txt[.gz]``                  -> {name: JECTable}
    - ``*.junc.txt[.gz]``                 -> {component: JuncTable}
    - ``*.jersf.txt[.gz]``                -> {name: JERSFTable}
    - ``*.json``: the normalized form below.

    JSON schema: {"corrections": [
      {"name": ..., "type": "dense",   "bins": [edges...] | [[e0..],[e1..]],
       "values": nested-list},
      {"name": ..., "type": "formula", "bins": [edges...],
       "formulas": ["1.0 + 2.0/sqrt(x)", ...]}
    ]}
    Returns {name: DenseLookup | FormulaLookup}.
    """
    import json

    base = path.rsplit("/", 1)[-1]
    if base.endswith(".gz"):
        base = base[:-3]
    if base.endswith(".csv"):
        from coffea_spark.correction_files import read_btag_csv

        t = read_btag_csv(path)
        return {base.split(".")[0]: t}
    if base.endswith(".junc.txt"):
        from coffea_spark.correction_files import read_junc_txt

        return read_junc_txt(path)
    if base.endswith(".jersf.txt"):
        from coffea_spark.correction_files import read_jersf_txt

        t = read_jersf_txt(path)
        return {t.name: t}
    if base.endswith(".txt"):
        from coffea_spark.correction_files import read_jec_txt

        t = read_jec_txt(path)
        return {t.name: t}

    with open(path) as f:
        doc = json.load(f)
    out = {}
    for c in doc.get("corrections", []):
        name, kind = c["name"], c["type"]
        if name in out:
            raise ValueError(f"duplicate correction name {name!r}")
        if kind == "dense":
            bins = c["bins"]
            if bins and not isinstance(bins[0], (list, tuple)):
                bins = [bins]
            out[name] = DenseLookup(
                np.asarray(c["values"], dtype=float),
                [np.asarray(b, dtype=float) for b in bins],
            )
        elif kind == "formula":
            out[name] = FormulaLookup(list(c["formulas"]), np.asarray(c["bins"], dtype=float))
        else:
            raise ValueError(f"unknown correction type {kind!r} for {name!r}")
    return out
