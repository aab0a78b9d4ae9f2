"""Histogram aggregation — the terminal operator of nearly every analysis.

The reference fills hist.Hist objects per chunk and monoid-merges them
(analysis_tools.py:41-55, processor/accumulator.py). Spark-first, a
weighted N-dim histogram is a groupBy over bucket ids with map-side
partial aggregation — one shuffle of at most ``nbins`` rows regardless of
input size, which is exactly the plan you want at 100 TB.

Bucket convention (matches both numpy.histogram on the in-range part and
SQL ``width_bucket``): bin i covers [lo + i*w, lo + (i+1)*w) for
i in 0..nbins-1; underflow -> bin -1, overflow -> bin nbins. The flow
bins are kept so totals are conserved (hist.Hist keeps under/overflow
too); filter them out for plotting.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket(col: Column, lo: float, hi: float, nbins: int) -> Column:
    """Uniform bucket id for ``col``: -1 underflow, nbins overflow,
    else floor((x-lo)/w). NULL stays NULL (null values fill nothing,
    matching option-type skip in the reference's Weights/fills)."""
    w = (hi - lo) / nbins
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("long")
    return (
        F.when(col.isNull(), F.lit(None).cast("long"))
        .when(col < F.lit(lo), F.lit(-1))
        .when(col >= F.lit(hi), F.lit(nbins))
        .otherwise(raw)
    )


def bucket_edges(col: Column, edges: list[float]) -> Column:
    """Variable-width bucket id via a literal edges array: -1 underflow,
    len(edges)-1 overflow, else index of the containing bin. O(len(edges))
    per value but fully codegen'd (no UDF)."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    nedges = len(edges)
    idx = F.size(F.filter(arr, lambda e: e <= col)) - 1
    return (
        F.when(col.isNull(), F.lit(None).cast("long"))
        .when(col < F.lit(float(edges[0])), F.lit(-1))
        .when(col >= F.lit(float(edges[-1])), F.lit(nedges - 1))
        .otherwise(idx.cast("long"))
    )


def hist1d(
    df: DataFrame,
    value: Column | str,
    nbins: int,
    lo: float,
    hi: float,
    weight: Column | str | None = None,
    by: list[str] | None = None,
    flow: bool = True,
) -> DataFrame:
    """Weighted 1-D histogram as a DataFrame (bin, sumw, sumw2, n).

    ``by`` adds categorical axes (e.g. dataset) — the reference's hist
    category axis. Plan shape: project -> partial hash agg -> final agg;
    a single small shuffle.
    """
    value = F.col(value) if isinstance(value, str) else value
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    b = bucket(value, lo, hi, nbins).alias("bin")
    keys = [F.col(k) for k in (by or [])] + [b]
    out = (
        df.select(*keys, wcol.alias("_w"))
        .groupBy(*[k if isinstance(k, str) else k for k in (by or [])], "bin")
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_w")).alias("sumw2"),
            F.count("_w").alias("n"),
        )
    )
    if not flow:
        out = out.filter((F.col("bin") >= 0) & (F.col("bin") < nbins))
    return out


def hist1d_edges(
    df: DataFrame,
    value: Column | str,
    edges: list[float],
    weight: Column | str | None = None,
    by: list[str] | None = None,
    flow: bool = True,
) -> DataFrame:
    """Weighted 1-D histogram over VARIABLE-width bins (the reference's
    hist.axis.Variable — SURVEY.md §2.5 "variable-width bins"): same
    ``(bin, sumw, sumw2, n)`` contract and single-small-shuffle plan as
    :func:`hist1d`, bucketed by :func:`bucket_edges` (codegen'd literal
    edges array, no UDF). Bin i covers ``[edges[i], edges[i+1])`` for
    i in 0..len(edges)-2; underflow -> -1, overflow -> len(edges)-1."""
    if len(edges) < 2 or any(b <= a for a, b in zip(edges, edges[1:])):
        raise ValueError("edges must be strictly increasing with >= 2 entries")
    value = F.col(value) if isinstance(value, str) else value
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    b = bucket_edges(value, edges).alias("bin")
    keys = [F.col(k) for k in (by or [])] + [b]
    out = (
        df.select(*keys, wcol.alias("_w"))
        .groupBy(*(by or []), "bin")
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_w")).alias("sumw2"),
            F.count("_w").alias("n"),
        )
    )
    if not flow:
        out = out.filter((F.col("bin") >= 0) & (F.col("bin") < len(edges) - 1))
    return out


def hist2d(
    df: DataFrame,
    xvalue: Column | str,
    yvalue: Column | str,
    xbins: int,
    xlo: float,
    xhi: float,
    ybins: int,
    ylo: float,
    yhi: float,
    weight: Column | str | None = None,
    flow: bool = True,
) -> DataFrame:
    """Weighted 2-D histogram: group by the bucket-id tuple."""
    xvalue = F.col(xvalue) if isinstance(xvalue, str) else xvalue
    yvalue = F.col(yvalue) if isinstance(yvalue, str) else yvalue
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    out = (
        df.select(
            bucket(xvalue, xlo, xhi, xbins).alias("xbin"),
            bucket(yvalue, ylo, yhi, ybins).alias("ybin"),
            wcol.alias("_w"),
        )
        .groupBy("xbin", "ybin")
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_w")).alias("sumw2"),
            F.count("_w").alias("n"),
        )
    )
    if not flow:
        out = out.filter(
            (F.col("xbin") >= 0) & (F.col("xbin") < xbins)
            & (F.col("ybin") >= 0) & (F.col("ybin") < ybins)
        )
    return out


def profile1d(
    df: DataFrame,
    xvalue: Column | str,
    yvalue: Column | str,
    nbins: int,
    lo: float,
    hi: float,
    weight: Column | str | None = None,
    flow: bool = True,
) -> DataFrame:
    """Profile histogram (the reference's hist.storage.Mean axis / ROOT
    TProfile): per x-bin the weighted MEAN of a sample value, with the
    accumulators (sumw, sumwy, sumwy2, n) needed for the error on the
    mean. Same bucket-id groupBy shape as hist1d — the shuffle carries
    one small row per occupied bin, map-side combined."""
    xvalue = F.col(xvalue) if isinstance(xvalue, str) else xvalue
    yvalue = F.col(yvalue) if isinstance(yvalue, str) else yvalue
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    out = (
        df.select(
            bucket(xvalue, lo, hi, nbins).alias("bin"),
            wcol.alias("_w"),
            yvalue.alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_y")).alias("sumwy"),
            F.sum(F.col("_w") * F.col("_y") * F.col("_y")).alias("sumwy2"),
            F.count("_w").alias("n"),
        )
        .withColumn(
            "mean",
            F.when(F.col("sumw") != 0, F.col("sumwy") / F.col("sumw")),
        )
    )
    if not flow:
        out = out.filter((F.col("bin") >= 0) & (F.col("bin") < nbins))
    return out


@dataclass
class Hist1D:
    """Driver-side materialized histogram (dense numpy arrays), for the
    accumulator/merge path and plotting — the engine-side object stays a
    DataFrame. Addition is the reference's accumulator monoid
    (processor/accumulator.py:28-104)."""

    nbins: int
    lo: float
    hi: float
    sumw: np.ndarray  # length nbins+2: [underflow, bins..., overflow]
    sumw2: np.ndarray

    @classmethod
    def from_df(cls, hdf: DataFrame, nbins: int, lo: float, hi: float) -> "Hist1D":
        sumw = np.zeros(nbins + 2)
        sumw2 = np.zeros(nbins + 2)
        for row in hdf.collect():
            i = int(row["bin"]) + 1  # shift so underflow=-1 -> 0
            sumw[i] += row["sumw"]
            sumw2[i] += row["sumw2"]
        return cls(nbins, lo, hi, sumw, sumw2)

    @property
    def edges(self) -> np.ndarray:
        return np.linspace(self.lo, self.hi, self.nbins + 1)

    @property
    def values(self) -> np.ndarray:
        """In-range bin contents (no flow)."""
        return self.sumw[1:-1]

    def __add__(self, other: "Hist1D") -> "Hist1D":
        assert (self.nbins, self.lo, self.hi) == (other.nbins, other.lo, other.hi)
        return Hist1D(self.nbins, self.lo, self.hi, self.sumw + other.sumw, self.sumw2 + other.sumw2)


@dataclass
class Hist2D:
    xbins: int
    xlo: float
    xhi: float
    ybins: int
    ylo: float
    yhi: float
    sumw: np.ndarray  # (xbins+2, ybins+2)

    @classmethod
    def from_df(cls, hdf: DataFrame, xbins, xlo, xhi, ybins, ylo, yhi) -> "Hist2D":
        sumw = np.zeros((xbins + 2, ybins + 2))
        for row in hdf.collect():
            sumw[int(row["xbin"]) + 1, int(row["ybin"]) + 1] += row["sumw"]
        return cls(xbins, xlo, xhi, ybins, ylo, yhi, sumw)

    def __add__(self, other: "Hist2D") -> "Hist2D":
        return Hist2D(
            self.xbins, self.xlo, self.xhi, self.ybins, self.ylo, self.yhi,
            self.sumw + other.sumw,
        )


def histnd(
    df: DataFrame,
    axes: list[tuple],
    weight: Column | str | None = None,
    by: list[str] | None = None,
    flow: bool = True,
) -> DataFrame:
    """Weighted N-dimensional histogram — the general form of the
    reference's hist.Hist fill (n regular axes + category axes,
    analysis_tools.py:1138-1459).

    ``axes`` is a list of (value, nbins, lo, hi) tuples (value: Column or
    column name). Output: one row per occupied bucket tuple
    (bin0..bin{n-1}, by..., sumw, sumw2, n). Plan shape is identical at
    any dimensionality: project to bucket ids -> partial hash agg ->
    final agg — ONE shuffle of (occupied buckets x partitions) tiny
    rows, never the data. Sparse by construction: empty buckets don't
    exist, so a 30000^3 binning costs only the occupied cells (the dense
    ndarray view is driver-side, HistND.from_df)."""
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    bins = []
    for i, (value, nbins, lo, hi) in enumerate(axes):
        v = F.col(value) if isinstance(value, str) else value
        bins.append(bucket(v, lo, hi, nbins).alias(f"bin{i}"))
    keys = [F.col(k) for k in (by or [])]
    out = (
        df.select(*keys, *bins, wcol.alias("_w"))
        .groupBy(*(by or []), *[f"bin{i}" for i in range(len(axes))])
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_w")).alias("sumw2"),
            F.count("_w").alias("n"),
        )
    )
    if not flow:
        cond = F.lit(True)
        for i, (_, nbins, _, _) in enumerate(axes):
            cond = cond & (F.col(f"bin{i}") >= 0) & (F.col(f"bin{i}") < nbins)
        out = out.filter(cond)
    return out


def hist_categorical(
    df: DataFrame,
    categories: Column | str,
    weight: Column | str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Categorical (StrCategory-axis) histogram: one row per observed
    label with (sumw, sumw2, n). The reference's growable StrCategory
    axis (hist.axis.StrCategory(growth=True)) is a groupBy in Spark —
    the label set needs no pre-declaration.

    ``categories`` may be a scalar string column (one label per row) or
    an ``array<string>`` column (RAGGED per-event label lists, e.g. all
    quality flags a document carries): arrays are exploded so each label
    receives the row's full weight, matching the reference's fill
    broadcasting of a jagged categorical. NULL labels / NULL arrays fill
    nothing (option-type skip).

    Scale: explode -> partial hash agg -> final agg; the shuffle carries
    one row per DISTINCT label per partition."""
    cat = F.col(categories) if isinstance(categories, str) else categories
    wcol = (
        F.lit(1.0)
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    base = df.select(*[F.col(k) for k in (by or [])], cat.alias("_c"), wcol.alias("_w"))
    ctype = base.schema["_c"].dataType.typeName()
    if ctype == "array":
        base = base.select(*(by or []), F.explode("_c").alias("_c"), "_w")
    return (
        base.where(F.col("_c").isNotNull())
        .groupBy(*(by or []), F.col("_c").alias("category"))
        .agg(
            F.sum("_w").alias("sumw"),
            F.sum(F.col("_w") * F.col("_w")).alias("sumw2"),
            F.count("_w").alias("n"),
        )
    )


#: histogram accumulator columns (summable under projection/merge)
_HIST_ACCS = ("sumw", "sumw2", "sumwy", "sumwy2", "n")


def project(hdf: DataFrame, axis: str) -> DataFrame:
    """Project an N-dim histogram DataFrame onto one bin axis by summing
    the accumulators over the other bin axes (the reference's
    ``hist.project``; works on any hist1d/hist2d/histnd output whose bin
    columns end in 'bin'). Category columns (e.g. a dataset axis) are
    KEPT as group keys, not summed away. Tiny aggregate over
    already-reduced bins — no data re-scan."""
    bin_cols = [c for c in hdf.columns if c.endswith("bin")]
    if axis not in bin_cols:
        raise ValueError(f"axis {axis!r} not among bin columns {bin_cols}")
    keys = [axis] + [
        c for c in hdf.columns
        if c not in bin_cols and c not in _HIST_ACCS and c != "mean"
    ]
    aggs = [F.sum(c).alias(c) for c in hdf.columns if c in _HIST_ACCS]
    return hdf.groupBy(*keys).agg(*aggs)
