"""PackedSelection / Cutflow / N-1 — named boolean cuts as predicates.

Reference: analysis_tools.py PackedSelection (add :2254-2279, require
:2295-2334, all/any/allfalse :2336-2384, cutflow :2483-2608, nminusone
:2386-2481). The reference bit-packs cuts into integer masks; here each
cut is a Catalyst boolean expression, and the bitmask is an optional
materialized column for reuse. Cutflow and N-1 reports compile to ONE
conditional-aggregation pass over the data — "one scan, many outputs" is
the physical property worth preserving from the reference (SURVEY.md §4).

Null handling: a NULL cut value counts as False (the reference coerces
option-type masks with explicit filling, analysis_tools.py:2196-2199).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_bool(c: Column) -> Column:
    """NULL -> False so conditional counts are well-defined."""
    return F.coalesce(c.cast("boolean"), F.lit(False))


class PackedSelection:
    """Registry of named boolean cuts over one DataFrame's columns."""

    def __init__(self, dtype: str = "uint32"):
        # dtype mirrors the reference ctor signature; capacity check only.
        self._maxitems = {"uint16": 16, "uint32": 32, "uint64": 63}[dtype]
        self._cuts: dict[str, Column] = {}

    @property
    def names(self) -> list[str]:
        return list(self._cuts)

    def add(self, name: str, cond: Column) -> "PackedSelection":
        if name in self._cuts:
            raise ValueError(f"cut {name!r} already registered")
        if len(self._cuts) >= self._maxitems:
            raise RuntimeError(f"capacity {self._maxitems} cuts exceeded")
        self._cuts[name] = _as_bool(cond)
        return self

    def add_multiple(self, cuts: dict[str, Column]) -> "PackedSelection":
        for k, v in cuts.items():
            self.add(k, v)
        return self

    def _pick(self, names) -> list[Column]:
        names = names or self.names
        missing = [n for n in names if n not in self._cuts]
        if missing:
            raise ValueError(f"unknown cuts: {missing}")
        return [self._cuts[n] for n in names]

    def all(self, *names: str) -> Column:
        out = F.lit(True)
        for c in self._pick(names):
            out = out & c
        return out

    def any(self, *names: str) -> Column:
        out = F.lit(False)
        for c in self._pick(names):
            out = out | c
        return out

    def allfalse(self, *names: str) -> Column:
        return ~self.any(*names)

    def require(self, **kv: bool) -> Column:
        """Rows where each named cut equals the given boolean."""
        out = F.lit(True)
        for name, want in kv.items():
            if name not in self._cuts:
                raise ValueError(f"unknown cut {name!r}")
            c = self._cuts[name]
            out = out & (c if want else ~c)
        return out

    def bitmask(self) -> Column:
        """Packed integer mask column (bit i = i-th registered cut), for
        persisting selections compactly (reference pack: analysis_tools
        :2219-2251)."""
        out = F.lit(0).cast("long")
        for i, c in enumerate(self._cuts.values()):
            out = out + F.when(c, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
        return out

    # -- reports ----------------------------------------------------------

    def cutflow_aggs(self, *names: str, weight: Column | None = None):
        """Aggregate expressions for a cutflow: one-cut and cumulative
        counts per cut (+ weighted variants when ``weight`` given)."""
        names = list(names) or self.names
        aggs = [F.count(F.lit(1)).alias("initial")]
        if weight is not None:
            aggs.append(F.sum(weight).alias("initial_w"))
        cumulative = F.lit(True)
        for n in names:
            c = self._cuts[n]
            cumulative = cumulative & c
            aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"onecut_{n}"))
            aggs.append(F.sum(F.when(cumulative, 1).otherwise(0)).alias(f"cutflow_{n}"))
            if weight is not None:
                aggs.append(F.sum(F.when(c, weight).otherwise(0.0)).alias(f"onecut_w_{n}"))
                aggs.append(F.sum(F.when(cumulative, weight).otherwise(0.0)).alias(f"cutflow_w_{n}"))
        return aggs

    def cutflow(self, df: DataFrame, *names: str, weight: Column | None = None) -> "Cutflow":
        """Single-pass cutflow over ``df`` (reference: PackedSelection.cutflow
        analysis_tools.py:2483-2608). One job, one row out."""
        names = list(names) or self.names
        row = df.agg(*self.cutflow_aggs(*names, weight=weight)).collect()[0]
        return Cutflow(
            names=names,
            initial=row["initial"],
            nevonecut=[row[f"onecut_{n}"] for n in names],
            nevcutflow=[row[f"cutflow_{n}"] for n in names],
            wevonecut=[row[f"onecut_w_{n}"] for n in names] if weight is not None else None,
            wevcutflow=[row[f"cutflow_w_{n}"] for n in names] if weight is not None else None,
            initial_w=row["initial_w"] if weight is not None else None,
        )

    def nminusone(self, df: DataFrame, *names: str) -> "NminusOne":
        """Counts passing all-but-one cut, per cut, plus all cuts — one
        conditional-aggregation pass (reference: analysis_tools.py
        :2386-2481)."""
        names = list(names) or self.names
        aggs = [F.count(F.lit(1)).alias("initial")]
        for leave_out in names:
            cond = F.lit(True)
            for n in names:
                if n != leave_out:
                    cond = cond & self._cuts[n]
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"nminusone_{leave_out}"))
        aggs.append(F.sum(F.when(self.all(*names), 1).otherwise(0)).alias("all_cuts"))
        row = df.agg(*aggs).collect()[0]
        return NminusOne(
            names=names,
            initial=row["initial"],
            nev=[row[f"nminusone_{n}"] for n in names],
            nev_all=row["all_cuts"],
        )


@dataclass
class Cutflow:
    """Result object mirroring the reference Cutflow.result tuple
    (analysis_tools.py:1494-1580)."""

    names: list[str]
    initial: int
    nevonecut: list[int]
    nevcutflow: list[int]
    wevonecut: list[float] | None = None
    wevcutflow: list[float] | None = None
    initial_w: float | None = None

    def result(self):
        return self.names, [self.initial] + self.nevonecut, [self.initial] + self.nevcutflow

    def to_rows(self) -> list[dict]:
        out = []
        for i, n in enumerate(self.names):
            row = {
                "cut": n,
                "onecut": self.nevonecut[i],
                "cutflow": self.nevcutflow[i],
            }
            if self.wevonecut is not None:
                row["onecut_w"] = self.wevonecut[i]
                row["cutflow_w"] = self.wevcutflow[i]
            out.append(row)
        return out

    def to_npz(self, path: str) -> None:
        """Export counts as npz (reference CutflowToNpz,
        analysis_tools.py:768-919; we export the counts, not per-event
        masks — masks at 100 TB belong in parquet via df.write)."""
        import numpy as np

        arrays = {
            "labels": np.array(["initial"] + self.names),
            "nevonecut": np.array([self.initial] + self.nevonecut),
            "nevcutflow": np.array([self.initial] + self.nevcutflow),
        }
        if self.wevonecut is not None:
            arrays["wevonecut"] = np.array([self.initial_w] + self.wevonecut)
            arrays["wevcutflow"] = np.array([self.initial_w] + self.wevcutflow)
        np.savez(path, **arrays)


@dataclass
class NminusOne:
    """Reference: NminusOne class analysis_tools.py:921-1010."""

    names: list[str]
    initial: int
    nev: list[int]
    nev_all: int

    def result(self):
        return self.names, [self.initial] + self.nev + [self.nev_all]

    def to_npz(self, path: str) -> None:
        """Export counts as npz (reference NminusOneToNpz,
        analysis_tools.py:649-766)."""
        import numpy as np

        np.savez(
            path,
            labels=np.array(["initial"] + [f"N - {n}" for n in self.names] + ["N"]),
            nev=np.array([self.initial] + self.nev + [self.nev_all]),
        )
