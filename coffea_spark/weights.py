"""Event weights with systematic up/down variations.

Reference: analysis_tools.py Weights (add :195-265, add_multivariation,
weight(modifier) :395-445, partial_weight :447-520, WeightStatistics
:138-193). A weight is a Column expression; the total weight is the
product of all registered weights; a "modifier" swaps one weight for its
up/down variation. Statistics compile to one agg pass.

Null handling: NULL weights are treated as 1.0 when multiplying into the
total (the reference fills masked weights with ones,
analysis_tools.py:229-233).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fill1(c: Column) -> Column:
    return F.coalesce(c.cast("double"), F.lit(1.0))


class Weights:
    def __init__(self, store_individual: bool = True):
        self._weights: dict[str, Column] = {}
        self._modifiers: dict[str, Column] = {}  # "name{Up,Down}" -> multiplier RELATIVE to nominal product

    @property
    def names(self) -> list[str]:
        return list(self._weights)

    @property
    def variations(self) -> list[str]:
        return list(self._modifiers)

    def add(
        self,
        name: str,
        weight: Column,
        weightUp: Column | None = None,
        weightDown: Column | None = None,
        shift: bool = False,
    ) -> "Weights":
        """Register a weight and optional variations. With ``shift=True``
        the variations are given as additive shifts from nominal
        (reference semantics, analysis_tools.py:195-265)."""
        if name in self._weights:
            raise ValueError(f"weight {name!r} already added")
        w = _fill1(weight)
        self._weights[name] = w
        if weightUp is not None:
            up = _fill1(weightUp)
            if shift:
                up = w + up
            self._modifiers[f"{name}Up"] = up / w
        if weightDown is not None:
            dn = _fill1(weightDown)
            if shift:
                dn = w - dn
            self._modifiers[f"{name}Down"] = dn / w
        return self

    def add_multivariation(
        self,
        name: str,
        weight: Column,
        modifierNames: list[str],
        weightsUp: list[Column],
        weightsDown: list[Column],
    ) -> "Weights":
        """Multiple named variations sharing one nominal weight
        (reference: add_multivariation)."""
        self.add(name, weight)
        w = self._weights[name]
        for mod, up, dn in zip(modifierNames, weightsUp, weightsDown):
            self._modifiers[f"{name}_{mod}Up"] = _fill1(up) / w
            self._modifiers[f"{name}_{mod}Down"] = _fill1(dn) / w
        return self

    def weight(self, modifier: str | None = None) -> Column:
        """Total weight Column; with ``modifier`` (e.g. "jesUp") the named
        variation replaces its nominal factor."""
        out = F.lit(1.0)
        for w in self._weights.values():
            out = out * w
        if modifier is not None:
            if modifier not in self._modifiers:
                raise ValueError(f"unknown modifier {modifier!r}")
            out = out * self._modifiers[modifier]
        return out

    def partial_weight(
        self, include: list[str] | None = None, exclude: list[str] | None = None
    ) -> Column:
        """Product over a subset of weights (reference: partial_weight)."""
        if include and exclude:
            raise ValueError("give include OR exclude, not both")
        names = include if include else [n for n in self._weights if n not in (exclude or [])]
        out = F.lit(1.0)
        for n in names:
            if n not in self._weights:
                raise ValueError(f"unknown weight {n!r}")
            out = out * self._weights[n]
        return out

    def statistics_aggs(self) -> list[Column]:
        """sumw/sumw2/min/max/n per registered weight, one agg pass
        (reference WeightStatistics, analysis_tools.py:138-193)."""
        aggs: list[Column] = []
        for n, w in self._weights.items():
            aggs += [
                F.sum(w).alias(f"{n}_sumw"),
                F.sum(w * w).alias(f"{n}_sumw2"),
                F.min(w).alias(f"{n}_minw"),
                F.max(w).alias(f"{n}_maxw"),
                F.count(w).alias(f"{n}_n"),
            ]
        return aggs

    def statistics(self, df: DataFrame) -> dict[str, dict[str, float]]:
        row = df.agg(*self.statistics_aggs()).collect()[0]
        return {
            n: {
                "sumw": row[f"{n}_sumw"],
                "sumw2": row[f"{n}_sumw2"],
                "minw": row[f"{n}_minw"],
                "maxw": row[f"{n}_maxw"],
                "n": row[f"{n}_n"],
            }
            for n in self._weights
        }
