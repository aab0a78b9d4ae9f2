"""Event weights with systematic up/down variations.

Reference: analysis_tools.py Weights (add :292-335, __add_variation
:483-524, add_multivariation :430-481, weight(modifier) :554-572,
partial_weight :574-638, variations :640-646, WeightStatistics
:138-193). A weight is a Column expression; the total weight is the
product of all registered weights; a "modifier" swaps one weight for its
up/down variation.

Semantics ported exactly:

- modifiers are stored as MULTIPLIERS relative to nominal, except where
  the nominal weight is 0.0 — there the variation stays absolute
  (reference ``weightUp[weight != 0.0] /= weight[weight != 0.0]``).
- a missing ``...Down`` modifier with a stored ``...Up`` is served as
  the symmetric inverse ``w / mod(Up)`` (reference weight():570-571 and
  _partial_weight():635-636); ``variations`` lists the synthesized Down.
- ``partial_weight`` needs ``store_individual=True`` and EXACTLY ONE of
  include/exclude; unknown names are set-intersected away, not errors;
  a ``modifier`` whose base weight is not in the partial set raises.
- weight names may not end in "Up"/"Down" (reference add():319-322).

Null handling: NULL weights are treated as 1.0 when multiplying into the
total (the reference fills masked weights with ones,
analysis_tools.py:341-346).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fill1(c: Column) -> Column:
    return F.coalesce(c.cast("double"), F.lit(1.0))


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


class Weights:
    def __init__(self, store_individual: bool = True):
        # the running product (reference self._weight) — kept so
        # weight() works even with store_individual=False
        self._weight: Column = F.lit(1.0)
        self._store_individual = bool(store_individual)
        self._weights: dict[str, Column] = {}
        self._names: list[str] = []
        # "name{Up,Down}" -> multiplier RELATIVE to nominal where the
        # nominal is nonzero, absolute where it is zero (reference
        # __add_variation_eager)
        self._modifiers: dict[str, Column] = {}

    @property
    def names(self) -> list[str]:
        return list(self._names)

    @property
    def variations(self) -> set[str]:
        """Available modifiers, including the symmetric Down synthesized
        for any Up-only variation (reference analysis_tools.py:640-646)."""
        keys = set(self._modifiers)
        for k in self._modifiers:
            keys.add(k.replace("Up", "Down"))
        return keys

    def _ratio(self, var: Column, w: Column) -> Column:
        """Variation -> stored modifier: divide by nominal where the
        nominal is nonzero, keep absolute where it is zero (reference
        ``weightUp[weight != 0.0] /= weight[weight != 0.0]``)."""
        return F.when(w != 0.0, var / w).otherwise(var)

    def add(
        self,
        name: str,
        weight,
        weightUp=None,
        weightDown=None,
        shift: bool = False,
    ) -> "Weights":
        """Register a weight and optional variations. With ``shift=True``
        the variations are given as additive shifts from nominal: up is
        ``w + weightUp``, down is ``w - weightDown`` (reference
        analysis_tools.py:489-499). A ``weightUp`` with no ``weightDown``
        gets a symmetric auto-Down (``1/up`` ratio) at lookup time."""
        if name in self._names:
            raise ValueError(f"Weight '{name}' already exists")
        if name.endswith("Up") or name.endswith("Down"):
            raise ValueError(
                "Avoid using 'Up' and 'Down' in weight names, instead "
                "pass appropriate shifts to add() call"
            )
        w = _fill1(_c(weight))
        self._weight = self._weight * w
        if self._store_individual:
            self._weights[name] = w
        self._names.append(name)
        if weightUp is not None:
            up = _fill1(_c(weightUp))
            if shift:
                up = w + up
            self._modifiers[f"{name}Up"] = self._ratio(up, w)
        if weightDown is not None:
            dn = _fill1(_c(weightDown))
            if shift:
                dn = w - dn
            self._modifiers[f"{name}Down"] = self._ratio(dn, w)
        return self

    def add_multivariation(
        self,
        name: str,
        weight,
        modifierNames: list[str],
        weightsUp: list,
        weightsDown: list,
        shift: bool = False,
    ) -> "Weights":
        """Multiple named variations sharing one nominal weight
        (reference: add_multivariation, analysis_tools.py:430-481;
        variation keys are ``{name}_{modifier}{Up,Down}``)."""
        if modifierNames and (
            len(modifierNames) != len(weightsUp)
            or len(modifierNames) != len(weightsDown)
        ):
            raise ValueError(
                "Provide the same number of modifier names related to "
                "the list of modified weights"
            )
        self.add(name, weight)
        w = self._weights.get(name)
        if w is None:  # store_individual=False still needs the nominal
            w = _fill1(_c(weight))
        for mod, up, dn in zip(modifierNames, weightsUp, weightsDown):
            if up is not None:
                u = _fill1(_c(up))
                if shift:
                    u = w + u
                self._modifiers[f"{name}_{mod}Up"] = self._ratio(u, w)
            if dn is not None:
                d = _fill1(_c(dn))
                if shift:
                    d = w - d
                self._modifiers[f"{name}_{mod}Down"] = self._ratio(d, w)
        return self

    def _apply_modifier(self, w: Column, modifier: str) -> Column:
        if "Down" in modifier and modifier not in self._modifiers:
            up = modifier.replace("Down", "Up")
            if up not in self._modifiers:
                raise ValueError(f"unknown modifier {modifier!r}")
            # symmetric auto-Down (reference weight():570-571)
            return w / self._modifiers[up]
        if modifier not in self._modifiers:
            raise ValueError(f"unknown modifier {modifier!r}")
        return w * self._modifiers[modifier]

    def weight(self, modifier: str | None = None) -> Column:
        """Total weight Column; with ``modifier`` (e.g. "jesUp") the named
        variation replaces its nominal factor."""
        if modifier is None:
            return self._weight
        return self._apply_modifier(self._weight, modifier)

    def partial_weight(
        self,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        modifier: str | None = None,
    ) -> Column:
        """Product over a subset of weights (reference: partial_weight,
        analysis_tools.py:574-638): exactly one of include/exclude;
        requires individual storage; ``modifier`` must vary a weight in
        the partial set."""
        if not self._store_individual:
            raise ValueError(
                "To be able to request weight exclusion, use "
                "store_individual=True when creating Weights object."
            )
        include = list(include or [])
        exclude = list(exclude or [])
        if (include and exclude) or not (include or exclude):
            raise ValueError(
                "Need to specify exactly one of the 'exclude' or "
                "'include' arguments."
            )
        names = set(self._weights)
        if include:
            names = names & set(include)
        if exclude:
            names = names - set(exclude)
        out = F.lit(1.0)
        # iterate registration order for a deterministic expression tree
        for n in self._names:
            if n in names:
                out = out * self._weights[n]
        if modifier is None:
            return out
        if modifier.replace("Down", "").replace("Up", "") not in names:
            raise ValueError(
                f"Modifier {modifier} is not in the list of included weights"
            )
        return self._apply_modifier(out, modifier)

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
