"""NanoEvents-style object API: ``events.Muon.pt``, ``muons.nearest(jets)``.

The reference binds physics behaviors to awkward record types at read time
(nanoevents/factory.py:267-480 builds the lazy event tree; behaviors in
methods/nanoaod.py:113-723 and methods/vector.py:479-561 give collections
methods like ``nearest``/``metric_table`` and properties like ``px``).

Spark Columns carry no behaviors, so this module provides thin proxy
classes over Column expressions instead:

- :class:`NanoEvents` wraps a DataFrame whose columns are collections
  (``array<struct>`` per event) — attribute access yields proxies.
- :class:`Collection` wraps one ``array<struct>`` Column; attribute access
  yields member arrays (``muons.pt``); kinematic properties that the
  NanoAOD layout doesn't store (``px``, ``energy``, ...) are computed on
  the fly; methods dispatch to :mod:`coffea_spark.joins` /
  :mod:`coffea_spark.vector`.
- :class:`Record` wraps one struct (an element inside a HOF lambda, or a
  simple collection like ``MET``) with the same surface at element level.

Everything remains a pure Catalyst expression: the proxies build Columns,
never execute, so whole-stage codegen and nested-schema pruning are
unaffected — ``events.Muon.pt`` compiles to the same plan as
``F.col("Muon.pt")``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coffea_spark import joins as _joins
from coffea_spark import vector as vec
from coffea_spark.schema import zip_collections

__all__ = ["NanoEvents", "Collection", "GenealogyView", "Record"]

# NanoAOD genealogy field names (reference methods/nanoaod.py GenParticle)
_MOTHER = "genPartIdxMother"
_PDG = "pdgId"

# kinematic properties computed from the PtEtaPhiM layout (reference
# methods/vector.py:145-470 property definitions)
_COMPUTED = {
    "px": vec.px,
    "py": vec.py,
    "pz": vec.pz,
    "energy": vec.energy,
    "p": vec.p,
    "p2": vec.p2,
    "theta": vec.theta,
    "rho": vec.rho,
}


def _c(x) -> Column:
    """Underlying Column of a proxy (pass Columns and literals through)."""
    if isinstance(x, (Record, Collection)):
        return x.c
    return x


class Record:
    """Element-level proxy: one struct-typed expression (a simple
    collection like ``MET``, a HOF lambda variable, or a combination
    member). ``rec.pt`` is the stored field; ``rec.px`` is computed;
    comparison/arithmetic operators build Columns."""

    __slots__ = ("_x", "_fields")

    def __init__(self, expr, fields: list[str] | None = None):
        object.__setattr__(self, "_x", expr)
        # optional static field-name metadata (Columns carry no runtime
        # struct type): enables dimensional-promotion dispatch
        object.__setattr__(self, "_fields", list(fields) if fields else None)

    @property
    def c(self):
        """The wrapped expression (Column or HOF lambda variable)."""
        return self._x

    def __getitem__(self, field: str):
        # plain expression access — lets vector.py's ``v["pt"]`` work on
        # Records so they can be passed to any function in that module
        return self._x[field]

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in _COMPUTED:
            return _COMPUTED[name](self._x)
        return Record(self._x[name])

    # ---- binary vector methods (dispatch to coffea_spark.vector) ----
    def delta_phi(self, other) -> Column:
        return vec.delta_phi(self, other if isinstance(other, Record) else Record(other))

    def delta_eta(self, other) -> Column:
        return vec.delta_eta(self, other if isinstance(other, Record) else Record(other))

    def delta_r(self, other) -> Column:
        return vec.delta_r(self, other if isinstance(other, Record) else Record(other))

    def add(self, other, with_charge: bool = False) -> "Record":
        return Record(vec.add(self, other, with_charge=with_charge))

    def add_promoted(self, other, fields=None, other_fields=None) -> "Record":
        """Sum with the reference's dimensional-promotion dispatch
        (methods/vector.py:675-690): the result carries
        min(dim(self), dim(other)) dimensions. Field names come from the
        Records' declared ``fields`` metadata or the explicit
        arguments."""
        fa = fields or self._fields
        ob = other if isinstance(other, Record) else Record(other)
        fb = other_fields or ob._fields
        if fa is None or fb is None:
            raise ValueError(
                "add_promoted needs field-name metadata for both sides "
                "(construct Record(expr, fields=[...]) or pass fields=)"
            )
        out = vec.add_promoted(self, ob, fa, fb)
        dim = min(vec.dimension(fa), vec.dimension(fb))
        out_fields = ["pt", "phi"] + (["eta"] if dim >= 3 else []) + (
            ["mass"] if dim == 4 else []
        )
        return Record(out, fields=out_fields)

    def invariant_mass(self, other) -> Column:
        return vec.invariant_mass(self, other)

    def scale(self, k) -> "Record":
        return Record(vec.scale(self, k))

    def negative(self) -> "Record":
        return Record(vec.negative(self))

    def isNotNull(self) -> Column:
        return self._x.isNotNull()

    def isNull(self) -> Column:
        return self._x.isNull()

    # ---- operators delegate to the wrapped expression ----
    def __add__(self, o):  # noqa: D105
        return self._x + _c(o)

    def __radd__(self, o):
        return _c(o) + self._x

    def __sub__(self, o):
        return self._x - _c(o)

    def __rsub__(self, o):
        return _c(o) - self._x

    def __mul__(self, o):
        return self._x * _c(o)

    def __rmul__(self, o):
        return _c(o) * self._x

    def __truediv__(self, o):
        return self._x / _c(o)

    def __neg__(self):
        return -self._x

    def __abs__(self):
        return F.abs(self._x)

    def __lt__(self, o):
        return self._x < _c(o)

    def __le__(self, o):
        return self._x <= _c(o)

    def __gt__(self, o):
        return self._x > _c(o)

    def __ge__(self, o):
        return self._x >= _c(o)

    def __eq__(self, o):  # noqa: D105 — Column semantics, not identity
        return self._x == _c(o)

    def __ne__(self, o):
        return self._x != _c(o)

    def __and__(self, o):
        return self._x & _c(o)

    def __or__(self, o):
        return self._x | _c(o)

    def __invert__(self):
        return ~self._x

    __hash__ = None


def _wrap_pred(fn: Callable) -> Callable:
    """User lambda over Records -> HOF lambda over raw variables."""

    def inner(x):
        return _c(fn(Record(x)))

    return inner


class GenealogyView:
    """Event-local genealogy accessors over a pristine base collection —
    the Spark spelling of the reference's global-index design
    (``GenPart.childrenIdxG`` / ``distinctParentIdxG`` +
    ``_apply_global_index``, methods/nanoaod.py:113-199, exercised by
    tests/test_nanoevents.py:12-47 ``genroundtrips``): the view carries a
    (possibly nested) array of INDICES into the per-event base array and
    gathers lazily, so chains like ``children.parent`` or
    ``distinctChildren.distinctParent`` stay in index space until a field
    access, and slices (``where`` / ``mask``) never break alignment —
    exactly why the reference ships IdxG columns instead of re-slicing
    structs.

    ``depth`` is the idx column's array nesting (1 = one index per base
    particle; ``children`` adds a level). NULL indices (masked elements,
    rootless parents) propagate NULL through every ACCESSOR and through
    ``mask()``; ``where()`` is the one exception — as a hard slice it
    DROPS NULL-index elements (their predicate evaluates NULL), so use
    ``mask()`` when masked-out must stay distinguishable from failed-cut.
    """

    __slots__ = ("_base", "_idx", "_depth")

    _GEN_ATTRS = (
        "parent",
        "children",
        "distinctParent",
        "distinctChildren",
        "distinctChildrenDeep",
    )

    def __init__(self, base: Column, idx: Column, depth: int = 1):
        object.__setattr__(self, "_base", base)
        object.__setattr__(self, "_idx", idx)
        object.__setattr__(self, "_depth", depth)

    @property
    def c(self) -> Column:
        """The (nested) index Column."""
        return self._idx

    @property
    def count(self) -> Column:
        """Sizes of the innermost lists (``ak.num(..., axis=deepest)``)."""
        return self._at_list_level(F.size)

    def _at_list_level(self, fn):
        def rec(col, d):
            if d == 1:
                return fn(col)
            return F.transform(col, lambda x: rec(x, d - 1))

        return rec(self._idx, self._depth)

    def _leaf(self, fn):
        def rec(col, d):
            if d == 1:
                return F.transform(col, lambda i: fn(i))
            return F.transform(col, lambda x: rec(x, d - 1))

        return rec(self._idx, self._depth)

    def _gather(self, i) -> Column:
        return _joins.gather_local(self._base, i)

    def _children_of(self, i) -> Column:
        pos = F.transform(self._base, lambda x, j: j)
        kids = F.filter(
            pos, lambda j: F.element_at(self._base, j + 1)[_MOTHER] == i
        )
        return F.when(i.isNotNull(), kids)

    def _distinct_children_of(self, i) -> Column:
        me = self._gather(i)[_PDG]
        pos = F.transform(self._base, lambda x, j: j)
        kids = F.filter(
            pos,
            lambda j: (F.element_at(self._base, j + 1)[_MOTHER] == i)
            & (F.element_at(self._base, j + 1)[_PDG] != me),
        )
        return F.when(i.isNotNull(), kids)

    # Spark cannot evaluate a Python UDF inside a higher-order-function
    # lambda (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so
    # the view's walks are PURE COLUMN expressions: a bounded
    # F.aggregate pointer-jump (<= size(base) steps — the same cap the
    # Arrow kernels use, genealogy.py:114,145). The relational operators
    # (genealogy.distinct_parent_idx etc.) keep the vectorized Arrow
    # kernels; these expression twins exist for proxy-API chains.

    def _distinct_parent_of(self, i) -> Column:
        """First different-pdg ancestor of base[i] (NULL if none) —
        expression twin of genealogy._distinct_parent_flat."""
        base = self._base
        p0 = self._gather(i)[_PDG]
        start = (
            F.when(self._gather(i)[_MOTHER] >= 0, self._gather(i)[_MOTHER])
            .cast("int")
        )

        def step(acc, _):
            cur = _joins.gather_local(base, acc)
            return (
                F.when(acc.isNull(), F.lit(None).cast("int"))
                .when(cur[_PDG] != p0, acc)
                .otherwise(F.when(cur[_MOTHER] >= 0, cur[_MOTHER]).cast("int"))
            )

        steps = F.sequence(F.lit(1), F.greatest(F.size(base), F.lit(1)))
        acc = F.aggregate(steps, start, step)
        return F.when(self._gather(acc)[_PDG] != p0, acc)

    def _deep_children_of(self, i) -> Column:
        """distinctChildrenDeep of base[i], reference-kernel semantics
        (transforms.py:302-431): EMPTY unless i tops a decay chain (a
        valid mother with a DIFFERENT pdg); otherwise every descendant
        reached through same-pdg chain nodes emitted at its first pdg
        change, plus childless same-pdg chain members ("last ones in
        the chain"). Expression twin of genealogy._deep_children_event,
        ordered by ascending local index instead of DFS order (the sets
        are identical; order differs only when an event's mother
        indices are non-monotone)."""
        base = self._base
        p0 = self._gather(i)[_PDG]
        mom = self._gather(self._gather(i)[_MOTHER])
        is_top = (
            self._gather(i)[_MOTHER] >= 0
        ) & mom.isNotNull() & (mom[_PDG] != p0)
        pos = F.transform(base, lambda x, j: j)
        steps = F.sequence(F.lit(1), F.greatest(F.size(base), F.lit(1)))

        def passes_through_i(j):
            # climb from mother(j) while nodes carry pdg(i); true iff
            # the climb reaches i before a pdg change / the root
            xj = F.element_at(base, j + 1)
            start = F.struct(
                F.when(xj[_MOTHER] >= 0, xj[_MOTHER]).cast("int").alias("cur"),
                F.lit(False).alias("found"),
            )

            def step(acc, _):
                cur, found = acc["cur"], acc["found"]
                hit = F.coalesce(cur == i, F.lit(False))
                c = _joins.gather_local(base, cur)
                new_cur = (
                    F.when(found | cur.isNull() | hit, F.lit(None).cast("int"))
                    .when(
                        c[_PDG] == p0,
                        F.when(c[_MOTHER] >= 0, c[_MOTHER]).cast("int"),
                    )
                    .otherwise(F.lit(None).cast("int"))
                )
                return F.struct(
                    new_cur.alias("cur"), (found | hit).alias("found")
                )

            return F.aggregate(steps, start, step)["found"]

        def childless(j):
            return ~F.exists(
                pos, lambda k: F.element_at(base, k + 1)[_MOTHER] == j
            )

        kids = F.filter(
            pos,
            lambda j: (
                (F.element_at(base, j + 1)[_PDG] != p0) | childless(j)
            )
            & (j != i)
            & passes_through_i(j),
        )
        # non-top particles get an EMPTY list (kernel parity), not NULL
        return F.when(
            i.isNotNull(),
            F.when(F.coalesce(is_top, F.lit(False)), kids).otherwise(
                F.slice(pos, 1, 0)
            ),
        )

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name == "parent":
            return GenealogyView(
                self._base,
                self._leaf(
                    lambda i: F.when(
                        self._gather(i)[_MOTHER] >= 0, self._gather(i)[_MOTHER]
                    )
                ),
                self._depth,
            )
        if name == "children":
            return GenealogyView(
                self._base, self._leaf(self._children_of), self._depth + 1
            )
        if name == "distinctParent":
            return GenealogyView(
                self._base, self._leaf(self._distinct_parent_of), self._depth
            )
        if name == "distinctChildren":
            return GenealogyView(
                self._base, self._leaf(self._distinct_children_of), self._depth + 1
            )
        if name == "distinctChildrenDeep":
            return GenealogyView(
                self._base, self._leaf(self._deep_children_of), self._depth + 1
            )
        if name in _COMPUTED:
            fn = _COMPUTED[name]
            return self._leaf(lambda i: fn(self._gather(i)))
        return self._leaf(lambda i: self._gather(i)[name])

    def where(self, pred: Callable) -> "GenealogyView":
        """Hard object slice that KEEPS genealogy resolution working
        (the reference's ``events.GenPart[mask]`` — indices travel with
        the slice, so relations still resolve into the full array).

        NULL indices are DROPPED, not kept: ``F.filter`` removes
        elements whose predicate evaluates NULL, which is every
        NULL index from a prior ``mask()``. That matches the
        reference's hard boolean slice (a masked entry cannot pass a
        cut); use ``mask()`` when NULL passthrough is required."""
        return GenealogyView(
            self._base,
            self._at_list_level(
                lambda col: F.filter(
                    col, lambda i: _c(pred(Record(self._gather(i))))
                )
            ),
            self._depth,
        )

    def mask(self, pred: Callable) -> "GenealogyView":
        """Null-preserving slice (``ak.mask`` analog in index space)."""
        return GenealogyView(
            self._base,
            self._leaf(
                lambda i: F.when(_c(pred(Record(self._gather(i)))), i)
            ),
            self._depth,
        )


class Collection:
    """Proxy over an ``array<struct>`` Column: one collection per event.

    ``muons.pt`` → array Column of the stored field; ``muons.px`` →
    computed per element; methods mirror the reference collection surface
    (methods/vector.py:479-561, methods/nanoaod.py:113-723).
    """

    __slots__ = ("_col", "_name", "_events", "_aligned", "_pristine")

    def __init__(
        self,
        col: Column,
        name: str = "<derived>",
        events=None,
        aligned: bool = True,
        pristine: Column | None = None,
    ):
        object.__setattr__(self, "_col", col)
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_events", events)
        # position-aligned with the pristine events collection? mask()
        # preserves alignment (nulls in place); where()/sort_by() break
        # it, which invalidates positional genealogy resolution
        object.__setattr__(self, "_aligned", aligned)
        # un-masked base for detached (events=None) aligned collections:
        # mask() stores the pre-mask column here so .indexed resolves
        # genealogy against pristine structs, not NULL-holed ones
        object.__setattr__(self, "_pristine", pristine)

    @property
    def c(self) -> Column:
        """The underlying array<struct> Column."""
        return self._col

    @property
    def count(self) -> Column:
        """Objects per event (``ak.num`` analog)."""
        return F.size(self._col)

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in _COMPUTED:
            fn = _COMPUTED[name]
            return F.transform(self._col, lambda x: fn(x))
        xref = self._resolve_xref(name)
        if xref is not None:
            return xref
        # GetArrayStructFields — same plan as F.col("Muon.pt")
        return self._col.getField(name)

    def _resolve_xref(self, name: str):
        """Schema-declared gathers: ``matched_jet`` (FK index) and
        ``matched_muons`` (nested Idx1/Idx2) from the events' schema
        spec (reference mixin properties, methods/nanoaod.py:113-723)."""
        ev = self._events
        spec = getattr(ev, "_schema", None) if ev is not None else None
        if spec is None:
            return None
        # variant specs (schemas_variants) declare no FK metadata
        nested = getattr(spec, "nested_references", {}).get(self._name, {})
        xrefs = getattr(spec, "cross_references", {})
        if name in nested:
            target, idx_fields = nested[name]
            return self.matched_via(idx_fields, ev[target])
        if name.startswith("matched_"):
            want = name[len("matched_"):]
            for idx_col, target in xrefs.items():
                coll, field = idx_col.split("_", 1)
                if coll == self._name and (
                    target.lower() == want
                    # reference naming: matched_gen (not matched_genpart)
                    # for the genPartIdx FK, methods/nanoaod.py
                    or (want == "gen" and field == "genPartIdx")
                ):
                    return self.matched(field, ev[target])
        if name == "parent" and f"{self._name}_{_MOTHER}" in xrefs:
            return self.matched(_MOTHER, ev[self._name])
        if (
            name in GenealogyView._GEN_ATTRS
            and f"{self._name}_{_MOTHER}" in xrefs
        ):
            return getattr(self.indexed, name)
        return None

    @property
    def indexed(self) -> "GenealogyView":
        """Identity :class:`GenealogyView` over this collection — the
        entry point for genealogy chains that must survive slicing
        (``GenPart.indexed.where(...).children.parent...``). Requires
        position alignment with the pristine events collection: masked
        elements become NULL indices; a ``where()``-derived collection
        (alignment broken) raises."""
        if not self._aligned:
            raise ValueError(
                "genealogy accessors need position alignment with the "
                "pristine collection; slice with .mask(...) or "
                ".indexed.where(...) instead of .where(...)"
            )
        ev = self._events
        if ev is not None:
            base = ev[self._name].c
        elif self._pristine is not None:
            # detached mask()-derived collection: resolve against the
            # stored pre-mask column — self._col has NULL structs and
            # would silently lose links through masked entries
            base = self._pristine
        else:
            base = self._col
        idx0 = F.transform(self._col, lambda x, i: F.when(x.isNotNull(), i))
        return GenealogyView(base, idx0, 1)

    def __getitem__(self, field: str) -> Column:
        return self._col.getField(field)

    # ---- restructuring ----
    def where(self, pred: Callable) -> "Collection":
        """Object-level filter (``jets[jets.pt > 30]`` analog): keep
        elements where ``pred(record)`` holds; shape shrinks (and
        position alignment with the pristine collection is lost — use
        ``.indexed.where(...)`` when genealogy must survive the slice)."""
        return Collection(
            F.filter(self._col, _wrap_pred(pred)),
            self._name,
            self._events,
            aligned=False,
        )

    def mask(self, pred: Callable) -> "Collection":
        """Null-preserving filter (``ak.mask`` analog): failing elements
        become NULL, the array keeps its length (and genealogy accessors
        keep working — NULL elements yield NULL indices)."""
        return Collection(
            F.transform(self._col, lambda x: F.when(_wrap_pred(pred)(x), x)),
            self._name,
            self._events,
            aligned=self._aligned,
            pristine=self._pristine if self._pristine is not None else self._col,
        )

    def map(self, fn: Callable) -> Column:
        """Per-element projection: array Column of ``fn(record)``."""
        return F.transform(self._col, lambda x: _c(fn(Record(x))))

    def sort_by(self, key: Callable, ascending: bool = True) -> "Collection":
        """Sort objects within the event by ``key(record)`` (stable via
        struct comparison; descending negates a numeric key)."""
        keyed = F.transform(
            self._col,
            lambda x: F.struct(
                (_c(key(Record(x))) * (1 if ascending else -1)).alias("k"),
                x.alias("v"),
            ),
        )
        return Collection(
            F.array_sort(keyed).getField("v"), self._name, self._events, aligned=False
        )

    # ---- joins (dispatch to coffea_spark.joins — all within-event) ----
    def combinations(self, n: int = 2, fields: list[str] | None = None) -> "Collection":
        """Distinct n-choose-k object combinations within the event."""
        return Collection(_joins.combinations(self._col, n, fields), f"{self._name}~{n}")

    def metric_table(self, other, metric: Callable = vec.delta_r) -> Column:
        """All-pairs metric vs another collection of the same event."""
        return _joins.metric_table(self._col, _c(other), metric)

    def nearest(
        self,
        other,
        metric: Callable = vec.delta_r,
        threshold: float | None = None,
        return_metric: bool = False,
    ) -> "Collection":
        """Per object, the metric-minimizing object of ``other``."""
        return Collection(
            _joins.nearest(
                self._col, _c(other), metric, threshold=threshold, return_metric=return_metric
            ),
            getattr(other, "_name", "<nearest>"),
        )

    def matched(self, idx_field: str, other) -> "Collection":
        """Cross-reference FK gather: ``Muon.matched_jet`` analog —
        per object, the element of ``other`` at this object's
        ``idx_field`` (NULL when -1 / out of range)."""
        return Collection(
            _joins.matched(self._col, idx_field, _c(other)),
            getattr(other, "_name", "<matched>"),
        )

    def matched_via(self, idx_fields: list[str], other) -> "Collection":
        """Fixed-k nested FK gather (``Jet.matched_muons`` analog)."""
        return Collection(
            _joins.matched_via(self._col, idx_fields, _c(other)),
            getattr(other, "_name", "<matched>"),
        )

    # ---- reductions (within event) ----
    def sum(self) -> Record:
        """Four-vector sum of the collection (``.sum()`` analog)."""
        return Record(vec.sum_vectors(self._col))

    def first(self) -> Record:
        return Record(F.element_at(self._col, 1))

    def explode(self, df: DataFrame, alias: str | None = None) -> DataFrame:
        """Flatten to one row per object (keeps no event columns)."""
        return df.select(F.explode(self._col).alias(alias or self._name))


class NanoEvents:
    """DataFrame proxy: attribute access yields collection proxies.

    ``NanoEvents(df)`` expects collection-shaped columns (array<struct>
    or struct); :meth:`from_flat` first zips flat ``Muon_pt``-style
    branches via :func:`coffea_spark.schema.zip_collections` — the Spark
    analog of NanoEventsFactory + NanoAODSchema
    (nanoevents/factory.py:267-480, schemas/nanoaod.py:255-408).
    """

    __slots__ = ("_df", "_schema")

    def __init__(self, df: DataFrame, schema=None):
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_schema", schema)

    @classmethod
    def from_flat(
        cls,
        df: DataFrame,
        collections: dict[str, list[str]] | None = None,
        schema=None,
    ) -> "NanoEvents":
        """Zip flat branches; with ``schema`` (a
        :class:`coffea_spark.schema.NanoAODSchemaSpec` or variant) apply
        its column synthesis first and carry its cross-reference
        metadata (enables ``events.Muon.matched_jet`` etc.)."""
        if schema is not None:
            return cls(schema.apply(df, collections), schema)
        return cls(zip_collections(df, collections))

    @classmethod
    def from_variant(cls, df: DataFrame, variant: str | None = None) -> "NanoEvents":
        """Apply an experiment schema-variant rewriter (PHYSLITE, Delphes,
        TreeMaker, EDM4HEP/FCC, ProtoDUNE, NanoAOD), auto-detected from
        branch names when not given — the analog of the reference's
        per-experiment factory entry points plus schemas/auto.py."""
        from coffea_spark.schemas_variants import SCHEMA_SPECS, detect_schema

        v = variant or detect_schema(df)
        if v == "nanoaod":
            from coffea_spark.schema import NanoAODSchemaSpec

            # real-file entry point: enforce the NanoAOD event-id
            # contract here (reference NanoAODSchema._build_collections
            # raises/warns on missing run/luminosityBlock/event)
            NanoAODSchemaSpec.validate_event_ids(df)
            return cls.from_flat(df, schema=NanoAODSchemaSpec)
        if v == "auto":
            return cls(zip_collections(df))
        return cls(SCHEMA_SPECS[v].apply(df), SCHEMA_SPECS[v])

    @property
    def df(self) -> DataFrame:
        return self._df

    def __getattr__(self, name: str):
        # only the slot and dunders are off-limits; engine-internal
        # columns like ``_os_pairs`` must resolve
        if name == "_df" or name.startswith("__"):
            raise AttributeError(name)
        try:
            dtype = self._df.schema[name].dataType
        except KeyError:
            raise AttributeError(f"no column {name!r} in events") from None
        col = F.col(name)
        if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
            return Collection(col, name, events=self)
        if isinstance(dtype, T.StructType):
            return Record(col)
        return col

    def __getitem__(self, name: str):
        return self.__getattr__(name)

    def filter(self, cond) -> "NanoEvents":
        """Event-level filter (rows drop)."""
        return NanoEvents(self._df.filter(_c(cond)), self._schema)

    def with_column(self, name: str, col) -> "NanoEvents":
        return NanoEvents(self._df.withColumn(name, _c(col)), self._schema)

    def select(self, *cols) -> DataFrame:
        return self._df.select(*[_c(c) for c in cols])
