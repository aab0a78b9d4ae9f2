"""GenParticle genealogy: parent/children pointer-chase within events.

Reference kernels (numba over flat offsets): children
(nanoevents/transforms.py:234-299), distinctParent (:182-231),
distinctChildrenDeep (:302-431); surfaced as GenParticle properties
(methods/nanoaod.py:113-202).

Each event's particle list is tiny (tens of entries), so these are
NOT distributed-graph problems: ``children`` is a pure HOF expression
(O(n^2) per event, same complexity as the reference's kernel), and the
irregular recursions (distinctParent / distinctChildrenDeep) are
Arrow-batched pandas UDFs over the array column — Python per event-batch,
never per row.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coffea_spark.joins import gather_local

MOTHER = "genPartIdxMother"


def parent_idx(genpart: Column) -> Column:
    """Local index of each particle's mother (-1 -> NULL)."""
    return F.transform(
        genpart, lambda x: F.when(x[MOTHER] >= 0, x[MOTHER])
    )


def parent(genpart: Column) -> Column:
    """Mother particle struct per particle (NULL for roots). Reference:
    GenParticle.parent, methods/nanoaod.py."""
    return F.transform(genpart, lambda x: gather_local(genpart, x[MOTHER]))


def children_idx(genpart: Column) -> Column:
    """Per particle, the 0-based indices of its direct children —
    doubly-jagged array<array<int>>. Pure HOF inversion of the parent
    relation (reference kernel: transforms.py:234-299)."""
    idx = F.transform(genpart, lambda x, i: i)
    return F.transform(
        genpart,
        lambda x, i: F.filter(idx, lambda j: F.element_at(genpart, j + 1)[MOTHER] == i),
    )


def children(genpart: Column) -> Column:
    """Child particle structs per particle (doubly-jagged)."""
    return F.transform(
        genpart,
        lambda x, i: F.filter(genpart, lambda c: c[MOTHER] == i),
    )


def _walk_distinct_parent(particles: list) -> list:
    """Per event: for each particle, walk the mother chain until the pdgId
    differs (reference kernel semantics, transforms.py:182-231). Returns
    0-based index of the distinct parent or None."""
    out = []
    n = len(particles)
    for p in particles:
        pdg = p["pdgId"]
        m = p[MOTHER]
        seen = 0
        while 0 <= m < n and particles[m]["pdgId"] == pdg and seen <= n:
            m = particles[m][MOTHER]
            seen += 1
        out.append(m if 0 <= m < n else None)
    return out


def _collect_children_deep(particles: list) -> list:
    """Per event: transitive children, skipping chains where the child has
    the same pdgId (descend through same-pdg children instead of keeping
    them) — reference kernel transforms.py:302-431."""
    n = len(particles)
    kids: list[list[int]] = [[] for _ in range(n)]
    for j, p in enumerate(particles):
        m = p[MOTHER]
        if 0 <= m < n:
            kids[m].append(j)

    def deep(i: int, depth: int = 0) -> list[int]:
        out: list[int] = []
        if depth > n:
            return out
        for c in kids[i]:
            if particles[c]["pdgId"] == particles[i]["pdgId"]:
                out.extend(deep(c, depth + 1))
            else:
                out.append(c)
        return out

    return [deep(i) for i in range(n)]


def _genealogy_udf(fn, rettype):
    @F.pandas_udf(rettype)
    def inner(col: pd.Series) -> pd.Series:
        return col.map(lambda parts: fn(list(parts)) if parts is not None else None)

    return inner


distinct_parent_idx_udf = _genealogy_udf(_walk_distinct_parent, T.ArrayType(T.IntegerType()))
distinct_children_deep_idx_udf = _genealogy_udf(
    _collect_children_deep, T.ArrayType(T.ArrayType(T.IntegerType()))
)


def distinct_parent_idx(genpart: Column) -> Column:
    """Index of the first ancestor with a different pdgId (NULL if none).
    Arrow-batched pandas UDF — irregular per-event recursion
    (SURVEY.md §2.2 'distinctParent')."""
    return distinct_parent_idx_udf(genpart)


def distinct_parent(genpart: Column) -> Column:
    """Distinct-parent particle structs (gather of distinct_parent_idx)."""
    return F.zip_with(
        genpart,
        distinct_parent_idx_udf(genpart),
        lambda x, i: gather_local(genpart, i),
    )


def distinct_children_deep_idx(genpart: Column) -> Column:
    """Doubly-jagged indices of transitive distinct children."""
    return distinct_children_deep_idx_udf(genpart)
