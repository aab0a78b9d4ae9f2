"""GenParticle genealogy: parent/children pointer-chase within events.

Reference kernels (numba over flat offsets): children
(nanoevents/transforms.py:234-299), distinctParent (:182-231),
distinctChildrenDeep (:302-431); surfaced as GenParticle properties
(methods/nanoaod.py:113-202).

Each event's particle list is tiny (tens of entries), so these are
NOT distributed-graph problems: ``children`` is a pure HOF expression
(O(n^2) per event, same complexity as the reference's kernel); the
irregular recursions (distinctParent / distinctChildrenDeep) are
Arrow-batched pandas UDFs that receive ONLY the two int columns they
need (mother index, pdgId) — never the full particle structs, whose
Arrow->Python conversion dominated the old per-event ``dict`` walk —
flattened to offsets+values arrays per batch, exactly the layout the
reference's numba kernels use:

- distinctParent runs as fully VECTORIZED numpy pointer-jumping over
  the whole flat batch (one ``gm[cur]`` gather per chain step, no
  per-particle Python), which beats a JIT'd scalar loop here;
- distinctChildrenDeep keeps its DFS (jagged output), but over flat
  int arrays instead of per-particle dicts — the same offsets+values
  shape a numba/JIT port would compile, with no object-layer work in
  the loop beyond int comparisons.
"""

from __future__ import annotations

import numpy as np
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


# ---------------------------------------------------------------------------
# flat-batch kernels
# ---------------------------------------------------------------------------

def _flatten_batch(mothers: pd.Series, pdgs: pd.Series):
    """Arrow list columns -> (flat_mothers, flat_pdgs, offsets, null_mask)
    int64 arrays covering the whole batch (reference layout:
    offsets+content, nanoevents/transforms.py)."""
    null = np.array([m is None for m in mothers], dtype=bool)
    arrs_m = [np.asarray(m, dtype=np.int64) if m is not None else np.empty(0, np.int64)
              for m in mothers]
    arrs_p = [np.asarray(p, dtype=np.int64) if p is not None else np.empty(0, np.int64)
              for p in pdgs]
    lens = np.array([len(a) for a in arrs_m], dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat_m = np.concatenate(arrs_m) if arrs_m else np.empty(0, np.int64)
    flat_p = np.concatenate(arrs_p) if arrs_p else np.empty(0, np.int64)
    return flat_m, flat_p, offsets, null


def _distinct_parent_flat(mothers: np.ndarray, pdgs: np.ndarray,
                          offsets: np.ndarray) -> np.ndarray:
    """Vectorized distinct-parent walk over a flat batch: local mother
    indices become global, then pointer-jump the whole batch at once —
    each iteration advances every particle still sitting on a same-pdg
    ancestor. Iteration count = longest same-pdg chain in the batch
    (the reference walks the same chain per particle in numba,
    transforms.py:182-231). Returns local index of the first
    different-pdg ancestor, -1 if none. Assumes acyclic mother chains
    (as does the reference kernel); a cycle cannot loop forever — the
    bound below caps iterations at the longest event."""
    n = mothers.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    ev_len = np.diff(offsets)
    ev_off = np.repeat(offsets[:-1], ev_len)
    loc_len = np.repeat(ev_len, ev_len)
    valid = (mothers >= 0) & (mothers < loc_len)
    gm = np.where(valid, mothers + ev_off, -1)
    cur = gm.copy()
    for _ in range(int(ev_len.max(initial=0)) + 1):
        act = cur >= 0
        safe = np.where(act, cur, 0)
        same = act & (pdgs[safe] == pdgs)
        if not same.any():
            break
        cur = np.where(same, gm[safe], cur)
    return np.where(cur >= 0, cur - ev_off, -1)


def _deep_children_event(m_loc, p_loc, n: int) -> list:
    """Per-event distinctChildrenDeep, faithful to the reference kernel
    (transforms.py:302-431, r9 parity fix):

    - only particles that sit at the TOP of a decay chain get a deep
      lookup: a valid mother whose pdg DIFFERS (roots and chain-interior
      nodes return []) — the reference skips interior nodes so chain
      children aren't repeated per chain member;
    - the result holds every descendant reached through same-pdg chain
      nodes, emitted at its first pdg change, PLUS same-pdg chain
      members with no children at all ("or last ones in the chain",
      methods/nanoaod.py distinctChildrenDeep doc).

    DFS in child-index order; unlike the reference's forward-only scan
    this is mother-order-independent (identical on the forward-ordered
    records generators emit). Operates on int arrays only; njit-shaped
    (no dicts, no attribute access)."""
    kids: list[list[int]] = [[] for _ in range(n)]
    for j in range(n):
        m = m_loc[j]
        if 0 <= m < n:
            kids[m].append(j)
    out = []
    for i in range(n):
        acc: list[int] = []
        pdg = p_loc[i]
        m = m_loc[i]
        if not (0 <= m < n) or p_loc[m] == pdg:
            out.append(acc)  # root or chain-interior: empty by design
            continue
        stack = [iter(kids[i])]
        while stack:
            try:
                c = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if p_loc[c] == pdg:
                if kids[c]:
                    if len(stack) >= n:
                        # an acyclic event of n particles can nest at
                        # most n chain frames; needing frame n+1 means
                        # the mother graph is cyclic — fail loud like
                        # the reference kernel's out-of-bounds
                        # RuntimeErrors (transforms.py:302-431), never
                        # emit a chain-interior node as if childless
                        raise RuntimeError(
                            "distinctChildrenDeep: descent depth exceeded "
                            f"event size ({n}) — cyclic mother graph"
                        )
                    stack.append(iter(kids[c]))
                else:
                    acc.append(c)  # childless chain member: last in chain
            else:
                acc.append(c)
        out.append(acc)
    return out


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def distinct_parent_idx_udf(mothers: pd.Series, pdgs: pd.Series) -> pd.Series:
    flat_m, flat_p, offsets, null = _flatten_batch(mothers, pdgs)
    res = _distinct_parent_flat(flat_m, flat_p, offsets)
    out = []
    for e in range(len(offsets) - 1):
        if null[e]:
            out.append(None)
            continue
        seg = res[offsets[e]:offsets[e + 1]]
        out.append([int(v) if v >= 0 else None for v in seg])
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.ArrayType(T.ArrayType(T.IntegerType())))
def distinct_children_deep_idx_udf(mothers: pd.Series, pdgs: pd.Series) -> pd.Series:
    flat_m, flat_p, offsets, null = _flatten_batch(mothers, pdgs)
    out = []
    for e in range(len(offsets) - 1):
        if null[e]:
            out.append(None)
            continue
        s, t = int(offsets[e]), int(offsets[e + 1])
        out.append(_deep_children_event(flat_m[s:t], flat_p[s:t], t - s))
    return pd.Series(out, dtype=object)


def _int_cols(genpart: Column) -> tuple[Column, Column]:
    """Project the two kernel inputs out of the particle structs so the
    Arrow transfer carries 2 int arrays, not every particle field."""
    mothers = F.transform(genpart, lambda x: x[MOTHER].cast("long"))
    pdgs = F.transform(genpart, lambda x: x["pdgId"].cast("long"))
    return mothers, pdgs


def distinct_parent_idx(genpart: Column) -> Column:
    """Index of the first ancestor with a different pdgId (NULL if none).
    Arrow-batched, batch-vectorized pointer-jump (SURVEY.md §2.2
    'distinctParent')."""
    return distinct_parent_idx_udf(*_int_cols(genpart))


def distinct_parent(genpart: Column) -> Column:
    """Distinct-parent particle structs (gather of distinct_parent_idx)."""
    return F.zip_with(
        genpart,
        distinct_parent_idx(genpart),
        lambda x, i: gather_local(genpart, i),
    )


def distinct_children_deep_idx(genpart: Column) -> Column:
    """Doubly-jagged indices of transitive distinct children."""
    return distinct_children_deep_idx_udf(*_int_cols(genpart))
