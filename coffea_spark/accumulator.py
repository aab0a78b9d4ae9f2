"""Driver-side monoid accumulation for multi-dataset result merging.

Reference: processor/accumulator.py:28-104 (add/iadd/accumulate —
numbers add, sets union, dicts merge recursively, lists concat, objects
with __add__ add). Spark's agg tree already does distributed reduction;
this module only merges the small per-dataset result dicts on the driver
(SURVEY.md §2.5 'accumulator reduce')."""

from __future__ import annotations

from collections.abc import Iterable


def add(a, b):
    """Monoid combine of two result objects (recursive on dicts)."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = add(out[k], v) if k in out else v
        return out
    if isinstance(a, set) and isinstance(b, set):
        return a | b
    if isinstance(a, list) and isinstance(b, list):
        return a + b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return tuple(add(x, y) for x, y in zip(a, b))
    return a + b  # numbers, numpy arrays, Hist1D/Hist2D, anything with __add__


def accumulate(items: Iterable):
    """Fold ``add`` over an iterable of results."""
    out = None
    for it in items:
        out = add(out, it)
    return out
