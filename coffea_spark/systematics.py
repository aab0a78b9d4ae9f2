"""Systematic-variation column framework.

Reference: ``Systematic.add_systematic(name, kind, what, varying_fn)``
stores variation records under an ``__systematics__`` field and
``UpDownSystematic.up/down`` re-zips the record with the varied column
(methods/base.py:54-259, methods/systematics/UpDownSystematic.py:8-59).

Spark-native spelling: a systematic IS extra columns. Variations live in
one ``systematics`` struct column —
``systematics.<name>.up`` / ``systematics.<name>.down`` — each holding
the varied value column (scalar or array, aligned with the nominal).
Pure column management: no engine support needed, Catalyst prunes
untouched variations out of the scan, and a variation participates in
any downstream expression exactly like its nominal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SYST_COL = "systematics"

_KINDS = ("UpDownSystematic", "UpDownMultiSystematic")


def add_updown_systematic(
    df: DataFrame,
    name: str,
    what: str | Column,
    up_fn: Callable[[Column], Column],
    down_fn: Callable[[Column], Column],
) -> DataFrame:
    """Register an up/down systematic: ``what`` (a column name or
    expression, scalar or array) varied by ``up_fn``/``down_fn``.
    Adds/extends the ``systematics`` struct column with
    ``<name>.up`` / ``<name>.down``."""
    col = F.col(what) if isinstance(what, str) else what
    entry = F.struct(up_fn(col).alias("up"), down_fn(col).alias("down"))
    if SYST_COL in df.columns:
        return df.withColumn(SYST_COL, F.col(SYST_COL).withField(name, entry))
    return df.withColumn(SYST_COL, F.struct(entry.alias(name)))


def add_updown_multi_systematic(
    df: DataFrame,
    name: str,
    whats: list[str],
    up_fn: Callable[[dict[str, Column]], dict[str, Column]],
    down_fn: Callable[[dict[str, Column]], dict[str, Column]],
) -> DataFrame:
    """Register a MULTI-column up/down systematic: several observables
    vary COHERENTLY under one source (reference
    methods/systematics/UpDownMultiSystematic.py:10-50 — e.g. a jet
    energy shift moving pt and mass together). ``up_fn``/``down_fn``
    receive {name: Column} for every entry of ``whats`` and return the
    varied columns; both directions land under one entry:
    ``systematics.<name>.up.<what>`` / ``...down.<what>`` — so a
    variation selects ALL its varied columns at once, never a
    mixed-direction combination."""
    if not whats:
        raise ValueError("whats must name at least one column")
    cols = {w: F.col(w) for w in whats}

    def pack(varied: dict[str, Column]) -> Column:
        missing = set(whats) - set(varied)
        if missing:
            raise ValueError(f"varying fn did not return columns for {sorted(missing)}")
        return F.struct(*[varied[w].alias(w) for w in whats])

    entry = F.struct(
        pack(up_fn(dict(cols))).alias("up"),
        pack(down_fn(dict(cols))).alias("down"),
    )
    if SYST_COL in df.columns:
        return df.withColumn(SYST_COL, F.col(SYST_COL).withField(name, entry))
    return df.withColumn(SYST_COL, F.struct(entry.alias(name)))


def add_systematic(
    df: DataFrame,
    name: str,
    kind: str,
    what: str | Column | list[str],
    varying_fn: Callable[..., Column | dict[str, Column]],
) -> DataFrame:
    """Reference-shaped entry point (methods/base.py:129-259): ``kind``
    selects the variation template. ``UpDownSystematic``'s varying_fn is
    called with (col, direction) for direction in (+1, -1);
    ``UpDownMultiSystematic``'s with ({name: col}, direction) and must
    return the varied columns keyed the same way."""
    if kind not in _KINDS:
        raise ValueError(f"unknown systematic kind {kind!r}; known: {_KINDS}")
    if kind == "UpDownMultiSystematic":
        whats = [what] if isinstance(what, str) else list(what)
        return add_updown_multi_systematic(
            df, name, whats,
            up_fn=lambda cols: varying_fn(cols, 1),
            down_fn=lambda cols: varying_fn(cols, -1),
        )
    if isinstance(what, list):
        raise ValueError("UpDownSystematic varies a single column; use "
                         "UpDownMultiSystematic for coherent multi-column shifts")
    return add_updown_systematic(
        df, name, what,
        up_fn=lambda c: varying_fn(c, 1),
        down_fn=lambda c: varying_fn(c, -1),
    )


def variation(df: DataFrame, name: str, direction: str) -> Column:
    """The varied column ``systematics.<name>.<up|down>`` (raises if the
    systematic was never registered)."""
    if direction not in ("up", "down"):
        raise ValueError("direction must be 'up' or 'down'")
    if SYST_COL not in df.columns:
        raise ValueError("no systematics registered")
    names = [f.name for f in df.schema[SYST_COL].dataType.fields]
    if name not in names:
        raise ValueError(f"unknown systematic {name!r}; known: {names}")
    return F.col(f"{SYST_COL}.{name}.{direction}")


def systematic_names(df: DataFrame) -> list[str]:
    if SYST_COL not in df.columns:
        return []
    return [f.name for f in df.schema[SYST_COL].dataType.fields]
