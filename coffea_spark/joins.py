"""Within-event join patterns — all shuffle-free higher-order array ops.

The reference has no generic relational join; its five join-like patterns
are all within one event (SURVEY.md §2.4). Rows = events here, so every
one of these compiles to per-row array expressions: at 100 TB these cost
zero shuffle — the plan is scan -> project, embarrassingly parallel.

- cross-reference FK gather  (reference: _apply_global_index,
  nanoevents/methods/base.py:313-346; index build schemas/nanoaod.py:291-311)
- pair/cartesian metric table (reference: metric_table,
  nanoevents/methods/vector.py:479-517)
- nearest-neighbour match     (reference: nearest, methods/vector.py:519-561)
- n-choose-k combinations     (reference: ak.combinations usage, e.g.
  processor/test_items/NanoEventsProcessor.py:62-70)

Index convention: the data carries 0-based local indices with -1 (or
out-of-range) meaning "no match" (reference masks them null,
transforms.py:129-142). Spark's element_at is 1-based — the +1 lives in
ONE place (``gather_local``) to keep off-by-ones out of user code.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from coffea_spark import vector as vec


def gather_local(target: Column, idx) -> Column:
    """Element of ``target`` at 0-based local index ``idx``; NULL when idx
    is -1 / out of range (reference null semantics, transforms.py:129-142)."""
    return F.when(
        (idx >= 0) & (idx < F.size(target)), F.element_at(target, idx + F.lit(1))
    )


def matched(source: Column, idx_field: str, target: Column) -> Column:
    """Cross-reference FK join: for each object in ``source``, the object
    of ``target`` (same event) pointed at by its ``idx_field``.

    Returns array aligned with ``source`` whose elements are target
    structs or NULL. E.g. ``matched(Jet, "muonIdx1", Muon)``.
    Reference surface: Muon.matched_jet etc., methods/nanoaod.py:113-723.
    """
    return F.transform(source, lambda x: gather_local(target, x[idx_field]))


def matched_via(source: Column, idx_fields: list[str], target: Column) -> Column:
    """Fixed-k nested FK join (e.g. Jet.muonIdx1/muonIdx2 -> matched_muons):
    per source object, the list of non-null matches (reference: nestedindex
    zip transforms.py:434-475 + gather)."""
    return F.transform(
        source,
        lambda x: F.filter(
            F.array(*[gather_local(target, x[f]) for f in idx_fields]),
            lambda m: m.isNotNull(),
        ),
    )


def metric_table(
    a: Column,
    b: Column,
    metric: Callable[[Column, Column], Column] = vec.delta_r,
) -> Column:
    """All-pairs metric between two collections of the same event:
    array (len a) of array (len b) of metric values. Reference:
    methods/vector.py:371-379 _metric_table_core (ak.cartesian nested)."""
    return F.transform(a, lambda x: F.transform(b, lambda y: metric(x, y)))


def nearest(
    a: Column,
    b: Column,
    metric: Callable[[Column, Column], Column] = vec.delta_r,
    threshold: float | None = None,
    return_metric: bool = False,
) -> Column:
    """For each object in ``a``, the object in ``b`` (same event)
    minimizing ``metric``; NULL when ``b`` is empty or the best metric
    exceeds ``threshold``. Reference: methods/vector.py:382-394
    _nearest_core (argmin over pair axis + threshold mask).

    With ``return_metric`` the result elements are
    struct<metric:double, obj:...> instead of bare objects.
    Implementation: per a-element, min over struct(metric, b-object) —
    array_min compares lexicographically so it picks the smallest metric;
    a single pass over b per a-element, still all within-row.
    """
    def best(x):
        pairs = F.transform(b, lambda y: F.struct(metric(x, y).alias("metric"), y.alias("obj")))
        m = F.array_min(pairs)
        if threshold is not None:
            m = F.when(m["metric"] < F.lit(threshold), m)
        return m if return_metric else m["obj"]

    return F.transform(a, best)


def combinations(collection: Column, n: int = 2, fields: list[str] | None = None) -> Column:
    """Distinct n-choose-k combinations (ANY n >= 1) of objects within
    an event, preserving order (i0 < i1 < ... < i_{n-1}): array of
    struct<f0..f{n-1}>. Reference: ak.combinations, exercised by the
    dimuon pipeline (processor/test_items/NanoEventsProcessor.py:62-70).

    Flat HOF composition — no explode, no shuffle: a recursive builder
    emits n nested transform-over-tail-slice levels (the n=2/3 shapes
    written out by hand in earlier rounds are exactly its expansions),
    flattened at each level. Expression depth grows linearly with n;
    combination COUNT grows as C(len, n) — per-row work, so the usual
    cardinality guidance applies (see pairs_exploded for the relational
    fallback when inner lists are huge).
    """
    if n < 1:
        raise ValueError("combinations needs n >= 1")
    if fields is None:
        fields = [f"f{i}" for i in range(n)]
    if len(fields) != n:
        raise ValueError(f"need {n} field names, got {len(fields)}")

    def rec(chosen: list, start, depth: int):
        # start: 1-based slice position of the next candidate element
        count = F.greatest(F.size(collection) - start + 1, F.lit(0))
        if depth == n - 1:
            return F.transform(
                F.slice(collection, start, count),
                lambda y: F.struct(
                    *[c.alias(f) for c, f in zip(chosen + [y], fields)]
                ),
            )
        return F.flatten(
            F.transform(
                F.slice(collection, start, count),
                lambda y, j: rec(chosen + [y], start + j + 1, depth + 1),
            )
        )

    return rec([], F.lit(1), 0)


def argcombinations(collection: Column, n: int = 2) -> Column:
    """Index form of :func:`combinations`: struct<i0,i1> of 0-based local
    indices."""
    idx = F.transform(collection, lambda x, i: i)
    return combinations(idx, n, fields=[f"i{k}" for k in range(n)])


# ---------------------------------------------------------------------------
# exploded-view equivalents (the scale path for very large inner lists)
# ---------------------------------------------------------------------------

def explode_collection(df, collection: str, event_id: str = "event", keep: list[str] | None = None):
    """Relational (exploded) view of a collection: one row per object with
    (event_id, local index, object struct). The HOF forms above are
    preferred — this exists for operators whose inner-list cardinality is
    too large for per-row processing (SURVEY.md §4 note on a
    cardinality-based rewrite)."""
    cols = [F.col(event_id)] + [F.col(k) for k in (keep or [])]
    return df.select(*cols, F.posexplode(collection).alias("idx", "obj"))


def pairs_exploded(df, collection: str, event_id: str = "event"):
    """Self-join form of combinations(n=2) on the exploded view: equi-join
    on event id with i<j. Broadcast is wrong here (same table); Catalyst
    plans a sort-merge join on event_id — used only when inner lists are
    huge."""
    e = explode_collection(df, collection, event_id)
    a = e.alias("a")
    b = e.alias("b")
    return a.join(
        b,
        (F.col(f"a.{event_id}") == F.col(f"b.{event_id}")) & (F.col("a.idx") < F.col("b.idx")),
    ).select(
        F.col(f"a.{event_id}").alias(event_id),
        F.col("a.obj").alias("f0"),
        F.col("b.obj").alias("f1"),
    )


def pairs_adaptive(
    df,
    collection: str,
    event_id: str = "event",
    threshold: int = 16,
):
    """Cardinality-adaptive combinations(n=2) — the SURVEY §4 rewrite
    rule: one output row per unordered pair (event_id, f0, f1), with
    the physical strategy chosen PER EVENT by inner-list size.

    - ``size <= threshold``: the flat HOF path — build the in-row
      combination array (:func:`combinations`) and explode it. Zero
      shuffle: the branch for typical HEP multiplicities (2-10
      objects), where avoiding the exchange is the whole game on a
      network-bound cluster.
    - ``size > threshold``: the relational path — posexplode + self
      equi-join on the event id (:func:`pairs_exploded`). One shuffle,
      but per-row memory stays O(1) and output is produced
      incrementally: a 10^4-object event would otherwise materialize a
      5*10^7-struct array inside ONE row (task-heap OOM at 100 TB,
      where a single pathological event can kill an executor), and the
      measured local crossover is brutal — at 1024 objects/event the
      HOF+explode path is ~100x slower (48.7 s vs 0.45 s).

    Both branches produce identical rows (pytest parity across the
    threshold); the union is by name and each branch filters on
    ``size(collection)`` at the scan, so events never take both paths.
    Default threshold 16: local[8] measurements put the output-rows
    crossover at ~4-8 objects (the join wins above it: 2.2x at 16,
    27x at 512 — full table in SCALE.md); the default sits slightly
    above the measured point because local shuffles are free compared
    to a real cluster's network exchange. Callers whose downstream is a
    WITHIN-ROW reduction (no explode) should keep :func:`combinations`
    — that shape never pays the explode and never shuffles.
    """
    size = F.size(F.col(collection))
    small = (
        df.where(size <= threshold)
        .select(
            F.col(event_id),
            F.explode(combinations(F.col(collection), 2)).alias("_c"),
        )
        .select(
            F.col(event_id),
            F.col("_c.f0").alias("f0"),
            F.col("_c.f1").alias("f1"),
        )
    )
    large = pairs_exploded(df.where(size > threshold), collection, event_id)
    return small.unionByName(large)


def asof_join(
    left,
    right,
    on: str = "ts",
    by: str | None = None,
    values: list[str] | None = None,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    tolerance=None,
):
    """As-of join (Spark has no native one): for each left row, the
    nearest right row at-or-before (``backward``) / at-or-after
    (``forward``) its ``on`` time, optionally within the same ``by`` key
    and within ``tolerance`` (same units as ``on``).

    Scale design: the naive spelling is a range join (quadratic blow-up
    per key); this is the union + running-extreme window instead — ONE
    shuffle on (by, on), state O(1) per row, the shape that survives
    100 TB. Matched right values arrive as ``_asof_<col>`` columns plus
    ``_asof_on`` (the matched right timestamp, NULL when unmatched).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    from pyspark.sql import Window as W

    right_on = right_on or on
    right_by = right_by or by
    values = values or []

    from pyspark.sql import types as T

    def tnum(frame, col):
        # numeric timeline in double: timestamps -> epoch seconds
        # (TIMESTAMP_NTZ/DATE need an intermediate cast; session tz is
        # the caller's concern — pin UTC for cross-engine parity)
        dt = frame.schema[col].dataType
        c = F.col(col)
        if isinstance(dt, (T.TimestampNTZType, T.DateType)):
            return c.cast("timestamp").cast("double")
        return c.cast("double")

    tag = "_is_left"
    key_cols = [F.col(by).alias("_k")] if by else []
    rkey = [F.col(right_by).alias("_k")] if right_by else []
    payload = F.struct(
        tnum(right, right_on).alias("_t"),
        *[F.col(c).alias(c) for c in values],
    )
    rsel = right.select(
        *rkey, tnum(right, right_on).alias("_tv"),
        F.lit(0).alias(tag), payload.alias("_p"),
    )
    rsel = rsel.select(
        *([F.col("_k")] if rkey else []), "_tv", tag, "_p",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    lsel = left.select(
        *key_cols, tnum(left, on).alias("_tv"), F.lit(1).alias(tag),
        F.lit(None).cast(rsel.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left.columns],
    )
    allu = rsel.unionByName(lsel)

    part = ["_k"] if by or right_by else []
    if direction == "backward":
        w = (
            W.partitionBy(*part)
            .orderBy(F.col("_tv").asc(), F.col(tag).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        best = F.max(F.when(F.col(tag) == 0, F.col("_p"))).over(w)
    else:
        w = (
            W.partitionBy(*part)
            .orderBy(F.col("_tv").desc(), F.col(tag).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        best = F.min(F.when(F.col(tag) == 0, F.col("_p"))).over(w)

    out = allu.withColumn("_best", best).filter(F.col(tag) == 1)
    if tolerance is not None:
        gap = (
            (F.col("_tv") - F.col("_best._t"))
            if direction == "backward"
            else (F.col("_best._t") - F.col("_tv"))
        )
        out = out.withColumn(
            "_best", F.when(gap <= F.lit(float(tolerance)), F.col("_best"))
        )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("_best._t").alias("_asof_on"))
    for c in values:
        sel.append(F.col(f"_best.{c}").alias(f"_asof_{c}"))
    return out.select(*sel)


def salted_join(
    left,
    right,
    key: str,
    salt: int = 8,
    how: str = "inner",
):
    """Skew-salted equi-join: replicate the (small) ``right`` side
    ``salt`` times and scatter hot ``left`` keys across the replicas, so
    one hot key's rows land on ``salt`` reducers instead of one.

    Results are identical to ``left.join(right, key, how)`` for
    inner/left joins — the salt only changes the physical distribution.
    The left salt is derived deterministically from xxhash64 of the
    whole row, so repeated runs shuffle identically.

    When to use: AQE's skew-join handling (on in this engine's sessions)
    already splits skewed SORT-MERGE partitions at runtime; reach for
    explicit salting when (a) AQE is unavailable, (b) the skew is in a
    broadcast-ineligible right side, or (c) you need a deterministic
    layout for a downstream co-partitioned op. 100 TB note: salt ~
    (hot-key rows / target partition rows), not "big number" — each
    increment multiplies the right side's shuffle volume.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    sc = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    lsalted = left.withColumn("_salt", sc)
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalted.join(rsalted, [key, "_salt"], how)
    return out.drop("_salt")
