"""Structured Streaming forms of the engine's aggregations.

The reference is batch-only (SURVEY.md §2.10): its "streaming" is
incremental chunk accumulation with monoid merges
(processor/executor.py:339-519). Spark gives the real thing: the same
histogram / cutflow / weight aggregations run over micro-batches with
watermarked event-time windows, or accumulate via foreachBatch with the
same driver-side monoid — so one pipeline definition serves batch and
streaming.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coffea_spark.hist import bucket


def windowed_hist(
    stream: DataFrame,
    value: Column | str,
    nbins: int,
    lo: float,
    hi: float,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    weight: Column | None = None,
) -> DataFrame:
    """Per event-time window histogram: watermark bounds state, late rows
    beyond it are dropped (exactly-once per window once the watermark
    passes). Output: (window, bin, sumw, n) in append mode."""
    value = F.col(value) if isinstance(value, str) else value
    w = F.lit(1.0) if weight is None else weight
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), bucket(value, lo, hi, nbins).alias("bin"))
        .agg(F.sum(w).alias("sumw"), F.count(F.lit(1)).alias("n"))
    )


def windowed_cutflow(
    stream: DataFrame,
    cuts: dict[str, Column],
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cutflow counts per event-time window — the streaming spelling of
    PackedSelection.cutflow (one conditional-agg pass per window)."""
    aggs = [F.count(F.lit(1)).alias("initial")]
    cumulative = F.lit(True)
    for name, c in cuts.items():
        c = F.coalesce(c.cast("boolean"), F.lit(False))
        cumulative = cumulative & c
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"onecut_{name}"))
        aggs.append(F.sum(F.when(cumulative, 1).otherwise(0)).alias(f"cutflow_{name}"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(*aggs)
    )


def sessionized(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (inactivity gap) — the streaming equivalent of the
    batch lag-based sessionization in queries.q_sessionize."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def run_foreach_batch(
    stream: DataFrame,
    pipeline: Callable[[DataFrame], dict],
    merge: Callable[[dict, dict], dict],
    trigger: str | None = None,
) -> tuple:
    """Accumulate arbitrary batch-pipeline outputs over micro-batches with
    a user monoid — the reference's executor accumulation pattern
    (processor/accumulator.py) on Spark's exactly-once batches.

    Returns (query, results_holder); ``results_holder["value"]`` carries
    the running merge. Call ``query.processAllAvailable()`` for a bounded
    source, then ``query.stop()``."""
    holder: dict = {"value": None}

    def on_batch(bdf: DataFrame, epoch_id: int) -> None:
        out = pipeline(bdf)
        holder["value"] = out if holder["value"] is None else merge(holder["value"], out)

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("update")
    if trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start(), holder


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming deduplication: emit the FIRST arrival per ``keys``,
    drop replays — the streaming form of the exact-dedup operator
    (llmdata/dedup.drop_exact_duplicates) for ingest pipelines where the
    corpus arrives continuously.

    State is the seen-key set; the watermark bounds it:
    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark`` —
    duplicates arriving within the watermark delay of each other are
    dropped and a key's state is evicted once the watermark passes it,
    so state is O(keys per watermark window), the only shape that
    survives an unbounded stream. ``False`` keeps exact all-time dedup
    (state grows with distinct keys — bounded corpora only).
    """
    wm = stream.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(keys)
    return wm.dropDuplicates(keys)


def stateful_ewma(
    stream: DataFrame,
    key: str,
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.3,
    watermark: str = "1 hour",
    state_ttl: str = "2 hours",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-key
    exponentially-weighted moving average maintained across micro-batches
    — the kind of sequential-fold statistic no built-in windowed
    aggregation expresses (each update depends on the previous state).

    State per key is THREE scalars (count, ewma, last event time); an
    event-time timeout evicts keys idle past ``state_ttl`` beyond the
    watermark, so state is O(active keys), never O(events) — the only
    shape that survives an unbounded stream. Batches fold in event-time
    order (the batch is sorted in the UDF; cross-batch order is the
    stream's delivery order past the watermark).

    Emits one row per key per micro-batch (update semantics):
    (key, n_events, ewma, last_ts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    ttl_ms = int(pd.Timedelta(state_ttl).total_seconds() * 1000)
    key_type = {f.name: f.dataType.simpleString() for f in stream.schema.fields}[key]
    out_schema = f"{key} {key_type}, n_events long, ewma double, last_ts timestamp"
    state_schema = "n long, ewma double, last_us long"

    def fn(key_tuple, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values([ts_col, *(tiebreak_cols or [])])
        if state.exists:
            n, ew, last_us = state.get
        else:
            n, ew, last_us = 0, None, None
        for v, t in zip(rows[value_col], rows[ts_col]):
            ew = float(v) if ew is None else alpha * float(v) + (1.0 - alpha) * ew
            n += 1
            last_us = t.value // 1000
        state.update((n, ew, last_us))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm_ms + ttl_ms, last_us // 1000 + ttl_ms))
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "n_events": [n],
                "ewma": [ew],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
        )
    )
