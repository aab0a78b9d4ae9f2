"""Data Selection with Importance Resampling (DSIR) weights.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", public): score every raw-corpus document by how much it
resembles a TARGET domain, using bag-of-hashed-n-gram unigram models —
``w(doc) = sum over grams g of log p_target(bucket(g)) -
log p_source(bucket(g))`` with add-one smoothing over the hash buckets
— then keep the top fraction (or Gumbel-resample).

Scale shape: both models are BUCKET COUNT TABLES (``buckets`` rows, a
few thousand), built by one explode -> groupBy over token rows each;
scoring joins the exploded corpus grams against the broadcast-sized
log-ratio table and sums per document — corpus-token-linear, one
aggregation shuffle, nothing quadratic and nothing model-sized on the
driver except the bucket table itself.

Hashing: default is a PORTABLE char-fold polynomial hash
(``(acc * 31 + code) % modulus`` over the gram's characters) so an
external SQL oracle can replay scores bit-for-bit; production callers
should pass ``hash_fn="xxhash64"`` to use Spark's built-in 64-bit hash
(one JVM call per gram instead of a per-char fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODULUS = 1_000_003  # prime; char-fold accumulator stays in int64


def _portable_bucket(gram: Column, buckets: int) -> Column:
    """(acc * 31 + ascii(char)) % _MODULUS folded over the gram's
    characters, then % buckets — replayable in any SQL engine."""
    folded = F.aggregate(
        F.filter(F.split(gram, ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % _MODULUS,
    )
    return (folded % buckets).cast("long")


def hashed_gram_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    gram_sizes: tuple[int, ...] = (1, 2),
    hash_fn: str = "portable",
) -> DataFrame:
    """Explode documents to (id, bucket) rows — one row per n-gram
    occurrence, bucketed by the chosen hash."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    gram_arrays = []
    for n in gram_sizes:
        g = words
        for k in range(1, n):
            g = F.zip_with(
                g,
                F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        gram_arrays.append(
            F.slice(g, 1, F.greatest(F.size(words) - (n - 1), F.lit(0)))
        )
    grams = F.concat(*gram_arrays) if len(gram_arrays) > 1 else gram_arrays[0]
    out = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    if hash_fn == "portable":
        bucket = _portable_bucket(F.col("gram"), buckets)
    elif hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64("gram"), F.lit(buckets)).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return out.select(id_col, bucket.alias("bucket"))


def bucket_log_ratios(
    source_rows: DataFrame,
    target_rows: DataFrame,
    buckets: int,
    source_count_col: str | None = None,
    target_count_col: str | None = None,
) -> DataFrame:
    """Per-bucket ``log p_target - log p_source`` with add-one smoothing
    over all ``buckets`` ids (buckets unseen on either side still get a
    well-defined ratio). Output is bucket-table-sized (broadcastable).

    A side may be PRE-REDUCED: pass ``*_count_col`` naming an
    occurrence-count column and the side's bucket counts are
    ``sum(count_col)`` instead of ``count(*)`` — identical totals, lets
    the caller share one reduced (id, bucket, occ) table between the
    model build and the scoring join instead of re-hashing raw grams."""
    import math

    spark = source_rows.sparkSession

    # ONE aggregation pass per side; the result is bucket-table-sized,
    # so totals and ratios are computed driver-side from the collected
    # counts instead of re-scanning the gram rows
    def _counts(rows: DataFrame, count_col: str | None) -> dict:
        agg = F.sum(count_col) if count_col else F.count(F.lit(1))
        return {
            r["bucket"]: r["c"]
            for r in rows.groupBy("bucket").agg(agg.alias("c")).collect()
        }

    sc = _counts(source_rows, source_count_col)
    tc = _counts(target_rows, target_count_col)
    s_tot, t_tot = sum(sc.values()), sum(tc.values())
    rows = [
        (
            b,
            math.log((tc.get(b, 0) + 1.0) / (t_tot + buckets))
            - math.log((sc.get(b, 0) + 1.0) / (s_tot + buckets)),
        )
        for b in range(buckets)
    ]
    return spark.createDataFrame(rows, "bucket long, log_ratio double")


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    gram_sizes: tuple[int, ...] = (1, 2),
    hash_fn: str = "portable",
) -> DataFrame:
    """Attach ``dsir_weight`` (sum of bucket log-ratios over the doc's
    grams; documents with no grams weigh 0) to every row of ``df``.
    ``target`` is a DataFrame of target-domain documents with the same
    ``text_col``.

    The pre-reduced source table (one (id, bucket, occ) row per distinct
    doc/bucket pair — far narrower than the raw gram rows) is PERSISTED
    for the duration of the returned plan: it feeds both the source
    model's bucket counts and the scoring join, and without the cache
    each consumer re-runs the per-character gram hashing over the whole
    corpus (measured 3x the dominant cost at sf0.1). Call
    ``spark.catalog.clearCache()`` (or unpersist) when done with the
    result — the same contract as ``dedup.jaccard_join``."""
    src_rows = hashed_gram_rows(df, text_col, id_col, buckets, gram_sizes, hash_fn)
    tgt_rows = hashed_gram_rows(
        target, text_col, id_col, buckets, gram_sizes, hash_fn
    )
    # pre-reduce to (doc, bucket, occurrences) so the broadcast join and
    # final sum run over distinct pairs, not raw token occurrences; the
    # SAME reduced table supplies the source bucket counts (sum of occ
    # == count of raw rows), so raw grams are hashed exactly once
    occ = (
        src_rows.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("occ"))
        .persist()
    )
    ratios = bucket_log_ratios(
        occ, tgt_rows, buckets, source_count_col="occ"
    )
    scores = (
        occ.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("occ") * F.col("log_ratio")).alias("dsir_weight"))
    )
    return df.join(scores, id_col, "left").withColumn(
        "dsir_weight", F.coalesce(F.col("dsir_weight"), F.lit(0.0))
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    keep_frac: float,
    exact: bool = True,
    **kwargs,
) -> DataFrame:
    """Top-fraction selection by DSIR weight (tie-broken on the id
    column so reruns keep the same set). The paper's Gumbel resampling
    adds noise before the cut — inject it upstream via a seeded column
    if sampling diversity matters more than determinism.

    ``exact=True`` takes exactly ``n`` rows via orderBy+limit
    (TakeOrdered — fine while the kept set fits the driver).
    ``exact=False`` is the 100 TB path: cut at the approxQuantile weight
    threshold, a scan-stage filter that never materializes or sorts the
    kept set (count is approximate at the boundary)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    id_col = kwargs.get("id_col", "doc_id")
    w = dsir_weights(df, target, **kwargs)
    if exact:
        n_keep = int(df.count() * keep_frac)
        return w.orderBy(F.col("dsir_weight").desc(), F.col(id_col)).limit(
            n_keep
        )
    thr = w.approxQuantile("dsir_weight", [1.0 - keep_frac], 1e-4)[0]
    return w.filter(F.col("dsir_weight") >= thr)
