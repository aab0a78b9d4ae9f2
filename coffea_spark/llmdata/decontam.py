"""Benchmark decontamination: flag training documents sharing any word
n-gram with an evaluation set (the overlap check run before training so
eval data doesn't leak into the corpus).

Relational shape — the scale-correct inverted-index semi-join, never a
doc×doc comparison:

1. explode eval docs to DISTINCT n-grams (the "dirty" gram set);
2. explode training docs the same way;
3. semi-join training grams against eval grams; any hit taints the doc.

The eval side is tiny (a benchmark suite: thousands of docs) — its
distinct-gram table broadcasts, so the check is a scan-stage hash probe
over the training corpus: zero shuffles of training data at any corpus
size. Per-doc hit counts (``contamination_report``) group only the
matched grams — at production contamination rates a sliver of the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coffea_spark.llmdata.text import word_ngrams


def _gram_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct training ids sharing >=1 word n-gram with the eval set.
    Eval grams broadcast; left_semi keeps the probe map-side."""
    dirty = eval_df.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    ).distinct()
    grams = _gram_table(train, id_col, text_col, n)
    return (
        grams.join(F.broadcast(dirty), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated training doc: how many distinct grams it shares
    with the eval set (ranking signal for manual review / removal)."""
    dirty = eval_df.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    ).distinct()
    grams = _gram_table(train, id_col, text_col, n)
    return (
        grams.join(F.broadcast(dirty), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dirty_grams"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training set minus contaminated docs (left_anti against the
    broadcast dirty-gram probe)."""
    dirty = eval_df.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    ).distinct()
    grams = _gram_table(train, id_col, text_col, n)
    bad = grams.join(F.broadcast(dirty), "gram", "left_semi").select(id_col).distinct()
    return train.join(bad, id_col, "left_anti")
