"""Distributed byte-pair-encoding (BPE) vocabulary training.

The training-data pipeline's tokenizer is learned from the corpus: BPE
(Sennrich et al. 2016, the GPT-2/Llama tokenizer family) repeatedly
merges the most frequent adjacent symbol pair. The scale-correct shape
— and the one implemented here — is the classic word-frequency
formulation:

1. ONE corpus-wide shuffle builds the distinct-word frequency table
   (``(word, freq)``; heavy map-side combine, output is vocabulary-
   sized — millions of rows — never corpus-sized).
2. Every merge iteration then runs entirely over that table: adjacent
   pair counts weighted by ``freq`` (one aggregation shuffle over
   word-table rows), a 1-row argmax to the driver, and a row-local
   greedy merge fold (``F.aggregate`` — stays in the JVM). 100 TB of
   text never moves again after step 1.

Driver round-trips are one per merge; for production vocab sizes
(32k merges) batch several non-interfering merges per round — see
SCALE.md. The greedy fold applies a merge left-to-right over each
word's symbol list, never re-merging across a just-merged symbol
(standard BPE apply semantics; mirrored exactly by the DuckDB oracle's
``list_reduce`` fold in queries.SQL_BPE_TRAIN).

``encode_bpe`` is the production encoder: an Arrow pandas UDF applying
the learned merge ranks with the classic lowest-rank-first algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The ONE corpus shuffle: whitespace words -> (word, freq)."""
    w = F.explode(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    ).alias("word")
    return df.select(w).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _chars(col: Column) -> Column:
    """Word -> its character symbols (initial BPE state)."""
    return F.filter(F.split(col, ""), lambda c: c != "")


def _merge_fold(syms: Column, p1: str, p2: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol array,
    as a pure Catalyst fold: append each symbol; when the accumulator's
    LAST symbol equals p1 and the incoming symbol equals p2, replace
    the last symbol with the concatenation instead."""
    merged = p1 + p2
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (x == F.lit(p2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the word table:
    (p1, p2, count). One aggregation shuffle over word-table rows."""
    syms = F.col(syms_col)
    pairs = F.filter(
        F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
        ),
        lambda p: p["p2"].isNotNull(),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.p1").alias("p1"), F.col("p.p2").alias("p2"))
        .agg(F.sum("freq").alias("count"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(p1, p2, count), ...]
    in merge order. Deterministic: argmax ties break on (p1, p2)
    lexicographically."""
    words = word_freq_table(df, text_col).withColumn(
        "syms", _chars(F.col("word"))
    ).select("freq", "syms")
    # each iteration's word table is read twice (argmax + next fold):
    # cache it, and unpersist the previous one as soon as it is replaced
    words = words.cache()
    live = [words]
    try:
        merges: list[tuple[str, str, int]] = []
        for _ in range(num_merges):
            best = (
                pair_counts(words)
                .orderBy(F.col("count").desc(), "p1", "p2")
                .limit(1)
                .collect()
            )
            if not best:
                break
            p1, p2, cnt = best[0]["p1"], best[0]["p2"], int(best[0]["count"])
            merges.append((p1, p2, cnt))
            words = words.select(
                "freq", _merge_fold(F.col("syms"), p1, p2).alias("syms")
            ).cache()
            live.append(words)
            if len(live) > 2:
                # materialize the new cache before dropping its parent so
                # the lineage never recomputes more than one fold deep
                words.count()
                live.pop(0).unpersist()
        return merges
    finally:
        for w in live:
            w.unpersist()


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Production encoder: apply learned merges with the classic
    lowest-rank-first algorithm in an Arrow pandas UDF (row-local,
    scan-stage — the merge table broadcasts with the UDF closure)."""
    import pandas as pd

    ranks = {(p1, p2): i for i, (p1, p2, _) in enumerate(merges)}

    def enc_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            rank, _ = min(cand)
            p1, p2 = merges[rank][0], merges[rank][1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def enc_series(texts):  # pd.Series -> pd.Series; annotations omitted:
        # the module's future-annotations would turn them into strings,
        # which pandas_udf's signature inference rejects
        return pd.Series(
            [[s for w in str(t).split() for s in enc_word(w)] for t in texts]
        )

    enc = F.pandas_udf(enc_series, "array<string>")
    return df.withColumn(out_col, enc(F.col(text_col)))
