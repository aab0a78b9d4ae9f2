"""Sequence packing: map a token stream onto fixed-length training
sequences (the concat-and-split packing used to build LM batches).

Documents are ordered deterministically within a group (e.g. language),
concatenated conceptually into one token stream, and cut every
``seq_len`` tokens. The operator computes, per document, its token
offsets in the stream and the range of sequences it lands in — without
materializing the stream: a cumulative-sum window over token counts is
all that's needed.

Scale shape: one hash-partition + sort per group key (the window). The
group key bounds the stream; packing 100 TB means thousands of
independent streams (per shard/language), each a separate partition of
the window — no global sort. Token counting itself is a scan-stage
expression (llmdata.text.token_count_bpe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    token_count_col: str,
    seq_len: int,
    group_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Per document: stream offsets [tok_start, tok_end) and the
    sequence ids [seq_first, seq_last] it occupies after concat-and-split
    packing at ``seq_len``. ``crosses`` marks documents cut by a
    sequence boundary."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tc = F.col(token_count_col).cast("long")
    out = df.withColumn("tok_end", F.sum(tc).over(w))
    out = out.withColumn("tok_start", F.col("tok_end") - tc)
    out = out.withColumn("seq_first", F.floor(F.col("tok_start") / seq_len))
    # empty docs occupy no sequence; point them at seq_first for sanity
    out = out.withColumn(
        "seq_last",
        F.when(tc > 0, F.floor((F.col("tok_end") - 1) / seq_len)).otherwise(
            F.col("seq_first")
        ),
    )
    return out.withColumn("crosses", (F.col("seq_last") > F.col("seq_first")).cast("int"))


def packing_summary(
    packed: DataFrame, seq_len: int, group_cols: list[str]
) -> DataFrame:
    """Per group: documents, total tokens, sequences produced
    (= ceil(total/seq_len)), boundary-crossing docs, padding tokens in
    the final partial sequence."""
    return packed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("tok_end").alias("n_tokens"),
        F.ceil(F.max("tok_end") / seq_len).cast("long").alias("n_sequences"),
        F.sum("crosses").alias("n_boundary_docs"),
        (F.ceil(F.max("tok_end") / seq_len) * seq_len - F.max("tok_end"))
        .cast("long")
        .alias("pad_tokens"),
    )
