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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Split long documents into overlapping fixed-size windows — the
    BERT-style striding / long-document chunking stage (Devlin et al.
    2019 used exactly this for SQuAD contexts; long-doc corpora chunk
    the same way before embedding or training). Each document yields
    chunks starting every ``stride`` tokens (default: max_tokens, i.e.
    disjoint), each ``max_tokens`` long except possibly the last; a
    chunk is emitted only if it starts before the document ends, and a
    final partial window is emitted only when it adds new tokens. Empty
    documents yield no chunks.

    Output: one row per chunk with (id, chunk_id, chunk_start,
    n_chunk_tokens, chunk_text). Pure scan-stage HOF math (tokenize ->
    slice per window index) — zero shuffles, zero UDFs; every rule
    replays in SQL list functions.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    stride = max_tokens if stride is None else stride
    if not 0 < stride <= max_tokens:
        raise ValueError("stride must be in (0, max_tokens]")
    from coffea_spark.llmdata.text import tokens

    t = tokens(F.col(text_col))
    n = F.size(t)
    # number of windows: ceil(max(n - max_tokens, 0) / stride) + 1 for
    # non-empty docs — the last window starts at the largest multiple
    # of stride still inside the doc
    n_chunks = F.when(
        n > 0,
        F.floor((F.greatest(n - max_tokens, F.lit(0)) + stride - 1) / stride) + 1,
    ).otherwise(F.lit(0)).cast("int")
    # NB: Spark's sequence(0, -1) DESCENDS ([0, -1]); the outer slice
    # truncates to exactly n_chunks windows, so empty docs yield none
    chunks = F.slice(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.struct(
                i.alias("chunk_id"),
                (i * stride).alias("chunk_start"),
                F.slice(t, i * stride + 1, max_tokens).alias("_toks"),
            ),
        ),
        1,
        n_chunks,
    )
    out = df.select(
        F.col(id_col),
        F.explode(chunks).alias("c"),
    ).select(
        id_col,
        F.col("c.chunk_id"),
        F.col("c.chunk_start"),
        F.size("c._toks").alias("n_chunk_tokens"),
        F.array_join("c._toks", " ").alias("chunk_text"),
    )
    return out
