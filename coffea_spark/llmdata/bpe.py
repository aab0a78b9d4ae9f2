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


def word_syms_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(freq, syms) initial BPE state table — the shared input of
    :func:`train_bpe` and :func:`encode_corpus_counts`. A caller that
    runs BOTH (train then whole-corpus encode) should build this once,
    materialize it (``localCheckpoint(eager=True)``), and pass it to
    each via their ``words=`` parameter, so the corpus word-frequency
    shuffle runs once instead of twice."""
    return (
        word_freq_table(df, text_col)
        .withColumn("syms", _chars(F.col("word")))
        .select("freq", "syms")
    )


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


def _merge_fold_multi(
    syms: Column, pairs: list[tuple[str, str]]
) -> Column:
    """Apply a batch of SYMBOL-DISJOINT merges in ONE left-to-right
    fold: at each step the accumulator's last symbol + incoming symbol
    are tested against every batch pair in a single when-chain.
    Because batch pairs share no symbols (and no pair equals another's
    merged result — enforced by the batch builder), merging one pair
    can neither create nor destroy an adjacency of another, so the
    simultaneous pass produces exactly the same symbols as applying the
    merges one fold at a time — without nesting one Catalyst aggregate
    per merge (which grows the expression tree linearly in batch size
    and stalls analysis)."""
    if len(pairs) == 1:
        return _merge_fold(syms, pairs[0][0], pairs[0][1])

    def step(acc: Column, x: Column) -> Column:
        w = None
        for p1, p2 in pairs:
            cond = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(p1))
                & (x == F.lit(p2))
            )
            res = F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))
            )
            w = F.when(cond, res) if w is None else w.when(cond, res)
        return w.otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


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


def _batch_from_snapshot(
    snap: list, budget: int, max_batch: int
) -> list[tuple[str, str, int]]:
    """Greedy prefix of one round's pair ranking that is PROVABLY equal
    to applying the merges one at a time (the sequence the Sennrich
    reference algorithm and the gate oracle produce).

    ``snap`` is the pair table sorted by (count desc, p1, p2) — the
    sequential tie-break order. A candidate P=(p1, p2, c) joins the
    batch only if, for every EARLIER batch member A=(a1, a2):

    1. disjoint symbols: {p1, p2} ∩ {a1, a2, a1+a2} = ∅. Then applying
       A cannot change count(P) — no occurrence of P's adjacency is
       consumed, and the only new symbol (a1+a2) is not in P.
    2. no interloper: every NEW pair A creates has the shape (x, a1a2)
       or (a1a2, y), and each new occurrence comes from an occurrence
       "x a1 a2" / "a1 a2 y" — so its count is bounded by the SNAPSHOT
       count of its parent (x, a1) / (a2, y). If every such parent
       counts STRICTLY below c, no new pair can outrank P (ties break
       lexicographically, so equality is not safe).

    The scan STOPS at the first unsafe candidate (a skipped pair's
    count may have changed, so later ranks are unknowable this round).
    Natural-language early rounds interfere heavily (t-h / h-e share
    'h') and may batch only 1-2 merges; disjoint tails batch wide —
    driver round-trips become o(num_merges) without changing output."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    # parents bound: max snapshot count over pairs (x, a1) / (a2, y)
    # for each selected A, maintained as one running threshold
    risk = -1
    left = {}  # symbol s -> max count of snapshot pairs (*, s)
    right = {}  # symbol s -> max count of snapshot pairs (s, *)
    for p1, p2, c in snap:
        left[p2] = max(left.get(p2, -1), c)
        right[p1] = max(right.get(p1, -1), c)
    for p1, p2, c in snap:
        if len(batch) >= min(budget, max_batch):
            break
        if batch:
            # the candidate's merged RESULT must also be fresh: if an
            # earlier member already produced (or consumed) p1+p2, the
            # one-pass fold would see a symbol the sequential replay
            # creates later (apply_merges enforces the same guard)
            if p1 in used or p2 in used or (p1 + p2) in used or risk >= c:
                break
        batch.append((p1, p2, int(c)))
        used.update((p1, p2, p1 + p2))
        # new pairs from this merge: (x, p1+p2) bounded by (x, p1)
        # parents = left[p1]; (p1+p2, y) bounded by (p2, y) = right[p2]
        risk = max(risk, left.get(p1, -1), right.get(p2, -1))
    return batch


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    max_batch: int = 8,
    snapshot_rows: int = 8192,
    stats: dict | None = None,
    words: DataFrame | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(p1, p2, count), ...]
    in merge order. Deterministic: argmax ties break on (p1, p2)
    lexicographically.

    Driver round-trips are batched: each round collects the top
    ``snapshot_rows`` of the pair table ONCE, selects a provably
    non-interfering greedy prefix (:func:`_batch_from_snapshot` — the
    batched sequence equals the one-merge-at-a-time sequence exactly),
    and applies the whole batch as one composed Catalyst fold chain.
    ``max_batch=1`` recovers the classic one-round-trip-per-merge loop.
    Pass ``stats={}`` to receive {"rounds": n} back (test/telemetry
    hook). A 32k-merge production vocabulary runs in o(num_merges)
    rounds; the snapshot cap is sound because pairs outside the
    collected prefix count at most the prefix minimum, which the batch
    threshold already respects."""
    if words is None:
        words = word_syms_table(df, text_col)
        # each round's word table is read twice (snapshot + next fold),
        # and round N's plan would otherwise chain through every previous
        # round's fold: localCheckpoint materializes the table AND
        # truncates the lineage to a LogicalRDD, so plans (and the
        # driver-side execution metadata retaining them) stay O(1) per
        # round instead of O(rounds) — a 32k-merge run must not
        # accumulate 32k nested plans
        words = words.localCheckpoint(eager=True)
    # a caller-supplied ``words`` must already be materialized
    # (checkpointed/cached (freq, syms)) — see word_syms_table
    rounds = 0
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        snap = [
            (r["p1"], r["p2"], int(r["count"]))
            for r in pair_counts(words)
            .orderBy(F.col("count").desc(), "p1", "p2")
            .limit(snapshot_rows + 1)
            .collect()
        ]
        rounds += 1
        if not snap:
            break
        if len(snap) > snapshot_rows:
            # pairs outside the prefix count <= the overflow row: fold
            # that bound into the interloper threshold by truncating
            # the usable prefix at strictly-above rows
            floor = snap[-1][2]
            snap = [s for s in snap[:snapshot_rows] if s[2] > floor]
            if not snap:
                raise ValueError(
                    "train_bpe: snapshot_rows too small for this corpus "
                    "(every collected pair ties the overflow count) — "
                    "raise snapshot_rows"
                )
        batch = _batch_from_snapshot(snap, num_merges - len(merges), max_batch)
        merges.extend(batch)
        syms = _merge_fold_multi(F.col("syms"), [(a, b) for a, b, _ in batch])
        words = words.select("freq", syms.alias("syms")).localCheckpoint(
            eager=True
        )
        # superseded checkpoint blocks are only reclaimed when the
        # ContextCleaner sees the old RDD garbage-collected; at
        # hundreds of rounds (32k-merge runs) that lag fills the block
        # managers — nudge the JVM like bench.py does, periodically
        if rounds % 32 == 0:
            words.sparkSession.sparkContext._jvm.System.gc()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def apply_merges(
    words: DataFrame,
    merges: list[tuple[str, str, int]],
    syms_col: str = "syms",
) -> DataFrame:
    """Corpus retokenization by TRAINING REPLAY: fold the learned
    merges over the distinct-word table in rank order — the same
    greedy left-to-right fold the trainer used, so the result equals
    the trainer's final word states exactly. Consecutive rank-order
    runs that share no symbol (nor a member's merged result — the
    condition under which a simultaneous pass provably equals
    sequential application, see ``_merge_fold_multi``) collapse into
    ONE fold, so a 32k-merge production vocabulary costs far fewer
    than 32k nested aggregates. All scan-stage; the only shuffle is
    whatever built ``words``."""
    out = words
    i = 0
    while i < len(merges):
        batch = [merges[i][:2]]
        used = {merges[i][0], merges[i][1], merges[i][0] + merges[i][1]}
        j = i + 1
        while j < len(merges) and len(batch) < 16:
            p1, p2 = merges[j][0], merges[j][1]
            if p1 in used or p2 in used or (p1 + p2) in used:
                break
            batch.append((p1, p2))
            used.update((p1, p2, p1 + p2))
            j += 1
        out = out.withColumn(
            syms_col, _merge_fold_multi(F.col(syms_col), batch)
        )
        i = j
    return out


def encode_corpus_counts(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Whole-corpus token counts under a trained merge table: ONE
    corpus shuffle builds the distinct (word, freq) table, rank-order
    fold retokenization runs over that vocabulary-sized table only,
    and counts come back freq-weighted — nothing token-level ever
    shuffles. This is the scale path for 'tokenize 100 TB and count':
    the per-document spelling is never materialized. Returns
    (token, cnt). ``words`` lets a caller that already built the
    (freq, syms) state (e.g. for training) reuse it — the corpus
    word-frequency shuffle then runs once for train + encode."""
    if words is None:
        words = word_syms_table(df, text_col)
    enc = apply_merges(words, merges)
    return (
        enc.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
    )


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
