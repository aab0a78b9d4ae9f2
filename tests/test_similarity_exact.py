"""exact_topk_join (blocked-matmul exact top-k) vs the HOF cross-join
gold standard.

The recall gates grade against `_exact_top1` — a broadcast cross join
whose cosine is sequential-HOF column math (bit-stable across engines,
but interpreted per pair and bounded by the corpus scan's task count:
~33 us/pair measured at sf1). `exact_topk_join` is the scalable
spelling (one numpy matmul per Arrow batch, per-batch winners reduced
by a tiny keyed window). These tests pin the two implementations to
IDENTICAL rows — the 6-decimal round absorbs the summation-order ULP
difference, the same argument that lets DuckDB's
list_cosine_similarity hash-match the HOF path in the driver gate.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from coffea_spark.session import get_spark

    return get_spark(app_name="coffea-spark-exact-topk", cpus=4)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_top1_matches_hof_cross_join(spark, sf_dir):
    from coffea_spark.llmdata.similarity import exact_topk_join
    from coffea_spark.queries import _exact_top1, _planted_queries

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = _planted_queries(emb)
    hof = _exact_top1(queries, emb).select(
        "qid", F.col("top1_id").alias("vec_id"), F.col("top1_cos").alias("cosine")
    )
    blocked = exact_topk_join(queries, emb, k=1)
    assert _rows(blocked) == _rows(hof)


def test_topk_ordering_and_tiebreak(spark):
    """k > 1 with engineered ties: identical vectors must rank by id
    ascending, and the batch-winner reduction must not lose the true
    global top-k when winners span Arrow batches (forced with tiny
    batches via many partitions)."""
    from coffea_spark.llmdata.similarity import exact_topk_join

    # corpus: ids 0/1/2 are the SAME vector (cosine 1.0 vs the query),
    # id 3 is orthogonal-ish, id 4 is close
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),  # same direction, different norm -> cos 1.0
        (3, [0.0, 1.0, 0.0]),
        (4, [1.0, 0.2, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(5)
    queries = spark.createDataFrame([(100, [1.0, 0.0, 0.0])], "qid long, qvec array<double>")
    got = exact_topk_join(queries, corpus, k=4)
    out = [(r.vec_id, r.cosine) for r in got.orderBy(F.desc("cosine"), "vec_id").collect()]
    assert [v for v, _ in out] == [0, 1, 2, 4]
    assert out[0][1] == 1.0 and out[1][1] == 1.0 and out[2][1] == 1.0


def test_small_side_contract(spark):
    from coffea_spark.llmdata.similarity import exact_topk_join

    corpus = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "qid long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="query table"):
        exact_topk_join(queries, corpus, k=1, max_query_rows=3)


def test_round_half_up_pins_three_engines(spark):
    """r11 ADVICE (a): the numpy exact paths round through ONE pinned
    half-away-from-zero helper, so the three spellings of the ordering
    key (numpy matmul / Spark F.round / DuckDB round) agree even on
    EXACT half boundaries — where np.round (half-to-even) diverges."""
    import duckdb
    import numpy as np

    from coffea_spark.llmdata.similarity import _round_half_up

    # exactly-representable halves at each digit level; np.round breaks
    # on every even-landing case (2.5 -> 2, 0.25 -> 0.2)
    cases = [(0.5, 0), (-0.5, 0), (1.5, 0), (2.5, 0), (-2.5, 0),
             (0.25, 1), (-0.25, 1), (0.125, 2), (-0.125, 2), (1.0625, 3)]
    for x, d in cases:
        ours = float(_round_half_up(np.asarray([x]), d)[0])
        spark_val = spark.createDataFrame([(x,)], "x double").select(
            F.round(F.col("x"), d).alias("r")
        ).head()["r"]
        duck_val = duckdb.sql(f"select round({x!r}::double, {d})").fetchone()[0]
        assert ours == spark_val == duck_val, (x, d, ours, spark_val, duck_val)
    # and the case np.round gets wrong under half-to-even:
    assert float(_round_half_up(np.asarray([2.5]), 0)[0]) == 3.0
    assert float(np.round(2.5)) == 2.0


def test_zero_norm_unified_contract(spark):
    """r11 ADVICE (c): exact_topk_join and the pq rerank path share one
    zero-norm contract — a zero vector (query or corpus) scores cosine
    0.0 via the guarded divide, so the rerank-degenerates-to-exact
    equivalence holds on corpora containing zero vectors."""
    from coffea_spark.llmdata.similarity import (
        exact_topk_join,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero-norm corpus vector
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.7, 0.7, 0.0, 0.0]),
    ] + [(i, [float(i), 1.0, 0.5, 0.0]) for i in range(4, 20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0, 0.0])],
        "qid long, qvec array<double>",
    )
    exact = exact_topk_join(queries, corpus, k=3)
    by_pair = {(r.qid, r.vec_id): r.cosine for r in exact.collect()}
    # zero corpus vector scores 0.0, never NaN; zero query scores 0.0
    # against everything and ranks its top-k purely by id
    assert all(c == c for c in by_pair.values())  # no NaN anywhere
    zq = exact.filter(F.col("qid") == 101).orderBy("vec_id").collect()
    assert [r.vec_id for r in zq] == [0, 1, 2] and all(r.cosine == 0.0 for r in zq)

    books = pq_train(corpus, m=2, n_codes=4, seed=1, max_sample=64)
    enc = pq_encode(corpus, books, keep_cols=("embedding",))
    rerank_full = pq_adc_topk(queries, enc, books, k=3, rerank=len(rows))
    assert sorted(tuple(r) for r in rerank_full.collect()) == sorted(
        tuple(r) for r in exact.collect()
    )


def test_integral_id_contract(spark):
    """r10 ADVICE #4: the integer-id contract fails FAST at the driver
    with a pointed message (string keys -> pq_adc_topk), not as an
    opaque numpy cast error inside an executor."""
    from coffea_spark.llmdata.similarity import exact_topk_join

    corpus = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    str_corpus = spark.createDataFrame(
        [("a", [1.0, 2.0])], "vec_id string, embedding array<double>"
    )
    queries = spark.createDataFrame([(1, [1.0, 0.0])], "qid long, qvec array<double>")
    str_queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "qid string, qvec array<double>"
    )
    with pytest.raises(TypeError, match="corpus id.*integral"):
        exact_topk_join(queries, str_corpus, k=1)
    with pytest.raises(TypeError, match="query id.*integral"):
        exact_topk_join(str_queries, corpus, k=1)
