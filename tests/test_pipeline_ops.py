"""Training-data pipeline operators: splits, packing, vocab, decontam."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.cache().count()
    return df


def test_hash_split_deterministic_and_partitioning_invariant(spark, docs):
    from coffea_spark.llmdata.splits import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r.doc_id: r.split for r in hash_split(docs, "doc_id", fr, salt=7).collect()}
    s2 = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(13), "doc_id", fr, salt=7).collect()
    }
    assert s1 == s2  # membership independent of layout
    n = len(s1)
    counts = {k: 0 for k in fr}
    for v in s1.values():
        counts[v] += 1
    assert sum(counts.values()) == n
    # fractions roughly honored (multiplicative hash on sequential ids)
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_hash_split_salt_changes_assignment(spark, docs):
    from coffea_spark.llmdata.splits import hash_split

    fr = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in hash_split(docs, "doc_id", fr, salt=1).collect()}
    s2 = {r.doc_id: r.split for r in hash_split(docs, "doc_id", fr, salt=2).collect()}
    assert s1 != s2


def test_hash_split_bad_fractions(docs):
    from coffea_spark.llmdata.splits import hash_split

    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_sample_per_stratum_exact_k(spark, docs):
    from coffea_spark.llmdata.splits import sample_per_stratum

    got = sample_per_stratum(docs, ["lang"], 3, "doc_id")
    per = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(3, avail[lang])
    # deterministic across runs
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(r.doc_id for r in sample_per_stratum(docs, ["lang"], 3, "doc_id").collect())
    assert a == b


def test_pack_offsets_contiguous(spark, docs):
    from coffea_spark.llmdata.packing import pack_offsets, packing_summary
    from coffea_spark.llmdata.text import token_count

    tc = docs.select("lang", "doc_id", token_count(F.col("text")).alias("tc"))
    packed = pack_offsets(tc, "tc", 64, ["lang"], "doc_id")
    rows = sorted(
        packed.select("lang", "doc_id", "tc", "tok_start", "tok_end").collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    # stream offsets tile [0, total) per language with no gaps
    prev_end = {}
    for r in rows:
        assert r.tok_end - r.tok_start == r.tc
        assert r.tok_start == prev_end.get(r.lang, 0)
        prev_end[r.lang] = r.tok_end
    summ = {r.lang: r for r in packing_summary(packed, 64, ["lang"]).collect()}
    for lang, end in prev_end.items():
        s = summ[lang]
        assert s.n_tokens == end
        assert s.n_sequences == -(-end // 64)
        assert s.pad_tokens == s.n_sequences * 64 - end


def test_pack_rejects_bad_seq_len(docs):
    from coffea_spark.llmdata.packing import pack_offsets

    with pytest.raises(ValueError):
        pack_offsets(docs, "n_chars", 0, ["lang"], "doc_id")


def test_term_table_counts(spark):
    from coffea_spark.llmdata.text import term_table

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a d"), (3, "")], "doc_id long, text string"
    )
    got = {r.term: (r["count"], r.doc_freq) for r in term_table(df, "text").collect()}
    assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1), "d": (1, 1)}


def test_decontaminate_removes_overlaps(spark):
    from coffea_spark.llmdata.decontam import (
        contaminated_ids,
        contamination_report,
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares a 5-gram
            (2, "one two three four five six"),
            (3, "alpha beta gamma delta epsilon other"),  # same leading 5-gram
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    bad = sorted(r.doc_id for r in contaminated_ids(train, eval_df, n=5).collect())
    assert bad == [1, 3]
    rep = {r.doc_id: r.n_dirty_grams for r in contamination_report(train, eval_df, n=5).collect()}
    assert rep == {1: 1, 3: 1}
    clean = sorted(r.doc_id for r in decontaminate(train, eval_df, n=5).collect())
    assert clean == [2]


def test_unigram_logprob_ranks_gibberish_low(spark):
    from coffea_spark.llmdata.text import unigram_logprob_score

    common = "the cat sat on the mat and the dog sat on the rug"
    df = spark.createDataFrame(
        [
            (1, common),
            (2, "the cat sat on the rug and the dog sat on the mat"),
            (3, "zxqv wkjh pqrs zzzz xxyy qqww eeee rrrr tttt yyyy uuuu iiii"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.logprob for r in unigram_logprob_score(df, "text").collect()}
    # gibberish (all hapax tokens) scores strictly below the common docs
    assert got[3] < got[1] and got[3] < got[2]
    assert all(v < 0 for v in got.values())
    # n_tokens preserved
    n = {r.doc_id: r.n_tokens for r in unigram_logprob_score(df, "text").collect()}
    assert n[1] == len(common.split())


def test_scrub_text_masks_pii_shapes(spark):
    from coffea_spark.llmdata.text import scrub_stats, scrub_text

    df = spark.createDataFrame(
        [
            (1, "contact me at jane.doe@example.org or https://ex.org/a?b=1 now"),
            (2, "call 555 123 4567 x89 maybe"),
            (3, "clean text with no sensitive spans"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.scrubbed, r.stats)
        for r in df.select(
            "doc_id",
            scrub_text(F.col("text")).alias("scrubbed"),
            scrub_stats(F.col("text")).alias("stats"),
        ).collect()
    }
    assert "<EMAIL>" in out[1][0] and "<URL>" in out[1][0]
    assert "example.org" not in out[1][0].replace("<EMAIL>", "")
    assert out[1][1]["n_email"] == 1 and out[1][1]["n_url"] == 1
    assert "<NUMBER>" in out[2][0] and out[2][1]["n_number"] == 1
    assert out[3][0] == "clean text with no sensitive spans"
    assert out[3][1]["n_url"] == out[3][1]["n_email"] == out[3][1]["n_number"] == 0


def test_bm25_ranks_matching_docs(spark):
    from coffea_spark.llmdata.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark query engine for big data"),
            (2, "query query query spark"),
            (3, "unrelated text about cats and dogs"),
            (4, "data engine"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, ["query", "engine"]).collect()}
    assert got[3] == 0.0
    # tf saturation: matching BOTH terms beats repeating one term
    assert got[1] > got[2] > 0
    # repeated "query" still beats a single "engine" hit
    assert got[2] > 0 and got[4] > 0
    import pytest

    with pytest.raises(ValueError):
        bm25_scores(df, [])


def test_web_pipeline_end_to_end(spark, tmp_path):
    """The full web-corpus user story composed from the round-6 pieces:
    WARC files -> html extraction -> URL domain filter -> quality/lang
    signals -> exact dedup -> sequence packing. Every stage is the
    public operator; the assertions pin the stage-by-stage row
    accounting so a regression in any piece moves a number."""
    import pyspark.sql.functions as F

    from coffea_spark.llmdata.dedup import drop_exact_duplicates
    from coffea_spark.llmdata.packing import pack_offsets
    from coffea_spark.llmdata.text import (
        domain_filter,
        html_to_text,
        token_count,
    )
    from coffea_spark.llmdata.warc import read_warc, write_warc

    # 2 WARC files: 8 pages, one exact duplicate body, one blocked domain
    pages = [
        (0, "https://a.good.org/x", "<p>alpha beta gamma delta</p>"),
        (1, "https://b.good.org/y", "<p>epsilon zeta eta theta</p>"),
        (2, "https://spam.bad.net/z", "<p>blocked page</p>"),
        (3, "https://c.good.org/w", "<p>alpha beta gamma delta</p>"),  # dup of 0
        (4, "https://d.good.org/v", "<script>x</script><p>iota kappa</p>"),
        (5, "https://e.good.org/u", "<p>lambda mu nu xi omicron pi</p>"),
        (6, "https://sub.spam.bad.net/t", "<p>also blocked</p>"),
        (7, "https://f.good.org/s", "<p>rho sigma tau</p>"),
    ]
    recs = [
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Target-URI": url,
                "Content-Type": "text/html",
            },
            "payload": html.encode(),
        }
        for _, url, html in pages
    ]
    f1, f2 = str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")
    write_warc(f1, recs[:4], compress=False)
    write_warc(f2, recs[4:], compress=True)

    raw = read_warc(spark, [f1, f2])
    assert raw.count() == 8

    docs = raw.select(
        F.monotonically_increasing_id().alias("doc_id"),
        "url",
        html_to_text(F.decode(F.col("payload"), "UTF-8")).alias("text"),
    )
    kept = domain_filter(docs, "url", ["bad.net"])
    assert kept.count() == 6  # 2 blocked (incl. the subdomain)

    deduped = drop_exact_duplicates(kept, "text", "doc_id")
    assert deduped.count() == 5  # the alpha-beta duplicate collapsed

    scored = deduped.select("doc_id", token_count(F.col("text")).alias("n_tok"))
    assert scored.agg(F.sum("n_tok")).collect()[0][0] == 4 + 4 + 2 + 6 + 3

    packed = pack_offsets(
        scored.withColumn("g", F.lit(0)), "n_tok", seq_len=8,
        group_cols=["g"], order_col="doc_id",
    )
    # concat-and-split at 8: offsets are a partition of [0, 19)
    stats = packed.agg(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("tok"),
        F.max("seq_last").alias("last_seq"),
        F.max("tok_end").alias("end"),
    ).collect()[0]
    assert stats.tok == 19 and stats.end == 19 and stats.last_seq == 2


def test_chunk_documents_striding(spark):
    """BERT-style striding: window starts, overlap, tail handling,
    disjoint default, empty docs, errors, and full-coverage invariant."""
    import pytest

    from coffea_spark.llmdata.packing import chunk_documents

    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(7))), (1, "x y"), (2, ""),
         (3, " ".join(f"u{i}" for i in range(4)))],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, max_tokens=4, stride=2).orderBy(
        "doc_id", "chunk_id").collect()
    got = [(r.doc_id, r.chunk_id, r.chunk_start, r.n_chunk_tokens) for r in rows]
    assert got == [(0, 0, 0, 4), (0, 1, 2, 4), (0, 2, 4, 3),
                   (1, 0, 0, 2), (3, 0, 0, 4)]
    assert rows[2].chunk_text == "t4 t5 t6"
    # every token of doc 0 appears in some chunk (coverage)
    toks = set()
    for r in rows[:3]:
        toks.update(r.chunk_text.split())
    assert toks == {f"t{i}" for i in range(7)}
    # disjoint default: stride == max_tokens
    dis = chunk_documents(df, max_tokens=3).where("doc_id = 0").collect()
    assert sorted((r.chunk_start, r.n_chunk_tokens) for r in dis) == [(0, 3), (3, 3), (6, 1)]
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, stride=5)
