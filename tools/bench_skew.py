#!/usr/bin/env python
"""Skew rehearsal (r10, judge ask #1): measure the skew-sensitive gates
and guard rails on ADVERSARIAL distributions, uniform vs skewed, at the
same SF.

``gen_scale_data.py --skew`` plants the four real-corpus shapes —
boilerplate near-dup cluster (6% of docs), 90%-one-language mix,
Zipf(1.3) hosts, one hot join key (2% of lineitem), one hot stream user
(50% of events), one dominant embedding cell (20% of vectors). This
harness answers, with measurements instead of plan-shape arguments:

1. per-gate wall, uniform vs skewed (a skew ratio >> 1 on a guarded
   operator means the guard is marketing);
2. does ``max_bucket_size`` actually FIRE on the boilerplate cluster,
   and what does the guarded production MinHash config cost vs the
   unguarded one on the same skewed corpus;
3. does Spark AQE's skew-join split actually ENGAGE on the hot key
   (final adaptive plan carries the skew marker);
4. does explicit salting keep the hot-key join flat (salted_join gate
   wall on skewed data, result parity already oracle-checked via
   check_oracle on the skewed dir).

Usage:
    python tools/gen_scale_data.py 1 /tmp/scale/sf1
    python tools/gen_scale_data.py 1 /tmp/scale/sf1-skew --skew
    python tools/bench_skew.py /tmp/scale/sf1 /tmp/scale/sf1-skew

Writes BENCH_SKEW_LATEST.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coffea_spark.queries import REGISTRY  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402

# gates whose INPUT columns carry the planted skew
GATES = [
    "minhash_lsh",        # boilerplate cluster -> hot LSH buckets
    "jaccard_dupes",      # same, through PPJoin prefix filtering
    "jaccard_collapsed",  # r11 composed posture: exact collapse first
    "paragraph_dedup",    # same cluster at paragraph granularity
    "dedup_exact",        # hot hash groups
    "dup_clusters",       # connected components over dup edges
    "doc_fingerprint",
    "alpha_sample",       # 90%-one-language mix
    "unimax_sample",
    "lang_id",
    "salted_join",        # hot l_orderkey
    "semdedup",           # dominant k-means cell
    "ivf_recall",         # dominant IVF list
    "sessionize",         # hot user_id
    "events_hourly",
]


def _timed(fn, reps):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), out


def bench_gates(spark, sf_dir, reps):
    res = {}
    for name in GATES:
        q = REGISTRY[name]
        med, _ = _timed(lambda: q.fn(spark, sf_dir).collect(), reps)
        spark.catalog.clearCache()
        res[name] = med
        print(f"  {name:20s} {med:8.3f}s", file=sys.stderr)
    return res


def probe_minhash_production(spark, sf_dir, reps):
    """Guarded vs unguarded production MinHash on the same corpus:
    8 bands x 8 rows, max_bucket_size=1000 (the BENCH_SCALE.md
    production config) vs the same banding with no bucket guard.
    Returns walls, candidate counts, and whether the guard FIRED."""
    from coffea_spark.llmdata.dedup import minhash_lsh_candidates, minhash_signatures

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {}
    sig = minhash_signatures(docs, "doc_id", "text", 3, 64).persist()
    sig.count()
    for label, cap in (("guarded", 1000), ("unguarded", None)):
        fired = []

        def run():
            with warnings.catch_warnings(record=True) as wlog:
                warnings.simplefilter("always")
                n = minhash_lsh_candidates(
                    docs, "doc_id", "text", 3, 64,
                    bands=8, max_bucket_size=cap, signatures=sig,
                ).count()
                fired.append(
                    any("hot" in str(x.message) for x in wlog)
                )
                return n

        med, n = _timed(run, reps)
        out[label] = {"wall": med, "candidates": n, "guard_fired": fired[-1]}
        print(
            f"  minhash {label:10s} {med:8.3f}s candidates={n}"
            f" guard_fired={fired[-1]}",
            file=sys.stderr,
        )
    sig.unpersist()
    return out


def probe_host_graph(spark, sf_dir, reps):
    """Zipf-host probes: PageRank over a link graph whose endpoints are
    the documents' (possibly Zipfian) hosts, and URL dedup over URLs
    keyed by those hosts — the hot-reducer shapes the gate recipes
    (deterministic doc_id hosts) cannot express."""
    from coffea_spark.llmdata.cluster import pagerank
    from coffea_spark.llmdata.text import url_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = {}

    def pr():
        # edge i: host(doc i) -> host(doc i+1); both endpoints follow
        # the corpus host distribution (Zipf in the skew dir)
        from pyspark.sql import Window

        e = docs.select(
            F.col("source").alias("src_h"),
            F.lead("source").over(Window.orderBy("doc_id")).alias("dst_h"),
        ).where(
            F.col("dst_h").isNotNull() & (F.col("src_h") != F.col("dst_h"))
        ).select(
            F.xxhash64("src_h").alias("src"), F.xxhash64("dst_h").alias("dst")
        )
        return pagerank(e, iterations=3, damping=0.85).count()

    med, n = _timed(pr, reps)
    out["pagerank_hosts_zipf"] = {"wall": med, "nodes": n}
    print(f"  pagerank_hosts_zipf  {med:8.3f}s nodes={n}", file=sys.stderr)

    def ud():
        urls = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit("?utm_source=x&id="), (F.col("doc_id") % 3).cast("string"),
            ).alias("url"),
        )
        return url_dedup(urls, "url", "doc_id").count()

    med, n = _timed(ud, reps)
    out["url_dedup_zipf"] = {"wall": med, "kept": n}
    print(f"  url_dedup_zipf       {med:8.3f}s kept={n}", file=sys.stderr)
    return out


def probe_aqe_skew_join(spark, sf_dir, reps):
    """Does AQE's skew-join split ENGAGE on the hot l_orderkey? Force a
    sort-merge join (no broadcast), lower the skew thresholds to this
    SF's bytes (defaults target 256 MB partitions), run, and read the
    FINAL adaptive plan for the skew marker."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # a partition is skewed only past skewedPartitionFactor x MEDIAN:
        # a 2%-of-table hot key is 1 + 0.02*P medians, so the reducer
        # count must be high enough for the hot reducer to stand out —
        # 256 reducers puts it at ~6x median (the production posture:
        # many reducers, one hot one). The join must also CARRY payload
        # columns: with the probe pruned to the bare key, the hot
        # partition compressed under the byte threshold.
        spark.conf.set("spark.sql.shuffle.partitions", "256")

        def run():
            j = (
                li.hint("merge")
                .join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("l_extendedprice").alias("sp"),
                    F.avg("l_quantity").alias("aq"),
                )
            )
            j.collect()
            plan = li._sc._jvm.PythonSQLUtils.explainString(
                j._jdf.queryExecution(), "simple"
            )
            return "skew=true" in plan

        med, engaged = _timed(run, reps)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    print(f"  aqe_skew_join        {med:8.3f}s engaged={engaged}", file=sys.stderr)
    return {"wall": med, "skew_split_engaged": engaged}


def main() -> None:
    uni_dir, skew_dir = sys.argv[1:3] if len(sys.argv) >= 3 else (
        "/tmp/scale/sf1",
        "/tmp/scale/sf1-skew",
    )
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(app_name="coffea-spark-skew", cpus=cpus)

    out = {"uniform": {}, "skewed": {}}
    for label, d in (("uniform", uni_dir), ("skewed", skew_dir)):
        print(f"== {label}: {d}", file=sys.stderr)
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        out[label]["gates"] = bench_gates(spark, d, reps)
        out[label]["minhash_production"] = probe_minhash_production(spark, d, reps)
        out[label]["host_graph"] = probe_host_graph(spark, d, reps)
        out[label]["aqe_skew_join"] = probe_aqe_skew_join(spark, d, reps)

    ratios = {
        g: round(out["skewed"]["gates"][g] / max(out["uniform"]["gates"][g], 1e-9), 2)
        for g in GATES
    }
    rec = {
        "metric": "skew_rehearsal",
        "reps": reps,
        "cpus": cpus,
        "uniform_dir": uni_dir,
        "skew_dir": skew_dir,
        "results": out,
        "skew_over_uniform": ratios,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SKEW_LATEST.json",
    )
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"skew_over_uniform": ratios}, separators=(",", ":")))


if __name__ == "__main__":
    main()
