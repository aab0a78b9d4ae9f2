#!/usr/bin/env python
"""ANN second decade (r10, judge ask #4): the embedding family measured
through sf10 (200k x 64), with the INDEX-SIDE cost separated from the
brute-force-truth overhead the recall gates carry.

The recall gates (ann_recall / ivf_recall / pq_recall) are graded
against `_exact_top1`, a broadcast cross product of Q planted queries
(every 25th vector -> Q = n/25) against the full corpus: O(n*Q) = O(n²/25)
cosine evaluations. That gold standard is the gate's SCAFFOLDING, not
the operator — at production scale you'd grade on a sampled query set.
This harness times three things per family and SF:

- index+serve: the approximate path alone (bucket/assign/encode once,
  then serve the full planted-query table) — the 100 TB cost shape;
- truth: the exact broadcast top-1 (shared by all three gates);
- recall@5 of the approximate path against that truth (must hold >= the
  gates' 0.9 bar at every SF).

Usage:
    python tools/bench_ann_decade.py /tmp/scale/sf1 /tmp/scale/sf10

Writes BENCH_ANN_DECADE_LATEST.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coffea_spark.queries import _exact_top1, _planted_queries  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402


def _timed(fn, reps):
    samples = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), out


def _recall_at5(truth, approx):
    """Fraction of queries whose exact top-1 appears in the approx
    top-5 (the gates' recall definition)."""
    hit = truth.join(
        approx,
        (truth.qid == approx.qid) & (truth.top1_id == approx.vec_id),
        "left_semi",
    ).count()
    return hit / max(truth.count(), 1)


def run_dir(spark, sf_dir, reps, cross_check_hof=False):
    from coffea_spark.llmdata.similarity import (
        ann_join,
        ivf_assign_table,
        ivf_probe_join,
        ivf_train,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    dim = len(emb.select("embedding").head()[0])
    queries = _planted_queries(emb).persist()
    nq = queries.count()
    res = {"n_vectors": n, "n_queries": nq}

    # ---- shared brute-force truth (the gates' scaffolding) ----
    # Computed with similarity.exact_topk_join (blocked numpy matmul
    # per Arrow batch — the scalable exact spelling) and timed ONCE:
    # the truth is O(n²/25) pair evaluations no matter how it's
    # spelled, and one honest sample is enough for scaffolding. The
    # gates' own HOF cross-join `_exact_top1` is additionally timed at
    # the FIRST (smallest) dir and pinned row-identical to the blocked
    # path — measured ~50x slower per pair (33 us/pair at sf1 on a
    # 2-task cross-join stage), which is exactly why the harness does
    # not drag it through sf10.
    from coffea_spark.llmdata.similarity import exact_topk_join

    t0 = time.perf_counter()
    truth = (
        exact_topk_join(queries, emb, k=1)
        .select(
            "qid",
            F.col("vec_id").alias("top1_id"),
            F.col("cosine").alias("top1_cos"),
        )
        .persist()
    )
    truth.count()
    t_truth = round(time.perf_counter() - t0, 3)
    res["truth_wall"] = t_truth
    res["truth_reps"] = 1
    if cross_check_hof:
        t0 = time.perf_counter()
        hof_rows = sorted(
            tuple(r) for r in _exact_top1(queries, emb).collect()
        )
        res["truth_hof_wall"] = round(time.perf_counter() - t0, 3)
        blocked_rows = sorted(tuple(r) for r in truth.collect())
        if hof_rows != blocked_rows:
            raise AssertionError(
                "blocked exact top-1 disagrees with the HOF cross join"
            )
        res["truth_hof_matches"] = True
        print(
            f"  truth HOF cross-check {res['truth_hof_wall']:8.3f}s (rows identical)",
            file=sys.stderr,
        )
    print(f"  truth (exact top-1)   {t_truth:8.3f}s  Q={nq}", file=sys.stderr)

    # ---- hyperplane LSH (index+serve only) ----
    def ann():
        return ann_join(queries, emb, k=5, n_planes=12, max_hamming=1, dim=dim)

    med, _ = _timed(lambda: ann().count(), reps)
    res["ann"] = {"wall": med, "recall": round(_recall_at5(truth, ann()), 4)}
    print(f"  ann index+serve       {med:8.3f}s recall={res['ann']['recall']}", file=sys.stderr)

    # ---- IVF: train + assign ONCE (index build), then serve ----
    def ivf_build():
        cents = ivf_train(emb.sample(0.25, seed=1), n_lists=16, seed=42)
        assigned = ivf_assign_table(emb, cents).persist()
        assigned.count()
        return cents, assigned

    t_build, (cents, assigned) = _timed(lambda: ivf_build(), 1)

    def ivf_serve():
        return ivf_probe_join(queries, assigned, cents, k=5, n_probe=4)

    med, _ = _timed(lambda: ivf_serve().count(), reps)
    res["ivf"] = {
        "build_wall": round(t_build, 3),
        "serve_wall": med,
        "recall": round(_recall_at5(truth, ivf_serve()), 4),
    }
    assigned.unpersist()
    print(
        f"  ivf build={t_build:.3f}s serve={med:8.3f}s recall={res['ivf']['recall']}",
        file=sys.stderr,
    )

    # ---- PQ: train + encode ONCE, then ADC serve ----
    def pq_build():
        books = pq_train(emb, m=8, n_codes=16, seed=7)
        enc = pq_encode(emb, books).persist()
        enc.count()
        return books, enc

    t_build, (books, enc) = _timed(lambda: pq_build(), 1)

    def pq_serve():
        return pq_adc_topk(
            queries.select("qid", F.col("qvec").alias("qvec")), enc, books, k=5
        ).select("qid", F.col("vec_id"))

    med, _ = _timed(lambda: pq_serve().count(), reps)
    res["pq"] = {
        "build_wall": round(t_build, 3),
        "serve_wall": med,
        "recall": round(_recall_at5(truth, pq_serve()), 4),
    }
    enc.unpersist()
    print(
        f"  pq  build={t_build:.3f}s serve={med:8.3f}s recall={res['pq']['recall']}",
        file=sys.stderr,
    )

    # ---- PQ two-stage (production): ADC shortlist + exact re-rank.
    # Raw ADC recall FALLS with corpus density (quantization error);
    # the standard fix is re-ranking a shortlist with exact cosine —
    # same never-shuffle-the-corpus shape, rerank/k x the top-k cost.
    def pq2_build():
        books = pq_train(emb, m=8, n_codes=16, seed=7)
        enc = pq_encode(emb, books, keep_cols=("embedding",)).persist()
        enc.count()
        return books, enc

    t_build, (books2, enc2) = _timed(lambda: pq2_build(), 1)

    def pq2_serve():
        return pq_adc_topk(
            queries.select("qid", "qvec"), enc2, books2, k=5, rerank=64
        ).select("qid", F.col("vec_id"))

    med, _ = _timed(lambda: pq2_serve().count(), reps)
    res["pq_rerank"] = {
        "build_wall": round(t_build, 3),
        "serve_wall": med,
        "rerank": 64,
        "recall": round(_recall_at5(truth, pq2_serve()), 4),
    }
    enc2.unpersist()
    print(
        f"  pq+rerank build={res['pq_rerank']['build_wall']:.3f}s serve={med:8.3f}s"
        f" recall={res['pq_rerank']['recall']}",
        file=sys.stderr,
    )

    # ---- IVF production config: n_lists ~ sqrt(n) (the gate's fixed
    # 16 lists keeps serve at n_probe/16 = 25% of brute force — the
    # quadratic law with a smaller constant; a real deployment scales
    # the list count with the corpus so probe cost stays ~constant
    # per query).
    nl = min(256, max(16, int(math.sqrt(n))))
    npb = max(4, nl // 16)

    def ivfp_build():
        cents = ivf_train(emb.sample(0.25, seed=1), n_lists=nl, seed=42)
        assigned = ivf_assign_table(emb, cents).persist()
        assigned.count()
        return cents, assigned

    t_build, (cents_p, assigned_p) = _timed(lambda: ivfp_build(), 1)

    def ivfp_serve():
        return ivf_probe_join(queries, assigned_p, cents_p, k=5, n_probe=npb)

    med, _ = _timed(lambda: ivfp_serve().count(), reps)
    res["ivf_prod"] = {
        "n_lists": nl,
        "n_probe": npb,
        "build_wall": round(t_build, 3),
        "serve_wall": med,
        "recall": round(_recall_at5(truth, ivfp_serve()), 4),
    }
    assigned_p.unpersist()
    print(
        f"  ivf_prod(L={nl},p={npb}) build={res['ivf_prod']['build_wall']:.3f}s"
        f" serve={med:8.3f}s recall={res['ivf_prod']['recall']}",
        file=sys.stderr,
    )

    # ---- semdedup: the operator IS the index path ----
    from coffea_spark.llmdata.dedup import semdedup as _semdedup

    med, kept = _timed(lambda: _semdedup(emb, "vec_id", "embedding").count(), reps)
    res["semdedup"] = {"wall": med, "kept": kept}
    print(f"  semdedup              {med:8.3f}s kept={kept}", file=sys.stderr)

    truth.unpersist()
    queries.unpersist()
    return res


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/scale/sf1", "/tmp/scale/sf10"]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(app_name="coffea-spark-ann-decade", cpus=cpus)
    out = {}
    for i, d in enumerate(dirs):
        print(f"== {d}", file=sys.stderr)
        out[d] = run_dir(spark, d, reps, cross_check_hof=(i == 0))

    slopes = {}
    if len(dirs) == 2:
        a, b = out[dirs[0]], out[dirs[1]]
        ratio = b["n_vectors"] / a["n_vectors"]
        for fam, key in (
            ("ann", "wall"),
            ("semdedup", "wall"),
            ("truth", None),
        ):
            t0 = a[fam][key] if key else a["truth_wall"]
            t1 = b[fam][key] if key else b["truth_wall"]
            slopes[fam] = round(math.log(t1 / t0) / math.log(ratio), 3)
        for fam in ("ivf", "pq", "pq_rerank", "ivf_prod"):
            t0 = a[fam]["build_wall"] + a[fam]["serve_wall"]
            t1 = b[fam]["build_wall"] + b[fam]["serve_wall"]
            slopes[fam] = round(math.log(t1 / t0) / math.log(ratio), 3)
    rec = {
        "metric": "ann_second_decade",
        "reps": reps,
        "cpus": cpus,
        "dirs": dirs,
        "results": out,
        "slopes": slopes,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ANN_DECADE_LATEST.json",
    )
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(rec, separators=(",", ":")))


if __name__ == "__main__":
    main()
