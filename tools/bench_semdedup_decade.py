#!/usr/bin/env python
"""semdedup scale rehearsal (r12 verdict asks #1c and #5): pin the
dense-vs-pair-join A/B with protocol, and give the dense rewrite its
decade row.

Legs (gate config: bucket_mean_centroids(8) quantizer, threshold 0.42,
full flag-set collected — the sf-scaled replica of q_semdedup):

  sf1  uniform : dense=True vs dense=False INTERLEAVED rep-by-rep in
                 one JVM (min-of-N per the noise protocol) — the pinned
                 replacement for the r12 ledger note "35.4 -> 4.9 s".
                 Flag sets asserted IDENTICAL (scale-size parity).
  sf1  skew    : same A/B on the dominant-cell corpus (20% of vectors
                 in one embedding cell -> one hot cluster).
  sf10 uniform : dense only (the pair join at 8 x C(25k,2) HOF pairs
                 is the ~40-minute spelling the rewrite retires) ->
                 decade slope vs sf1 dense, plus clamp evidence:
                 per-cluster sizes and the per-cluster batch step
                 (step = 16_777_216 // n < n means the ~16M-cell clamp
                 engaged and the scoring ran multi-batch).

Writes BENCH_SEMDEDUP_DECADE.json. Corpora: tools/gen_scale_data.py
output at /tmp/scale (BENCH_SCALE.md provenance).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from coffea_spark.llmdata.dedup import bucket_mean_centroids, semdedup  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402

BATCH_CELLS = 16_777_216


def run_leg(spark, sf_dir, dense):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = bucket_mean_centroids(emb, 8)
    out = semdedup(emb, n_clusters=8, threshold=0.42, centroids=cents, dense=dense)
    rows = out.select("vec_id", "cluster", "is_dup").collect()
    flags = frozenset(r.vec_id for r in rows if r.is_dup == 1)
    sizes = {}
    for r in rows:
        sizes[int(r.cluster)] = sizes.get(int(r.cluster), 0) + 1
    return flags, sizes, len(rows)


def timed(fn, reps):
    samples, payload = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        payload = fn()
        samples.append(round(time.perf_counter() - t0, 2))
    return samples, payload


def main():
    reps = int(os.environ.get("AB_REPS", "2"))
    # the retired pair-join spelling is ~100x the dense time at sf1 (the
    # 8-key join coalesces to a near-single-task HOF scan of ~25M cosine
    # evaluations at the measured ~33 us each — the exact cost the dense
    # rewrite retires), so it gets ONE timed rep after the shared warmup:
    # the 2-20 s one-sided box noise cannot flip a two-orders comparison,
    # and min-of-N on an ~800 s leg buys nothing for its price.
    pair_reps = int(os.environ.get("AB_PAIR_REPS", "1"))
    load0 = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="semdedup-decade")
    result = {
        "protocol": "interleaved same-process A/B at sf1 (uniform+skew), "
        f"dense min of {reps}, pair-join min of {pair_reps} (noise band "
        "<< the two-orders gap); sf10 dense-only; gate config (8 "
        f"bucket-mean clusters, t=0.42); load_at_launch {load0}",
        "corpora": "tools/gen_scale_data.py at /tmp/scale",
    }

    # --- sf1 uniform + skew: interleaved dense vs pair-join -------------
    for tag, sf_dir in (("sf1", "/tmp/scale/sf1"), ("sf1-skew", "/tmp/scale/sf1-skew")):
        t = {True: [], False: []}
        got = {}
        run_leg(spark, sf_dir, True)  # untimed warmup (JIT + footer cache)
        spark.catalog.clearCache()
        for rep in range(reps):
            for dense in (True, False):
                if not dense and rep >= pair_reps:
                    continue
                t0 = time.perf_counter()
                got[dense] = run_leg(spark, sf_dir, dense)
                t[dense].append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
                print(f"{tag} rep {rep} dense={dense}: {t[dense][-1]} s", flush=True)
        parity = got[True][0] == got[False][0]
        sizes = got[True][1]
        nmax = max(sizes.values())
        result[tag] = {
            "dense": {"min": min(t[True]), "samples": t[True]},
            "pair_join": {"min": min(t[False]), "samples": t[False]},
            "speedup_min": round(min(t[False]) / min(t[True]), 2),
            "flag_set_parity": parity,
            "n_rows": got[True][2],
            "n_flagged": len(got[True][0]),
            "cluster_sizes": dict(sorted(sizes.items())),
            "max_cluster": nmax,
            "clamp_engaged": BATCH_CELLS // nmax < nmax,
        }
        assert parity, f"{tag}: dense vs pair-join flag sets differ"

    # --- sf10: dense only, decade slope + clamp evidence ----------------
    run_leg(spark, "/tmp/scale/sf10", True)
    spark.catalog.clearCache()
    samples, (flags, sizes, nrows) = timed(
        lambda: run_leg(spark, "/tmp/scale/sf10", True), reps
    )
    spark.catalog.clearCache()
    per_cluster = {
        c: {"n": n, "step": max(16, min(4096, BATCH_CELLS // n)),
            "batches": math.ceil(n / max(16, min(4096, BATCH_CELLS // n)))}
        for c, n in sorted(sizes.items())
    }
    result["sf10"] = {
        "dense": {"min": min(samples), "samples": samples},
        "n_rows": nrows,
        "n_flagged": len(flags),
        "per_cluster": per_cluster,
        "clamp_engaged_clusters": sum(
            1 for v in per_cluster.values() if v["batches"] > 1
        ),
    }
    result["decade_slope_dense"] = round(
        math.log10(min(samples) / result["sf1"]["dense"]["min"]), 2
    )
    with open(os.path.join(REPO, "BENCH_SEMDEDUP_DECADE.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "protocol"},
                     indent=1, default=str)[:2000])


if __name__ == "__main__":
    main()
