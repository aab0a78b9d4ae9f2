#!/usr/bin/env python
"""jaccard_collapsed sf0.1 interleaved A/B (r12 verdict ask #4): close
the 13.9 -> 18.9 s quiet-ledger drift the way jaccard_dupes was closed.

Three legs, INTERLEAVED rep-by-rep in ONE JVM (the noise protocol:
never compare configs across JVM lifetimes — JIT/codegen warmup charges
the first config; one-sided 2-20 s box noise — report per-leg MIN):

  cur-on  : HEAD collapse_jaccard_join, dense guard at defaults
  cur-off : HEAD with the guard disabled (dense_min_mass=None patched
            into the stage-2 jaccard_join call)
  r11     : the round-11 dedup module (commit 16667e6, pre-guard)
            executed from git against the same inputs

Each leg runs the FULL gate shape (parquet read -> collapse -> pairs ->
the two aggregates -> crossJoin -> collect), matching what the bench
times. If cur-on ~= cur-off ~= r11 (mins), the drift was box noise; a
real cur-vs-r11 gap attributes to the guard stats or the r12 cache
work. Writes BENCH_COLLAPSE_AB_SF01.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
import types
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from coffea_spark.session import get_spark  # noqa: E402
import coffea_spark.llmdata.dedup as cur_dedup  # noqa: E402

R11_COMMIT = "16667e6"


def load_r11_dedup():
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{R11_COMMIT}:coffea_spark/llmdata/dedup.py"],
        text=True,
    )
    mod = types.ModuleType("dedup_r11")
    mod.__file__ = f"<git:{R11_COMMIT}:dedup.py>"
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def gate(spark, sf_dir, collapse_fn):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps, pairs = collapse_fn(
        docs, 0.5, "doc_id", "text", 5, block_cols=["lang", "source"]
    )
    r = reps.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.sum("n_members").alias("n_docs"),
        (F.sum("n_members") - F.count(F.lit(1))).alias("n_collapsed"),
    )
    p = pairs.agg(
        F.count(F.lit(1)).alias("n_near_pairs"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )
    return r.crossJoin(p).collect()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("AB_REPS", "4"))
    load0 = round(os.getloadavg()[0], 2)

    r11 = load_r11_dedup()
    orig_jj = cur_dedup.jaccard_join

    def jj_guard_off(*a, **k):
        k["dense_min_mass"] = None
        return orig_jj(*a, **k)

    def leg_cur_on(spark, sf):
        return gate(spark, sf, cur_dedup.collapse_jaccard_join)

    def leg_cur_off(spark, sf):
        cur_dedup.jaccard_join = jj_guard_off
        try:
            return gate(spark, sf, cur_dedup.collapse_jaccard_join)
        finally:
            cur_dedup.jaccard_join = orig_jj

    def leg_r11(spark, sf):
        return gate(spark, sf, r11.collapse_jaccard_join)

    legs = {"cur-on": leg_cur_on, "cur-off": leg_cur_off, "r11": leg_r11}
    spark = get_spark(app_name="collapse-ab-sf01")
    # one untimed warmup of the whole path (JIT + parquet footer cache)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        leg_cur_on(spark, sf_dir)
    spark.catalog.clearCache()

    times = {k: [] for k in legs}
    rows = {}
    for rep in range(reps):
        for name, fn in legs.items():
            t0 = time.perf_counter()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                out = fn(spark, sf_dir)
            times[name].append(round(time.perf_counter() - t0, 2))
            rows[name] = [tuple(r) for r in out]
            spark.catalog.clearCache()
            print(f"rep {rep} {name}: {times[name][-1]} s", flush=True)

    parity = len({json.dumps(sorted(map(str, v))) for v in rows.values()}) == 1
    result = {
        "protocol": "interleaved same-process, per-leg min of "
        f"{reps}, warmup rep untimed, load_at_launch {load0}",
        "sf_dir": sf_dir,
        "r11_commit": R11_COMMIT,
        "legs": {
            k: {
                "min": min(v),
                "med": round(statistics.median(v), 2),
                "samples": v,
            }
            for k, v in times.items()
        },
        "output_parity_across_legs": parity,
        "gate_row": [str(r) for r in rows["cur-on"]],
    }
    with open(os.path.join(REPO, "BENCH_COLLAPSE_AB_SF01.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(result["legs"], indent=1))
    print("parity:", parity)


if __name__ == "__main__":
    main()
