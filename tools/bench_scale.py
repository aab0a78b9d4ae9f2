#!/usr/bin/env python
"""Scale rehearsal: time the heaviest registry gates across a DECADE of
scale factors (gen_scale_data.py outputs at sf0.01 / sf0.1 / sf1) and
fit per-operator scaling exponents.

The per-round bench (bench.py) measures one SF; every SCALE.md claim is
argued from plan shape. This harness measures the claims: for each
operator, n-rep median wall at each SF, plus the log-log slope between
consecutive decades (slope ~1 = corpus-linear, >1 super-linear). A
fixed per-query overhead (session/scheduling, ~0.3-1 s) flattens slopes
at the small end, so the sf0.1 -> sf1 slope is the honest scale signal.

Usage:
    python tools/gen_scale_data.py 0.01 /tmp/scale/sf0.01   # etc.
    python tools/bench_scale.py /tmp/scale/sf0.01 /tmp/scale/sf0.1 /tmp/scale/sf1
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coffea_spark.queries import REGISTRY  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402

# the 12 heaviest gates by BENCH_FULL history (r8 judge's rehearsal set)
# + the embedding/ANN family (blocked self-joins and bucketed
# assignment are exactly the shapes that must hold at corpus scale)
HEAVY = [
    "ccnet_pipeline",
    "dup_clusters",
    "pagerank_hosts",
    "minhash_lsh",
    "jaccard_dupes",
    "substring_removal",
    "bpe_train",
    "tree_train",
    "gbdt_train_boost",
    "decontaminate",
    "paragraph_dedup",
    "pairs_routed",
    "ann_recall",
    "ivf_recall",
    "pq_recall",
    "semdedup",
    "knn_classify",
]

# the relational/physics core (TPC-H-shaped tables + the jagged event
# model): scan+agg, broadcast star join, windows, sessionization,
# within-event combinatorics, N-D histograms, the corrected-jets chain
RELATIONAL = [
    "pricing_summary",
    "region_revenue",
    "topk_per_group",
    "running_window",
    "sessionize",
    "events_hourly",
    "hist3d",
    "cutflow",
    "dimuon_mass",
    "boost_cosstar",
    "jagged_reduce",
    "xref_roundtrip",
    "combinations_pairs",
    "quads_metric",
    "salted_join",
    "corrected_jets_det",
]

# Structured Streaming surface: state-store growth is the scale axis —
# windowed aggs, sessions, stream-stream joins, dedup state, sketches
STREAMING = [
    "stream_windowed_hist",
    "stream_cutflow",
    "stream_sessions",
    "stream_enrich",
    "stream_interval_join",
    "stream_dedup",
    "stream_ewma",
    "stream_heavy_hitters",
]

SETS = {"heavy": HEAVY, "relational": RELATIONAL, "streaming": STREAMING}


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/tmp/scale/sf0.01",
        "/tmp/scale/sf0.1",
        "/tmp/scale/sf1",
    ]
    gate_set = os.environ.get("SPARK_GRAFT_SCALE_SET", "heavy")
    explicit = os.environ.get("SPARK_GRAFT_SCALE_GATES")
    gates = (
        [g for g in explicit.split(",") if g] if explicit else SETS[gate_set]
    )
    if explicit:
        gate_set = "custom"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(app_name="coffea-spark-scale", cpus=cpus)

    sfs = [float(d.rstrip("/").rsplit("sf", 1)[-1]) for d in sf_dirs]
    out: dict[str, dict] = {name: {"sf": {}} for name in gates}
    for d, sf in zip(sf_dirs, sfs):
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()  # warm
        for name in gates:
            q = REGISTRY[name]
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                q.fn(spark, d).collect()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            out[name]["sf"][str(sf)] = {
                "median": round(statistics.median(samples), 3),
                "spread": round(max(samples) - min(samples), 3),
            }
            print(
                f"{name:20s} sf{sf:<5g} median={out[name]['sf'][str(sf)]['median']:8.3f}s"
                f" spread={out[name]['sf'][str(sf)]['spread']:.3f}",
                file=sys.stderr,
            )
        spark.sparkContext._jvm.System.gc()

    for name in gates:
        pts = sorted(
            ((float(s), v["median"]) for s, v in out[name]["sf"].items())
        )
        slopes = {}
        for (s0, t0), (s1, t1) in zip(pts, pts[1:]):
            slopes[f"{s0:g}->{s1:g}"] = round(
                math.log(t1 / t0) / math.log(s1 / s0), 3
            )
        out[name]["slope"] = slopes

    rec = {
        "metric": "scale_rehearsal",
        "reps": reps,
        "cpus": cpus,
        "sf_dirs": sf_dirs,
        "set": gate_set,
        "operators": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        (f"BENCH_SCALE_{gate_set.upper()}_LATEST.json" if gate_set != "heavy" else "BENCH_SCALE_LATEST.json"),
    )
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(rec, separators=(",", ":")))


if __name__ == "__main__":
    main()
