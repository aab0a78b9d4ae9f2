"""Interleaved A/B for the r13 session-5 adaptive broadcast-df spelling.

Two legs, flipped in ONE process so host-noise bursts hit both legs:

- leg "win": PPJoin document frequency via the window count (the
  session-3 shipped spelling), reproduced by setting
  ``dedup._PPJOIN_DF_BROADCAST_MAX = None``.
- leg "bc":  the adaptive broadcast-df spelling (probe the vocabulary,
  broadcast the df table back onto tok when it fits) — the candidate.

Per rep the legs run round-robin; min-of-N per (gate, leg) is the
decision metric (the round's one-sided-noise protocol), with JVM CPU
time (utime+stime of the driver JVM, which in local mode runs all task
work) recorded per leg as the host-noise-robust secondary metric.
Collected rows are asserted identical across legs every rep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import coffea_spark.llmdata.dedup as D  # noqa: E402
from coffea_spark.queries import REGISTRY  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402

GATES = ["jaccard_dupes", "jaccard_collapsed", "dup_clusters"]
REPS = int(os.environ.get("AB_REPS", "4"))
SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")

_CLK = os.sysconf("SC_CLK_TCK")


def _jvm_cpu_s() -> float:
    """utime+stime of every live java process (local mode: the driver
    JVM holds all task threads)."""
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _CLK
        except OSError:
            continue
    return total


def set_leg(leg: int) -> None:
    D._PPJOIN_DF_BROADCAST_MAX = None if leg == 0 else 2_000_000


def main() -> None:
    spark = get_spark(
        app_name="dfbc-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    spark.read.parquet(os.path.join(SF, "region.parquet")).count()
    names = ["win", "bc"]
    results: dict[str, dict[str, list[float]]] = {
        g: {n: [] for n in names} for g in GATES
    }
    cpu: dict[str, dict[str, list[float]]] = {
        g: {n: [] for n in names} for g in GATES
    }
    rows_ref: dict[str, list] = {}
    for rep in range(REPS):
        for leg in (0, 1) if rep % 2 == 0 else (1, 0):
            set_leg(leg)
            for g in GATES:
                spark.sparkContext.setJobDescription(f"dfbc:{g}:{names[leg]}:r{rep}")
                c0 = _jvm_cpu_s()
                t0 = time.perf_counter()
                rows = REGISTRY[g].fn(spark, SF).collect()
                dt = time.perf_counter() - t0
                dc = _jvm_cpu_s() - c0
                spark.catalog.clearCache()
                results[g][names[leg]].append(round(dt, 2))
                cpu[g][names[leg]].append(round(dc, 1))
                key = sorted(map(tuple, rows))
                if g in rows_ref:
                    assert key == rows_ref[g], f"{g}: rows differ on leg {names[leg]}"
                else:
                    rows_ref[g] = key
                print(
                    f"rep{rep} {names[leg]:3s} {g:18s} {dt:6.2f} s  cpu {dc:6.1f} s",
                    flush=True,
                )
    set_leg(0)  # restore the shipped binding (_PPJOIN_DF_BROADCAST_MAX = None)
    summary = {
        g: {
            leg: {
                "min": min(v),
                "samples": v,
                "cpu_med": sorted(cpu[g][leg])[len(cpu[g][leg]) // 2],
                "cpu_samples": cpu[g][leg],
            }
            for leg, v in legs.items()
        }
        for g, legs in results.items()
    }
    out = {"sf": SF, "reps": REPS, "gates": summary, "rows_identical": True}
    print(json.dumps(out, indent=1))
    with open("BENCH_DFBC_AB.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
