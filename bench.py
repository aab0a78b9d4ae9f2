#!/usr/bin/env python
"""Benchmark: run every registry query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line with per-query
wall seconds."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coffea_spark.queries import REGISTRY  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="coffea-spark-bench", cpus=cpus)

    # warm the JVM/codegen path once (tiny scan, not timed)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, (name, q) in enumerate(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            # one broken query must not void the whole bench run
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
        # drop caches a query pinned (e.g. shared minhash signatures) so
        # storage memory doesn't accumulate across unrelated queries
        spark.catalog.clearCache()
        if (i + 1) % 10 == 0:
            # broadcast/shuffle state is only reclaimed by the
            # ContextCleaner on driver GC, which a large heap rarely
            # triggers on its own — nudge it so dozens of accumulated
            # broadcasts don't degrade later queries
            spark.sparkContext._jvm.System.gc()

    out = {
        "metric": "total_query_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
