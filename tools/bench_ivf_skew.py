#!/usr/bin/env python
"""IVF dominant-cell rehearsal (r10, BENCH_SKEW.md addendum): gate
config (L=16, p=4) vs production (L=sqrt(n), p=L/16) on uniform vs
20%-hot-ball embeddings. Measures serve wall, recall@5 against the
blocked exact truth, and list-size imbalance (max/mean).

Usage:
    python tools/gen_scale_data.py 1 /tmp/scale/sf1 --only=embeddings
    python tools/gen_scale_data.py 1 /tmp/scale/sf1-skew --only=embeddings --skew
    python tools/bench_ivf_skew.py /tmp/scale/sf1 /tmp/scale/sf1-skew
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coffea_spark.llmdata.similarity import (  # noqa: E402
    exact_topk_join,
    ivf_assign_table,
    ivf_probe_join,
    ivf_refine_oversized,
    ivf_train,
)
from coffea_spark.queries import _planted_queries  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402


def main() -> None:
    uni, skew = sys.argv[1:3] if len(sys.argv) >= 3 else (
        "/tmp/scale/sf1", "/tmp/scale/sf1-skew")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(app_name="coffea-spark-ivf-skew", cpus=cpus)
    out = {}
    for tag, d in (("uniform", uni), ("skew", skew)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        q = _planted_queries(emb).persist()
        nq = q.count()
        truth = (
            exact_topk_join(q, emb, k=1)
            .select("qid", F.col("vec_id").alias("top1_id"))
            .persist()
        )
        truth.count()
        prod_l = int(n ** 0.5)
        for cfg, lists, probes, guard in (
            ("gate", 16, 4, False),
            ("gate+g", 16, 4, True),
            ("prod", prod_l, max(4, prod_l // 16), False),
            ("prod+g", prod_l, max(4, prod_l // 16), True),
        ):
            cents = ivf_train(emb.sample(0.25, seed=1), n_lists=lists, seed=42)
            if guard:
                # r11 dominant-cell guard: re-cluster any list over 2x the
                # mean into finer cells (the q_ivf_recall gate posture)
                t0 = time.perf_counter()
                cents = ivf_refine_oversized(
                    emb, cents, math.ceil(2 * n / lists)
                )
                print(
                    f"  guard: {lists} -> {cents.shape[0]} cells "
                    f"({time.perf_counter() - t0:.1f}s refine)"
                )
            asg = ivf_assign_table(emb, cents).persist()
            asg.count()
            sizes = asg.groupBy("_list").count().agg(
                F.max("count").alias("mx"), F.avg("count").alias("av")
            ).first()
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                ivf_probe_join(q, asg, cents, k=5, n_probe=probes).count()
                walls.append(time.perf_counter() - t0)
            served = ivf_probe_join(q, asg, cents, k=5, n_probe=probes)
            hit = truth.join(
                served,
                (truth.qid == served.qid) & (truth.top1_id == served.vec_id),
                "left_semi",
            ).count()
            asg.unpersist()
            out[(tag, cfg)] = min(walls)
            print(
                f"{tag:8s} {cfg:5s} L={lists:3d} p={probes:2d} "
                f"wall={min(walls):7.2f}s recall={hit / nq:.4f} "
                f"max/mean list size={sizes.mx / sizes.av:.1f}"
            )
        truth.unpersist()
        q.unpersist()
    print(
        "skew self-penalty: "
        + "  ".join(
            f"{c} {out[('skew', c)] / out[('uniform', c)]:.2f}x"
            for c in ("gate", "gate+g", "prod", "prod+g")
        )
    )


if __name__ == "__main__":
    main()
