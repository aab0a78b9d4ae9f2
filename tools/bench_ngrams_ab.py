"""Interleaved A/B for the r13 char_ngrams work (session 4).

Two legs, flipped in ONE process so host-noise bursts hit both legs:

- leg "old": the pre-r13 redundant outer array_distinct in
  jaccard_join / collapse verify (emulated by wrapping dedup's imported
  char_ngrams — dedup imports the symbol by name, so rebinding
  ``dedup.char_ngrams`` reproduces the pre-change plan).
- leg "dd":  double-distinct removed (the shipped spelling).

The committed BENCH_NGRAMS_AB.json also carries a third "pos" leg from
the session the A/B ran in: a split-once positional char_ngrams
respelling (codepoint array bound as a lambda variable, windows via
array_join(slice)) that was value-identical on the full corpus but
measured consistently SLOWER on all three gates — REVERTED per the
round's decision rule; the spelling lives only in that ledger and the
char_ngrams docstring.

Per rep the legs run round-robin; min-of-N per (gate, leg) is the
decision metric (the round's one-sided-noise protocol). Collected rows
are asserted identical across legs every rep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import coffea_spark.llmdata.dedup as D  # noqa: E402
import coffea_spark.llmdata.text as T  # noqa: E402
from coffea_spark.queries import REGISTRY  # noqa: E402
from coffea_spark.session import get_spark  # noqa: E402

GATES = ["jaccard_dupes", "minhash_lsh", "jaccard_collapsed"]
REPS = int(os.environ.get("AB_REPS", "4"))
SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")

_plain = T.char_ngrams


def _doubled(col, n=5):
    return F.array_distinct(_plain(col, n))


def set_leg(leg: int) -> None:
    D.char_ngrams = _doubled if leg == 0 else _plain


def main() -> None:
    spark = get_spark(app_name="ngrams-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.read.parquet(os.path.join(SF, "region.parquet")).count()
    names = ["old", "dd"]
    results: dict[str, dict[str, list[float]]] = {
        g: {n: [] for n in names} for g in GATES
    }
    rows_ref: dict[str, list] = {}
    for rep in range(REPS):
        for leg in (0, 1):
            set_leg(leg)
            for g in GATES:
                spark.sparkContext.setJobDescription(f"ab:{g}:{names[leg]}:r{rep}")
                t0 = time.perf_counter()
                rows = REGISTRY[g].fn(spark, SF).collect()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                results[g][names[leg]].append(round(dt, 2))
                key = sorted(map(tuple, rows))
                if g in rows_ref:
                    assert key == rows_ref[g], f"{g}: rows differ on leg {names[leg]}"
                else:
                    rows_ref[g] = key
                print(f"rep{rep} {names[leg]:3s} {g:18s} {dt:6.2f} s", flush=True)
    set_leg(1)  # leave the tree's real binding in place
    summary = {
        g: {leg: {"min": min(v), "samples": v} for leg, v in legs.items()}
        for g, legs in results.items()
    }
    out = {"sf": SF, "reps": REPS, "gates": summary, "rows_identical": True}
    print(json.dumps(out, indent=1))
    with open("BENCH_NGRAMS_AB.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
