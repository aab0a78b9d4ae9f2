"""Dataset discovery / fileset preprocess / splitting (reference
dataset_tools/preprocess.py:1148, splitting.py:163; Rucio/DAS catalog
queries stay out of scope — discovery is filesystem-native)."""

import os

import pytest

from coffea_spark.dataset_tools import (
    discover_fileset,
    missing_files,
    preprocess,
    split_fileset,
)

SF = "/root/testdata/sf0.001"
SAMPLES = "/root/reference/tests/samples"


def test_discover_and_preprocess_parquet(spark):
    fs = discover_fileset(
        {"tpch": f"{SF}/*.parquet"}, metadata={"tpch": {"era": "sf0.001"}}
    )
    assert len(fs["tpch"]["files"]) >= 9
    assert fs["tpch"]["metadata"] == {"era": "sf0.001"}
    avail, upd = preprocess(fs, step_size=500, spark=spark)
    import duckdb

    con = duckdb.connect()
    for path, meta in avail["tpch"]["files"].items():
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        assert meta["num_entries"] == n
        assert meta["format"] == "parquet"
        assert meta["steps"][0][0] == 0 and meta["steps"][-1][1] == n
        assert sum(b - a for a, b in meta["steps"]) == n
        assert all(b - a <= 500 for a, b in meta["steps"])
        assert meta["uuid"]


@pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference fixtures not available"
)
def test_preprocess_root_align_clusters():
    fs = discover_fileset({"dy": f"{SAMPLES}/nano_dimuon.root"})
    avail, upd = preprocess(fs, step_size=16, align_clusters=True)
    meta = next(iter(avail["dy"]["files"].values()))
    assert meta["num_entries"] == 40
    assert meta["object_path"] == "Events"
    assert meta["format"] == "root"
    assert meta["steps"][0][0] == 0 and meta["steps"][-1][1] == 40
    assert sum(b - a for a, b in meta["steps"]) == 40


def test_skip_bad_files_and_missing():
    fs = discover_fileset({"d": [f"{SF}/lineitem.parquet", "/nonexistent.parquet"]})
    with pytest.raises(Exception):
        preprocess(fs)
    avail, upd = preprocess(fs, skip_bad_files=True)
    assert len(avail["d"]["files"]) == 1
    assert upd["d"]["files"]["/nonexistent.parquet"] is None
    assert missing_files(upd, avail) == {"d": ["/nonexistent.parquet"]}


def test_split_fileset_round_robin():
    fs = discover_fileset({"a": f"{SF}/*.parquet"})
    nfiles = len(fs["a"]["files"])
    parts = split_fileset(fs, 3)
    assert len(parts) == 3
    got = [p for part in parts for p in part["a"]["files"]]
    assert sorted(got) == sorted(fs["a"]["files"])
    sizes = [len(part["a"]["files"]) for part in parts]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == nfiles
    with pytest.raises(ValueError):
        split_fileset(fs, 0)


def test_read_fileset_mixed_formats(spark):
    from coffea_spark.dataset_tools import read_fileset

    fs = discover_fileset(
        {
            "orders": f"{SF}/orders.parquet",
            "lineitem": f"{SF}/lineitem.parquet",
        }
    )
    avail, _ = preprocess(fs)
    dfs = read_fileset(spark, avail)
    assert set(dfs) == {"orders", "lineitem"}
    meta = next(iter(avail["orders"]["files"].values()))
    assert dfs["orders"].count() == meta["num_entries"]
    assert dfs["orders"].select("dataset").first()[0] == "orders"


@pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference fixtures not available"
)
def test_read_fileset_root(spark):
    from pyspark.sql import functions as F

    from coffea_spark.dataset_tools import read_fileset

    fs = discover_fileset({"dy": f"{SAMPLES}/nano_dimuon.root"})
    avail, _ = preprocess(fs)
    dfs = read_fileset(spark, avail, columns=["run", "nMuon"])
    df = dfs["dy"]
    assert df.count() == 40
    assert df.agg(F.sum("nMuon")).first()[0] == 84
