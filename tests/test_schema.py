"""Schema zipping: flat branches -> array<struct> collections and back.

Reference behavior mirrored: NanoAODSchema._build_collections
(nanoevents/schemas/nanoaod.py:255-408) and zip_forms (schemas/base.py:24-80).
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from coffea_spark.schema import (
    collection_fields,
    infer_collection_groups,
    unzip_collection,
    zip_collections,
)
from coffea_spark.testing import events_flat_df, events_nano_df


def test_infer_groups(spark):
    flat = events_flat_df(spark, n_events=50)
    groups = infer_collection_groups(flat)
    assert "Muon" in groups and "Jet" in groups and "MET" in groups
    assert "Muon_pt" in groups["Muon"]
    # singletons are not grouped
    assert "run" not in groups


def test_zip_jagged_roundtrip(spark):
    flat = events_flat_df(spark, n_events=100)
    zipped = zip_collections(flat)
    # jagged collection became array<struct>
    mt = zipped.schema["Muon"].dataType
    assert isinstance(mt, T.ArrayType) and isinstance(mt.elementType, T.StructType)
    assert set(collection_fields(zipped, "Muon")) >= {"pt", "eta", "phi", "mass", "charge"}
    # simple collection became struct
    assert isinstance(zipped.schema["MET"].dataType, T.StructType)
    # count columns dropped, singleton passthrough kept
    assert "nMuon" not in zipped.columns and "run" in zipped.columns
    # counts are preserved: size(Muon) == original nMuon
    joined = zipped.select("event", F.size("Muon").alias("sz")).join(
        flat.select("event", "nMuon"), "event"
    )
    assert joined.filter(F.col("sz") != F.col("nMuon")).count() == 0
    # values preserved
    a = zipped.select("event", F.col("Muon.pt").alias("pts")).orderBy("event").collect()
    b = flat.select("event", F.col("Muon_pt").alias("pts")).orderBy("event").collect()
    for ra, rb in zip(a, b):
        assert list(ra.pts or []) == list(rb.pts or [])


def test_zip_matches_native(spark):
    """Zipping the flat layout reproduces the natively-nested fixture."""
    native = events_nano_df(spark, n_events=50)
    zipped = zip_collections(events_flat_df(spark, n_events=50))
    na = native.select("event", F.col("Muon.pt").alias("p")).orderBy("event").collect()
    zb = zipped.select("event", F.col("Muon.pt").alias("p")).orderBy("event").collect()
    for ra, rb in zip(na, zb):
        assert list(ra.p or []) == list(rb.p or [])


def test_unzip(spark):
    native = events_nano_df(spark, n_events=50)
    flat = unzip_collection(native, "Muon")
    assert "Muon_pt" in flat.columns and "nMuon" in flat.columns
    assert "Muon" not in flat.columns
    row = flat.select(F.sum(F.col("nMuon")).alias("s")).collect()[0]
    row2 = native.select(F.sum(F.size("Muon")).alias("s")).collect()[0]
    assert row.s == row2.s


def test_pad_none(spark):
    """ak.pad_none semantics: nulls appended to n, clip truncates, and
    the element type (incl. structs) is preserved."""
    import pyspark.sql.functions as F

    from coffea_spark.schema import pad_none

    df = spark.createDataFrame(
        [([1.0], 1), ([1.0, 2.0, 3.0], 2), ([], 3)], "a array<double>, id int"
    )
    rows = {
        r.id: (r.p, r.c)
        for r in df.select(
            "id",
            pad_none(F.col("a"), 2).alias("p"),
            pad_none(F.col("a"), 2, clip=True).alias("c"),
        ).collect()
    }
    assert rows[1] == ([1.0, None], [1.0, None])
    assert rows[2] == ([1.0, 2.0, 3.0], [1.0, 2.0])
    assert rows[3] == ([None, None], [None, None])

    # struct elements survive (the ak.firsts leading-object idiom)
    sdf = spark.createDataFrame(
        [([(30.0, 1)],), ([],)], "mu array<struct<pt:double,q:int>>"
    )
    got = sdf.select(
        F.element_at(pad_none(F.col("mu"), 2), 1)["pt"].alias("lead_pt")
    ).collect()
    assert [r.lead_pt for r in got] == [30.0, None]


def test_preloaded_df_roundtrip(spark):
    """preloaded_df: in-memory columnar arrays -> DataFrame, value- and
    schema-faithful, and usable as the small side of a broadcast join."""
    import numpy as np

    from pyspark.sql import functions as F

    from coffea_spark.testing import preloaded_df

    pre = preloaded_df(
        spark,
        {
            "k": np.arange(5, dtype=np.int64),
            "name": ["a", "b", "c", "d", "e"],
            "scale": np.linspace(0.0, 1.0, 5),
        },
    )
    rows = {r.k: (r.name, r.scale) for r in pre.collect()}
    assert rows[3] == ("d", 0.75)
    assert len(rows) == 5
    fact = spark.createDataFrame([(i % 5, float(i)) for i in range(100)], "k long, v double")
    joined = fact.join(F.broadcast(pre), "k").agg(F.sum(F.col("v") * F.col("scale")).alias("s"))
    expect = sum((i % 5) / 4.0 * i for i in range(100))
    assert abs(joined.collect()[0].s - expect) < 1e-9
