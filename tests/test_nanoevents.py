"""NanoEvents object API: proxy round-trips mirroring the reference's
tests/test_nanoevents.py:12-63 (crossref + genroundtrips) on the F1
synthetic fixture — no ROOT needed, same invariants.
"""

import math

import pyspark.sql.functions as F
import pytest

from coffea_spark import vector as vec
from coffea_spark.nanoevents import Collection, NanoEvents, Record
from coffea_spark.testing import events_flat_df


@pytest.fixture(scope="module")
def ne(nano):
    return NanoEvents(nano)


def test_attribute_access_matches_column(ne, nano):
    # events.Muon.pt compiles to the same values as F.col("Muon.pt")
    a = ne.df.select(ne.Muon.pt.alias("p")).collect()
    b = nano.select(F.col("Muon.pt").alias("p")).collect()
    assert a == b


def test_computed_kinematics(ne):
    # px computed per element == pt*cos(phi) (reference methods/vector.py px)
    rows = ne.df.select(
        ne.Muon.px.alias("px"), F.col("Muon.pt").alias("pt"), F.col("Muon.phi").alias("phi")
    ).collect()
    for r in rows:
        for got, pt, phi in zip(r.px, r.pt, r.phi):
            assert got == pytest.approx(pt * math.cos(phi), rel=1e-12)


def test_simple_collection_record(ne):
    # MET is a struct -> Record proxy; met.pt is the stored field
    met = ne.MET
    assert isinstance(met, Record)
    row = ne.df.select(met.pt.c.alias("metpt"), F.col("MET.pt").alias("raw")).first()
    assert row.metpt == row.raw


def test_where_mask_count(ne):
    hard = ne.Muon.where(lambda m: m.pt > 20)
    masked = ne.Muon.mask(lambda m: m.pt > 20)
    row = ne.df.select(
        ne.Muon.count.alias("n"),
        hard.count.alias("nh"),
        masked.count.alias("nm"),
        F.size(F.filter(masked.c, lambda x: x.isNotNull())).alias("nmk"),
    ).collect()
    for r in row:
        assert r.nh <= r.n
        assert r.nm == r.n  # mask preserves shape
        assert r.nmk == r.nh  # non-null masked == hard-filtered


def test_crossref_roundtrip(ne):
    """Reference crossref: Jet.matched_muons.matched_jet.pt == Jet.pt
    (tests/test_nanoevents.py:54-63) — via matched_via + matched."""
    jets, muons = ne.Jet, ne.Muon
    matched_muons = jets.matched_via(["muonIdx1", "muonIdx2"], muons)
    # each matched muon's jetIdx gathers back a jet with that jet's pt
    back = ne.df.select(
        F.flatten(
            F.transform(
                matched_muons.c,
                lambda ms: F.transform(ms, lambda m: m["jetIdx"]),
            )
        ).alias("back_idx"),
    )
    # every muon matched from a jet must carry a valid jetIdx that points
    # back to SOME jet (fixture guarantees consistency for valid links)
    nbad = back.select(
        F.size(F.filter("back_idx", lambda i: i < -1)).alias("nb")
    ).agg(F.sum("nb")).first()[0]
    assert nbad == 0

    # muon -> jet -> muon list contains the original muon's pt
    mj = muons.matched("jetIdx", jets)
    rows = ne.df.select(
        F.col("Muon.jetIdx").alias("midx"), mj.pt.alias("mjpt"), F.col("Jet.pt").alias("jpt")
    ).collect()
    for r in rows:
        for idx, got in zip(r.midx, r.mjpt):
            if 0 <= idx < len(r.jpt):
                assert got == pytest.approx(r.jpt[idx], rel=1e-12)
            else:
                assert got is None


def test_nearest_equals_matched_when_self(ne):
    """Reference: Muon.matched_jet.delta_r(Muon.nearest(Jet)) == 0 —
    the nearest jet to a muon whose FK is valid is within delta_r of the
    matched one only if they coincide; here assert nearest() returns the
    argmin of the metric_table."""
    muons, jets = ne.Muon, ne.Jet
    table = muons.metric_table(jets)
    nearest_dr = F.transform(
        muons.nearest(jets, return_metric=True).c, lambda s: s["metric"]
    )
    rows = ne.df.select(
        F.transform(table, lambda row: F.array_min(row)).alias("mins"),
        nearest_dr.alias("got"),
    ).collect()
    for r in rows:
        for a, b in zip(r.mins, r.got):
            if a is None:
                assert b is None
            else:
                assert b == pytest.approx(a, rel=1e-12)


def test_combinations_pipeline(ne):
    """Dimuon via the object API == hand-built HOF expression."""
    pairs = ne.Muon.combinations(2).where(lambda p: p.f0.charge + p.f1.charge == 0)
    api = ne.df.select(
        F.explode(pairs.map(lambda p: vec.invariant_mass(p.f0, p.f1))).alias("m")
    )
    from coffea_spark.joins import combinations

    raw = ne.df.select(
        F.explode(
            F.transform(
                F.filter(
                    combinations(F.col("Muon"), 2),
                    lambda p: p["f0"]["charge"] + p["f1"]["charge"] == 0,
                ),
                lambda p: vec.invariant_mass(p["f0"], p["f1"]),
            )
        ).alias("m")
    )
    assert sorted(r.m for r in api.collect()) == sorted(r.m for r in raw.collect())


def test_sum_and_sort(ne):
    s = ne.Muon.sum()
    row = (
        ne.filter(ne.Muon.count >= 2)
        .select(s.c.alias("sv"), F.col("Muon").alias("mu"))
        .first()
    )
    # componentwise px sum matches
    want_px = sum(m.pt * math.cos(m.phi) for m in row.mu)
    got_px = row.sv.pt * math.cos(row.sv.phi)
    assert got_px == pytest.approx(want_px, rel=1e-9)

    by_pt = ne.Muon.sort_by(lambda m: m.pt, ascending=False)
    r = ne.df.select(by_pt.pt.alias("p")).first()
    assert r.p == sorted(r.p, reverse=True)


def test_from_flat_roundtrip(spark):
    """from_flat(events_flat) reproduces the zipped fixture (reference
    test_read_nanomc round-trip analog)."""
    from coffea_spark.testing import events_nano_df

    flat = events_flat_df(spark, n_events=100)
    ne = NanoEvents.from_flat(flat)
    assert isinstance(ne.Muon, Collection)
    zipped = events_nano_df(spark, n_events=100)
    a = ne.df.select("event", ne.Muon.pt.alias("p")).orderBy("event").collect()
    b = zipped.select("event", F.col("Muon.pt").alias("p")).orderBy("event").collect()
    assert [r.p for r in a] == [r.p for r in b]


def test_event_filter_returns_nanoevents(ne):
    sub = ne.filter(ne.Muon.count >= 2)
    assert isinstance(sub, NanoEvents)
    assert sub.df.count() <= ne.df.count()
    assert sub.select(F.min(F.size("Muon"))).first()[0] >= 2


def test_schema_synthesis_and_variants(spark):
    """Derived-column synthesis (constant fills, renames, aliases) and
    variant specs (reference schemas/nanoaod.py:169-200, 467-557)."""
    from coffea_spark.schema import NanoAODSchemaSpec, ScoutingNanoAODSchema

    flat = events_flat_df(spark, n_events=50)
    # drop any existing Photon columns, inject a regressed-energy column
    flat = flat.withColumn("Photon_pt", F.col("Jet_pt")).withColumn(
        "Electron_regrEnergy", F.transform("Electron_pt", lambda x: x * 2.0)
    )
    out = NanoAODSchemaSpec.synthesize(flat)
    cols = set(out.columns)
    # constant fill synthesized with the collection's jagged shape
    assert {"Photon_mass", "Photon_charge", "Jet_charge"} <= cols
    r = out.select("Photon_pt", "Photon_mass", "Jet_pt", "Jet_charge").first()
    assert len(r.Photon_mass) == len(r.Photon_pt)
    assert all(v == 0.0 for v in r.Photon_mass)
    assert len(r.Jet_charge) == len(r.Jet_pt)
    # rename applied
    assert "Electron_energy" in cols and "Electron_regrEnergy" not in cols

    # variant dicts extend the base spec
    assert "ScoutingJet_charge" in ScoutingNanoAODSchema.full_like_items
    assert ScoutingNanoAODSchema.alias_items["MET_pt"] == "MET_fiducialGenPt"
    assert "Photon_mass" in ScoutingNanoAODSchema.full_like_items  # inherited


def test_schema_xref_attributes(spark):
    """events.Muon.matched_jet / events.Jet.matched_muons resolve via
    the schema's cross-reference metadata (reference crossref surface,
    tests/test_nanoevents.py:54-63)."""
    from coffea_spark.schema import NanoAODSchemaSpec
    from coffea_spark.testing import events_nano_df

    ne = NanoEvents(events_nano_df(spark, n_events=200), schema=NanoAODSchemaSpec)
    mj = ne.Muon.matched_jet
    assert isinstance(mj, Collection)
    rows = ne.df.select(
        F.col("Muon.jetIdx").alias("idx"), mj.pt.alias("mjpt"), F.col("Jet.pt").alias("jpt")
    ).collect()
    for r in rows:
        for i, got in zip(r.idx, r.mjpt):
            want = r.jpt[i] if 0 <= i < len(r.jpt) else None
            assert got == want

    jm = ne.Jet.matched_muons
    assert isinstance(jm, Collection)
    n = ne.df.select(F.explode(jm.c).alias("ms")).count()
    assert n > 0

    # GenPart.parent walks the mother index within the same collection
    par = ne.GenPart.parent
    rows = ne.df.select(
        F.col("GenPart.genPartIdxMother").alias("mi"), par.pdgId.alias("ppdg"),
        F.col("GenPart.pdgId").alias("pdg"),
    ).first()
    for i, got in zip(rows.mi, rows.ppdg):
        want = rows.pdg[i] if 0 <= i < len(rows.pdg) else None
        assert got == want

    # without a schema, matched_* does not resolve (falls through to field
    # access which fails at analysis; attribute building itself is lazy)
    ne2 = NanoEvents(events_nano_df(spark, n_events=5))
    col = ne2.Muon.matched_jet  # plain field access column, unresolved
    import pyspark
    try:
        ne2.df.select(col.c if isinstance(col, Collection) else col).collect()
        raise AssertionError("expected analysis failure without schema")
    except pyspark.errors.exceptions.base.AnalysisException:
        pass


def test_record_add_promoted(spark, nano):
    """Record.add_promoted: dimensional promotion through the proxy
    (reference vector.py:675-690 dispatch)."""
    from coffea_spark.nanoevents import Record

    met = Record(F.element_at(F.col("Muon"), 1), fields=["pt", "eta", "phi", "mass"])
    two = Record(
        F.element_at(F.col("Muon"), 2), fields=["pt", "phi"]
    )
    s = met.add_promoted(two)
    df = nano.filter(F.size("Muon") >= 2).select(s.c.alias("s")).limit(5)
    t = repr(df.schema["s"].dataType)
    assert "pt" in t and "phi" in t and "eta" not in t
    assert df.count() >= 0
    import pytest as _pt

    with _pt.raises(ValueError):
        Record(F.element_at(F.col("Muon"), 1)).add_promoted(two.c)
