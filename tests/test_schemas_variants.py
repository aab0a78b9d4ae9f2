"""Experiment schema-variant rewriters (reference nanoevents/schemas/:
physlite.py, delphes.py, treemaker.py, edm4hep.py, fcc.py, pdune.py,
auto.py — invariants mirror tests/test_nanoevents_physlite.py,
test_nanoevents_delphes.py, test_nanoevents_treemaker.py,
test_nanoevents_edm4hep.py in the reference)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from coffea_spark.schemas_variants import (
    DelphesSchemaSpec,
    EDM4HEPSchemaSpec,
    FCCSchemaSpec,
    PDUNESchemaSpec,
    PHYSLITESchemaSpec,
    TreeMakerSchemaSpec,
    auto_mixins,
    detect_schema,
    gather_range,
    nest_by_counts,
    resolve_element_links,
    resolve_objectid,
)


# ---------------------------------------------------------------------------
# PHYSLITE
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def physlite_df(spark):
    rows = [
        Row(
            eventNumber=1,
            **{
                "AnalysisElectronsAuxDyn.pt": [10.0, 20.0],
                "AnalysisElectronsAuxDyn.eta": [0.5, -1.0],
                "AnalysisElectronsAuxDyn.trackParticleLinks.m_persKey": [[7], [7, 7]],
                "AnalysisElectronsAuxDyn.trackParticleLinks.m_persIndex": [[0], [1, 2]],
                "AnalysisMuonsAuxDyn.pt": [30.0],
                "AnalysisMuonsAuxDyn.eta": [1.5],
                "GSFTrackParticlesAuxDyn.qOverP": [0.01, -0.02, 0.05],
                "GSFTrackParticlesAuxDyn.theta": [1.0, 2.0, 0.5],
                "PrimaryVerticesAuxDyn.z": [0.1, 0.2],
            },
        ),
        Row(
            eventNumber=2,
            **{
                "AnalysisElectronsAuxDyn.pt": [5.0],
                "AnalysisElectronsAuxDyn.eta": [2.0],
                "AnalysisElectronsAuxDyn.trackParticleLinks.m_persKey": [[7]],
                "AnalysisElectronsAuxDyn.trackParticleLinks.m_persIndex": [[-1]],
                "AnalysisMuonsAuxDyn.pt": [],
                "AnalysisMuonsAuxDyn.eta": [],
                "GSFTrackParticlesAuxDyn.qOverP": [0.1],
                "GSFTrackParticlesAuxDyn.theta": [0.25],
                "PrimaryVerticesAuxDyn.z": [],
            },
        ),
    ]
    return spark.createDataFrame(rows)


def test_physlite_collections_and_names(physlite_df):
    events = PHYSLITESchemaSpec.apply(physlite_df)
    cols = set(events.columns)
    assert {"Electrons", "Muons", "GSFTrackParticles", "PrimaryVertices",
            "eventNumber"} <= cols
    assert not any("AuxDyn" in c for c in cols)


def test_physlite_trackparticle_derivations(physlite_df):
    events = PHYSLITESchemaSpec.apply(physlite_df)
    row = events.orderBy("eventNumber").select("GSFTrackParticles").first()
    tps = row[0]
    # p = 1/|qOverP|, pt = sin(theta)/|qOverP| (physlite.py:156-162)
    assert tps[0]["p"] == pytest.approx(100.0)
    assert tps[1]["p"] == pytest.approx(50.0)
    assert tps[0]["pt"] == pytest.approx(math.sin(1.0) * 100.0)
    assert tps[2]["tau"] == pytest.approx(139.570)


def test_physlite_muon_mass_fill(physlite_df):
    events = PHYSLITESchemaSpec.apply(physlite_df)
    mu = events.orderBy("eventNumber").select("Muons").first()[0]
    assert mu[0]["m"] == pytest.approx(105.658)


def test_physlite_elementlink_perskey_dispatch(physlite_df, spark):
    """m_persKey routes each link to its target container."""
    events = PHYSLITESchemaSpec.apply(physlite_df)
    other = F.transform(
        F.col("GSFTrackParticles"), lambda t: t.withField("qOverP", t["qOverP"] * 100.0)
    )
    resolved = events.select(
        "eventNumber",
        resolve_element_links(
            F.col("Electrons"),
            "trackParticleLinks",
            {7: F.col("GSFTrackParticles"), 8: other},
        ).alias("tracks"),
    ).orderBy("eventNumber").first()
    # fixture links all carry persKey 7 -> plain target values
    assert resolved["tracks"][0][0]["qOverP"] == pytest.approx(0.01)


def test_physlite_elementlink_resolution(physlite_df):
    events = PHYSLITESchemaSpec.apply(physlite_df)
    resolved = events.select(
        "eventNumber",
        resolve_element_links(
            F.col("Electrons"), "trackParticleLinks", F.col("GSFTrackParticles")
        ).alias("tracks"),
    ).orderBy("eventNumber").collect()
    ev1 = resolved[0]["tracks"]
    assert ev1[0][0]["qOverP"] == pytest.approx(0.01)
    assert [t["qOverP"] for t in ev1[1]] == pytest.approx([-0.02, 0.05])
    # -1 index -> NULL (mask semantics, transforms.py:129-142)
    assert resolved[1]["tracks"][0][0] is None


# ---------------------------------------------------------------------------
# Delphes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def delphes_df(spark):
    rows = [
        Row(
            **{
                "Muon/Muon.PT": [15.0, 25.0],
                "Muon/Muon.Eta": [0.1, 0.2],
                "Muon/Muon.Phi": [1.0, -1.0],
                "Muon_size": 2,
                "Jet/Jet.PT": [50.0],
                "Jet/Jet.Eta": [1.1],
                "Jet/Jet.Phi": [2.0],
                "Jet/Jet.Mass": [8.0],
                "Jet_size": 1,
                "MissingET/MissingET.MET": [42.0],
                "MissingET/MissingET.Eta": [0.5],
                "MissingET/MissingET.Phi": [0.25],
                "MissingET_size": 1,
            }
        ),
        Row(
            **{
                "Muon/Muon.PT": [],
                "Muon/Muon.Eta": [],
                "Muon/Muon.Phi": [],
                "Muon_size": 0,
                "Jet/Jet.PT": [60.0, 70.0],
                "Jet/Jet.Eta": [-1.0, 0.0],
                "Jet/Jet.Phi": [0.0, 3.0],
                "Jet/Jet.Mass": [10.0, 12.0],
                "Jet_size": 2,
                "MissingET/MissingET.MET": [17.0],
                "MissingET/MissingET.Eta": [-0.5],
                "MissingET/MissingET.Phi": [1.5],
                "MissingET_size": 1,
            }
        ),
    ]
    return spark.createDataFrame(rows)


def test_delphes_aliases_and_mass_fill(delphes_df):
    events = DelphesSchemaSpec.apply(delphes_df)
    assert {"Muon", "Jet", "MissingET"} <= set(events.columns)
    assert "Muon_size" not in events.columns
    first = events.orderBy(F.size("Muon").desc()).first()
    mu = first["Muon"]
    assert mu[0]["pt"] == pytest.approx(15.0)
    assert mu[0]["mass"] == 0.0  # massless fill (delphes.py:319-321)
    jet = first["Jet"]
    assert jet[0]["mass"] == pytest.approx(8.0)


def test_delphes_singleton_flatten_and_rho(delphes_df):
    events = DelphesSchemaSpec.apply(delphes_df)
    # MissingET is flattened from length-1 vector to a struct
    met = events.select("MissingET.MET", "MissingET.rho", "MissingET.eta").collect()
    by_met = {r["MET"]: r for r in met}
    assert by_met[42.0]["rho"] == pytest.approx(42.0 / math.cosh(0.5))
    assert by_met[17.0]["eta"] == pytest.approx(-0.5)


# ---------------------------------------------------------------------------
# TreeMaker
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def treemaker_df(spark):
    rows = [
        Row(
            **{
                "Jets/Jets.fCoordinates.fPt": [100.0, 50.0],
                "Jets/Jets.fCoordinates.fEta": [0.0, 1.0],
                "Jets/Jets.fCoordinates.fPhi": [0.5, -0.5],
                "Jets/Jets.fCoordinates.fE": [110.0, 80.0],
                "Jets_jecFactor": [1.05, 0.98],
                "Jets_subjetsCounts": [2, 1],
                "Jets_subjets/Jets_subjets.fCoordinates.fPt": [40.0, 35.0, 20.0],
                "Jets_subjets/Jets_subjets.fCoordinates.fEta": [0.1, 0.2, 0.9],
                "Jets_subjets/Jets_subjets.fCoordinates.fPhi": [0.4, 0.6, -0.4],
                "Jets_subjets/Jets_subjets.fCoordinates.fE": [45.0, 40.0, 30.0],
                "PrimaryVertices/PrimaryVertices.fCoordinates.fX": [0.01],
                "PrimaryVertices/PrimaryVertices.fCoordinates.fY": [0.02],
                "PrimaryVertices/PrimaryVertices.fCoordinates.fZ": [1.5],
                "MET": 75.0,
            }
        ),
    ]
    return spark.createDataFrame(rows)


def test_treemaker_composite_and_merge(treemaker_df):
    events = TreeMakerSchemaSpec.apply(treemaker_df)
    row = events.first()
    jets = row["Jets"]
    assert jets[0]["pt"] == pytest.approx(100.0)
    assert jets[0]["energy"] == pytest.approx(110.0)
    assert jets[1]["jecFactor"] == pytest.approx(0.98)
    pv = row["PrimaryVertices"]
    assert pv[0]["z"] == pytest.approx(1.5)
    assert row["MET"] == pytest.approx(75.0)


def test_treemaker_nested_subjets(treemaker_df):
    events = TreeMakerSchemaSpec.apply(treemaker_df)
    jets = events.first()["Jets"]
    assert [len(j["subjets"]) for j in jets] == [2, 1]
    assert jets[0]["subjets"][1]["pt"] == pytest.approx(35.0)
    assert jets[1]["subjets"][0]["pt"] == pytest.approx(20.0)


def test_nest_by_counts_empty(spark):
    df = spark.createDataFrame(
        [Row(inner=[1, 2, 3], counts=[0, 2, 0, 1]), Row(inner=[], counts=[])]
    )
    out = df.select(
        nest_by_counts(F.col("inner"), F.col("counts")).alias("nested")
    ).collect()
    assert [list(x) for x in out[0]["nested"]] == [[], [1, 2], [], [3]]
    assert list(out[1]["nested"]) == []


# ---------------------------------------------------------------------------
# EDM4HEP / FCC
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fcc_df(spark):
    rows = [
        Row(
            **{
                "ReconstructedParticles/ReconstructedParticles.energy": [10.0, 20.0, 30.0],
                "ReconstructedParticles/ReconstructedParticles.momentum.x": [1.0, 2.0, 3.0],
                "ReconstructedParticles/ReconstructedParticles.momentum.y": [0.0, 0.5, 1.0],
                "ReconstructedParticles/ReconstructedParticles.momentum.z": [5.0, 6.0, 7.0],
                "Muon#0/Muon#0.index": [2, 0],
                "Muon#0/Muon#0.collectionID": [13, 13],
                "Jet/Jet.energy": [55.0],
                "Jet/Jet.particles_begin": [0],
                "Jet/Jet.particles_end": [3],
            }
        ),
    ]
    return spark.createDataFrame(rows)


def test_fcc_members_and_momentum_alias(fcc_df):
    events = FCCSchemaSpec.apply(fcc_df)
    rp = events.first()["ReconstructedParticles"]
    assert rp[1]["px"] == pytest.approx(2.0)
    assert rp[2]["E"] == pytest.approx(30.0)


def test_fcc_objectid_resolution(fcc_df):
    events = FCCSchemaSpec.apply(fcc_df)
    assert "Muon_idx0" in events.columns
    resolved = events.select(
        resolve_objectid(
            F.col("Muon_idx0"), {13: F.col("ReconstructedParticles")}
        ).alias("muons")
    ).first()["muons"]
    assert resolved[0]["E"] == pytest.approx(30.0)
    assert resolved[1]["E"] == pytest.approx(10.0)


def test_fcc_range_gather(fcc_df):
    events = EDM4HEPSchemaSpec.apply(fcc_df)
    jets = events.select(
        F.transform(
            F.col("Jet"),
            lambda j: F.struct(j["E"].alias("E"), j["particles"].alias("r")),
        ).alias("Jet"),
        gather_range(
            F.col("ReconstructedParticles"),
            F.col("Jet.particles.begin"),
            F.col("Jet.particles.end"),
        ).alias("constituents"),
    ).first()
    assert [c["E"] for c in jets["constituents"][0]] == pytest.approx([10.0, 20.0, 30.0])


# ---------------------------------------------------------------------------
# PDune
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pdune_df(spark):
    rows = [
        Row(
            **{
                "reco_beam_startX": 1.0,
                "reco_beam_startY": 2.0,
                "reco_beam_startZ": 2.0,
                "reco_beam_len": 12.5,
                "reco_daughter_allTrack_startX": [0.0, 1.0],
                "reco_daughter_allTrack_startY": [3.0, 4.0],
                "reco_daughter_allTrack_startZ": [4.0, 8.0],
                "reco_daughter_allTrack_len": [5.0, 6.0],
            }
        ),
    ]
    return spark.createDataFrame(rows)


def test_pdune_hierarchy(pdune_df):
    events = PDUNESchemaSpec.apply(pdune_df)
    row = events.first()
    beam = row["RecoBeam"]
    assert beam["start3D"]["x"] == pytest.approx(1.0)
    assert beam["len"] == pytest.approx(12.5)
    tracks = row["Tracks"]
    assert tracks[1]["start3D"]["z"] == pytest.approx(8.0)
    assert tracks[0]["len"] == pytest.approx(5.0)


# ---------------------------------------------------------------------------
# auto detection
# ---------------------------------------------------------------------------

def test_auto_mixins(spark):
    df = spark.createDataFrame(
        [
            Row(
                ele_pt=[1.0], ele_eta=[0.0], ele_phi=[0.0], ele_mass=[0.0],
                ele_charge=[1.0], trk_d0=[0.1], trk_z0=[0.2],
            )
        ]
    )
    mix = auto_mixins(df)
    assert mix["ele"] == "PtEtaPhiMCandidate"
    assert mix["trk"] == "NanoCollection"


def test_nanoevents_from_variant(physlite_df, fcc_df):
    from coffea_spark.nanoevents import NanoEvents

    ev = NanoEvents.from_variant(physlite_df)
    assert "Electrons" in ev.df.columns
    # proxy access works on the rewritten collections
    total = ev.df.select(
        F.sum(F.aggregate(ev.Electrons.pt, F.lit(0.0), lambda s, x: s + x)).alias("s")
    ).first()["s"]
    assert total == pytest.approx(35.0)
    ev2 = NanoEvents.from_variant(fcc_df)
    assert "Muon_idx0" in ev2.df.columns


def test_detect_schema(physlite_df, delphes_df, treemaker_df, fcc_df, pdune_df):
    assert detect_schema(physlite_df) == "physlite"
    assert detect_schema(delphes_df) == "delphes"
    assert detect_schema(treemaker_df) == "treemaker"
    assert detect_schema(fcc_df) == "edm4hep"
    assert detect_schema(pdune_df) == "pdune"
    assert detect_schema(["nMuon", "Muon_pt", "Muon_eta"]) == "nanoaod"
    assert detect_schema(["ele_pt", "ele_eta"]) == "auto"
