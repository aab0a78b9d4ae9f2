"""Reference-shaped end-to-end pipelines.

``dimuon_analysis`` reproduces the reference's canonical test processor
(processor/test_items/NanoEventsProcessor.py:25-90): opposite-charge
dimuon selection -> invariant-mass & pt histograms + cutflow — the "Q1"
workload of BASELINE.md. The whole pipeline is Catalyst expressions:
one scan, a handful of array HOFs per row, and two tiny histogram
shuffles. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coffea_spark import vector as vec
from coffea_spark.hist import hist1d
from coffea_spark.nanoevents import NanoEvents
from coffea_spark.selection import PackedSelection


def dimuon_analysis(
    events: DataFrame,
    mass_bins: int = 30000,
    mass_lo: float = 0.25,
    mass_hi: float = 300.0,
    pt_bins: int = 30000,
    pt_lo: float = 0.24,
    pt_hi: float = 300.0,
) -> dict:
    """Run the dimuon workload; returns dict of result DataFrames.

    Steps (reference NanoEventsProcessor.process):
    1. cut: >= 2 muons
    2. all opposite-charge muon pairs (combinations)
    3. invariant mass per pair -> 1-D histogram
    4. muon pt -> 1-D histogram
    5. cutflow over the named cuts

    Written through the NanoEvents object API (``ne.Muon``,
    ``.combinations``, ``.where``) — the proxies compile to the exact
    Column expressions the hand-built version used, so the plan is
    unchanged: one scan, per-row HOFs, two bucket-id shuffles.
    """
    ne = NanoEvents(events)
    muons = ne.Muon
    os_pairs = muons.combinations(2).where(lambda p: p.f0.charge + p.f1.charge == 0)
    with_pairs = ne.with_column("_os_pairs", os_pairs)

    sel = PackedSelection()
    sel.add("two_muons", muons.count >= 2)
    sel.add("os_pair", F.size("_os_pairs") >= 1)

    selected = with_pairs.filter(sel.all("two_muons"))

    masses = selected.select(
        F.explode(
            selected._os_pairs.map(lambda p: vec.invariant_mass(p.f0, p.f1))
        ).alias("mass")
    )
    mass_hist = hist1d(masses, "mass", mass_bins, mass_lo, mass_hi)

    pts = events.select(F.explode(muons.pt).alias("pt"))
    pt_hist = hist1d(pts, "pt", pt_bins, pt_lo, pt_hi)

    cutflow = sel.cutflow(with_pairs.df)
    return {"mass_hist": mass_hist, "pt_hist": pt_hist, "cutflow": cutflow}
