"""Milestone-0 flagship: dimuon pipeline vs numpy oracle
(reference: processor/test_items/NanoEventsProcessor.py:25-90)."""

import math

import numpy as np

from coffea_spark.hist import Hist1D
from coffea_spark.pipelines import dimuon_analysis


def _mass(a, b):
    def cart(m):
        px = m["pt"] * math.cos(m["phi"])
        py = m["pt"] * math.sin(m["phi"])
        pz = m["pt"] * math.sinh(m["eta"])
        e = math.sqrt(m["mass"] ** 2 + m["pt"] ** 2 * math.cosh(m["eta"]) ** 2)
        return px, py, pz, e

    ax, ay, az, ae = cart(a)
    bx, by, bz, be = cart(b)
    m2 = (ae + be) ** 2 - (ax + bx) ** 2 - (ay + by) ** 2 - (az + bz) ** 2
    return math.sqrt(max(m2, 0.0))


def test_dimuon_pipeline(spark, nano, nano_rows):
    nbins = 300  # coarser than prod (30000) to keep the test light
    out = dimuon_analysis(nano, mass_bins=nbins, pt_bins=nbins)

    # numpy oracle
    oracle_masses = []
    n_two = n_os = 0
    for ref in nano_rows:
        mus = ref["Muon"]
        pairs = [
            (mus[i], mus[j])
            for i in range(len(mus))
            for j in range(i + 1, len(mus))
            if mus[i]["charge"] + mus[j]["charge"] == 0
        ]
        if len(mus) >= 2:
            n_two += 1
            oracle_masses.extend(_mass(a, b) for a, b in pairs)
        if pairs:
            n_os += 1

    cf = out["cutflow"]
    assert cf.initial == len(nano_rows)
    assert cf.nevcutflow == [n_two, n_os]

    h = Hist1D.from_df(out["mass_hist"], nbins, 0.25, 300.0)
    om = np.array(oracle_masses)
    inr = (om >= 0.25) & (om < 300.0)
    expected, _ = np.histogram(om[inr], bins=nbins, range=(0.25, 300.0))
    assert np.allclose(h.values, expected)
    assert int(h.sumw.sum()) == len(om)

    hpt = Hist1D.from_df(out["pt_hist"], nbins, 0.24, 300.0)
    all_pts = [m["pt"] for ref in nano_rows for m in ref["Muon"]]
    assert int(hpt.sumw.sum()) == len(all_pts)
