"""Muon momentum-scale (Rochester) and pileup-reweighting operators.

Reference surfaces:
- lookup_tools/rochester_lookup.py — kScaleDT/kScaleMC are
  ``1 / (M(eta, phi) + charge * A(eta, phi) * pt)`` with M/A from 2-D
  (eta, phi) dense tables per type (0 = MC, 1 = DATA); kSpreadMC
  multiplies by ``x / (1 + (x - 1) * kRes_data(|eta|) / kRes_mc(|eta|))``
  with ``x = genpt / (k * pt)`` (rochester_lookup.py:88-171).
- lookup_tools/json_converters.py:105-121 (pileup profile) and the
  standard nTrueInt data/MC ratio reweight.

Both are thin compositions over :class:`coffea_spark.lookup.DenseLookup`
— binned tables compile to literal-array column math, so the correction
is part of the scan-stage expression: zero extra shuffles, zero UDFs,
broadcast-free (the table is IN the plan).

``kSmearMC`` (the no-gen-match path) needs the inverse CDF of a
double-sided crystal-ball per muon (rochester_lookup.py:173-208); it is
intentionally not implemented here — the deterministic-content-seeded
uniform from :mod:`coffea_spark.corrections` could drive it, but the
reference's doublecrystalball.ppf has no closed form (scipy is not a
dependency). Use kSpreadMC with matched gen muons instead.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column
from pyspark.sql import functions as F

from coffea_spark.lookup import DenseLookup

__all__ = ["RochesterCorrection", "PileupWeight"]

MC, DATA = 0, 1


class RochesterCorrection:
    """Rochester momentum-scale correction from dense M/A/kRes tables.

    Parameters
    ----------
    M, A : {type: DenseLookup} — 2-D (eta, phi) tables, type 0=MC 1=DATA
    k_res : {type: DenseLookup} — 1-D |eta| resolution tables
    """

    def __init__(
        self,
        M: dict[int, DenseLookup],
        A: dict[int, DenseLookup],
        k_res: dict[int, DenseLookup] | None = None,
    ):
        self.M = M
        self.A = A
        self.k_res = k_res or {}

    @classmethod
    def from_tables(cls, eta_edges, phi_edges, M_mc, M_data, A_mc, A_data,
                    res_eta_edges=None, k_res_mc=None, k_res_data=None):
        """Build from plain nested lists / arrays (the wrapped_values
        layout the reference's converter produces, one set/member)."""
        bins2 = [np.asarray(eta_edges, float), np.asarray(phi_edges, float)]
        M = {MC: DenseLookup(np.asarray(M_mc, float), bins2),
             DATA: DenseLookup(np.asarray(M_data, float), bins2)}
        A = {MC: DenseLookup(np.asarray(A_mc, float), bins2),
             DATA: DenseLookup(np.asarray(A_data, float), bins2)}
        k_res = {}
        if res_eta_edges is not None:
            bins1 = [np.asarray(res_eta_edges, float)]
            k_res = {MC: DenseLookup(np.asarray(k_res_mc, float), bins1),
                     DATA: DenseLookup(np.asarray(k_res_data, float), bins1)}
        return cls(M, A, k_res)

    def _k_scale(self, t: int, charge: Column, pt: Column, eta: Column, phi: Column) -> Column:
        m = self.M[t](eta, phi)
        a = self.A[t](eta, phi)
        return F.lit(1.0) / (m + charge * a * pt)

    def k_scale_dt(self, charge, pt, eta, phi) -> Column:
        """Data momentum-scale correction (kScaleDT)."""
        return self._k_scale(DATA, charge, pt, eta, phi)

    def k_scale_mc(self, charge, pt, eta, phi) -> Column:
        """MC momentum-scale correction (kScaleMC — prefer kSpreadMC)."""
        return self._k_scale(MC, charge, pt, eta, phi)

    def k_spread_mc(self, charge, pt, eta, phi, genpt) -> Column:
        """MC correction with matched gen pt (kSpreadMC):
        k * x / (1 + (x-1) * kRes_data/kRes_mc), x = genpt/(k*pt)."""
        if not self.k_res:
            raise ValueError("kSpreadMC needs k_res tables")
        k = self.k_scale_mc(charge, pt, eta, phi)
        abseta = F.abs(eta)
        k_data = self.k_res[DATA](abseta)
        k_mc = self.k_res[MC](abseta)
        x = genpt / (k * pt)
        return k * (x / (F.lit(1.0) + (x - F.lit(1.0)) * k_data / k_mc))


class PileupWeight:
    """nTrueInt reweight: w = data_profile[bin] / mc_profile[bin], both
    profiles normalized to unit area (the standard pileup correction the
    reference expresses through its lookup machinery)."""

    def __init__(self, data_counts, mc_counts, edges):
        data = np.asarray(data_counts, float)
        mc = np.asarray(mc_counts, float)
        if data.shape != mc.shape:
            raise ValueError("data/mc profiles must share binning")
        data = data / data.sum()
        mc = mc / mc.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(mc > 0, data / np.where(mc > 0, mc, 1.0), 0.0)
        self.lookup = DenseLookup(ratio, [np.asarray(edges, float)])

    def __call__(self, n_true_int: Column) -> Column:
        return self.lookup(n_true_int)
