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
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def read_rochester_txt(path: str, loaduncs: bool = True) -> "RochesterFile":
    """Parse a real RoccoR*.txt[.gz] payload (the public CMS Rochester
    muon-correction format; reference txt_converters.py:536-760
    ``convert_rochester_file``). Header lines declare the set/member
    layout (NSET/NMEM/TVAR) and binnings (CPHI/CETA for the scale
    tables, RETA for the resolution tables); body lines are
    ``SET MEMBER TAG [indices] [values]`` with tag C carrying the
    per-(type, eta, phi) M/A scale parameters (M = 1 + 0.01x,
    A = 0.01x) and tag F the per-(type, |eta|) kRes values. Tags T/R
    (the kSmearMC crystal-ball machinery) are parsed past — kSmearMC
    stays out of scope here as documented in the module docstring.

    With ``loaduncs`` every set/member is kept (RoccoR2018: 6 sets,
    members [1,100,1,1,1,1] — the stat replicas + systematic variants
    that define kScaleDTerror); otherwise only set 0.
    """
    import gzip as _gzip

    with open(path, "rb") as probe:
        magic = probe.read(2)
    opener = _gzip.open if magic == b"\x1f\x8b" else open
    nsets = nphi = neta = nabseta = None
    members: list[int] = []
    etaedges: list[float] = []
    absetaedges: list[float] = []
    M: dict = {}
    A: dict = {}
    kres: dict = {}
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            key = parts[0]
            if key == "NSET":
                nsets = int(parts[1])
            elif key == "NMEM":
                members = [int(x) for x in parts[1:]]
            elif key == "TVAR":
                pass
            elif key == "CPHI":
                nphi = int(parts[1])
            elif key == "CETA":
                neta = int(parts[1])
                etaedges = [float(x) for x in parts[2:]]
            elif key in ("RMIN", "RTRK"):
                pass
            elif key == "RETA":
                nabseta = int(parts[1])
                absetaedges = [float(x) for x in parts[2:]]
            else:
                s, m, tag = int(parts[0]), int(parts[1]), parts[2]
                if s > 0 and not loaduncs:
                    continue
                rest = parts[3:]
                if tag == "C":
                    t, v, b = int(rest[0]), int(rest[1]), int(rest[2])
                    vals = np.array([float(x) for x in rest[3:]])
                    if v == 0:
                        M.setdefault((s, m, t), {})[b] = 1.0 + vals * 0.01
                    elif v == 1:
                        A.setdefault((s, m, t), {})[b] = vals * 0.01
                elif tag == "F":
                    t = int(rest[0])
                    kres[(s, m, t)] = np.array([float(x) for x in rest[1:]])
                # tags T/R: kSmearMC-only (nTrk + crystal-ball) — skipped
    if nsets is None or nphi is None or neta is None:
        raise ValueError(f"{path}: not a RoccoR file (missing NSET/CPHI/CETA)")
    phiedges = np.array(
        [x * 2 * np.pi / nphi - np.pi for x in range(nphi + 1)]
    )
    sm = sorted({(s, m) for (s, m, _t) in M})
    Marr = np.stack([
        np.stack([np.stack([M[(s, m, t)][b] for b in range(neta)]) for t in (0, 1)])
        for s, m in sm
    ])
    Aarr = np.stack([
        np.stack([np.stack([A[(s, m, t)][b] for b in range(neta)]) for t in (0, 1)])
        for s, m in sm
    ])
    Karr = np.stack([
        np.stack([kres[(s, m, t)] for t in (0, 1)]) for s, m in sm
    ])
    return RochesterFile(
        sm_index=sm,
        members=members,
        M=Marr,  # (n_sm, 2, neta, nphi)
        A=Aarr,
        k_res=Karr,  # (n_sm, 2, nabseta)
        eta_edges=np.array(etaedges),
        phi_edges=phiedges,
        abseta_edges=np.array(absetaedges),
    )


class RochesterFile:
    """Full RoccoR payload: per-(set, member) M/A/kRes tables with the
    reference's kScaleDT / kScaleMC / kSpreadMC surfaces PLUS their
    uncertainty forms (the member-spread formula
    err^2 = sum_s (1/NMEM_s) sum_m (k_sm - k_00)^2,
    rochester_lookup.py:76-90).

    The nominal (s=0, m=0) corrections compile to literal-array column
    expressions through :class:`RochesterCorrection` — scan-stage, no
    UDF. The ERROR forms loop 100+ members, which as literals would be
    a ~50k-node expression tree; they run instead as ONE vectorized
    Arrow pandas UDF over the broadcast (members, eta, phi) arrays —
    the batch-ML-inference shape (numpy does the member loop per Arrow
    batch; nothing per-row crosses the Python boundary)."""

    def __init__(self, sm_index, members, M, A, k_res,
                 eta_edges, phi_edges, abseta_edges):
        self.sm_index = list(sm_index)
        self.members = list(members)
        self.M = np.asarray(M, float)
        self.A = np.asarray(A, float)
        self.k_res = np.asarray(k_res, float)
        self.eta_edges = np.asarray(eta_edges, float)
        self.phi_edges = np.asarray(phi_edges, float)
        self.abseta_edges = np.asarray(abseta_edges, float)
        self._nominal = None

    def _sm(self, s: int, m: int) -> int:
        try:
            return self.sm_index.index((s, m))
        except ValueError:
            raise KeyError(f"set {s} member {m} not loaded") from None

    def correction(self, s: int = 0, m: int = 0) -> RochesterCorrection:
        """The (set, member) slice as literal-expression lookups."""
        i = self._sm(s, m)
        bins2 = [self.eta_edges, self.phi_edges]
        bins1 = [self.abseta_edges]
        return RochesterCorrection(
            M={MC: DenseLookup(self.M[i, 0], bins2),
               DATA: DenseLookup(self.M[i, 1], bins2)},
            A={MC: DenseLookup(self.A[i, 0], bins2),
               DATA: DenseLookup(self.A[i, 1], bins2)},
            k_res={MC: DenseLookup(self.k_res[i, 0], bins1),
                   DATA: DenseLookup(self.k_res[i, 1], bins1)},
        )

    # -- nominal column expressions (s=0, m=0) --------------------------
    def k_scale_dt(self, charge, pt, eta, phi, s: int = 0, m: int = 0) -> Column:
        return self.correction(s, m).k_scale_dt(charge, pt, eta, phi)

    def k_scale_mc(self, charge, pt, eta, phi, s: int = 0, m: int = 0) -> Column:
        return self.correction(s, m).k_scale_mc(charge, pt, eta, phi)

    def k_spread_mc(self, charge, pt, eta, phi, genpt,
                    s: int = 0, m: int = 0) -> Column:
        return self.correction(s, m).k_spread_mc(charge, pt, eta, phi, genpt)

    # -- member-spread uncertainties (vectorized Arrow UDF) -------------
    def _error_udf(self, spark, kind: str, charge, pt, eta, phi, genpt=None):
        if not self.members or len(self.sm_index) <= 1:
            raise ValueError("uncertainty requires loaduncs=True tables")
        bc = spark.sparkContext.broadcast(
            (self.sm_index, self.members, self.M, self.A, self.k_res,
             self.eta_edges, self.phi_edges, self.abseta_edges)
        )
        t_idx = 1 if kind.endswith("dt") else 0
        spread = kind == "spread"

        def _err_core(*cols: "pd.Series") -> "pd.Series":
            sm, memb, Ma, Aa, Ka, ee, pe, ae = bc.value
            q = cols[0].to_numpy(float)
            ptv = cols[1].to_numpy(float)
            etav = cols[2].to_numpy(float)
            phiv = cols[3].to_numpy(float)
            ie = np.clip(np.searchsorted(ee, etav, "right") - 1, 0, len(ee) - 2)
            ip = np.clip(np.searchsorted(pe, phiv, "right") - 1, 0, len(pe) - 2)
            tt = 1 if t_idx else 0
            k_all = 1.0 / (Ma[:, tt, ie, ip] + q * Aa[:, tt, ie, ip] * ptv)
            if spread:
                genv = cols[4].to_numpy(float)
                ia = np.clip(
                    np.searchsorted(ae, np.abs(etav), "right") - 1, 0, len(ae) - 2
                )
                x = genv / (k_all * ptv)
                ratio = Ka[:, 1, ia] / Ka[:, 0, ia]
                k_all = k_all * (x / (1.0 + (x - 1.0) * ratio))
            default = k_all[sm.index((0, 0))]
            out = np.zeros_like(default)
            for j, (s_, m_) in enumerate(sm):
                d = k_all[j] - default
                out += d * d / memb[s_]
            return pd.Series(np.sqrt(out))

        # fixed-arity wrappers: PySpark 4 cannot infer the eval type of
        # a *args pandas UDF signature
        if spread:
            @F.pandas_udf(T.DoubleType())
            def err5(a: pd.Series, b: pd.Series, c: pd.Series,
                     d: pd.Series, e: pd.Series) -> pd.Series:
                return _err_core(a, b, c, d, e)

            return err5(charge, pt, eta, phi, genpt)

        @F.pandas_udf(T.DoubleType())
        def err4(a: pd.Series, b: pd.Series, c: pd.Series,
                 d: pd.Series) -> pd.Series:
            return _err_core(a, b, c, d)

        return err4(charge, pt, eta, phi)

    def k_scale_dt_error(self, spark, charge, pt, eta, phi) -> Column:
        return self._error_udf(spark, "scale_dt", charge, pt, eta, phi)

    def k_scale_mc_error(self, spark, charge, pt, eta, phi) -> Column:
        return self._error_udf(spark, "scale_mc", charge, pt, eta, phi)

    def k_spread_mc_error(self, spark, charge, pt, eta, phi, genpt) -> Column:
        return self._error_udf(spark, "spread", charge, pt, eta, phi, genpt)
