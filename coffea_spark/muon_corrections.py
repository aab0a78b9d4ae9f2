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

``kSmearMC`` (the no-gen-match path, rochester_lookup.py:173-208) needs
the inverse CDF of a symmetric double-sided crystal ball per muon:
implemented here scipy-free — power-law tails invert in closed form and
the Gaussian core goes through Acklam's inverse normal CDF with one
exact-erf Halley refinement (:func:`dscb_ppf`, machine precision). The
full RoccoR surface (kScaleDT/kScaleMC/kSpreadMC/kSmearMC and their
member-spread errors) is validated ONE-TO-ONE against the official
C++-derived values the reference pins (nano_*_rochester*.npy).
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
    A = 0.01x), tag F the per-(type, |eta|) kRes values, and tag R the
    kSmearMC machinery (rsPars polynomial coefficients per (|eta|,
    nTrk) — v==2 scaled by 0.01 — and the crystal-ball s/a/n tables).
    Tag T (nTrk count tables) is not needed by any k* surface.

    With ``loaduncs`` every set/member is kept (RoccoR2018: 6 sets,
    members [1,100,1,1,1,1] — the stat replicas + systematic variants
    that define kScaleDTerror); otherwise only set 0.
    """
    import gzip as _gzip

    with open(path, "rb") as probe:
        magic = probe.read(2)
    opener = _gzip.open if magic == b"\x1f\x8b" else open
    nsets = nphi = neta = nabseta = nmin = ntrk = None
    members: list[int] = []
    etaedges: list[float] = []
    absetaedges: list[float] = []
    M: dict = {}
    A: dict = {}
    kres: dict = {}
    rspars: dict = {}
    cbs: dict = {}
    cba: dict = {}
    cbn: dict = {}
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
            elif key == "RMIN":
                nmin = int(parts[1])
            elif key == "RTRK":
                ntrk = int(parts[1])
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
                elif tag == "R":
                    # kSmearMC machinery: v 0-2 -> rsPars (v==2 scaled by
                    # 0.01), v 3/4/5 -> crystal-ball s/a/n per (|eta|, nTrk)
                    v, b = int(rest[0]), int(rest[1])
                    vals = np.array([float(x) for x in rest[2:]])
                    if v == 2:
                        vals = vals * 0.01
                    if v <= 2:
                        rspars.setdefault((s, m, v), {})[b] = vals
                    elif v == 3:
                        cbs.setdefault((s, m), {})[b] = vals
                    elif v == 4:
                        cba.setdefault((s, m), {})[b] = vals
                    elif v == 5:
                        cbn.setdefault((s, m), {})[b] = vals
                # tag T (nTrk count tables) is not needed by any k* surface
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
    rs = cbsa = cbaa = cbna = trkedges = None
    if rspars and ntrk is not None and nmin is not None:
        rs = np.stack([
            np.stack([
                np.stack([rspars[(s, m, v)][b] for b in range(nabseta)])
                for v in (0, 1, 2)
            ])
            for s, m in sm
        ])  # (n_sm, 3, nabseta, ntrk)
        cbsa = np.stack([
            np.stack([cbs[(s, m)][b] for b in range(nabseta)]) for s, m in sm
        ])
        cbaa = np.stack([
            np.stack([cba[(s, m)][b] for b in range(nabseta)]) for s, m in sm
        ])
        cbna = np.stack([
            np.stack([cbn[(s, m)][b] for b in range(nabseta)]) for s, m in sm
        ])
        trkedges = np.array([0.0] + [nmin + x + 0.5 for x in range(ntrk)])
    return RochesterFile(
        sm_index=sm,
        members=members,
        M=Marr,  # (n_sm, 2, neta, nphi)
        A=Aarr,
        k_res=Karr,  # (n_sm, 2, nabseta)
        eta_edges=np.array(etaedges),
        phi_edges=phiedges,
        abseta_edges=np.array(absetaedges),
        rs_pars=rs,
        cb_s=cbsa,
        cb_a=cbaa,
        cb_n=cbna,
        trk_edges=trkedges,
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
                 eta_edges, phi_edges, abseta_edges,
                 rs_pars=None, cb_s=None, cb_a=None, cb_n=None,
                 trk_edges=None):
        self.sm_index = list(sm_index)
        self.members = list(members)
        self.M = np.asarray(M, float)
        self.A = np.asarray(A, float)
        self.k_res = np.asarray(k_res, float)
        self.eta_edges = np.asarray(eta_edges, float)
        self.phi_edges = np.asarray(phi_edges, float)
        self.abseta_edges = np.asarray(abseta_edges, float)
        self.rs_pars = None if rs_pars is None else np.asarray(rs_pars, float)
        self.cb_s = None if cb_s is None else np.asarray(cb_s, float)
        self.cb_a = None if cb_a is None else np.asarray(cb_a, float)
        self.cb_n = None if cb_n is None else np.asarray(cb_n, float)
        self.trk_edges = None if trk_edges is None else np.asarray(trk_edges, float)
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
    def _tables(self):
        return (self.sm_index, self.members, self.M, self.A, self.k_res,
                self.eta_edges, self.phi_edges, self.abseta_edges,
                self.rs_pars, self.cb_s, self.cb_a, self.cb_n, self.trk_edges)

    def _broadcast(self, spark):
        """One broadcast of the table stack per (instance, SparkContext)
        — every correction/error column reuses it instead of re-shipping
        the multi-MB member tables per method call."""
        sc = spark.sparkContext
        cached = getattr(self, "_bc", None)
        if cached is not None and cached[0] is sc:
            return cached[1]
        bc = sc.broadcast(self._tables())
        self._bc = (sc, bc)
        return bc

    def _udf(self, spark, kind: str, mode: str, cols, s: int = 0, m: int = 0):
        """One vectorized Arrow pandas UDF: the (n_sm, batch) correction
        matrix via :func:`_rochester_k_matrix`, reduced either to the
        requested (s, m) row (mode='value') or to the member-spread
        error (mode='error')."""
        # guard on the number of SETS (the reference gates _error on
        # len(self._M.keys()) > 1): loaduncs=False still keeps set 0's
        # 100 stat replicas, and a spread over them alone would be a
        # silently underestimated uncertainty
        if mode == "error" and len({s_ for s_, _ in self.sm_index}) <= 1:
            raise ValueError("uncertainty requires loaduncs=True tables")
        if kind == "smear" and self.rs_pars is None:
            raise ValueError("kSmearMC needs the R-tag tables (re-parse file)")
        bc = self._broadcast(spark)
        row = self._sm(s, m)

        def core(*series) -> pd.Series:
            tabs = bc.value
            args = [x.to_numpy(float) for x in series]
            k_all = _rochester_k_matrix(tabs, kind, *args)
            if mode == "value":
                return pd.Series(k_all[row])
            sm, memb = tabs[0], tabs[1]
            default = k_all[sm.index((0, 0))]
            out = np.zeros_like(default)
            for j, (s_, _m_) in enumerate(sm):
                d = k_all[j] - default
                out += d * d / memb[s_]
            return pd.Series(np.sqrt(out))

        # fixed-arity wrappers: PySpark 4 cannot infer the eval type of
        # a *args pandas UDF signature
        n = len(cols)
        if n == 4:
            @F.pandas_udf(T.DoubleType())
            def u4(a: pd.Series, b: pd.Series, c: pd.Series,
                   d: pd.Series) -> pd.Series:
                return core(a, b, c, d)
            return u4(*cols)
        if n == 5:
            @F.pandas_udf(T.DoubleType())
            def u5(a: pd.Series, b: pd.Series, c: pd.Series,
                   d: pd.Series, e: pd.Series) -> pd.Series:
                return core(a, b, c, d, e)
            return u5(*cols)

        @F.pandas_udf(T.DoubleType())
        def u6(a: pd.Series, b: pd.Series, c: pd.Series,
               d: pd.Series, e: pd.Series, g: pd.Series) -> pd.Series:
            return core(a, b, c, d, e, g)
        return u6(*cols)

    def k_smear_mc(self, spark, charge, pt, eta, phi, nl, u,
                   s: int = 0, m: int = 0) -> Column:
        """MC correction WITHOUT a gen match (kSmearMC,
        rochester_lookup.py:173-208): k = kScaleMC, then
        x = sqrt(kRes_data^2 - kRes_mc^2) * sigma(k*pt, |eta|, nTrk)
        * DSCB^-1(u), kExtra = 1/(1+x) for x > -1 else 1. ``u`` is the
        caller's uniform draw (use corrections.content_rand for a
        deterministic content-seeded one). Runs as a vectorized Arrow
        UDF (the DSCB inverse CDF is not column math)."""
        return self._udf(spark, "smear", "value",
                         [charge, pt, eta, phi, nl, u], s, m)

    def k_scale_dt_error(self, spark, charge, pt, eta, phi) -> Column:
        return self._udf(spark, "scale_dt", "error", [charge, pt, eta, phi])

    def k_scale_mc_error(self, spark, charge, pt, eta, phi) -> Column:
        return self._udf(spark, "scale_mc", "error", [charge, pt, eta, phi])

    def k_spread_mc_error(self, spark, charge, pt, eta, phi, genpt) -> Column:
        return self._udf(spark, "spread", "error", [charge, pt, eta, phi, genpt])

    def k_smear_mc_error(self, spark, charge, pt, eta, phi, nl, u) -> Column:
        return self._udf(spark, "smear", "error", [charge, pt, eta, phi, nl, u])


def _rochester_k_matrix(tabs, kind, q, ptv, etav, phiv, x5=None, x6=None):
    """(n_sm, batch) correction-factor matrix for every loaded
    set/member — the numpy core shared by the nominal and error UDFs.
    kind: 'scale_dt' | 'scale_mc' | 'spread' (x5 = genpt) |
    'smear' (x5 = nTrackerLayers, x6 = uniform draw)."""
    (sm, memb, Ma, Aa, Ka, ee, pe, ae, rs, cs, ca, cn, te) = tabs
    ie = np.clip(np.searchsorted(ee, etav, "right") - 1, 0, len(ee) - 2)
    ip = np.clip(np.searchsorted(pe, phiv, "right") - 1, 0, len(pe) - 2)
    tt = 1 if kind == "scale_dt" else 0
    k_all = 1.0 / (Ma[:, tt, ie, ip] + q * Aa[:, tt, ie, ip] * ptv)
    if kind in ("scale_dt", "scale_mc"):
        return k_all
    ia = np.clip(np.searchsorted(ae, np.abs(etav), "right") - 1, 0, len(ae) - 2)
    if kind == "spread":
        x = x5 / (k_all * ptv)
        ratio = Ka[:, 1, ia] / Ka[:, 0, ia]
        return k_all * (x / (1.0 + (x - 1.0) * ratio))
    # smear (rochester_lookup._kExtra): sigma from rsPars at (|eta|,
    # nTrk), symmetric DSCB inverse CDF scaled by cbS, gated on
    # kRes_data > kRes_mc; x <= -1 (unphysical) falls back to k
    it = np.clip(np.searchsorted(te, x5, "right") - 1, 0, len(te) - 2)
    kpt = k_all * ptv
    dpt = kpt - 45.0
    sigma = rs[:, 0, ia, it] + rs[:, 1, ia, it] * dpt + rs[:, 2, ia, it] * dpt * dpt
    invcdf = dscb_ppf(x6, ca[:, ia, it], ca[:, ia, it],
                      cn[:, ia, it], cn[:, ia, it], 0.0, cs[:, ia, it])
    k_data, k_mc = Ka[:, 1, ia], Ka[:, 0, ia]
    with np.errstate(invalid="ignore"):
        x = np.where(
            k_data > k_mc,
            np.sqrt(np.maximum(k_data * k_data - k_mc * k_mc, 0.0))
            * sigma * invcdf,
            0.0,
        )
    kextra = np.where(x > -1.0, 1.0 / (1.0 + x), 1.0)
    return k_all * kextra


# ---------------------------------------------------------------------------
# double-sided crystal-ball inverse CDF (numpy, for kSmearMC)
# ---------------------------------------------------------------------------

_NORM_PDF_C = float(np.sqrt(2 * np.pi))
_erf_vec = np.vectorize(__import__("math").erf, otypes=[float])


def _norm_cdf_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, float)
    # math.erf is exact but per-element; the DSCB tail boundaries take
    # BINNED crystal-ball parameters (nabseta x ntrk distinct values
    # fanned out over members x batch), so a unique-gather removes most
    # of the Python-loop cost without losing the exactness claim
    if x.size > 64:
        u, inv = np.unique(x, return_inverse=True)
        if u.size * 4 < x.size:
            return (0.5 * (1.0 + _erf_vec(u / np.sqrt(2.0))))[inv].reshape(x.shape)
    return 0.5 * (1.0 + _erf_vec(x / np.sqrt(2.0)))


def _norm_ppf_np(p: np.ndarray) -> np.ndarray:
    """Acklam's rational-approximation inverse normal CDF plus one
    Halley refinement through the exact (math.erf) CDF — full double
    precision, no scipy."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    p = np.asarray(p, float)
    out = np.full(p.shape, np.nan)
    plow, phigh = 0.02425, 1.0 - 0.02425
    with np.errstate(divide="ignore", invalid="ignore"):
        m = (p > 0) & (p < plow)
        if m.any():
            q = np.sqrt(-2.0 * np.log(p[m]))
            out[m] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
                      / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0))
        m = (p >= plow) & (p <= phigh)
        if m.any():
            q = p[m] - 0.5
            r = q * q
            out[m] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q \
                / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0)
        m = (p > phigh) & (p < 1)
        if m.any():
            q = np.sqrt(-2.0 * np.log(1.0 - p[m]))
            out[m] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
                       / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0))
        # one Halley step against the exact CDF
        fin = np.isfinite(out)
        if fin.any():
            x = out[fin]
            e = _norm_cdf_np(x) - p[fin]
            u = e * _NORM_PDF_C * np.exp(0.5 * x * x)
            out[fin] = x - u / (1.0 + 0.5 * x * u)
    out[p == 0] = -np.inf
    out[p == 1] = np.inf
    return out


def dscb_ppf(p, beta_l, beta_h, m_l, m_h, loc=0.0, scale=1.0):
    """Inverse CDF of the double-sided crystal ball (reference
    lookup_tools/doublecrystalball.py:169-227 `_ppf`, including the
    scipy loc/scale wrap): power-law tails invert in closed form, the
    Gaussian core through the inverse normal CDF. Vectorized numpy;
    inputs broadcast."""
    p, beta_l, beta_h, m_l, m_h = np.broadcast_arrays(
        np.asarray(p, float), np.asarray(beta_l, float),
        np.asarray(beta_h, float), np.asarray(m_l, float),
        np.asarray(m_h, float),
    )
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        c_l = m_l / beta_l / (m_l - 1.0) * np.exp(-0.5 * beta_l * beta_l)
        c_h = m_h / beta_h / (m_h - 1.0) * np.exp(-0.5 * beta_h * beta_h)
        core_int = _NORM_PDF_C * (_norm_cdf_np(beta_h) - _norm_cdf_np(-beta_l))
        n = 1.0 / (c_l + c_h + core_int)
        p_lo = n * (m_l / beta_l) * np.exp(-0.5 * beta_l * beta_l) / (m_l - 1.0)
        p_hi = 1.0 - n * (m_h / beta_h) * np.exp(-0.5 * beta_h * beta_h) / (m_h - 1.0)
        low = (m_l / beta_l - beta_l
               - ((m_l - 1.0) * (m_l / beta_l) ** (-m_l)
                  / np.exp(-0.5 * beta_l * beta_l) * p / n) ** (1.0 / (1.0 - m_l)))
        high = -(m_h / beta_h - beta_h
                 - ((m_h - 1.0) * (m_h / beta_h) ** (-m_h)
                    / np.exp(-0.5 * beta_h * beta_h) * (1.0 - p) / n)
                 ** (1.0 / (1.0 - m_h)))
        core = _norm_ppf_np(
            _norm_cdf_np(-beta_l) + (1.0 / _NORM_PDF_C) * (p / n - c_l)
        )
        out = np.where(p < p_lo, low, np.where(p > p_hi, high, core))
    return np.asarray(loc, float) + np.asarray(scale, float) * out
