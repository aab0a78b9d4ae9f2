"""Jet-energy corrections, resolution smearing, systematic variations,
MET propagation, and b-tag scale factors.

Reference: jetmet_tools/FactorizedJetCorrector.py:51-240 (chained
multiplicative levels), CorrectedJetsFactory.py (raw-pt bookkeeping,
deterministic gaussian smear :36-122, JES/JER up-down variation structs
:205-500), CorrectedMETFactory.py:7-212 (polar MET recompute),
btag_tools/btagscalefactor.py:7-243 (piecewise formula table).

Spark shapes:
- every correction is a column expression over the jet collection via
  ``transform`` + ``withField`` — per-row, codegen'd, no shuffle;
- variations are EXTRA struct fields (``jet.JES_up_pt``), mirroring the
  reference's lazily-attached variation records;
- the smear RNG is content-derived (xxhash64 of the jet kinematics ->
  Box-Muller), so results are deterministic per jet independent of
  partitioning — the Spark equivalent of the reference's
  seeds-from-data-bits trick (CorrectedJetsFactory.py:37-40), which a
  partition-seeded ``F.randn`` would NOT give.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


class FactorizedJetCorrector:
    """Chained multiplicative correction levels. Each level is a callable
    ``(eta: Column, pt: Column) -> Column`` (e.g. a DenseLookup or
    FormulaLookup); level i sees the pt corrected by levels < i, exactly
    like the reference's getSubCorrections."""

    def __init__(self, levels):
        self.levels = list(levels)

    def get_sub_corrections(self, eta: Column, pt_raw: Column) -> list[Column]:
        out = []
        pt = pt_raw
        total = F.lit(1.0)
        for level in self.levels:
            c = level(eta, pt)
            out.append(c)
            total = total * c
            pt = pt_raw * total
        return out

    def get_correction(self, eta: Column, pt_raw: Column) -> Column:
        total = F.lit(1.0)
        for c in self.get_sub_corrections(eta, pt_raw):
            total = total * c
        return total


def _hash_uniform(*cols: Column, salt: int = 0) -> Column:
    """Deterministic uniform (0,1) from content: xxhash64 -> 53-bit
    mantissa. Open interval (never exactly 0) so log() is safe."""
    h = F.xxhash64(*cols, F.lit(salt))
    u = (F.shiftrightunsigned(h, 11).cast("double")) / F.lit(float(1 << 53))
    return F.greatest(u, F.lit(1e-300))


def content_randn(*cols: Column, salt: int = 0) -> Column:
    """Deterministic standard normal from content via Box-Muller
    (reference's rand_gauss seeds from data bits,
    CorrectedJetsFactory.py:36-62)."""
    u1 = _hash_uniform(*cols, salt=salt)
    u2 = _hash_uniform(*cols, salt=salt + 1)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)


# -- oracle-portable content RNG --------------------------------------------
#
# The xxhash64 Box-Muller draw above is the production default, but no
# independent SQL engine reproduces xxhash64 or guarantees bitwise log/cos.
# The PORTABLE twin derives the gaussian from a multiplicative hash mod
# 2^31-1 (plain modular arithmetic) and an Irwin-Hall sum of 12 uniforms
# (N(0,1) to ~1e-2 tails) — every operation used (+ - * / mod sqrt) is
# IEEE-correctly-rounded, so any engine evaluating the same expression in
# the same order produces the SAME bits. Same content-seeded semantics as
# the reference (CorrectedJetsFactory.py:36-62); exchange the distribution
# tail for an exact cross-engine oracle.

PORTABLE_P = 2147483647  # 2^31 - 1 (prime)
_PORTABLE_A = 1000003
_PORTABLE_C = 12345


def portable_hash(cols: tuple[Column, ...], salt: int = 0) -> Column:
    """Fold integer columns into [0, 2^31-1) with h = (h*a + x + c) mod p.
    Intermediates stay below 2^51 — exact in int64."""
    h: Column = F.lit(int(salt) % PORTABLE_P)
    for c in cols:
        h = F.pmod(
            h * F.lit(_PORTABLE_A)
            + F.pmod(c.cast("long"), F.lit(PORTABLE_P))
            + F.lit(_PORTABLE_C),
            F.lit(PORTABLE_P),
        )
    return h


def content_randn_portable(*cols: Column, salt: int = 0) -> Column:
    """Content-seeded ~N(0,1) using only exactly-portable operations:
    sum of 12 hash uniforms minus 6 (Irwin-Hall). Pair with
    :func:`portable_randn_sql` for a bit-identical ANSI-SQL oracle."""
    total = None
    for k in range(12):
        h = portable_hash(cols, salt=salt * 16 + k)
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(PORTABLE_P))
        total = u if total is None else total + u
    return total - F.lit(6.0)


def portable_randn_sql(exprs: list[str], salt: int = 0) -> str:
    """The SQL spelling of :func:`content_randn_portable` over the same
    integer expressions, with identical fold and summation order."""
    p, a, c = PORTABLE_P, _PORTABLE_A, _PORTABLE_C
    terms = []
    for k in range(12):
        h = str((salt * 16 + k) % p)
        for e in exprs:
            h = (
                f"(({h}) * {a} + ((CAST({e} AS BIGINT)) % {p} + {p}) % {p}"
                f" + {c}) % {p}"
            )
        terms.append(f"((CAST({h} AS DOUBLE) + 0.5) / {float(p)!r})")
    total = terms[0]
    for t in terms[1:]:
        total = f"({total} + {t})"
    return f"({total} - 6.0)"


def jer_smear_factor(
    pt: Column,
    pt_gen: Column,
    resolution: Column,
    sf: Column,
    *,
    rand_cols: tuple[Column, ...] | None = None,
    randn: Column | None = None,
) -> Column:
    """Hybrid deterministic/stochastic JER smearing factor (reference
    jer_smear, CorrectedJetsFactory.py:65-122):

    - matched (pt_gen valid): 1 + (sf-1) * (pt - pt_gen)/pt  [scaling]
    - unmatched: 1 + randn * sqrt(max(sf^2-1, 0)) * resolution [stochastic]
    clamped at >= 0.

    Pass ``randn`` to share ONE content-seeded draw across nominal/up/down
    variations (reference semantics: the random draw is per jet, not per
    variation — and recomputing the Box-Muller chain three times triples
    the hash/trig work per jet).
    """
    if randn is None:
        randn = content_randn(*rand_cols)
    det = 1.0 + (sf - 1.0) * (pt - pt_gen) / pt
    stoch = 1.0 + randn * F.sqrt(
        F.greatest(sf * sf - 1.0, F.lit(0.0))
    ) * resolution
    factor = F.when(pt_gen.isNotNull() & (pt_gen > 0), det).otherwise(stoch)
    return F.greatest(factor, F.lit(0.0))


class CorrectedJetsFactory:
    """Build corrected jets with JES/JER variations as extra fields.

    ``build(jets)`` maps ``Jet: array<struct<... pt, eta, phi, mass,
    rawFactor ...>>`` to the same array with added fields:
    ``pt_orig, pt_raw, pt_jec, pt`` (+ ``mass_*``), and per-variation
    ``JES_up_pt / JES_down_pt / JER_up_pt / JER_down_pt`` (reference
    attaches variation records; flat fields are the Spark-native spelling
    and prune better)."""

    def __init__(
        self,
        corrector: FactorizedJetCorrector,
        junc=0.02,
        jer: bool = False,
        resolution=None,
        resolution_sf=None,
    ):
        """``junc`` is either a scalar relative uncertainty, or a binned
        table callable ``junc(eta, pt) -> struct<up, down>`` (e.g. a
        :class:`coffea_spark.correction_files.JuncTable` parsed from a
        ``*.junc.txt`` file — the reference's eta/pt-binned
        JetCorrectionUncertainty, jetmet_tools/JetCorrectionUncertainty.py:54)."""
        self.corrector = corrector
        self.junc = junc
        self.jer = jer
        self.resolution = resolution
        self.resolution_sf = resolution_sf

    def build(self, jets: Column) -> Column:
        def one(j):
            pt_orig = j["pt"]
            mass_orig = j["mass"]
            pt_raw = j["pt"] * (1.0 - j["rawFactor"])
            mass_raw = j["mass"] * (1.0 - j["rawFactor"])
            corr = self.corrector.get_correction(j["eta"], pt_raw)
            pt_jec = pt_raw * corr
            mass_jec = mass_raw * corr
            out = (
                j.withField("pt_orig", pt_orig)
                .withField("mass_orig", mass_orig)
                .withField("pt_raw", pt_raw)
                .withField("mass_raw", mass_raw)
                .withField("pt_jec", pt_jec)
                .withField("mass_jec", mass_jec)
                .withField("pt", pt_jec)
                .withField("mass", mass_jec)
            )
            if self.junc is not None:
                if callable(self.junc):
                    u = self.junc(j["eta"], pt_jec)
                    up_f, down_f = pt_jec * u["up"], pt_jec * u["down"]
                else:
                    up_f = pt_jec * (1.0 + self.junc)
                    down_f = pt_jec * (1.0 - self.junc)
                out = (
                    out.withField("JES_up_pt", up_f)
                    .withField("JES_down_pt", down_f)
                )
            if self.jer and self.resolution is not None:
                reso = self.resolution(j["eta"], pt_jec)
                sf_nom, sf_up, sf_down = self.resolution_sf(j["eta"])
                rand = content_randn(j["pt"], j["eta"], j["phi"])
                pt_gen = F.lit(None).cast("double")  # no gen match by default
                smear = jer_smear_factor(pt_jec, pt_gen, reso, sf_nom, randn=rand)
                smear_up = jer_smear_factor(pt_jec, pt_gen, reso, sf_up, randn=rand)
                smear_dn = jer_smear_factor(pt_jec, pt_gen, reso, sf_down, randn=rand)
                out = (
                    out.withField("pt", pt_jec * smear)
                    .withField("JER_up_pt", pt_jec * smear_up)
                    .withField("JER_down_pt", pt_jec * smear_dn)
                )
            return out

        return F.transform(jets, one)


def corrected_polar_met(
    met_pt: Column, met_phi: Column, jets: Column,
    pt_old_field: str = "pt_orig", pt_new_field: str = "pt",
    unclust_dx: Column | None = None, unclust_dy: Column | None = None,
) -> Column:
    """Propagate jet corrections into MET (reference corrected_polar_met,
    CorrectedMETFactory.py:7-20): subtract the vector delta of every
    jet's (new - old) pt from the MET 2-vector. One aggregate HOF.

    With ``unclust_dx/dy`` (the MetUnclustEnUpDelta vector) the result
    also carries the ±unclustered-energy variations
    (reference CorrectedMETFactory.build:66-212):
    ``pt_unclust_up/phi_unclust_up`` and ``..._down``."""
    zero = F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y"))
    delta = F.aggregate(
        jets,
        zero,
        lambda acc, j: F.struct(
            (acc["x"] + (j[pt_new_field] - j[pt_old_field]) * F.cos(j["phi"])).alias("x"),
            (acc["y"] + (j[pt_new_field] - j[pt_old_field]) * F.sin(j["phi"])).alias("y"),
        ),
    )
    mx = met_pt * F.cos(met_phi) - delta["x"]
    my = met_pt * F.sin(met_phi) - delta["y"]
    fields = [
        F.sqrt(mx * mx + my * my).alias("pt"), F.atan2(my, mx).alias("phi")
    ]
    if unclust_dx is not None and unclust_dy is not None:
        ux, uy = mx + unclust_dx, my + unclust_dy
        dx2, dy2 = mx - unclust_dx, my - unclust_dy
        fields += [
            F.sqrt(ux * ux + uy * uy).alias("pt_unclust_up"),
            F.atan2(uy, ux).alias("phi_unclust_up"),
            F.sqrt(dx2 * dx2 + dy2 * dy2).alias("pt_unclust_down"),
            F.atan2(dy2, dx2).alias("phi_unclust_down"),
        ]
    return F.struct(*fields)


class BTagScaleFactor:
    """Piecewise per-(flavor, eta, pt) formula table (reference
    btag_tools/btagscalefactor.py). Rows: dicts with keys flavor,
    eta_min/eta_max, pt_min/pt_max, formula (in ``x`` = pt or discr).
    Compiles to a nested WHEN chain of native expressions — broadcast-free
    for typical CSV sizes (hundreds of rows)."""

    def __init__(self, rows: list[dict]):
        self.rows = rows

    def eval(self, flavor: Column, abseta: Column, pt: Column) -> Column:
        from coffea_spark.lookup import _substitute

        result = F.lit(None).cast("double")
        for r in self.rows:
            cond = (
                (flavor == F.lit(r["flavor"]))
                & (abseta >= F.lit(r["eta_min"])) & (abseta < F.lit(r["eta_max"]))
                & (pt >= F.lit(r["pt_min"])) & (pt < F.lit(r["pt_max"]))
            )
            result = F.when(cond, _substitute(r["formula"], pt)).otherwise(result)
        return result
