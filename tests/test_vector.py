"""Kinematics DSL vs numpy oracle (reference semantics:
nanoevents/methods/vector.py)."""

import math

import pytest

import numpy as np
import pyspark.sql.functions as F

from coffea_spark import vector as vec


def _np_vec(rng, n):
    return {
        "pt": rng.exponential(20.0, n) + 1.0,
        "eta": rng.uniform(-3, 3, n),
        "phi": rng.uniform(-math.pi, math.pi, n),
        "mass": rng.exponential(2.0, n),
    }


def _df_from(spark, a, b):
    rows = [
        {
            "a": {k: float(a[k][i]) for k in a},
            "b": {k: float(b[k][i]) for k in b},
        }
        for i in range(len(a["pt"]))
    ]
    return spark.createDataFrame(rows, "a struct<pt:double,eta:double,phi:double,mass:double>, b struct<pt:double,eta:double,phi:double,mass:double>")


def test_kinematics_against_numpy(spark):
    rng = np.random.default_rng(7)
    n = 500
    a, b = _np_vec(rng, n), _np_vec(rng, n)
    df = _df_from(spark, a, b)
    out = df.select(
        vec.px(F.col("a")).alias("px"),
        vec.py(F.col("a")).alias("py"),
        vec.pz(F.col("a")).alias("pz"),
        vec.energy(F.col("a")).alias("e"),
        vec.delta_phi(F.col("a"), F.col("b")).alias("dphi"),
        vec.delta_r(F.col("a"), F.col("b")).alias("dr"),
        vec.invariant_mass(F.col("a"), F.col("b")).alias("m"),
        vec.theta(F.col("a")).alias("theta"),
    ).toPandas()

    npx = a["pt"] * np.cos(a["phi"])
    npy = a["pt"] * np.sin(a["phi"])
    npz = a["pt"] * np.sinh(a["eta"])
    ne = np.sqrt(a["mass"] ** 2 + a["pt"] ** 2 * np.cosh(a["eta"]) ** 2)
    ndphi = (a["phi"] - b["phi"] + math.pi) % (2 * math.pi) - math.pi
    ndr = np.hypot(a["eta"] - b["eta"], ndphi)

    bx = b["pt"] * np.cos(b["phi"])
    by = b["pt"] * np.sin(b["phi"])
    bz = b["pt"] * np.sinh(b["eta"])
    be = np.sqrt(b["mass"] ** 2 + b["pt"] ** 2 * np.cosh(b["eta"]) ** 2)
    m2 = (ne + be) ** 2 - (npx + bx) ** 2 - (npy + by) ** 2 - (npz + bz) ** 2
    nm = np.sqrt(np.clip(m2, 0, None))

    assert np.allclose(out["px"], npx)
    assert np.allclose(out["py"], npy)
    assert np.allclose(out["pz"], npz)
    assert np.allclose(out["e"], ne)
    assert np.allclose(out["dphi"], ndphi)
    assert np.allclose(out["dr"], ndr)
    assert np.allclose(out["m"], nm, rtol=1e-9, atol=1e-6)
    assert np.allclose(out["theta"], 2 * np.arctan(np.exp(-a["eta"])))


def test_add_consistency(spark):
    """add(a,b).mass == invariant_mass(a,b); sum_vectors over [a,b] too."""
    rng = np.random.default_rng(11)
    a, b = _np_vec(rng, 200), _np_vec(rng, 200)
    df = _df_from(spark, a, b)
    out = df.select(
        vec.add(F.col("a"), F.col("b"))["mass"].alias("m_add"),
        vec.invariant_mass(F.col("a"), F.col("b")).alias("m_pair"),
        vec.sum_vectors(F.array("a", "b"))["mass"].alias("m_sum"),
        vec.sum_vectors(F.array("a", "b"))["pt"].alias("pt_sum"),
        vec.add(F.col("a"), F.col("b"))["pt"].alias("pt_add"),
    ).toPandas()
    assert np.allclose(out["m_add"], out["m_pair"], rtol=1e-9, atol=1e-9)
    assert np.allclose(out["m_sum"], out["m_pair"], rtol=1e-9, atol=1e-9)
    assert np.allclose(out["pt_sum"], out["pt_add"], rtol=1e-9, atol=1e-9)


def test_bit_helpers(spark):
    df = spark.range(16).select(F.col("id").cast("int").alias("v"))
    got = df.select("v", vec.has_bit(F.col("v"), 1).alias("b1"),
                    vec.has_flags(F.col("v"), 0, 2).alias("f02")).collect()
    for r in got:
        assert r.b1 == bool(r.v & 2)
        assert r.f02 == ((r.v & 5) == 5)


def test_boost_rest_frame(spark):
    """Boosting a vector by -its own boostvec lands in its rest frame:
    momentum ~0, energy ~mass, mass preserved (reference vector.py
    boostvec contract + vector package boost_beta3)."""
    rng = np.random.default_rng(11)
    a, b = _np_vec(rng, 200), _np_vec(rng, 200)
    df = _df_from(spark, a, b)
    rows = df.select(
        vec.boost_cartesian(F.col("a"), vec.negative3(vec.boostvec(F.col("a")))).alias("rf"),
        vec.boost(F.col("a"), vec.negative3(vec.boostvec(F.col("a")))).alias("rfv"),
        F.col("a.mass").alias("m"),
        vec.energy(F.col("a")).alias("e"),
    ).collect()
    for r in rows:
        p = math.sqrt(r.rf.x ** 2 + r.rf.y ** 2 + r.rf.z ** 2)
        assert p < 1e-6 * r.e, (p, r.e)
        assert abs(r.rf.t - r.m) < 1e-6 * r.e
        assert abs(r.rfv.mass - r.m) < 1e-6 * r.e  # boost preserves mass


def test_boost_zero_identity_and_roundtrip(spark):
    """Zero-beta boost is the identity; boost(+beta) then boost(-beta)
    round-trips (gamma^2/(gamma+1) form is finite at beta=0)."""
    rng = np.random.default_rng(13)
    a, b = _np_vec(rng, 100), _np_vec(rng, 100)
    df = _df_from(spark, a, b)
    zero = F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y"), F.lit(0.0).alias("z"))
    beta = vec.negative3(vec.boostvec(F.col("b")))
    rows = df.select(
        "a",
        vec.boost(F.col("a"), zero).alias("id"),
        vec.boost_cartesian(
            F.struct(
                F.col("a.pt").alias("pt"),
                F.col("a.eta").alias("eta"),
                F.col("a.phi").alias("phi"),
                F.col("a.mass").alias("mass"),
            ),
            beta,
        ).alias("fwd"),
        vec.to_cartesian(F.col("a")).alias("lab"),
        vec.energy(F.col("a")).alias("e"),
    ).collect()
    for r in rows:
        for f in ("pt", "eta", "phi", "mass"):
            assert abs(r.id[f] - r.a[f]) < 1e-9 * max(1.0, abs(r.a[f])), f
        # fwd boosted energy is still >= mass (timelike preserved)
        assert r.fwd.t >= r.a.mass - 1e-9


def test_three_vector_algebra(spark):
    """dot/cross/unit/r3 identities: |u|=1, cross orthogonal to both
    inputs, |a x b|^2 + (a.b)^2 = |a|^2 |b|^2 (Lagrange)."""
    rng = np.random.default_rng(17)
    a, b = _np_vec(rng, 200), _np_vec(rng, 200)
    df = _df_from(spark, a, b)
    va, vb = vec.pvec(F.col("a")), vec.pvec(F.col("b"))
    rows = df.select(
        vec.r3(vec.unit3(va)).alias("unit_norm"),
        vec.dot3(vec.cross3(va, vb), va).alias("orth_a"),
        vec.dot3(vec.cross3(va, vb), vb).alias("orth_b"),
        (
            vec.dot3(vec.cross3(va, vb), vec.cross3(va, vb))
            + vec.dot3(va, vb) * vec.dot3(va, vb)
            - vec.dot3(va, va) * vec.dot3(vb, vb)
        ).alias("lagrange"),
        (vec.dot3(va, va) * vec.dot3(vb, vb)).alias("scale"),
    ).collect()
    for r in rows:
        assert abs(r.unit_norm - 1.0) < 1e-12
        assert abs(r.orth_a) < 1e-6 * max(1.0, r.scale)
        assert abs(r.orth_b) < 1e-6 * max(1.0, r.scale)
        assert abs(r.lagrange) < 1e-6 * max(1.0, r.scale)


def test_coordinate_validation():
    """Constructor-style checks (reference vector.py:84-142): mixed
    coordinate systems and incomplete layouts are rejected."""
    vec.validate_coordinates(["pt", "eta", "phi", "mass"])
    vec.validate_coordinates(["px", "py", "pz", "energy"])
    vec.validate_coordinates(["pt", "phi"])
    with pytest.raises(ValueError):
        vec.validate_coordinates(["pt", "phi", "px", "py"])  # mixed azimuthal
    with pytest.raises(ValueError):
        vec.validate_coordinates(["pt"])  # incomplete azimuthal
    with pytest.raises(ValueError):
        vec.validate_coordinates(["px", "py", "eta", "pz"])  # two longitudinal
    with pytest.raises(ValueError):
        vec.validate_coordinates(["pt", "phi", "eta", "mass", "energy"])
    with pytest.raises(ValueError):
        vec.validate_coordinates(["pt", "phi", "mass"])  # temporal w/o longitudinal
    assert vec.dimension(["pt", "phi"]) == 2
    assert vec.dimension(["px", "py", "theta"]) == 3
    assert vec.dimension(["pt", "eta", "phi", "mass"]) == 4


def test_add_promoted_dispatch(spark):
    """2D+4D -> 2D, 3D+4D -> 3D (reference vector.py:675-690): promoted
    sums agree with the full 4D cartesian sum on shared components."""
    rng = np.random.default_rng(23)
    a, b = _np_vec(rng, 100), _np_vec(rng, 100)
    df = _df_from(spark, a, b)
    va, vb = F.col("a"), F.col("b")
    full = vec.add(va, vb)
    two = vec.add_promoted(va, vb, ["pt", "phi"], ["pt", "eta", "phi", "mass"])
    three = vec.add_promoted(
        va, vb, ["pt", "eta", "phi"], ["pt", "eta", "phi", "mass"]
    )
    rows = df.select(
        full["pt"].alias("pt4"), full["phi"].alias("phi4"), full["eta"].alias("eta4"),
        two["pt"].alias("pt2"), two["phi"].alias("phi2"),
        three["pt"].alias("pt3"), three["eta"].alias("eta3"),
    ).collect()
    for r in rows:
        assert abs(r.pt2 - r.pt4) < 1e-9
        assert abs(r.phi2 - r.phi4) < 1e-9
        assert abs(r.pt3 - r.pt4) < 1e-9
        assert abs(r.eta3 - r.eta4) < 1e-9
    assert "eta" not in repr(df.select(two.alias("s")).schema["s"].dataType)
    sch3 = df.select(three.alias("s")).schema["s"].dataType
    assert "eta" in repr(sch3) and "mass" not in repr(sch3)


def test_add_promoted_cartesian_input(spark):
    """Cartesian-layout structs promote identically (px/py/pz/energy)."""
    rng = np.random.default_rng(29)
    a, b = _np_vec(rng, 50), _np_vec(rng, 50)
    df = _df_from(spark, a, b)
    cart_b = vec.to_cartesian(F.col("b"))
    mixed = vec.add_promoted(
        F.col("a"), cart_b, ["pt", "eta", "phi", "mass"],
        ["px", "py", "pz", "energy"],
    )
    full = vec.add(F.col("a"), F.col("b"))
    rows = df.select(
        (mixed["pt"] - full["pt"]).alias("dpt"),
        (mixed["mass"] - full["mass"]).alias("dm"),
    ).collect()
    for r in rows:
        assert abs(r.dpt) < 1e-9
        assert abs(r.dm) < 1e-6


def _jag3(spark, xs, ys, zs):
    import pyspark.sql.functions as F

    rows = [
        ([{"x": float(x), "y": float(y), "z": float(z)} for x, y, z in zip(a, b, c)],)
        for a, b, c in zip(xs, ys, zs)
    ]
    return spark.createDataFrame(
        rows, "v array<struct<x double, y double, z double>>"
    ).withColumn("_i", F.monotonically_increasing_id())


def test_three_vector_hand_values(spark):
    """Reference tests/test_nanoevents_vector.py:103-213 ported: the
    hand-valued 3-vector table over a JAGGED layout including an empty
    event — dot, cross (both orders), negation, unit."""
    import pyspark.sql.functions as F

    ax, ay, az = [[1, 2], [], [3], [4]], [[5, 6], [], [7], [8]], [[9, 10], [], [11], [12]]
    bx, by, bz = [[4, 1], [], [10], [11]], [[17, 7], [], [11], [6]], [[9, 11], [], [5], [16]]
    a = _jag3(spark, ax, ay, az).withColumnRenamed("v", "a")
    b = _jag3(spark, bx, by, bz).withColumnRenamed("v", "b")
    df = a.join(b, "_i").orderBy("_i")

    out = df.select(
        F.zip_with("a", "b", lambda p, q: vec.dot3(p, q)).alias("dot_ab"),
        F.zip_with("b", "a", lambda p, q: vec.dot3(p, q)).alias("dot_ba"),
        F.zip_with("a", "b", lambda p, q: vec.cross3(p, q)).alias("cross_ab"),
        F.zip_with("b", "a", lambda p, q: vec.cross3(p, q)).alias("cross_ba"),
        F.transform("a", vec.negative3).alias("neg"),
        F.transform("a", lambda p: vec.r3(vec.unit3(p))).alias("unit_r"),
        F.transform(
            "a", lambda p: F.atan2(vec.unit3(p)["y"], vec.unit3(p)["x"]) - F.atan2(p["y"], p["x"])
        ).alias("unit_dphi"),
    ).collect()

    want_dot = [[170, 154], [], [162], [284]]
    want_cross = [
        [(-108, 27, -3), (-4, -12, 8)],
        [],
        [(-86, 95, -37)],
        [(56, 68, -64)],
    ]
    for i, r in enumerate(out):
        assert [v for v in r.dot_ab] == want_dot[i]
        assert [v for v in r.dot_ba] == want_dot[i]
        got_ab = [(c.x, c.y, c.z) for c in r.cross_ab]
        assert got_ab == [tuple(map(float, t)) for t in want_cross[i]]
        got_ba = [(c.x, c.y, c.z) for c in r.cross_ba]
        assert got_ba == [tuple(-float(v) for v in t) for t in want_cross[i]]
        assert [(n.x, n.y, n.z) for n in r.neg] == [
            (-x, -y, -z) for x, y, z in zip(ax[i], ay[i], az[i])
        ]
        for u in r.unit_r:
            assert u == pytest.approx(1.0, abs=1e-12)
        for d in r.unit_dphi:
            assert d == pytest.approx(0.0, abs=1e-12)


def test_ptetaphim_scalar_multiply_reference_semantics(spark):
    """Reference PtEtaPhiMLorentzVector.multiply (vector.py:590-606):
    a NEGATIVE scalar keeps pt/mass physical (|k|) and flips the
    direction — eta * sign(k), phi - pi; scale(v, -1) == negative(v);
    divide is multiply by 1/k."""
    import math

    import pyspark.sql.functions as F

    rows = [(10.0, 1.2, 0.4, 5.0), (7.0, -0.3, -2.9, 1.0)]
    df = spark.createDataFrame(rows, "pt double, eta double, phi double, mass double")
    v = F.struct("pt", "eta", "phi", "mass")
    out = df.select(
        vec.scale(v, 2.0).alias("x2"),
        vec.scale(v, -2.0).alias("xm2"),
        vec.scale(v, -1.0).alias("xm1"),
        vec.negative(v).alias("neg"),
    ).collect()
    for (pt, eta, phi, mass), r in zip(rows, out):
        assert (r.x2.pt, r.x2.mass) == (2 * pt, 2 * mass)
        assert r.x2.eta == eta
        # positive k keeps the 2pi-periodic representative
        assert math.cos(r.x2.phi) == pytest.approx(math.cos(phi), abs=1e-12)
        assert math.sin(r.x2.phi) == pytest.approx(math.sin(phi), abs=1e-12)
        # negative k: physical pt/mass, flipped direction
        assert (r.xm2.pt, r.xm2.mass) == (2 * pt, 2 * mass)
        assert r.xm2.eta == -eta
        assert math.cos(r.xm2.phi) == pytest.approx(-math.cos(phi), abs=1e-12)
        assert math.sin(r.xm2.phi) == pytest.approx(-math.sin(phi), abs=1e-12)
        # scale(v, -1) == negative(v) (same direction flip)
        assert r.xm1.pt == r.neg.pt and r.xm1.eta == r.neg.eta
        assert math.cos(r.xm1.phi) == pytest.approx(math.cos(r.neg.phi), abs=1e-12)
        assert r.xm1.mass == r.neg.mass


def test_lorentz_boost_to_rest_frame_hand_values(spark):
    """Reference test_lorentz_vector boost check (:319-326): boosting a
    vector by -boostvec lands its momentum at zero — on the cartesian
    hand-value table with an empty event."""
    import pyspark.sql.functions as F

    xs = [[1.0, 2.0], [], [3.0], [4.0]]
    ys = [[5.0, 6.0], [], [7.0], [8.0]]
    zs = [[9.0, 10.0], [], [11.0], [12.0]]
    ts = [[50.0, 51.0], [], [52.0], [53.0]]
    rows = [
        ([{"px": x, "py": y, "pz": z, "energy": t} for x, y, z, t in zip(a, b, c, d)],)
        for a, b, c, d in zip(xs, ys, zs, ts)
    ]
    df = spark.createDataFrame(
        rows, "v array<struct<px double, py double, pz double, energy double>>"
    )

    def rest(p):
        beta = F.struct(
            (p["px"] / p["energy"]).alias("x"),
            (p["py"] / p["energy"]).alias("y"),
            (p["pz"] / p["energy"]).alias("z"),
        )
        return vec.boost_xyzt(p, vec.negative3(beta))

    out = df.select(F.transform("v", rest).alias("r")).collect()
    n = 0
    for row in out:
        for p in row.r:
            assert abs(p.x) < 1e-9 and abs(p.y) < 1e-9 and abs(p.z) < 1e-9
            n += 1
    assert n == 4
