"""Within-event joins, combinatorics, genealogy vs python oracle.

Mirrors the reference invariant tests (tests/test_nanoevents.py:12-63
genroundtrips/crossref) on the F1 fixture.
"""

import math

import numpy as np
import pyspark.sql.functions as F

from coffea_spark import vector as vec
from coffea_spark.genealogy import (
    children_idx,
    distinct_children_deep_idx,
    distinct_parent_idx,
    parent_idx,
)
from coffea_spark.joins import (
    combinations,
    argcombinations,
    matched,
    matched_via,
    metric_table,
    nearest,
    pairs_exploded,
)


def test_matched_gather(spark, nano, nano_rows):
    got = nano.select(
        "event", matched(F.col("Muon"), "jetIdx", F.col("Jet"))["pt"].alias("jpt")
    ).orderBy("event").collect()
    for row, ref in zip(got, nano_rows):
        want = [
            ref["Jet"][m["jetIdx"]]["pt"] if 0 <= m["jetIdx"] < len(ref["Jet"]) else None
            for m in ref["Muon"]
        ]
        assert list(row.jpt or []) == want


def test_matched_via(spark, nano, nano_rows):
    got = nano.select(
        "event",
        F.transform(
            matched_via(F.col("Jet"), ["muonIdx1", "muonIdx2"], F.col("Muon")),
            lambda ms: F.size(ms),
        ).alias("nm"),
    ).orderBy("event").collect()
    for row, ref in zip(got, nano_rows):
        want = [
            sum(
                1
                for f in ("muonIdx1", "muonIdx2")
                if 0 <= j[f] < len(ref["Muon"])
            )
            for j in ref["Jet"]
        ]
        assert list(row.nm or []) == want


def test_combinations_counts_and_pairs(spark, nano, nano_rows):
    got = nano.select(
        "event",
        F.size(combinations(F.col("Muon"), 2)).alias("n2"),
        F.size(combinations(F.col("Muon"), 3)).alias("n3"),
        argcombinations(F.col("Muon"), 2).alias("idx"),
    ).orderBy("event").collect()
    for row, ref in zip(got, nano_rows):
        n = len(ref["Muon"])
        assert row.n2 == n * (n - 1) // 2
        assert row.n3 == n * (n - 1) * (n - 2) // 6
        want = [(i, j) for i in range(n) for j in range(i + 1, n)]
        assert [(p["i0"], p["i1"]) for p in (row.idx or [])] == want


def test_combinations_generic_n(spark, nano, nano_rows):
    """The recursive builder must emit exactly itertools.combinations
    order for any n, including n=1 and n>3 (reference ak.combinations
    takes arbitrary n)."""
    import itertools

    import pytest

    got = nano.select(
        "event",
        *[
            F.transform(
                combinations(F.col("Muon.pt"), k),
                (lambda _k: lambda s: F.array(*[s[f"f{i}"] for i in range(_k)]))(k),
            ).alias(f"c{k}")
            for k in (1, 4, 5)
        ],
    ).orderBy("event").collect()
    for row, ref in zip(got, nano_rows):
        pts = [m["pt"] for m in ref["Muon"]]
        for k in (1, 4, 5):
            want = [list(t) for t in itertools.combinations(pts, k)]
            have = [
                [pytest.approx(v, rel=1e-6) for v in c] for c in (row[f"c{k}"] or [])
            ]
            assert len(have) == len(want)
            for h, w in zip(have, want):
                assert w == h
    with pytest.raises(ValueError):
        combinations(F.col("Muon"), 0)
    with pytest.raises(ValueError):
        combinations(F.col("Muon"), 2, fields=["only_one"])


def test_pairs_exploded_matches_hof(spark, nano):
    hof = nano.select(F.explode(combinations(F.col("Muon"), 2)).alias("p")).count()
    rel = pairs_exploded(nano, "Muon").count()
    assert hof == rel


def test_pairs_adaptive_parity_across_threshold(spark, nano):
    """The adaptive switch must return the identical pair SET whether
    events route through the HOF branch, the exploded-join branch, or a
    mix — thresholds 0 (all exploded), 10^9 (all HOF), and a mid value
    that genuinely splits the nano fixture are compared row-for-row."""
    from coffea_spark.joins import pairs_adaptive

    def canon(df):
        return sorted(
            (r["event"], r["f0"]["pt"], r["f1"]["pt"])
            for r in df.select(
                "event", "f0", "f1"
            ).collect()
        )

    # pick a mid threshold that splits the fixture into both branches
    sizes = [r.n for r in nano.select(F.size("Muon").alias("n")).collect()]
    mid = sorted(sizes)[len(sizes) // 2]
    assert any(s <= mid for s in sizes) and any(s > mid for s in sizes)

    base = canon(pairs_adaptive(nano, "Muon", threshold=10**9))  # pure HOF
    assert canon(pairs_adaptive(nano, "Muon", threshold=0)) == base
    assert canon(pairs_adaptive(nano, "Muon", threshold=mid)) == base
    # and the HOF branch agrees with raw combinations()
    n_hof = nano.select(F.explode(combinations(F.col("Muon"), 2))).count()
    assert len(base) == n_hof


def test_metric_table_and_nearest(spark, nano, nano_rows):
    got = nano.select(
        "event",
        metric_table(F.col("Muon"), F.col("Jet")).alias("mt"),
        nearest(F.col("Muon"), F.col("Jet"), return_metric=True).alias("nst"),
        nearest(F.col("Muon"), F.col("Jet"), threshold=0.5)["pt"].alias("thr_pt"),
    ).orderBy("event").collect()

    def dphi(a, b):
        return (a - b + math.pi) % (2 * math.pi) - math.pi

    for row, ref in zip(got, nano_rows):
        mus, jets = ref["Muon"], ref["Jet"]
        want = [
            [math.hypot(m["eta"] - j["eta"], dphi(m["phi"], j["phi"])) for j in jets]
            for m in mus
        ]
        got_mt = [list(r) for r in (row.mt or [])]
        assert np.allclose(got_mt, want) if want and want[0] else got_mt == want
        # nearest = argmin of each metric row
        for k, m in enumerate(mus):
            if not jets:
                assert row.nst[k] is None
                continue
            best = int(np.argmin(want[k]))
            assert np.isclose(row.nst[k]["metric"], want[k][best])
            assert np.isclose(row.nst[k]["obj"]["pt"], jets[best]["pt"])
            # threshold form
            if want[k][best] < 0.5:
                assert np.isclose(row.thr_pt[k], jets[best]["pt"])
            else:
                assert row.thr_pt[k] is None


def test_children_parent_roundtrip(spark, nano):
    """children(i) all point back to i; parent of root is NULL.
    Reference invariant: tests/test_nanoevents.py genroundtrips."""
    df = nano.select(
        "event",
        F.col("GenPart").alias("gp"),
        children_idx(F.col("GenPart")).alias("kids"),
        parent_idx(F.col("GenPart")).alias("par"),
    )
    bad = df.select(
        F.exists(
            F.transform(
                F.col("kids"),
                lambda ks, i: F.exists(
                    ks, lambda j: F.element_at(F.col("gp"), j + 1)["genPartIdxMother"] != i
                ),
            ),
            lambda x: x,
        ).alias("bad")
    ).filter(F.col("bad")).count()
    assert bad == 0


def test_distinct_parent_pdg_differs(spark, nano, nano_rows):
    got = nano.select("event", distinct_parent_idx(F.col("GenPart")).alias("dp")).orderBy(
        "event"
    ).collect()
    n_checked = 0
    for row, ref in zip(got, nano_rows):
        parts = ref["GenPart"]
        for k, dpi in enumerate(list(row.dp or [])):
            if dpi is not None:
                # invariant: distinctParent.pdgId != pdgId
                assert parts[dpi]["pdgId"] != parts[k]["pdgId"]
                n_checked += 1
            else:
                # walk by hand: chain ends at root or loops
                m = parts[k]["genPartIdxMother"]
                while 0 <= m < len(parts) and parts[m]["pdgId"] == parts[k]["pdgId"]:
                    m = parts[m]["genPartIdxMother"]
                assert not (0 <= m < len(parts))
    assert n_checked > 100  # fixture must actually exercise the op


def test_distinct_children_deep(spark, nano, nano_rows):
    """Reference-kernel semantics (transforms.py:302-431, r9 parity
    fix): deep sets are EMPTY off chain tops; entries are either
    different-pdg descendants reached through same-pdg chains, or
    childless same-pdg chain members ('last ones in the chain')."""
    got = nano.select(
        "event", distinct_children_deep_idx(F.col("GenPart")).alias("dcd")
    ).orderBy("event").collect()
    n_same_pdg_leaves = 0
    for row, ref in zip(got, nano_rows):
        parts = ref["GenPart"]
        has_child = {p["genPartIdxMother"] for p in parts}
        for i, kids in enumerate(list(row.dcd or [])):
            m = parts[i]["genPartIdxMother"]
            is_top = 0 <= m < len(parts) and parts[m]["pdgId"] != parts[i]["pdgId"]
            if not is_top:
                # roots and chain-interior particles: empty by design
                assert list(kids) == []
                continue
            for c in kids:
                if parts[c]["pdgId"] == parts[i]["pdgId"]:
                    # same-pdg deep child must be a childless chain leaf
                    assert c not in has_child
                    n_same_pdg_leaves += 1
    # fixture is rich enough to exercise the last-in-chain branch
    assert n_same_pdg_leaves > 0


def test_slice_stability(spark, nano):
    """Reference pattern (tests/test_nanoevents.py:87-93): the
    genealogy/cross-ref invariants must survive event-level AND
    object-level slicing. Event filter keeps whole rows (indices stay
    valid); an object filter that DROPS pointed-at objects must be
    expressed as a mask (null-out), not a slice — we assert the mask
    spelling preserves the children->parent invariant."""
    sliced = nano.filter(F.size("GenPart") >= 4).limit(200)
    df = sliced.select(
        "event",
        F.col("GenPart").alias("gp"),
        children_idx(F.col("GenPart")).alias("kids"),
    )
    bad = df.select(
        F.exists(
            F.transform(
                F.col("kids"),
                lambda ks, i: F.exists(
                    ks, lambda j: F.element_at(F.col("gp"), j + 1)["genPartIdxMother"] != i
                ),
            ),
            lambda x: x,
        ).alias("bad")
    ).filter(F.col("bad")).count()
    assert bad == 0
    # masked (null-preserving) object filter: shape kept, invariant holds
    masked = sliced.select(
        "event",
        F.transform(
            "GenPart", lambda p: F.when(p["pt"] > 5.0, p)
        ).alias("gp_masked"),
        F.col("GenPart").alias("gp"),
    )
    r = masked.select(
        F.size("gp_masked").alias("n_masked"), F.size("gp").alias("n")
    ).agg(F.sum((F.col("n_masked") == F.col("n")).cast("int")).alias("same"),
          F.count(F.lit(1)).alias("total")).first()
    assert r.same == r.total  # mask preserves shape (nulls, not drops)
