"""Schema restructuring: flat "branch" columns -> array<struct> collections.

The reference's NanoAODSchema groups flat branches into collections by
naming convention (reference: nanoevents/schemas/nanoaod.py:27-35 docstring,
_build_collections at nanoaod.py:255-408; the zip itself is zip_forms,
nanoevents/schemas/base.py:24-80). We reproduce the same four collection
shapes on a Spark DataFrame:

1. *singleton*        — plain scalar column per row (``run``)           -> kept as-is
2. *simple collection*— scalar columns ``MET_pt``, ``MET_phi``          -> ``MET: struct<pt,phi>``
3. *list singleton*   — one array column with no siblings               -> kept as-is
4. *jagged table*     — array columns ``Muon_pt``, ``Muon_eta``, ... (+
   optional count ``nMuon``)                                            -> ``Muon: array<struct<pt,eta,...>>``

Unlike the reference there is no offsets bookkeeping (counts2offsets,
nanoevents/transforms.py:90-112): Spark array columns carry their own
lengths, and ``F.size`` recovers counts. Count branches ``nX`` are dropped
after an optional consistency check.

All of this is pure column expressions (``arrays_zip`` / ``struct``) —
Catalyst sees through it, so nested-schema pruning still reaches the
parquet scan.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_collection_groups(df: DataFrame) -> dict[str, list[str]]:
    """Group column names by the NanoAOD-style prefix convention.

    Returns mapping collection name -> list of member column names (the
    flat names, e.g. ``{"Muon": ["Muon_pt", "Muon_eta"], ...}``).
    Columns without an underscore, count columns (``nX`` matching a
    collection ``X``), and lone array columns stay out of the mapping.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    groups: dict[str, list[str]] = defaultdict(list)
    for name in fields:
        if "_" in name:
            prefix = name.split("_", 1)[0]
            groups[prefix].append(name)
    # A group of one scalar column is not a collection; keep flat.
    return {k: sorted(v) for k, v in groups.items() if len(v) > 1}


def _zip_one(members: dict[str, Column]) -> Column:
    """arrays_zip with stable field names (field name = member suffix)."""
    return F.arrays_zip(*[col.alias(fname) for fname, col in members.items()])


def zip_collections(
    df: DataFrame,
    collections: dict[str, list[str]] | None = None,
    drop_counts: bool = True,
) -> DataFrame:
    """Restructure flat branch columns into collection columns.

    Parameters
    ----------
    df : flat DataFrame (one column per branch)
    collections : explicit mapping collection -> member columns; inferred
        via :func:`infer_collection_groups` when omitted.
    drop_counts : drop ``nX`` count columns for zipped collections.

    Array members zip into ``array<struct>`` (jagged table); scalar
    members pack into a ``struct`` (simple collection). Mixed groups
    raise. Equivalent reference op: zip_forms / listarray_form
    (nanoevents/schemas/base.py:5-80).
    """
    if collections is None:
        collections = infer_collection_groups(df)
    fields = {f.name: f.dataType for f in df.schema.fields}

    out_cols: list[Column] = []
    consumed: set[str] = set()
    for cname, members in collections.items():
        suffixes = {m: m.split("_", 1)[1] for m in members}
        kinds = {isinstance(fields[m], T.ArrayType) for m in members}
        if len(kinds) != 1:
            raise ValueError(
                f"collection {cname!r} mixes array and scalar members: {members}"
            )
        member_cols = {suffixes[m]: F.col(m) for m in members}
        if kinds.pop():  # jagged table
            zipped = _zip_one(member_cols)
        else:  # simple collection
            zipped = F.struct(*[c.alias(n) for n, c in member_cols.items()])
        out_cols.append(zipped.alias(cname))
        consumed.update(members)
        count_col = f"n{cname}"
        if drop_counts and count_col in fields:
            consumed.add(count_col)

    passthrough = [
        F.col(f"`{n}`").alias(n) for n in fields if n not in consumed
    ]
    return df.select(*passthrough, *out_cols)


def unzip_collection(df: DataFrame, name: str, drop: bool = True) -> DataFrame:
    """Inverse of :func:`zip_collections` for one collection: expand
    ``X: array<struct<a,b>>`` back into flat ``X_a``, ``X_b`` array columns
    plus an ``nX`` count column (the reference's writeable form,
    schemas/base.py:136-178 uproot_writeable)."""
    dtype = df.schema[name].dataType
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        flat = [
            F.col(name).getField(f.name).alias(f"{name}_{f.name}")
            for f in dtype.elementType.fields
        ]
        flat.append(F.size(name).alias(f"n{name}"))
    elif isinstance(dtype, T.StructType):
        flat = [F.col(f"{name}.{f.name}").alias(f"{name}_{f.name}") for f in dtype.fields]
    else:
        raise ValueError(f"column {name!r} is not a collection (got {dtype})")
    keep = [c for c in df.columns if c != name or not drop]
    return df.select(*keep, *flat)


# ---------------------------------------------------------------------------
# schema variants: derived-column synthesis + cross-reference metadata
# ---------------------------------------------------------------------------

class NanoAODSchemaSpec:
    """Declarative NanoAOD schema: synthesized columns and
    cross-reference metadata, applied before zipping (reference:
    schemas/nanoaod.py — full_like_items :169-190, rename/alias
    :191-200, cross_references/nested index build :291-311).

    Spark differences: there is no offsets bookkeeping, so "full_like
    from offsets" is a constant-valued ``transform`` over a sibling
    array, and the reference's GLOBAL index build (local2global) is
    unnecessary — collections live inside the event row, local indices
    gather directly (joins.gather_local). ``cross_references`` and
    ``nested_references`` therefore stay metadata: the NanoEvents proxy
    uses them to expose ``muons.matched_jet`` / ``jets.matched_muons``.
    """

    #: {absent_column: constant} -> synthesized with the collection's shape
    full_like_items: dict[str, float] = {
        "Photon_mass": 0.0,
        "Photon_charge": 0.0,
        "Jet_charge": 0.0,
        "FatJet_charge": 0.0,
    }
    #: {present_name: canonical_name} renames (regressed energy etc.)
    rename_items: dict[str, str] = {
        "Electron_regrEnergy": "Electron_energy",
        "Photon_regrEnergy": "Photon_energy",
    }
    #: {canonical_name: source_name} duplicated under a second name
    alias_items: dict[str, str] = {
        "CorrT1METJet_pt": "CorrT1METJet_rawPt",
        "CorrT1METJet_mass": "CorrT1METJet_rawMass",
    }
    #: every FK gather the LATEST NanoAOD version carries (reference
    #: nanoaod.py all_cross_references); per-version specs subtract the
    #: links a given production did not have yet
    all_cross_references: dict[str, str] = {
        "Muon_jetIdx": "Jet",
        "Muon_genPartIdx": "GenPart",
        "Muon_fsrPhotonIdx": "FsrPhoton",   # v6+
        "FsrPhoton_muonIdx": "Muon",        # v6+
        "Electron_jetIdx": "Jet",
        "Electron_genPartIdx": "GenPart",
        "Electron_photonIdx": "Photon",
        "Photon_electronIdx": "Electron",
        "Photon_jetIdx": "Jet",
        "Jet_genJetIdx": "GenJet",
        "FatJet_genJetAK8Idx": "GenJetAK8",  # v7+
        "GenPart_genPartIdxMother": "GenPart",
    }
    #: {index_column: target_collection} FK gathers (Muon.matched_jet, ...)
    cross_references: dict[str, str] = dict(all_cross_references)
    #: NanoAOD production version this spec models
    version: str = "latest"
    #: event identifiers every NanoAOD file must carry (reference
    #: schemas/nanoaod.py NanoAODSchema.event_ids, checked in
    #: _build_collections)
    event_ids: list[str] = ["run", "luminosityBlock", "event"]
    #: raise (True) or warn (False) when event ids are missing —
    #: reference NanoAODSchema.error_missing_event_ids
    error_missing_event_ids: bool = True

    @classmethod
    def validate_event_ids(cls, df: DataFrame) -> None:
        """Check the frame carries the NanoAOD event identifiers;
        RuntimeError (default) or RuntimeWarning per
        ``error_missing_event_ids`` — the reference's message and
        escape hatch (schemas/nanoaod.py:321-334)."""
        missing = [e for e in cls.event_ids if e not in df.columns]
        if not missing:
            return
        msg = (
            f"Missing event_ids : {missing}\n"
            "Set error_missing_event_ids=False on the schema spec to "
            "demote this to a warning"
        )
        if cls.error_missing_event_ids:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(f"Missing event_ids : {missing}", RuntimeWarning)

    @classmethod
    def versioned(cls, version: str) -> type["NanoAODSchemaSpec"]:
        """Version-specific spec (reference nanoaod.py:202-253): NanoAOD
        v5/v6/v7 lack cross-links added later — v7 introduced
        FatJet->GenJetAK8 matching, v6 the muon FSR-photon links. The
        returned class behaves like this one with those links removed,
        so the NanoEvents proxy refuses gathers the production never
        wrote instead of emitting NULL joins."""
        xref = dict(cls.all_cross_references)
        if version != "latest":
            if int(version) < 7:
                xref.pop("FatJet_genJetAK8Idx", None)
            if int(version) < 6:
                xref.pop("FsrPhoton_muonIdx", None)
                xref.pop("Muon_fsrPhotonIdx", None)
        return type(
            f"{cls.__name__}V{version}",
            (cls,),
            {"cross_references": xref, "version": version},
        )

    @classmethod
    def v7(cls) -> type["NanoAODSchemaSpec"]:
        return cls.versioned("7")

    @classmethod
    def v6(cls) -> type["NanoAODSchemaSpec"]:
        return cls.versioned("6")

    @classmethod
    def v5(cls) -> type["NanoAODSchemaSpec"]:
        return cls.versioned("5")
    #: {source_collection: {attr: (target, [index_fields...])}} 1->k FKs
    nested_references: dict[str, dict[str, tuple[str, list[str]]]] = {
        "Jet": {
            "matched_muons": ("Muon", ["muonIdx1", "muonIdx2"]),
            "matched_electrons": ("Electron", ["electronIdx1", "electronIdx2"]),
        },
    }
    #: {collection: behavior} — which computed-property family applies
    mixins: dict[str, str] = {
        "Muon": "PtEtaPhiMCandidate",
        "Electron": "PtEtaPhiMCandidate",
        "Photon": "PtEtaPhiMCandidate",
        "Jet": "PtEtaPhiMLorentzVector",
        "FatJet": "PtEtaPhiMLorentzVector",
        "GenPart": "PtEtaPhiMCandidate",
        "GenJet": "PtEtaPhiMLorentzVector",
        "MET": "MissingET",
    }

    @classmethod
    def synthesize(cls, df: DataFrame) -> DataFrame:
        """Apply rename/alias/constant-fill at the flat-branch level."""
        fields = {f.name: f.dataType for f in df.schema.fields}
        for src, dst in cls.rename_items.items():
            if src in fields and dst not in fields:
                df = df.withColumnRenamed(src, dst)
                fields[dst] = fields.pop(src)
        for dst, src in cls.alias_items.items():
            if src in fields and dst not in fields:
                df = df.withColumn(dst, F.col(src))
                fields[dst] = fields[src]
        for name, const in cls.full_like_items.items():
            if name in fields:
                continue
            coll = name.split("_", 1)[0]
            sibling = next(
                (c for c in fields if c.startswith(coll + "_")), None
            )
            if sibling is None:
                continue
            if isinstance(fields[sibling], T.ArrayType):
                filled = F.transform(F.col(sibling), lambda _: F.lit(const))
            else:
                filled = F.lit(const)
            df = df.withColumn(name, filled)
            fields[name] = df.schema[name].dataType
        return df

    @classmethod
    def apply(cls, df: DataFrame, collections: dict[str, list[str]] | None = None,
              drop_counts: bool = True) -> DataFrame:
        """synthesize + zip: flat branches -> collection columns."""
        return zip_collections(cls.synthesize(df), collections, drop_counts)


class PFNanoAODSchema(NanoAODSchemaSpec):
    """PFNano variant: PF candidates + secondary vertices with their
    jet/candidate cross-links (reference schemas/nanoaod.py:467-508)."""

    mixins = {
        **NanoAODSchemaSpec.mixins,
        "PFCands": "PFCand",
        "GenCands": "PFCand",
        "JetPFCands": "AssociatedPFCand",
        "JetSVs": "AssociatedSV",
    }
    cross_references = {
        **NanoAODSchemaSpec.cross_references,
        "JetPFCands_jetIdx": "Jet",
        "JetPFCands_pFCandsIdx": "PFCands",
        "JetSVs_jetIdx": "Jet",
        "JetSVs_sVIdx": "SV",
        "FatJetPFCands_jetIdx": "FatJet",
        "FatJetPFCands_pFCandsIdx": "PFCands",
    }


class ScoutingNanoAODSchema(NanoAODSchemaSpec):
    """Scouting variant: scouting objects mapped onto the standard
    behaviors, with their constant fills and MET aliases (reference
    schemas/nanoaod.py:511-557)."""

    mixins = {
        **NanoAODSchemaSpec.mixins,
        "ScoutingJet": "PtEtaPhiMLorentzVector",
        "ScoutingFatJet": "PtEtaPhiMLorentzVector",
        "ScoutingMET": "MissingET",
        "ScoutingElectron": "PtEtaPhiMCandidate",
        "ScoutingPhoton": "PtEtaPhiMCandidate",
        "ScoutingMuonNoVtx": "PtEtaPhiMCandidate",
        "ScoutingMuonVtx": "PtEtaPhiMCandidate",
    }
    full_like_items = {
        **NanoAODSchemaSpec.full_like_items,
        "ScoutingJet_charge": 0.0,
        "ScoutingFatJet_charge": 0.0,
        "ScoutingPhoton_m": 0.0,
        "ScoutingPhoton_charge": 0.0,
    }
    alias_items = {
        **NanoAODSchemaSpec.alias_items,
        "MET_pt": "MET_fiducialGenPt",
        "MET_phi": "MET_fiducialGenPhi",
    }


def collection_fields(df: DataFrame, name: str) -> list[str]:
    """Field names of an array<struct> collection column."""
    dtype = df.schema[name].dataType
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        return [f.name for f in dtype.elementType.fields]
    if isinstance(dtype, T.StructType):
        return [f.name for f in dtype.fields]
    raise ValueError(f"column {name!r} is not a collection (got {dtype})")


def pad_none(col: Column, n: int, clip: bool = False) -> Column:
    """``ak.pad_none`` analog: pad an array column with nulls up to
    length ``n`` (so positional access like ``element_at(col, 2)`` is
    total); ``clip=True`` also truncates longer arrays to exactly
    ``n``. Pure HOF math — per-row, no shuffle. The null filler is
    derived from the column itself (a never-true ``when`` over its
    first element), so the element type is preserved for ANY array —
    structs included — without a cast guess. Reference: ak.pad_none,
    the leading-object-access idiom (methods/vector.py:388-389
    ``ak.firsts``)."""
    filler = F.slice(
        F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.when(F.lit(False), F.element_at(col, 1)),
        ),
        1,
        F.greatest(F.lit(n) - F.size(col), F.lit(0)),
    )
    padded = F.concat(col, filler)
    return F.slice(padded, 1, n) if clip else padded
