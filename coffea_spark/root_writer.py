"""ROOT-format TTree SINK: write DataFrames back to .root files.

Reference surface: ``uproot_writeable`` (schemas/base.py:136-178,
schemas/nanoaod.py:417-464) — the reference converts events back to a
form uproot can write; this engine writes the binary format directly
(the reader in ``root_reader.py`` already encodes the format knowledge:
TKey records, ROOT compression framing, TBasket layout, TLeaf streamers).

Scope & honesty: files carry structurally correct TKey / TBasket /
compression framing and real TLeaf records (TLeafF/D/I/L/S/B/O member
layout per ROOT's streamers, NanoAOD-style counts leaves for jagged
columns), organized under a minimal TTree envelope (TNamed + fEntries +
a TObjArray shell of TBranch records). TStreamerInfo records are NOT
written — ROOT itself would regenerate missing dictionaries from its
own streamers for these foundation classes, but bit-level dictionary
parity is not claimed; the contract tested here is lossless round-trip
through :func:`coffea_spark.root_reader.read_root` and basket-level
compatibility (compression frames, entry-offset tables, fLast/keylen
bookkeeping) with the published format.

Distributed shape: ``write_root_dir`` is a real SINK — one task per
partition, each serializing its rows to one part-NNNNN.root file
(exactly parquet's layout contract), so a 100-TB frame fans out without
any driver materialization. ``write_root_file`` writes one file from a
small/collected frame (driver-side; for fixtures and tool interchange).

Supported column types: numeric/bool scalars and array<numeric/bool>
(jagged) columns. Jagged columns get an Int32 counts branch (shareable
via ``counts_map`` — NanoAOD's ``nMuon`` convention). Strings, structs,
and nested arrays are rejected with an actionable error.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_FBEGIN = 100
_MAXFRAME = (1 << 24) - 1  # ROOT compression frame limit (3-byte sizes)

# numpy kind+itemsize -> (TLeaf class, struct fmt for min/max, fLenType, unsigned)
_LEAF_FOR_DTYPE = {
    "f4": ("TLeafF", ">f", 4, False),
    "f8": ("TLeafD", ">d", 8, False),
    "i4": ("TLeafI", ">i", 4, False),
    "u4": ("TLeafI", ">i", 4, True),
    "i8": ("TLeafL", ">q", 8, False),
    "u8": ("TLeafL", ">q", 8, True),
    "i2": ("TLeafS", ">h", 2, False),
    "u2": ("TLeafS", ">h", 2, True),
    "i1": ("TLeafB", ">b", 1, False),
    "u1": ("TLeafB", ">b", 1, True),
    "b1": ("TLeafO", ">b", 1, False),  # bool
    "str": ("TLeafC", ">i", 1, False),  # one TString per entry
}
_LEAF_SUFFIX = {
    "TLeafF": "F", "TLeafD": "D", "TLeafI": "I", "TLeafL": "L",
    "TLeafS": "S", "TLeafB": "B", "TLeafO": "O", "TLeafC": "C",
}


class RootWriteError(ValueError):
    pass


def _tstring(s: str) -> bytes:
    b = s.encode("latin1")
    if len(b) < 255:
        return bytes([len(b)]) + b
    return b"\xff" + struct.pack(">I", len(b)) + b


def _bc(payload: bytes, version: int) -> bytes:
    """Versioned-object header: bytecount (kByteCountMask) + version."""
    return struct.pack(">IH", (len(payload) + 2) | 0x40000000, version) + payload


def _tobject() -> bytes:
    return struct.pack(">HII", 1, 0, 0x03000000)


def _tnamed(name: str, title: str) -> bytes:
    return _bc(_tobject() + _tstring(name) + _tstring(title), 1)


def _leaf_record(dtype_key: str, name: str, title: str, fixed_len: int = 1,
                 is_range: bool = False) -> bytes:
    """One streamed TLeaf with a first-use class tag — the layout
    root_reader._parse_leaves consumes (and ROOT's TLeaf v2 streamer)."""
    cls, mmfmt, lentype, unsigned = _LEAF_FOR_DTYPE[dtype_key]
    members = struct.pack(
        ">iiiBBI", fixed_len, lentype, 0, int(is_range), int(unsigned), 0
    )
    tleaf = _bc(_tnamed(name, title) + members, 2)
    minmax = struct.pack(mmfmt, 0) + struct.pack(mmfmt, 0)
    full = _bc(tleaf + minmax, 1)
    return b"\xff\xff\xff\xff" + cls.encode() + b"\x00" + full


def _tobjarray(items: list[bytes]) -> bytes:
    body = _tobject() + _tstring("") + struct.pack(">ii", len(items), 0)
    return b"\xff\xff\xff\xffTObjArray\x00" + _bc(
        body + b"".join(items), 3
    )


def _branch_record(name: str, title: str, entries: int, leaf: bytes) -> bytes:
    members = struct.pack(">iiqq", 32000, 0, entries, entries)
    body = _tnamed(name, title) + members + _tobjarray([leaf])
    return b"\xff\xff\xff\xffTBranch\x00" + _bc(body, 13)


def _compress(payload: bytes, level: int) -> "bytes | None":
    """ROOT multi-frame zlib stream ('ZL' + method + 3-byte sizes).
    Returns None when a frame's COMPRESSED size exceeds the 3-byte field
    (zlib expands incompressible data past 0xFFFFFF) — the caller then
    stores the payload raw instead of crashing."""
    out = []
    for i in range(0, len(payload), _MAXFRAME):
        chunk = payload[i : i + _MAXFRAME]
        comp = zlib.compress(chunk, level)
        if len(comp) > _MAXFRAME:
            return None
        out.append(
            b"ZL" + bytes([8])
            + len(comp).to_bytes(3, "little")
            + len(chunk).to_bytes(3, "little")
            + comp
        )
    return b"".join(out)


def _tkey(cls: str, name: str, title: str, payload: bytes, seekkey: int,
          extra_header: bytes = b"", compression: int = 1) -> bytes:
    """A full TKey record at ``seekkey``; compresses when it pays."""
    strings = _tstring(cls) + _tstring(name) + _tstring(title)
    keylen = 26 + len(strings) + len(extra_header)
    objlen = len(payload)
    stored = payload
    if compression and len(payload) > 64:
        comp = _compress(payload, compression)
        if comp is not None and len(comp) < len(payload):
            stored = comp
    nbytes = keylen + len(stored)
    if seekkey + nbytes >= 1 << 31:
        raise RootWriteError(
            "part file would exceed 2 GiB (32-bit TKey offsets); "
            "repartition the frame into smaller partitions or lower "
            "basket_rows"
        )
    head = struct.pack(
        ">iHiIhh", nbytes, 4, objlen, 0, keylen, 1
    ) + struct.pack(">ii", seekkey, _FBEGIN)
    rec = head + strings + extra_header + stored
    assert len(rec) == nbytes
    return rec


def _basket_record(branch: str, tree: str, content: bytes, nev: int,
                   seekkey: int, offsets: np.ndarray | None = None,
                   compression: int = 1) -> bytes:
    """TBasket: content (+ optional entry-offset table) with the
    fLast/keylen bookkeeping the readers rely on."""
    strings = _tstring("TBasket") + _tstring(branch) + _tstring(tree)
    keylen = 26 + len(strings) + 19  # + basket header (v,h) + 4i + flag
    flast = keylen + len(content)
    payload = content
    nev_size = 0
    if offsets is not None:
        # entry-offset table: i4 count, then keylen-based i4 offsets
        table = struct.pack(">i", nev) + (offsets + keylen).astype(">i4").tobytes()
        payload = content + table
        nev_size = 4
    basket_hdr = struct.pack(
        ">hiiii", 3, len(payload) + keylen, nev_size, nev, flast
    ) + b"\x00"
    return _tkey(
        "TBasket", branch, tree, payload, seekkey,
        extra_header=basket_hdr,
        compression=compression,
    )


def _column_arrays(name, values):
    """Normalize one column to (flat values, counts or None). The flat
    dtype comes from the first NON-EMPTY element — a row with an empty
    array must not promote an integer/bool column to float64 (numpy's
    default for np.asarray([]))."""
    s = values
    if len(s) and isinstance(s[0], (list, np.ndarray)):
        counts = np.asarray([len(x) for x in s], dtype=np.int32)
        parts = [np.asarray(x) for x in s]
        # dtype: numpy promotion over the NON-EMPTY parts only — an
        # empty row's float64 default must not promote an int column,
        # but genuine mixed dtypes (e.g. a null-bearing cell arriving
        # as float64) still promote rather than truncate
        non_empty = [p.dtype for p in parts if len(p)]
        elem_dtype = np.result_type(*non_empty) if non_empty else np.dtype(np.float64)
        flat = (
            np.concatenate([p.astype(elem_dtype, copy=False) for p in parts])
            if counts.sum()
            else np.asarray([], dtype=elem_dtype)
        )
        return flat, counts
    return np.asarray(s), None


def _is_string_array(arr: np.ndarray) -> bool:
    # an EMPTY object array can only be a string column here (jagged
    # columns are lists-of-arrays and never reach this as object dtype)
    return arr.dtype.kind == "U" or (
        arr.dtype == object and (len(arr) == 0 or isinstance(arr[0], str))
    )


def _dtype_key(arr: np.ndarray) -> str:
    if arr.dtype == bool:
        return "b1"
    if _is_string_array(arr):
        return "str"
    k = f"{arr.dtype.kind}{arr.dtype.itemsize}"
    if k not in _LEAF_FOR_DTYPE:
        raise RootWriteError(
            f"unsupported column dtype {arr.dtype} (supported: "
            f"{sorted(_LEAF_FOR_DTYPE)} + str scalars)"
        )
    return k


def serialize_root_file(
    columns: dict[str, "np.ndarray | list"],
    tree: str = "Events",
    title: str = "",
    counts_map: dict[str, str] | None = None,
    basket_rows: int = 65536,
    compression: int = 1,
) -> bytes:
    """Serialize named columns (numpy arrays; lists of arrays = jagged)
    into one in-memory ROOT file. Jagged columns get an Int32 counts
    branch named ``n_<col>`` unless ``counts_map`` assigns a shared one
    (columns mapped to the same counts branch must agree on lengths)."""
    counts_map = dict(counts_map or {})
    n_entries = None
    # normalize + derive counts branches
    flat: dict[str, tuple[np.ndarray, str | None]] = {}
    counts_data: dict[str, np.ndarray] = {}
    for name, vals in columns.items():
        arr, counts = _column_arrays(name, vals)
        rows = len(counts) if counts is not None else len(arr)
        if n_entries is None:
            n_entries = rows
        elif rows != n_entries:
            raise RootWriteError(
                f"column {name}: {rows} rows, expected {n_entries}"
            )
        if counts is not None:
            cname = counts_map.get(name, f"n_{name}")
            prev = counts_data.get(cname)
            if prev is not None and not np.array_equal(prev, counts):
                raise RootWriteError(
                    f"columns sharing counts branch {cname!r} disagree on "
                    f"per-entry lengths (first difference at entry "
                    f"{int(np.argmax(prev != counts))})"
                )
            counts_data[cname] = counts
            flat[name] = (arr, cname)
        else:
            flat[name] = (arr, None)
    n_entries = n_entries or 0

    # branch plan: counts branches first (ROOT requires the count leaf
    # to pre-exist its users)
    branch_arrays: dict[str, tuple[np.ndarray, str | None]] = {}
    for cname, counts in counts_data.items():
        if cname in flat:
            raise RootWriteError(
                f"counts branch name {cname!r} collides with a data column"
            )
        branch_arrays[cname] = (counts, None)
    branch_arrays.update(flat)

    # leaf + branch records
    branches = []
    for bname, (arr, cname) in branch_arrays.items():
        dk = _dtype_key(arr)
        cls = _LEAF_FOR_DTYPE[dk][0]
        if cname is not None:
            leaf_title = f"{bname}[{cname}]"
            br_title = f"{leaf_title}/{_LEAF_SUFFIX[cls]}"
        else:
            leaf_title = bname
            br_title = f"{bname}/{_LEAF_SUFFIX[cls]}"
        leaf = _leaf_record(
            dk, bname, leaf_title, is_range=bname in counts_data
        )
        branches.append(_branch_record(bname, br_title, n_entries, leaf))

    tree_payload = (
        _tnamed(tree, title or tree)
        + struct.pack(">q", n_entries)
        + _tobjarray(branches)
    )

    # assemble the file: header, directory key, baskets, tree key
    records = []
    pos = _FBEGIN
    dir_key = _tkey("TFile", "spark_graft", "", b"", pos, compression=0)
    records.append(dir_key)
    pos += len(dir_key)

    for bname, (arr, cname) in branch_arrays.items():
        counts = counts_data.get(cname) if cname else None
        # entry starts into the flat array
        if counts is not None:
            starts = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
        for b0 in range(0, max(n_entries, 1), basket_rows):
            b1 = min(b0 + basket_rows, n_entries)
            if b1 <= b0 and n_entries > 0:
                break
            if counts is not None:
                vals = arr[starts[b0] : starts[b1]]
                itemsize = vals.dtype.itemsize
                offs = (
                    (starts[b0:b1] - starts[b0]) * itemsize
                ).astype(np.int64)
            else:
                vals = arr[b0:b1]
                offs = None
            if _is_string_array(arr):
                if counts is not None:
                    raise RootWriteError(
                        f"{bname}: jagged string columns are not writable "
                        "(TLeafC is one string per entry)"
                    )
                parts = [_tstring(str(s)) for s in vals]
                lens = np.asarray([len(b) for b in parts], dtype=np.int64)
                offs = np.zeros(len(parts), dtype=np.int64)
                np.cumsum(lens[:-1], out=offs[1:])
                payload = b"".join(parts)
            elif vals.dtype == bool:
                payload = vals.astype("u1").tobytes()
            else:
                payload = vals.astype(vals.dtype.newbyteorder(">")).tobytes()
            rec = _basket_record(
                bname, tree, payload, b1 - b0, pos,
                offsets=offs, compression=compression,
            )
            records.append(rec)
            pos += len(rec)
            if n_entries == 0:
                break

    tree_key = _tkey("TTree", tree, title or tree, tree_payload, pos,
                     compression=compression)
    records.append(tree_key)
    pos += len(tree_key)
    fend = pos

    # Published TFile header layout (ROOT io/io/src/TFile.cxx, small-file
    # form): fVersion fBEGIN fEND fSeekFree fNbytesFree nfree fNbytesName
    # are 4-byte ints, then fUnits is ONE byte, then fCompress fSeekInfo
    # fNbytesInfo. Packing fUnits as an int would shift every later field.
    header = (
        b"root"
        + struct.pack(
            ">iiiiiii",
            63200,          # format version
            _FBEGIN,
            fend,           # fEND
            0, 0, 0,        # fSeekFree, fNbytesFree, nfree
            len(dir_key),   # fNbytesName (directory record size)
        )
        + struct.pack(">B", 4)  # fUnits: one byte
        + struct.pack(">iii", int(compression), 0, 0)  # fCompress, fSeekInfo, fNbytesInfo
    )
    header = header + b"\x00" * (_FBEGIN - len(header))
    return header + b"".join(records)


def write_root_file(
    df_or_columns,
    path: str,
    tree: str = "Events",
    counts_map: dict[str, str] | None = None,
    basket_rows: int = 65536,
    compression: int = 1,
) -> str:
    """Write ONE .root file from a (small) DataFrame or a column dict.
    DataFrame input collects to the driver — use :func:`write_root_dir`
    for frames that don't fit."""
    if isinstance(df_or_columns, dict):
        cols = df_or_columns
    else:
        pdf = df_or_columns.toPandas()
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        cols = {
            c: (list(v) if len(v) and isinstance(v[0], (list, np.ndarray)) else v)
            for c, v in cols.items()
        }
    blob = serialize_root_file(
        cols, tree=tree, counts_map=counts_map,
        basket_rows=basket_rows, compression=compression,
    )
    with open(path, "wb") as f:
        f.write(blob)
    return path


def write_events_root(
    df,
    path: str,
    tree: str = "Events",
    basket_rows: int = 65536,
    compression: int = 1,
) -> list[str]:
    """The reference's ``uproot_writeable`` surface end-to-end
    (schemas/base.py:136-178, schemas/nanoaod.py:417-464): flatten every
    ``X: array<struct>`` collection back to flat ``X_member`` branches
    sharing one NanoAOD-style ``nX`` counts leaf, then write the frame
    as a directory of .root part files. Events read with
    ``read_nanoevents`` round-trip: ROOT -> collections -> ROOT."""
    from pyspark.sql import types as T

    from coffea_spark.schema import unzip_collection

    counts_map: dict[str, str] = {}
    drop: list[str] = []
    for f in list(df.schema.fields):
        if isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, T.StructType
        ):
            members = [m.name for m in f.dataType.elementType.fields]
            df = unzip_collection(df, f.name)
            drop.append(f"n{f.name}")  # the sink re-derives counts leaves
            for m in members:
                counts_map[f"{f.name}_{m}"] = f"n{f.name}"
        elif isinstance(f.dataType, T.StructType):
            df = unzip_collection(df, f.name)
    if drop:
        df = df.drop(*drop)
    return write_root_dir(
        df, path, tree=tree, counts_map=counts_map,
        basket_rows=basket_rows, compression=compression,
    )


def write_root_dir(
    df,
    path: str,
    tree: str = "Events",
    counts_map: dict[str, str] | None = None,
    basket_rows: int = 65536,
    compression: int = 1,
) -> list[str]:
    """Distributed ROOT sink: one part-NNNNN.root per partition (the
    parquet directory-layout contract), written executor-side over the
    Arrow batch path (``mapInPandas`` — values never cross the Python
    boundary row-by-row) — no driver materialization, so the sink scales
    with the cluster. Peak executor memory is one partition's columns
    plus its serialized blob; size partitions accordingly (part files
    are capped at 2 GiB by the 32-bit TKey offsets). Returns the written
    file paths. Read back with ``read_root(spark, f"{path}/part-*.root")``."""
    import pandas as pd
    from pyspark.sql import types as ST

    os.makedirs(path, exist_ok=True)
    schema = df.schema
    names = [f.name for f in schema.fields]
    # jaggedness and integral-ness come from the SPARK schema, never
    # from sniffing batch values (a NULL first cell must not
    # misclassify a column)
    is_jagged = {
        f.name: isinstance(f.dataType, ST.ArrayType) for f in schema.fields
    }
    int_np = {
        ST.ByteType(): np.int8, ST.ShortType(): np.int16,
        ST.IntegerType(): np.int32, ST.LongType(): np.int64,
    }
    scalar_int = {
        f.name: int_np.get(f.dataType)
        for f in schema.fields
        if not is_jagged[f.name]
    }
    cmap = dict(counts_map or {})

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: dict[str, list] = {n: [] for n in names}
        for pdf in batches:
            if not len(pdf):
                continue
            for n in names:
                s = pdf[n]
                if is_jagged[n]:
                    if s.isna().any():
                        raise RootWriteError(
                            f"column {n!r} contains NULL arrays; ROOT "
                            "branches cannot store null collections — "
                            "coalesce to empty arrays before writing"
                        )
                    buf[n].extend(np.asarray(x) for x in s)
                else:
                    a = s.to_numpy()
                    want = scalar_int.get(n)
                    if want is not None and a.dtype.kind == "f":
                        # pandas turns int-with-null into float64/NaN;
                        # nulls have no leaflist representation — fail
                        # loudly, and cast null-free batches back
                        if np.isnan(a).any():
                            raise RootWriteError(
                                f"column {n!r} contains NULLs; ROOT "
                                "leaflist branches cannot store nulls"
                            )
                        a = a.astype(want)
                    buf[n].append(a)
        cols = {}
        n_rows = 0
        for n in names:
            if is_jagged[n]:
                cols[n] = buf[n]
                n_rows = max(n_rows, len(buf[n]))
            else:
                cols[n] = (
                    np.concatenate(buf[n]) if buf[n] else np.asarray([])
                )
                n_rows = max(n_rows, len(cols[n]))
        if n_rows == 0:
            return
        out = os.path.join(path, f"part-{pid:05d}.root")
        blob = serialize_root_file(
            cols, tree=tree, counts_map=cmap,
            basket_rows=basket_rows, compression=compression,
        )
        with open(out, "wb") as f:
            f.write(blob)
        yield pd.DataFrame({"path": [out]})

    return [
        r["path"]
        for r in df.mapInPandas(_write, schema="path string").collect()
    ]
