"""File readers: WKT and CSV geometry sources (reference S1-S5 parity).

* WKT (reference src/env/partitioning.cpp:361-604): one geometry per line
  (first TSV column), invalid / wrong-type / MULTI* rows skipped, recID =
  0-based line number (partitioning.cpp:526 uses the line counter even when
  rows are skipped).
* CSV (partitioning.cpp:201-354): ``id,x y,x y,...`` rows.

``load_*_table`` are driver-side loaders for small query/golden files;
``read_wkt`` is the distributed path (per-file tasks, collision-free ids:
file_rank * FILE_ID_STRIDE + line number; single-file ids equal the
driver-side loader's line numbers exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geometry.core import GTYPE_NAMES, mbr_of, parse_wkt, pts_to_coords

_NAME_TO_GTYPE = {v: k for k, v in GTYPE_NAMES.items()}


def _geom_table(ids, gtypes, coords_list) -> pa.Table:
    mbrs = np.array([mbr_of(g, c) for g, c in zip(gtypes, coords_list)]) \
        if len(ids) else np.zeros((0, 4))
    offs = np.zeros(len(ids) + 1, dtype=np.int32)
    if len(ids):
        np.cumsum([len(c) for c in coords_list], out=offs[1:])
    flat = np.concatenate(coords_list) if len(ids) else np.zeros(0)
    return pa.table({
        "id": pa.array(np.asarray(ids, dtype=np.int64)),
        "gtype": pa.array(np.asarray(gtypes, dtype=np.int8)),
        "coords": pa.ListArray.from_arrays(pa.array(offs),
                                           pa.array(flat,
                                                    type=pa.float64())),
        "minx": pa.array(mbrs[:, 0]), "miny": pa.array(mbrs[:, 1]),
        "maxx": pa.array(mbrs[:, 2]), "maxy": pa.array(mbrs[:, 3]),
    })


def load_wkt_table(path: str, data_type: str | None = None) -> pa.Table:
    """Driver-side WKT file -> geometry table; id = 0-based line number.

    ``data_type`` (e.g. "POLYGON") mirrors prepareDataset's declared type:
    rows of a different type are skipped (partitioning.cpp:528-531)."""
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None
    ids, gts, coords = [], [], []
    with open(path) as f:
        for lineno, line in enumerate(f):
            line = line.split("\t")[0].strip()
            if not line:
                continue
            g = parse_wkt(line)
            if g is None:
                continue
            if want is not None and g[0] != want:
                continue
            ids.append(lineno)
            gts.append(g[0])
            coords.append(np.asarray(g[1]))
    return _geom_table(ids, gts, coords)


def load_csv_table(path: str, data_type: str) -> pa.Table:
    """Driver-side CSV ``id,x y,x y,...`` -> geometry table
    (reference partitioning.cpp:201-354 format)."""
    want = _NAME_TO_GTYPE[data_type]
    ids, gts, coords = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 2:
                continue
            try:
                rid = int(parts[0])
                pts = np.array([[float(v) for v in p.split()]
                                for p in parts[1:] if p.strip()])
            except ValueError:
                continue
            if pts.ndim != 2 or pts.shape[1] != 2:
                continue
            ids.append(rid)
            gts.append(want)
            coords.append(pts_to_coords(pts))
    return _geom_table(ids, gts, coords)


FILE_ID_STRIDE = 1 << 40    # ids = file_rank * stride + line number


def read_wkt(paths, data_type: str | None = None):
    """Distributed WKT reader with collision-free stable ids.

    Each file is parsed whole in one task; ``id = file_rank * FILE_ID_STRIDE
    + 0-based line number`` where file_rank is the file's index in the sorted
    path list.  For a single file this reproduces the driver-side
    ``load_wkt_table`` ids exactly (reference recID semantics,
    partitioning.cpp:526).  The unit of read parallelism is the file — at
    100 TB the corpus is many files, so this matches the reference's
    per-file loading while keeping ids stable regardless of Ray's block
    re-batching (a per-batch enumerate would collide across blocks)."""
    import os
    import ray.data as rd
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None

    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += [os.path.join(p, f) for f in sorted(os.listdir(p))
                      if not f.startswith(".")]
        else:
            files.append(str(p))
    def _norm(path: str) -> str:
        # read_binary_files may return scheme-stripped and/or absolute
        # paths; abspath only applies to local paths (an s3://... key
        # must NOT resolve against cwd)
        had_scheme = "://" in path
        p = path.split("://", 1)[-1]
        return p if had_scheme else os.path.abspath(p)

    files = sorted(dict.fromkeys(_norm(f) for f in files))
    rank = {f: i for i, f in enumerate(files)}

    def _rank_of(path: str) -> int:
        p = _norm(path)
        if p in rank:
            return rank[p]
        # object-store reads come back scheme-stripped ("bucket/key")
        # while the rank key may be the original normalized form; fall
        # back to suffix matching before failing
        for k, i in rank.items():
            if k.endswith(p) or p.endswith(k):
                return i
        raise KeyError(path)

    def parse(t: pa.Table) -> pa.Table:
        ids, gts, coords = [], [], []
        for path, data in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            base = _rank_of(path) * FILE_ID_STRIDE
            for lineno, line in enumerate(
                    data.decode("utf-8", "replace").splitlines()):
                line = line.split("\t")[0].strip()
                if not line:
                    continue
                g = parse_wkt(line)
                if g is None or (want is not None and g[0] != want):
                    continue
                ids.append(base + lineno)
                gts.append(g[0])
                coords.append(np.asarray(g[1]))
        return _geom_table(ids, gts, coords)

    return rd.read_binary_files(files, include_paths=True) \
        .map_batches(parse, batch_size=1, batch_format="pyarrow")


def read_wkt_split(paths, data_type: str | None = None,
                   target_bytes: int = 64 << 20):
    """Byte-range-split WKT reader (reference S5 mmap analog,
    src/env/partitioning.cpp:606-748): one huge file no longer caps read
    parallelism at one task.

    Ids are IDENTICAL to ``read_wkt`` / ``load_wkt_table`` (file_rank *
    FILE_ID_STRIDE + 0-based line number): a cheap prepass counts
    newlines per chunk (vectorized ``bytes.count``), the driver
    prefix-sums the counts (one tiny row per chunk), and the parse pass
    reconstructs exact global line numbers from its chunk's prefix.

    Chunk-boundary protocol: a line belongs to the chunk where it STARTS.
    A task reads ``[start-1, end)`` — the lookback byte decides whether a
    line starts exactly at ``start`` — skips the partial head line (it
    started in the previous chunk), and extends past ``end`` to finish
    its last line.  Files <= target_bytes skip the prepass entirely.
    """
    import os
    import ray.data as rd
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None

    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += [os.path.join(p, f) for f in sorted(os.listdir(p))
                      if not f.startswith(".")]
        else:
            files.append(str(p))
    files = sorted(dict.fromkeys(os.path.abspath(f) for f in files))

    chunks = []            # (path, rank, start, end, chunk_idx_in_file)
    per_file_nchunks = {}
    for rank, f in enumerate(files):
        size = os.path.getsize(f)
        n = max(1, -(-size // target_bytes))
        per_file_nchunks[rank] = n
        step = -(-size // n)
        for k in range(n):
            chunks.append({"path": f, "rank": rank,
                           "start": k * step,
                           "end": min((k + 1) * step, size), "k": k})

    # prepass: newline count per chunk, only for files that are split
    split_chunks = [c for c in chunks if per_file_nchunks[c["rank"]] > 1]
    base_lines = {(c["rank"], c["k"]): 0 for c in chunks}
    if split_chunks:
        def count_nl(t: pa.Table) -> pa.Table:
            out = []
            for row in t.to_pylist():
                with open(row["path"], "rb") as fh:
                    fh.seek(row["start"])
                    out.append(fh.read(row["end"] - row["start"])
                               .count(b"\n"))
            return t.append_column("nl", pa.array(out, type=pa.int64()))

        counted = (rd.from_items(split_chunks,
                                 override_num_blocks=len(split_chunks))
                   .map_batches(count_nl, batch_format="pyarrow")
                   .take_all())
        by_file: dict[int, dict[int, int]] = {}
        for row in counted:
            by_file.setdefault(row["rank"], {})[row["k"]] = row["nl"]
        for rank, ks in by_file.items():
            acc = 0
            for k in sorted(ks):
                base_lines[(rank, k)] = acc
                acc += ks[k]

    for c in chunks:
        c["base_line"] = base_lines[(c["rank"], c["k"])]

    def parse_chunk(t: pa.Table) -> pa.Table:
        ids, gts, coords = [], [], []
        for row in t.to_pylist():
            path, s, e = row["path"], row["start"], row["end"]
            lineno = row["base_line"]
            with open(path, "rb") as fh:
                lo = max(s - 1, 0)
                fh.seek(lo)
                buf = fh.read(e - lo)
                # extend to complete the last line started before `end`
                while not buf.endswith(b"\n"):
                    ext = fh.read(1 << 16)
                    if not ext:
                        break
                    nl = ext.find(b"\n")
                    if nl >= 0:
                        buf += ext[:nl + 1]
                        break
                    buf += ext
                if s > 0:
                    if buf[:1] == b"\n":
                        buf = buf[1:]        # line starts exactly at s
                    else:
                        nl = buf.find(b"\n")
                        if nl < 0:
                            continue          # chunk is mid-line only
                        buf = buf[nl + 1:]   # head belongs to prev chunk
                        lineno += 1
            base = row["rank"] * FILE_ID_STRIDE
            for line in buf.decode("utf-8", "replace").splitlines():
                this_line = lineno
                lineno += 1
                line = line.split("\t")[0].strip()
                if not line:
                    continue
                g = parse_wkt(line)
                if g is None or (want is not None and g[0] != want):
                    continue
                ids.append(base + this_line)
                gts.append(g[0])
                coords.append(np.asarray(g[1]))
        return _geom_table(ids, gts, coords)

    return (rd.from_items(chunks, override_num_blocks=len(chunks))
            .map_batches(parse_chunk, batch_format="pyarrow"))


def write_partitioned(ds, out_dir: str, grid=None):
    """Resumable sink (reference S6 partition-file writer analog): one
    parquet directory; pair with state.checkpoint for skip-if-done."""
    ds.write_parquet(out_dir)


# ---------------------------------------------------------------------------
# GeoJSON (RFC 7946) — third text source beside WKT/CSV
# ---------------------------------------------------------------------------

_GJ_TYPES = {"Point": 1, "LineString": 2, "Polygon": 3}


def _norm_path(path: str) -> str:
    """Normalize like read_wkt: abspath local paths only (a scheme-
    qualified object-store key must not resolve against cwd)."""
    import os
    had_scheme = "://" in path
    p = path.split("://", 1)[-1]
    return p if had_scheme else os.path.abspath(p)


def _geojson_geom(geom: dict):
    """GeoJSON geometry dict -> (gtype, flat coords) or None (skip).

    Engine conventions (geometry/core.py): polygons keep the OUTER ring
    only, stored unclosed; Multi*/GeometryCollection and holes are skipped
    like the WKT loader skips MULTI* rows (partitioning.cpp:528-531)."""
    gt = _GJ_TYPES.get(geom.get("type"))
    if gt is None:
        return None
    c = geom.get("coordinates")
    try:
        if gt == 1:
            flat = np.asarray(c, dtype=np.float64)
            if flat.shape != (2,):
                return None
        elif gt == 2:
            pts = np.asarray(c, dtype=np.float64)
            if pts.ndim != 2 or pts.shape[0] < 2 or pts.shape[1] != 2:
                return None
            flat = pts.ravel()
        else:
            rings = c
            if not rings:
                return None
            ring = np.asarray(rings[0], dtype=np.float64)
            if ring.ndim != 2 or ring.shape[1] != 2 or ring.shape[0] < 4:
                return None
            if (ring[0] == ring[-1]).all():
                ring = ring[:-1]          # store unclosed
            if ring.shape[0] < 3:
                return None
            # normalize to CCW (shoelace sign)
            x, y = ring[:, 0], ring[:, 1]
            if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
                ring = ring[::-1]
            flat = ring.ravel()
    except (TypeError, ValueError):
        return None
    return gt, flat


def load_geojson_table(path: str, data_type: str | None = None) -> pa.Table:
    """Driver-side GeoJSON FeatureCollection (or bare geometry /
    feature) -> geometry table; id = feature index, or the feature's
    integer ``id`` member when present on every feature."""
    import json
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        feats = doc.get("features", [])
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:
        feats = [{"geometry": doc}]
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None
    use_ids = all(isinstance(f.get("id"), int) for f in feats) and feats
    ids, gts, coords = [], [], []
    for k, f in enumerate(feats):
        g = _geojson_geom(f.get("geometry") or {})
        if g is None:
            continue
        if want is not None and g[0] != want:
            continue
        ids.append(f["id"] if use_ids else k)
        gts.append(g[0])
        coords.append(g[1])
    return _geom_table(ids, gts, coords)


def read_geojsonl(paths, data_type: str | None = None):
    """Distributed GeoJSON-Lines reader (one Feature or geometry JSON per
    line — the standard big-data GeoJSON layout; a single FeatureCollection
    file cannot be split without parsing it whole).  Ids are collision-free
    across files: file_rank * FILE_ID_STRIDE + line number, matching
    read_wkt's scheme."""
    import json
    import ray.data as rd
    if isinstance(paths, str):
        paths = [paths]
    ranked = sorted(_norm_path(p) for p in paths)
    rank = {p: i for i, p in enumerate(ranked)}
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None

    def parse(t: pa.Table) -> pa.Table:
        ids, gts, coords = [], [], []
        for path, data in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            p = _norm_path(path)
            base = rank.get(p)
            if base is None:        # scheme-stripped read path
                base = next((i for k, i in rank.items()
                             if k.endswith(p) or p.endswith(k)), 0)
            base *= FILE_ID_STRIDE
            for lineno, line in enumerate(
                    data.decode("utf-8", "replace").splitlines()):
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]", "{", "}"):
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                geom = obj.get("geometry", obj) if isinstance(obj, dict) \
                    else None
                g = _geojson_geom(geom or {})
                if g is None:
                    continue
                if want is not None and g[0] != want:
                    continue
                ids.append(base + lineno)
                gts.append(g[0])
                coords.append(g[1])
        return _geom_table(ids, gts, coords)

    return rd.read_binary_files(paths, include_paths=True) \
        .map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_geojsonl(table: pa.Table, path: str) -> None:
    """Geometry table -> GeoJSON-Lines file (one Feature per row)."""
    import json
    inv = {1: "Point", 2: "LineString", 3: "Polygon"}
    with open(path, "w") as f:
        for row in table.to_pylist():
            flat = np.asarray(row["coords"]).reshape(-1, 2)
            gt = int(row["gtype"])
            if gt == 4:               # box -> closed polygon ring
                (x0, y0), (x1, y1) = flat
                ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                geom = {"type": "Polygon", "coordinates": [ring]}
            elif gt == 3:
                ring = flat.tolist() + [flat[0].tolist()]
                geom = {"type": "Polygon", "coordinates": [ring]}
            elif gt == 2:
                geom = {"type": "LineString", "coordinates": flat.tolist()}
            else:
                geom = {"type": "Point", "coordinates": flat[0].tolist()}
            f.write(json.dumps({"type": "Feature", "id": int(row["id"]),
                                "geometry": geom, "properties": {}})
                    + "\n")


# ---------------------------------------------------------------------------
# WKB parquet (GeoParquet-style: geometry as a WKB binary column)
# ---------------------------------------------------------------------------
# The reference ingests WKT/CSV text only (src/env/partitioning.cpp:361-604);
# WKB-in-parquet is the standard binary interchange layout (GeoParquet, and
# the Lance-style tables the north rule names carry binary payload columns
# the same way), so the engine reads and writes it natively.  Rows whose
# WKB fails to parse (or is a MULTI*/nested type) are skipped, matching the
# WKT reader's invalid-row policy.

def parse_wkb_batch(t: pa.Table, geometry_col: str = "geometry",
                    id_col: str = "id", want: int | None = None) -> pa.Table:
    """One parquet batch with a WKB binary column -> geometry table.

    All-point batches (the dominant shape at scale) take a zero-copy
    vectorized path over the Arrow binary buffers; mixed batches fall
    back to per-row ``from_wkb``."""
    from ..geometry.core import GT_POINT, from_wkb
    idc = t[id_col]
    if idc.null_count:
        # a NaN->int64 cast would silently mint INT64_MIN join keys
        raise ValueError(f"WKB parquet {id_col!r} column contains nulls")
    ids_in = idc.to_numpy(zero_copy_only=False).astype(np.int64)
    geo = t[geometry_col].combine_chunks()
    n = len(geo)
    if n and geo.null_count == 0:
        if isinstance(geo, pa.LargeBinaryArray):
            off_dt = np.int64
        else:
            off_dt = np.int32
        offs = np.frombuffer(geo.buffers()[1], dtype=off_dt)[
            geo.offset: geo.offset + n + 1]
        if ((offs[1:] - offs[:-1]) == 21).all():
            raw = np.frombuffer(geo.buffers()[2], dtype=np.uint8)
            b = raw[offs[0]: offs[-1]].reshape(n, 21)
            if (b[:, 0] == 1).all() and \
                    (b[:, 1:5].copy().view("<u4").ravel() == 1).all():
                if want is not None and want != GT_POINT:
                    return _geom_table([], [], [])
                xy = b[:, 5:21].copy().view("<f8").reshape(n, 2)
                loffs = np.arange(n + 1, dtype=np.int32) * 2
                return pa.table({
                    "id": pa.array(ids_in),
                    "gtype": pa.array(
                        np.full(n, GT_POINT, dtype=np.int8)),
                    "coords": pa.ListArray.from_arrays(
                        pa.array(loffs),
                        pa.array(xy.ravel(), type=pa.float64())),
                    "minx": pa.array(xy[:, 0]), "miny": pa.array(xy[:, 1]),
                    "maxx": pa.array(xy[:, 0]), "maxy": pa.array(xy[:, 1]),
                })
    ids, gts, coords = [], [], []
    for rid, buf in zip(ids_in, geo.to_pylist()):
        g = from_wkb(buf) if buf is not None else None
        if g is None:
            continue
        if want is not None and g[0] != want:
            continue
        ids.append(rid)
        gts.append(g[0])
        coords.append(np.asarray(g[1], dtype=np.float64))
    return _geom_table(ids, gts, coords)


def read_wkb_parquet(paths, geometry_col: str = "geometry",
                     id_col: str = "id", data_type: str | None = None):
    """Distributed GeoParquet-style reader: parquet files with a WKB
    binary geometry column -> engine geometry Dataset
    (id/gtype/coords/minx..maxy).  Only ``id_col`` and ``geometry_col``
    leave storage (column-pruned read); ``data_type`` filters rows like
    prepareDataset's declared type does for the WKT reader."""
    import ray.data as rd
    want = _NAME_TO_GTYPE.get(data_type) if data_type else None
    if data_type == "BOX":
        # boxes have no WKB type of their own: the writer encodes them as
        # their closed polygon ring, so a GT_BOX filter would silently
        # match nothing — fail loudly with the correct spelling instead
        raise ValueError("WKB carries boxes as polygon rings; "
                         "filter with data_type='POLYGON'")

    def parse(t: pa.Table) -> pa.Table:
        return parse_wkb_batch(t, geometry_col, id_col, want)

    return rd.read_parquet(paths, columns=[id_col, geometry_col]) \
        .map_batches(parse, batch_format="pyarrow")


def geom_to_wkb_table(t: pa.Table, geometry_col: str = "geometry") -> pa.Table:
    """Geometry table -> (id, WKB binary) table (boxes written as their
    closed polygon ring, the WKB-standard encoding for them)."""
    from ..geometry.core import to_wkb
    bufs = [to_wkb(int(g), np.asarray(c.as_py()))
            for g, c in zip(t["gtype"].to_pylist(), t["coords"])]
    return pa.table({"id": t["id"],
                     geometry_col: pa.array(bufs, type=pa.binary())})


def write_wkb_parquet(ds, out_dir: str,
                      geometry_col: str = "geometry") -> None:
    """Distributed geometry Dataset -> WKB parquet directory."""
    ds.map_batches(lambda t: geom_to_wkb_table(t, geometry_col),
                   batch_format="pyarrow").write_parquet(out_dir)


def read_lance_or_parquet(path: str, columns=None):
    """Prefer Lance when the library exists (the north-star input format),
    fall back to parquet (this container has no lance)."""
    import ray.data as rd
    try:
        import lance  # noqa: F401
        return rd.read_lance(path, columns=columns)
    except ImportError:
        return rd.read_parquet(path, columns=columns)
