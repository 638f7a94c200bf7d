"""Partitioned spatial store: cell-keyed parquet layout + fragment pruning.

Reference parity: the partition files the reference writes/reads per node
(S6/S7, src/env/partitioning.cpp + storage) and, on top of them, the index
pruning its query filters do in memory:

* range:  visit only cells overlapping the window, bulk-accept interior
  cells (src/TwoLayer/range_filter.cpp:91-685) -> here: skip parquet
  fragments whose footer MBR statistics don't intersect the window.
* kNN:    prune partitions by distanceToPartition vs the current heap max
  (src/UniformGrid/knn_filter.cpp:7-55, include/containers.h:424-428)
  -> here: expand cell-group rings by min-distance until k rows are
  covered, derive a sound radius bound, and scan only fragments within it.

Layout: each row is assigned to exactly ONE cell (the cell of its MBR
center — the store is a storage layout, not the join's replicated
assignment), cells are grouped into ``cgroup = hilbert_d >> group_shift``
so every parquet partition directory covers a spatially compact block of
cells, and ``write_parquet(partition_cols=["cgroup"])`` writes one
directory per group.  Fragment pruning reads ONLY parquet footers
(min/max statistics of the minx/miny/maxx/maxy columns + row counts), the
same trick table formats use — no sidecar index required, and it works
unchanged on object storage at 100 TB.  The manifest (per-fragment bounds
+ row counts) is cached as JSON next to the data after the first scan.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import GridSpec
from ..geometry.hilbert import xy2d

MANIFEST = "_spatial_manifest.json"


def _center_cells(grid: GridSpec, minx, miny, maxx, maxy) -> np.ndarray:
    cx = np.clip(((minx + maxx) / 2 - grid.minx) / grid.cell_w,
                 0, grid.ppd - 1).astype(np.int64)
    cy = np.clip(((miny + maxy) / 2 - grid.miny) / grid.cell_h,
                 0, grid.ppd - 1).astype(np.int64)
    return cx, cy


def write_spatial(ds, out_dir: str, grid: GridSpec,
                  group_shift: int = 6) -> str:
    """Write ds (a geometry table) cell-partitioned under out_dir.

    ``group_shift``: cells per group = 2^group_shift along the Hilbert
    curve (ppd=128, shift=6 -> 256 groups of 64 curve-adjacent cells).
    Returns out_dir.  Resumable: pair with state.checkpoint upstream; the
    write itself is one streaming pass, no driver materialization.
    """
    import pyarrow as pa
    order = int(np.log2(grid.ppd))
    assert (1 << order) == grid.ppd, "store grid ppd must be a power of two"

    def add_group(t: pa.Table) -> pa.Table:
        minx = t["minx"].to_numpy(zero_copy_only=False)
        miny = t["miny"].to_numpy(zero_copy_only=False)
        maxx = t["maxx"].to_numpy(zero_copy_only=False)
        maxy = t["maxy"].to_numpy(zero_copy_only=False)
        cx, cy = _center_cells(grid, minx, miny, maxx, maxy)
        d = xy2d(order, cx, cy)
        return t.append_column("cgroup",
                               pa.array((d >> group_shift).astype(np.int64)))

    ds.map_batches(add_group, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["cgroup"])
    # grid spec sidecar so readers reconstruct the layout
    with open(os.path.join(out_dir, "_grid.json"), "w") as f:
        json.dump({"minx": grid.minx, "miny": grid.miny,
                   "maxx": grid.maxx, "maxy": grid.maxy,
                   "ppd": grid.ppd, "group_shift": group_shift}, f)
    # build the fragment manifest eagerly (footers are already hot)
    build_manifest(out_dir, refresh=True)
    return out_dir


def _fragment_files(out_dir: str) -> list[str]:
    files = []
    for root, _dirs, names in os.walk(out_dir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    return sorted(files)


def build_manifest(out_dir: str, refresh: bool = False) -> list[dict]:
    """Per-fragment {path, rows, minx, miny, maxx, maxy} from parquet
    footer statistics; cached as JSON (the 100 TB path would keep this in
    the table format's metadata layer — same information)."""
    mpath = os.path.join(out_dir, MANIFEST)
    if not refresh and os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    import pyarrow.parquet as pq
    out = []
    for path in _fragment_files(out_dir):
        md = pq.read_metadata(path)
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        lo = {"minx": np.inf, "miny": np.inf}
        hi = {"maxx": -np.inf, "maxy": -np.inf}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in lo:
                lo[c] = min(lo[c], g.column(names[c]).statistics.min)
            for c in hi:
                hi[c] = max(hi[c], g.column(names[c]).statistics.max)
        out.append({"path": os.path.relpath(path, out_dir),
                    "rows": md.num_rows, "minx": lo["minx"],
                    "miny": lo["miny"], "maxx": hi["maxx"],
                    "maxy": hi["maxy"]})
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, mpath)
    return out


def _read_fragments(out_dir: str, frags: list[dict]):
    import ray.data as rd
    paths = [os.path.join(out_dir, f["path"]) for f in frags]
    return rd.read_parquet(paths)


def prune_fragments_mbr(out_dir: str, boxes: np.ndarray) -> list[dict]:
    """Fragments whose bounds intersect ANY of the (n,4) query boxes."""
    man = build_manifest(out_dir)
    if len(man) == 0:
        return []
    fb = np.array([[f["minx"], f["miny"], f["maxx"], f["maxy"]]
                   for f in man])
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    hit = ((fb[:, None, 0] <= b[None, :, 2])
           & (b[None, :, 0] <= fb[:, None, 2])
           & (fb[:, None, 1] <= b[None, :, 3])
           & (b[None, :, 1] <= fb[:, None, 3])).any(axis=1)
    return [f for f, h in zip(man, hit) if h]


def range_query_store(out_dir: str, windows, mode: str = "collect"):
    """Range query with fragment-level pruning (range_filter.cpp analog).

    Only fragments whose footer MBR intersects some window are read at
    all; the per-batch MBR prefilter still applies within them."""
    from ..geometry.core import mbr_of
    from ..pipelines.range_query import range_query

    boxes = np.array([mbr_of(int(gt), np.asarray(c)) for _, gt, c in windows])
    frags = prune_fragments_mbr(out_dir, boxes)
    if not frags:
        import pandas as pd
        if mode == "count":
            return pd.DataFrame({
                "query_id": np.array(sorted(int(w[0]) for w in windows),
                                     dtype=np.int64),
                "result_count": np.zeros(len(windows), dtype=np.int64)})
        from ..pipelines.range_query import RANGE_SCHEMA
        import ray.data as rd
        return rd.from_arrow(RANGE_SCHEMA.empty_table())
    return range_query(_read_fragments(out_dir, frags), windows, mode=mode)


def _mindist2(qx, qy, fb: np.ndarray) -> np.ndarray:
    """Squared min distance from point to each fragment box (n,4)."""
    dx = np.maximum(np.maximum(fb[:, 0] - qx, qx - fb[:, 2]), 0.0)
    dy = np.maximum(np.maximum(fb[:, 1] - qy, qy - fb[:, 3]), 0.0)
    return dx * dx + dy * dy


def _maxdist2(qx, qy, fb: np.ndarray) -> np.ndarray:
    dx = np.maximum(np.abs(qx - fb[:, 0]), np.abs(qx - fb[:, 2]))
    dy = np.maximum(np.abs(qy - fb[:, 1]), np.abs(qy - fb[:, 3]))
    return dx * dx + dy * dy


def knn_prune_fragments(out_dir: str, queries, k: int) -> list[dict]:
    """Sound fragment selection for batch kNN (knn_filter.cpp analog).

    Per query: sort fragments by mindist, take the shortest prefix whose
    row count reaches k, bound = max maxdist over that prefix (the k-th
    neighbor cannot be farther), then keep every fragment with mindist <=
    bound.  The union over queries is scanned once for all queries."""
    man = build_manifest(out_dir)
    if not man:
        return []
    fb = np.array([[f["minx"], f["miny"], f["maxx"], f["maxy"]]
                   for f in man])
    rows = np.array([f["rows"] for f in man], dtype=np.int64)
    keep = np.zeros(len(man), dtype=bool)
    for _qid, qx, qy in queries:
        mind = _mindist2(qx, qy, fb)
        maxd = _maxdist2(qx, qy, fb)
        order = np.argsort(mind, kind="stable")
        cum = np.cumsum(rows[order])
        need = int(np.searchsorted(cum, k))   # first idx with cum >= k
        if need >= len(man):
            keep[:] = True
            break
        bound = maxd[order[:need + 1]].max()
        keep |= mind <= bound
    return [f for f, kp in zip(man, keep) if kp]


def knn_query_store(out_dir: str, queries, k: int):
    """Batch kNN over the store, scanning only ring-pruned fragments.

    Bit-identical to pipelines.knn.knn_query over the full table (the
    pruning bound is sound); at scale the scan is O(rings), not O(corpus).
    """
    from ..pipelines.knn import knn_query
    frags = knn_prune_fragments(out_dir, queries, k)
    ds = _read_fragments(out_dir, frags)
    return knn_query(ds, queries, k)
