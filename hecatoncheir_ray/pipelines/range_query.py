"""Batch range queries: windows (boxes or polygons) against a dataset.

Reference: range filters over the two-layer / uniform-grid indexes
(/root/reference/Hecatoncheir/src/TwoLayer/range_filter.cpp:91-685,
src/UniformGrid/range_filter.cpp:50-259) and batch-query broadcast
(src/env/comm_host.cpp:755-837).  Semantics: emit object id when
``window.intersects(object)`` (refinement::relate::refineRange,
src/refinement/topology.cpp:377-381).

Ray-Data shape (SURVEY §3 EP2): the query windows are a small broadcast
list; ONE map_batches pass evaluates every window per block — the index's
cell pruning becomes a vectorized per-batch MBR pre-filter.  No shuffle at
all for COLLECT; COUNT adds a tiny groupby over (query_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..geometry.core import GT_BOX, GT_POINT, GT_POLYGON, box_to_ring
from ..geometry.fast import points_in_polygon_batch
from ..stages.assign import geoms_from_table

RANGE_SCHEMA = pa.schema([("query_id", pa.int64()), ("id", pa.int64())])


def _with_window(geo, wgt: int, wc: np.ndarray, wmbr):
    """Append the query window as one extra geometry row so the join
    kernel's mega-batched ``refine_mask`` can evaluate window-vs-candidate
    pairs vectorized (window row index = len(original))."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    if wgt == GT_BOX:      # ring form keeps polygon candidates vectorized
        wc = box_to_ring(wc).ravel()
        wgt = GT_POLYGON
    app = lambda a, v, dt: np.concatenate([a, np.asarray([v], dtype=dt)])
    return (app(ids, -1, ids.dtype),
            app(gtypes, wgt, gtypes.dtype),
            np.concatenate([np.asarray(offs, dtype=np.int64),
                            [int(offs[-1]) + len(wc)]]),
            np.concatenate([vals, wc]),
            app(minx, wmbr[0], minx.dtype), app(miny, wmbr[1], miny.dtype),
            app(maxx, wmbr[2], maxx.dtype), app(maxy, wmbr[3], maxy.dtype))


def make_range_fn(windows: list[tuple[int, int, np.ndarray]]):
    """windows: list of (query_id, gtype, coords)."""
    wins = [(int(q), int(gt), np.asarray(c, dtype=np.float64))
            for q, gt, c in windows]
    from ..geometry.core import mbr_of
    wmbrs = [mbr_of(gt, c) for _, gt, c in wins]

    def range_eval(t: pa.Table) -> pa.Table:
        from ..stages.sweep import refine_mask
        geo = geoms_from_table(t)
        ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
        out_q, out_id = [], []
        all_points = bool((gtypes == GT_POINT).all()) if len(gtypes) else True
        for (qid, wgt, wc), wmbr in zip(wins, wmbrs):
            wx0, wy0, wx1, wy1 = wmbr
            cand = np.nonzero((minx <= wx1) & (wx0 <= maxx)
                              & (miny <= wy1) & (wy0 <= maxy))[0]
            if len(cand) == 0:
                continue
            if all_points:
                px = vals[offs[cand]]
                py = vals[offs[cand] + 1]
                keep = points_in_polygon_batch(px, py, wgt, wc) >= 0
                hits = cand[keep]
            else:
                # window as an extra geometry row -> one vectorized
                # refine_mask call per (window, batch) instead of a
                # per-candidate Python loop
                geo2 = _with_window(geo, wgt, wc, wmbr)
                wrow = np.full(len(cand), len(gtypes), dtype=np.int64)
                keep = refine_mask(None, geo2, wrow,
                                   cand.astype(np.int64), "intersects")
                hits = cand[keep]
            out_q.append(np.full(len(hits), qid, dtype=np.int64))
            out_id.append(ids[hits])
        if not out_q:
            return RANGE_SCHEMA.empty_table()
        return pa.table({"query_id": np.concatenate(out_q),
                         "id": np.concatenate(out_id)}, schema=RANGE_SCHEMA)

    return range_eval


def range_query(ds: Dataset, windows, mode: str = "collect"):
    """Evaluate windows against ds.

    mode 'collect' -> Dataset(query_id, id);
    mode 'count'   -> pandas DataFrame(query_id, result_count), zero-filled.
    The COUNT path pre-aggregates per batch and merges the tiny partials on
    the driver (a ray-level groupby costs a full shuffle barrier for a
    result of len(windows) rows — the wrong tool; partial-aggregate inside
    map_batches, then merge the tiny partials).
    """
    if mode == "count":
        return range_counts(ds, windows)
    return ds.map_batches(make_range_fn(windows), batch_format="pyarrow")


def range_counts(ds: Dataset, windows):
    import pandas as pd
    base = make_range_fn(windows)

    def partial(t: pa.Table) -> pa.Table:
        hits = base(t)
        q = hits["query_id"].to_numpy(zero_copy_only=False)
        uq, cnt = np.unique(q, return_counts=True)
        return pa.table({"query_id": pa.array(uq, type=pa.int64()),
                         "partial": pa.array(cnt, type=pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = {int(w[0]): 0 for w in windows}
    for r in rows:
        acc[int(r["query_id"])] += int(r["partial"])
    return pd.DataFrame({
        "query_id": np.array(sorted(acc), dtype=np.int64),
        "result_count": np.array([acc[k] for k in sorted(acc)],
                                 dtype=np.int64)})
