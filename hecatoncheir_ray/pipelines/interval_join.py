"""Interval (time-range) join, expressed through the spatial engine.

``interval_join(left, right)`` pairs every left row whose timestamp falls
inside a right row's [start, end] interval — the classic range join a
training-data pipeline needs for sessionization / window attribution.
Rather than a bespoke operator, time is embedded as a 1-D dataspace of the
existing two-phase partitioned spatial join (reference:
``src/TwoLayer/intersection_join_filter.cpp`` — the engine's core):

* left rows become points (t, 0.5); right rows become degenerate boxes
  [start, end] x [0.5, 0.5] (zero height, so an interval never replicates
  across grid rows — the y axis exists only to satisfy the 2-D kernel);
* the dataspace is (t_min, 0, t_max + 1, 1); grid cells are therefore
  pure time slices and the one groupby shuffle is 1-D time partitioning
  with the engine's reference-point dedup, hot-cell salting and resumable
  slices for free;
* predicate ``covered_by`` gives the inclusive start <= t <= end.

Timestamps ride as float64 microsecond epochs — exact integers well below
2**53, so boundary equality in the float kernel matches integer SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..config import EngineConfig
from .spatial_join import spatial_join

GT_POINT = 1
GT_BOX = 2


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype="datetime64[us]").view(np.int64)


def _point_layer(ids: np.ndarray, x: np.ndarray) -> pa.Table:
    y = np.full(len(ids), 0.5)
    flat = np.empty(2 * len(ids))
    flat[0::2] = x
    flat[1::2] = y
    offs = np.arange(0, 2 * len(ids) + 1, 2, dtype=np.int32)
    coords = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(
                         np.full(len(ids), GT_POINT, np.int8)),
                     "coords": coords,
                     "minx": pa.array(x), "miny": pa.array(y),
                     "maxx": pa.array(x), "maxy": pa.array(y)})


def _interval_layer(ids: np.ndarray, s: np.ndarray,
                    e: np.ndarray) -> pa.Table:
    y = np.full(len(ids), 0.5)
    flat = np.empty(4 * len(ids))
    flat[0::4] = s
    flat[1::4] = y
    flat[2::4] = e
    flat[3::4] = y
    offs = np.arange(0, 4 * len(ids) + 1, 4, dtype=np.int32)
    coords = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(np.full(len(ids), GT_BOX, np.int8)),
                     "coords": coords,
                     "minx": pa.array(s), "miny": pa.array(y),
                     "maxx": pa.array(e), "maxy": pa.array(y)})


def interval_join(left: Dataset, right: Dataset, t_col: str = "ts",
                  left_id: str = "event_id", right_id: str = "event_id",
                  start_col: str = "start", end_col: str = "end",
                  ppd: int = 64,
                  cfg: EngineConfig | None = None) -> Dataset:
    """(r_id, s_id) pairs with right.start <= left.t <= right.end
    (timestamps or numeric columns).  One time-partitioned shuffle via
    the spatial join; intervals longer than a grid slice replicate to
    exactly the slices they overlap, as reference cell assignment does."""

    def as_x(col: pd.Series) -> np.ndarray:
        if np.issubdtype(col.dtype, np.datetime64):
            return _ts_us(col).astype(np.float64)
        return col.to_numpy().astype(np.float64)

    def to_points(df: pd.DataFrame) -> pa.Table:
        return _point_layer(df[left_id].to_numpy().astype(np.int64),
                            as_x(df[t_col]))

    def to_intervals(df: pd.DataFrame) -> pa.Table:
        return _interval_layer(df[right_id].to_numpy().astype(np.int64),
                               as_x(df[start_col]), as_x(df[end_col]))

    pts = left.select_columns([left_id, t_col]) \
        .map_batches(to_points, batch_format="pandas")
    boxes = right.select_columns([right_id, start_col, end_col]) \
        .map_batches(to_intervals, batch_format="pandas")

    if cfg is None:
        from ray.data.aggregate import Max, Min
        lo = pts.aggregate(Min("minx"))["min(minx)"]
        hi = pts.aggregate(Max("maxx"))["max(maxx)"]
        ro = boxes.aggregate(Min("minx"))["min(minx)"]
        rh = boxes.aggregate(Max("maxx"))["max(maxx)"]
        if None in (lo, hi, ro, rh):
            # either side empty (plausible after an upstream filter):
            # the inner join is empty — short-circuit instead of doing
            # dataspace math on None
            import ray.data
            return ray.data.from_arrow(pa.table(
                {"r_id": pa.array([], pa.int64()),
                 "s_id": pa.array([], pa.int64())}))
        t0, t1 = min(lo, ro), max(hi, rh)
        cfg = EngineConfig(dataspace=(t0, 0.0, t1 + 1.0, 1.0), ppd=ppd)
    return spatial_join(pts, boxes, "covered_by", cfg)
