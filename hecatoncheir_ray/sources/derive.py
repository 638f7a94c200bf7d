"""Geometry layers derived deterministically from the driver's testdata
tables, with *bit-identical* DuckDB SQL counterparts.

The driver's correctness gate runs each Ray query and its oracle SQL
side-by-side on the same parquet (TESTDATA.md) and hash-compares values.
Every derived coordinate therefore comes from integer hashing + one float
division + literal-constant affine math, written ONCE here and emitted both
as numpy and as SQL text — identical IEEE-754 results in both engines.

Hash family: u01(key, a, m) = (((key % 100003) * a) % m) / m   in [0, 1).
No intermediate exceeds ~2.7e14, so BIGINT never overflows in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import TIGER_US_BOUNDS
from ..geometry.core import GT_BOX, GT_POINT

_M0 = 100003

X0, Y0, X1, Y1 = TIGER_US_BOUNDS
W = X1 - X0
H = Y1 - Y0


def u01_np(key: np.ndarray, a: int, m: int) -> np.ndarray:
    h = ((key % _M0) * a) % m
    return h / m


def u01_sql(expr: str, a: int, m: int) -> str:
    # "/ m.0" forces double division (DuckDB's / is float anyway; explicit)
    return f"(((({expr}) % {_M0}) * {a}) % {m}) / {m}.0"


# (a, m) pairs per attribute — distinct multipliers, prime-ish moduli
_PT_X = (2654435761, 1000003)
_PT_Y = (2246822519, 999983)
_BOX_CX = (3266489917, 1000033)
_BOX_CY = (668265263, 999979)
_BOX_W = (374761393, 99991)
_BOX_H = (2869860233, 99989)


def _lit(x: float) -> str:
    return repr(float(x))


# ---------------------------------------------------------------------------
# points from events
# ---------------------------------------------------------------------------

def points_np(key: np.ndarray):
    x = X0 + u01_np(key, *_PT_X) * W
    y = Y0 + u01_np(key, *_PT_Y) * H
    return x, y


def points_sql(key_expr: str) -> tuple[str, str]:
    x = f"{_lit(X0)} + ({u01_sql(key_expr, *_PT_X)}) * {_lit(W)}"
    y = f"{_lit(Y0)} + ({u01_sql(key_expr, *_PT_Y)}) * {_lit(H)}"
    return x, y


def sql_points_events() -> str:
    """CTE body: the event-point layer as (id, x, y)."""
    x, y = points_sql("event_id")
    return f"SELECT event_id AS id, {x} AS x, {y} AS y FROM events"


# ---------------------------------------------------------------------------
# boxes from orders / part
# ---------------------------------------------------------------------------

def boxes_np(key: np.ndarray, salt: int, shrink: float = 1.0):
    k = key + salt
    cx = X0 + u01_np(k, *_BOX_CX) * W
    cy = Y0 + u01_np(k, *_BOX_CY) * H
    hw = (0.05 + u01_np(k, *_BOX_W) * 0.4) * shrink
    hh = (0.05 + u01_np(k, *_BOX_H) * 0.4) * shrink
    return cx - hw, cy - hh, cx + hw, cy + hh


def boxes_sql(key_expr: str, salt: int,
              shrink: float = 1.0) -> tuple[str, str, str, str]:
    k = f"{key_expr} + {salt}"
    cx = f"{_lit(X0)} + ({u01_sql(k, *_BOX_CX)}) * {_lit(W)}"
    cy = f"{_lit(Y0)} + ({u01_sql(k, *_BOX_CY)}) * {_lit(H)}"
    hw = f"(0.05 + ({u01_sql(k, *_BOX_W)}) * 0.4) * {_lit(shrink)}"
    hh = f"(0.05 + ({u01_sql(k, *_BOX_H)}) * 0.4) * {_lit(shrink)}"
    return (f"({cx}) - ({hw})", f"({cy}) - ({hh})",
            f"({cx}) + ({hw})", f"({cy}) + ({hh})")


ORDERS_SALT = 17
PART_SALT = 7919


def sql_boxes_orders() -> str:
    minx, miny, maxx, maxy = boxes_sql("o_orderkey", ORDERS_SALT)
    return (f"SELECT o_orderkey AS id, {minx} AS minx, {miny} AS miny, "
            f"{maxx} AS maxx, {maxy} AS maxy FROM orders")


def sql_boxes_part() -> str:
    minx, miny, maxx, maxy = boxes_sql("p_partkey", PART_SALT)
    return (f"SELECT p_partkey AS id, {minx} AS minx, {miny} AS miny, "
            f"{maxx} AS maxx, {maxy} AS maxy FROM part")


def sql_boxes_part_oct() -> str:
    """The part-octagon base boxes (OCT_S_SHRINK-scaled part boxes)."""
    minx, miny, maxx, maxy = boxes_sql("p_partkey", PART_SALT, OCT_S_SHRINK)
    return (f"SELECT p_partkey AS id, {minx} AS minx, {miny} AS miny, "
            f"{maxx} AS maxx, {maxy} AS maxy FROM part")


# ---------------------------------------------------------------------------
# convex octagons from orders / part (corner-cut boxes)
# ---------------------------------------------------------------------------
# Chamfer the four corners of the hashed box by per-corner fractions in
# [0.1, 0.45] of the full edge — an intersection of six halfplanes, so
# always convex; every box side keeps a positive-length segment, so the
# octagon's MBR *is* the box (candidate generation matches the box join).
# Vertices CCW, stored unclosed (engine ring convention, geometry/core.py).
# With coordinates from independent hash streams the layers are in generic
# position: no collinear triples, no boundary contact across layers — the
# regime where convex intersect/containment is exactly expressible in
# plain SQL (edge-cross + first-vertex-in tests, see __ray_entry__ oracles).

_OCT_CUTS = [
    (2971215073, 999959), (1540483477, 999953),   # bottom edge L/R
    (2654435789, 999931), (2246822591, 999917),   # right edge B/T
    (3266489921, 999907), (668265341, 999883),    # top edge R/L
    (374761421, 999863), (2869860241, 999853),    # left edge T/B
]


def _cut_np(k: np.ndarray, which: int) -> np.ndarray:
    a, m = _OCT_CUTS[which]
    return 0.1 + u01_np(k, a, m) * 0.35


def _cut_sql(kexpr: str, which: int) -> str:
    a, m = _OCT_CUTS[which]
    return f"0.1 + ({u01_sql(kexpr, a, m)}) * 0.35"


OCT_S_SHRINK = 0.9   # part-side octagons ride a 0.9-shrunk box: hash-key
# collisions across layers (key+salt coincidence, e.g. o_orderkey+17 ==
# p_partkey+7919) then yield concentric similar octagons — clean strict
# containment instead of boundary-equal geometry, preserving generic
# position AND guaranteeing inside/contains rows in the relation histogram.


def octagons_np(key: np.ndarray, salt: int, shrink: float = 1.0):
    """(8, n) x and y vertex arrays (CCW) + the box MBR."""
    minx, miny, maxx, maxy = boxes_np(key, salt, shrink)
    k = key + salt
    w = maxx - minx
    h = maxy - miny
    c = [_cut_np(k, i) for i in range(8)]
    xs = np.stack([minx + c[0] * w, maxx - c[1] * w, maxx, maxx,
                   maxx - c[4] * w, minx + c[5] * w, minx, minx])
    ys = np.stack([miny, miny, miny + c[2] * h, maxy - c[3] * h,
                   maxy, maxy, maxy - c[6] * h, miny + c[7] * h])
    return xs, ys, minx, miny, maxx, maxy


def sql_octagon_vertices(box_cte: str, key_expr: str, salt: int) -> str:
    """CTE body: (id, i, x, y) — 8 CCW vertices per box row.

    ``box_cte`` must yield (id, minx, miny, maxx, maxy); ``key_expr`` is the
    cut-hash key in terms of that CTE's columns (b.id), matching the numpy
    side's ``key + salt``."""
    k = f"b.{key_expr} + {salt}"
    w = "(b.maxx - b.minx)"
    h = "(b.maxy - b.miny)"
    cut = [_cut_sql(k, i) for i in range(8)]
    x = (f"CASE v.i WHEN 1 THEN b.minx + ({cut[0]}) * {w} "
         f"WHEN 2 THEN b.maxx - ({cut[1]}) * {w} "
         f"WHEN 3 THEN b.maxx WHEN 4 THEN b.maxx "
         f"WHEN 5 THEN b.maxx - ({cut[4]}) * {w} "
         f"WHEN 6 THEN b.minx + ({cut[5]}) * {w} "
         f"ELSE b.minx END")
    y = (f"CASE v.i WHEN 1 THEN b.miny WHEN 2 THEN b.miny "
         f"WHEN 3 THEN b.miny + ({cut[2]}) * {h} "
         f"WHEN 4 THEN b.maxy - ({cut[3]}) * {h} "
         f"WHEN 5 THEN b.maxy WHEN 6 THEN b.maxy "
         f"WHEN 7 THEN b.maxy - ({cut[6]}) * {h} "
         f"ELSE b.miny + ({cut[7]}) * {h} END")
    return (f"SELECT b.id AS id, v.i AS i, {x} AS x, {y} AS y "
            f"FROM ({box_cte}) b CROSS JOIN "
            f"(SELECT unnest(generate_series(1, 8)) AS i) v")


# ---------------------------------------------------------------------------
# x-monotone polylines from events
# ---------------------------------------------------------------------------
# 5 vertices, strictly increasing x (jitter 0.4*step < step keeps the order),
# so always simple.  Every coordinate is a closed form of (event_id, i) —
# no cumulative sums, whose float association differs between numpy and
# DuckDB window aggregates.

LINE_NV = 5
_LN_SX = (2654435741, 999829)    # step in [0.05, 0.3)
_LN_XS = (3266489887, 999809)    # start x
_LN_CY = (668265203, 999773)     # center y
_LN_AMP = (2246822573, 999763)   # amplitude in [0.05, 0.4)
_LN_JX = (374761381, 999749)     # per-vertex x jitter
_LN_JY = (2869860217, 999727)    # per-vertex y offset

LINES_SALT = 3571
_LN_XSPAN = W - 1.4              # start-x range: 4.4*step_max = 1.32 < 1.4
_LN_YPAD = H - 0.8               # center-y range: amp_max 0.4 each side


def lines_np(key: np.ndarray):
    """(LINE_NV, n) vertex arrays of the event polylines."""
    k = key + LINES_SALT
    sx = 0.05 + u01_np(k, *_LN_SX) * 0.25
    xs = X0 + u01_np(k, *_LN_XS) * _LN_XSPAN
    cy = (Y0 + 0.4) + u01_np(k, *_LN_CY) * _LN_YPAD
    amp = 0.05 + u01_np(k, *_LN_AMP) * 0.35
    i = np.arange(1, LINE_NV + 1, dtype=np.int64)[:, None]
    xv = xs + (i - 1) * sx + 0.4 * sx * u01_np(k * 11 + i, *_LN_JX)
    yv = cy + amp * (2.0 * u01_np(k * 13 + i, *_LN_JY) - 1.0)
    return xv, yv


def sql_line_vertices() -> str:
    """CTE body: (id, i, x, y) — LINE_NV vertices per events row."""
    k = f"(e.event_id + {LINES_SALT})"
    sx = f"(0.05 + ({u01_sql(k, *_LN_SX)}) * 0.25)"
    xs = f"({_lit(X0)} + ({u01_sql(k, *_LN_XS)}) * {_lit(_LN_XSPAN)})"
    cy = f"(({_lit(Y0 + 0.4)}) + ({u01_sql(k, *_LN_CY)}) * {_lit(_LN_YPAD)})"
    amp = f"(0.05 + ({u01_sql(k, *_LN_AMP)}) * 0.35)"
    kx = f"({k} * 11 + v.i)"
    ky = f"({k} * 13 + v.i)"
    x = f"{xs} + (v.i - 1) * {sx} + 0.4 * {sx} * ({u01_sql(kx, *_LN_JX)})"
    y = f"{cy} + {amp} * (2.0 * ({u01_sql(ky, *_LN_JY)}) - 1.0)"
    return (f"SELECT e.event_id AS id, v.i AS i, {x} AS x, {y} AS y "
            f"FROM events e CROSS JOIN "
            f"(SELECT unnest(generate_series(1, {LINE_NV})) AS i) v")


# ---------------------------------------------------------------------------
# Ray-side geometry tables
# ---------------------------------------------------------------------------

def _points_table(ids: np.ndarray) -> pa.Table:
    x, y = points_np(ids)
    flat = np.empty(2 * len(ids))
    flat[0::2] = x
    flat[1::2] = y
    offs = np.arange(0, 2 * len(ids) + 1, 2, dtype=np.int32)
    coords = pa.ListArray.from_arrays(pa.array(offs),
                                      pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(np.full(len(ids), GT_POINT, np.int8)),
                     "coords": coords,
                     "minx": pa.array(x), "miny": pa.array(y),
                     "maxx": pa.array(x), "maxy": pa.array(y)})


def _boxes_table(ids: np.ndarray, salt: int) -> pa.Table:
    minx, miny, maxx, maxy = boxes_np(ids, salt)
    flat = np.empty(4 * len(ids))
    flat[0::4] = minx
    flat[1::4] = miny
    flat[2::4] = maxx
    flat[3::4] = maxy
    offs = np.arange(0, 4 * len(ids) + 1, 4, dtype=np.int32)
    coords = pa.ListArray.from_arrays(pa.array(offs),
                                      pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(np.full(len(ids), GT_BOX, np.int8)),
                     "coords": coords,
                     "minx": pa.array(minx), "miny": pa.array(miny),
                     "maxx": pa.array(maxx), "maxy": pa.array(maxy)})


# ---------------------------------------------------------------------------
# embeddings with seeded near-duplicates
# ---------------------------------------------------------------------------
# The raw embeddings fixture has no true near-dup pairs (max pair cosine
# ~0.51 at sf0.01), so a near-dup operator returns 0 rows and the driver
# can't tell "correct empty" from "broken".  Derivation: union the table
# with perturbed copies of vec_id < DUP_N — v'_i = v_i + 0.001*k(vec_id, i)
# with k integer in [-3, 3] (pure IEEE arithmetic, bit-identical in SQL).
# Planted pairs land at cosine ~0.9999, far above both the 0.95 threshold
# and the natural max — positive path driver-verified, no borderline pairs.

DUP_N = 20
DUP_OFFSET = 100000

_EMB_LONG = ("SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
             "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings")


def list_matrix(col: "pa.ChunkedArray") -> np.ndarray:
    """list<float*> column -> (n, dim) ndarray (offset-safe)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1)


def perturb_np(vid: np.ndarray, V: np.ndarray) -> np.ndarray:
    """v + 0.001*((((vec_id*31) + i) % 7) - 3), i 1-based (SQL twin below)."""
    i = np.arange(1, V.shape[1] + 1, dtype=np.int64)
    k = ((vid[:, None] * 31 + i[None, :]) % 7) - 3
    return V + 0.001 * k


def sql_embeddings_with_dups_long() -> str:
    """CTE body: (vec_id, i, v DOUBLE) long form of embeddings UNION the
    perturbed copies (vec_id + DUP_OFFSET for vec_id < DUP_N)."""
    return f"""
        SELECT vec_id, i, v FROM ({_EMB_LONG})
        UNION ALL
        SELECT vec_id + {DUP_OFFSET} AS vec_id, i,
               v + 0.001 * ((((vec_id * 31) + i) % 7) - 3) AS v
        FROM ({_EMB_LONG}) WHERE vec_id < {DUP_N}"""


def ray_embeddings_with_dups(sf_dir: str):
    """embeddings (cast to float64) ∪ perturbed near-dup copies."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = list_matrix(batch["embedding"]).astype(np.float64)
        sel = vid < DUP_N
        P = perturb_np(vid[sel], V[sel])
        allv = np.concatenate([V, P])
        ids = np.concatenate([vid, vid[sel] + DUP_OFFSET])
        n, dim = allv.shape
        offs = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
        emb = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(allv.ravel(), type=pa.float64()))
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": emb})

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .map_batches(build, batch_format="pyarrow")


def _octagons_table(ids: np.ndarray, salt: int,
                    shrink: float = 1.0) -> pa.Table:
    from ..geometry.core import GT_POLYGON
    xs, ys, minx, miny, maxx, maxy = octagons_np(ids, salt, shrink)
    n = len(ids)
    flat = np.empty(16 * n)
    flat[0::2] = xs.T.ravel()
    flat[1::2] = ys.T.ravel()
    offs = np.arange(0, 16 * n + 1, 16, dtype=np.int32)
    coords = pa.ListArray.from_arrays(pa.array(offs),
                                      pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(np.full(n, GT_POLYGON, np.int8)),
                     "coords": coords,
                     "minx": pa.array(minx), "miny": pa.array(miny),
                     "maxx": pa.array(maxx), "maxy": pa.array(maxy)})


def _lines_table(ids: np.ndarray) -> pa.Table:
    from ..geometry.core import GT_LINESTRING
    xv, yv = lines_np(ids)
    n = len(ids)
    flat = np.empty(2 * LINE_NV * n)
    flat[0::2] = xv.T.ravel()
    flat[1::2] = yv.T.ravel()
    offs = np.arange(0, 2 * LINE_NV * n + 1, 2 * LINE_NV, dtype=np.int32)
    coords = pa.ListArray.from_arrays(pa.array(offs),
                                      pa.array(flat, type=pa.float64()))
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "gtype": pa.array(np.full(n, GT_LINESTRING, np.int8)),
                     "coords": coords,
                     "minx": pa.array(xv.min(axis=0)),
                     "miny": pa.array(yv.min(axis=0)),
                     "maxx": pa.array(xv.max(axis=0)),
                     "maxy": pa.array(yv.max(axis=0))})


def ray_octagons_orders(sf_dir: str):
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _octagons_table(
            batch["o_orderkey"].to_numpy(zero_copy_only=False), ORDERS_SALT)

    return rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey"]) \
        .map_batches(build, batch_format="pyarrow")


def ray_octagons_part(sf_dir: str):
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _octagons_table(
            batch["p_partkey"].to_numpy(zero_copy_only=False), PART_SALT,
            OCT_S_SHRINK)

    return rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"]) \
        .map_batches(build, batch_format="pyarrow")


def ray_lines_events(sf_dir: str):
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _lines_table(
            batch["event_id"].to_numpy(zero_copy_only=False))

    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id"]) \
        .map_batches(build, batch_format="pyarrow")


def ray_points_events(sf_dir: str):
    """Geotag layer: one point per events row (column-pruned read)."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _points_table(
            batch["event_id"].to_numpy(zero_copy_only=False))

    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id"]) \
        .map_batches(build, batch_format="pyarrow")


def ray_boxes_orders(sf_dir: str):
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _boxes_table(
            batch["o_orderkey"].to_numpy(zero_copy_only=False), ORDERS_SALT)

    return rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey"]) \
        .map_batches(build, batch_format="pyarrow")


def ray_boxes_part(sf_dir: str):
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return _boxes_table(
            batch["p_partkey"].to_numpy(zero_copy_only=False), PART_SALT)

    return rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"]) \
        .map_batches(build, batch_format="pyarrow")
