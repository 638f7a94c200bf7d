"""H3-style hexagonal index over the planar dataspace (north rule:
"H3/S2 index").

The quadkey pyramid (tiling.py) is the S2/Z-order side of the rule; this
module is the H3 side: a pointy-top hexagonal grid addressed by axial
coordinates (q, r), assigned by exact cube rounding.  Hex cells give the
properties H3 is used for at corpus scale — 6 equidistant neighbors
(no corner-adjacency anisotropy, unlike square tiles) and near-round
cells, which makes ring expansion (kNN) and density estimates direction-
unbiased.

Documented deviation from real H3: H3 proper is an aperture-7 hierarchy
on an icosahedron (spherical); the reference engine
(Hecatoncheir `containers/Grid.h`) partitions a PLANAR dataspace with
uniform grids, so the faithful Ray-native analog is a planar hex lattice,
not a spherical one.  The addressing math (axial coords + cube rounding)
is the textbook public algorithm (Red Blob Games / H3 docs).

Every float expression here has a character-identical IEEE twin in
:func:`hex_sql`, same op order and the same ``floor(v + 0.5)`` rounding
on both sides (numpy and DuckDB both round-half-to-even under ``round``;
``floor(v + 0.5)`` sidesteps the mismatch), so assignments are bit-exact
vs the SQL oracle — the same convention as quadkey_sql above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# axial projection constants (pointy-top): shared verbatim with hex_sql
# via {c!r} literals so numpy and DuckDB parse the identical doubles.
_C_Q_X = 3.0 ** 0.5 / 3.0      # sqrt(3)/3
_C_Q_Y = 1.0 / 3.0
_C_R_Y = 2.0 / 3.0

# axial -> int64 packing: id = (q + _OFF) * _SPAN + (r + _OFF).
# _OFF bounds |q|,|r| < 2^20 — at the TIGER dataspace (~60 deg wide) that
# allows hex sizes down to ~1e-4 deg (~10 m); integer-exact in SQL.
_OFF = 1 << 20
_SPAN = 1 << 21

HEX_SCHEMA = pa.schema([("id", pa.int64()), ("hex_id", pa.int64())])


def hex_axial(x: np.ndarray, y: np.ndarray, size: float):
    """Vectorized point -> axial (q, r) hex coords via cube rounding.

    Branch logic: only the q (=cube x) and r (=cube z) outputs matter, so
    of the three reconstruction branches just two are applied — the
    "fix y" branch leaves both outputs untouched.
    """
    qf = (x * _C_Q_X - y * _C_Q_Y) / size
    rf = (y * _C_R_Y) / size
    yf = -qf - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    r = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    return q, r


def hex_id(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Pack axial (q, r) into one int64 cell id (integer-exact)."""
    return (q + _OFF) * np.int64(_SPAN) + (r + _OFF)


def hex_center(q: np.ndarray, r: np.ndarray, size: float):
    """Axial -> cartesian cell-center (the inverse projection)."""
    x = size * (3.0 ** 0.5) * (np.asarray(q, dtype=np.float64)
                               + np.asarray(r, dtype=np.float64) / 2.0)
    y = size * 1.5 * np.asarray(r, dtype=np.float64)
    return x, y


def hex_assignments(points: Dataset, size: float) -> Dataset:
    """Point geometry table -> (id, hex_id), one row per point.

    Same shape as tile_assignments: a zero-copy Arrow map_batches, no
    shuffle — the scale cost is exactly one pass over the point column.
    """

    def assign(t: pa.Table) -> pa.Table:
        x = t["minx"].to_numpy(zero_copy_only=False)
        y = t["miny"].to_numpy(zero_copy_only=False)
        q, r = hex_axial(x, y, size)
        return pa.table({"id": t["id"],
                         "hex_id": pa.array(hex_id(q, r), type=pa.int64())},
                        schema=HEX_SCHEMA)

    return points.map_batches(assign, batch_format="pyarrow")


def hex_counts(assignments: Dataset) -> Dataset:
    """(id, hex_id) -> (hex_id, n) for non-empty cells.

    tile_counts pattern: per-batch sparse partials + one shuffle-side
    hash_group_reduce Sum — the driver never sees per-point rows and the
    partial size tracks the batch's distinct cells, not the lattice.
    """
    from ..functions.idjoin import hash_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        c = t["hex_id"].to_numpy(zero_copy_only=False)
        uc, cnt = np.unique(c, return_counts=True)
        return pa.table({"hex_id": pa.array(uc, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    return hash_group_reduce(
        assignments.map_batches(partial, batch_format="pyarrow"),
        ["hex_id"], {"n": ("n", "sum")}, num_parts=64)


def hex_regions(hex_values: Dataset, size: float, threshold: int,
                num_parts: int = 64,
                single_task_max_cells: int = 1 << 22) -> Dataset:
    """Hex-lattice polygonize: 6-connected components of above-threshold
    hex cells -> (region_id, cell_count, total_n, minx, miny, maxx,
    maxy), region_id = the component's minimum hex_id and the bbox over
    CELL CENTERS (exact inverse projection, IEEE-twinned).

    The hexagonal counterpart of :func:`..tiling.raster_regions`: the
    shared :func:`..tiling.label_regions` core does the threshold
    filter, semi-joined neighbor edges, and adaptive single-task /
    alternating-star labeling; only the 6-neighbor deltas — pure id
    arithmetic (+-SPAN, +-1, +-(SPAN-1)); the axial lattice is
    unbounded, so no edge clamping exists at all — and the
    center-projection reduce differ."""
    from .tiling import label_regions, region_empty, region_reduce

    def edge_fn(h: np.ndarray):
        # 3 directed deltas; CC symmetrizes (the other 3 are reverses)
        return (np.concatenate([h, h, h]),
                np.concatenate([h + _SPAN, h + 1, h + (_SPAN - 1)]))

    labels = label_regions(hex_values, "hex_id", edge_fn, threshold,
                           num_parts, single_task_max_cells)
    if labels is None:
        return region_empty("cell_count")

    def bounds_fn(h: np.ndarray):
        q = h // _SPAN - _OFF
        r = h % _SPAN - _OFF
        cx, cy = hex_center(q, r, size)
        return cx, cy, cx, cy          # a cell CENTER bounds itself

    return region_reduce(labels, "cell_count", bounds_fn, num_parts)


def hex_regions_sql(cells_sql: str, size: float, threshold) -> str:
    """DuckDB twin of :func:`hex_regions` over ``cells_sql`` (columns
    hex_id, n): recursive reachability over the six id-arithmetic
    neighbor deltas, min-label per component, center-bbox via the SAME
    inverse-projection expression (string-cast DOUBLE constants — bare
    decimal literals go through DECIMAL and land 1 ulp off strtod)."""
    k1 = size * (3.0 ** 0.5)
    k2 = size * 1.5
    deltas = [_SPAN, -_SPAN, 1, -1, _SPAN - 1, -(_SPAN - 1)]
    edge_sel = "\n            UNION ALL\n            ".join(
        f"SELECT a.hex_id AS u, b.hex_id AS v FROM kept a "
        f"JOIN kept b ON b.hex_id = a.hex_id + ({d})" for d in deltas)
    cx = (f"CAST('{k1!r}' AS DOUBLE) * ((k.hex_id // {_SPAN} - {_OFF}) "
          f"+ CAST(k.hex_id % {_SPAN} - {_OFF} AS DOUBLE) / 2.0)")
    cy = f"CAST('{k2!r}' AS DOUBLE) * (k.hex_id % {_SPAN} - {_OFF})"
    return f"""
        WITH RECURSIVE kept AS (
            SELECT hex_id, n FROM ({cells_sql}) WHERE n >= {threshold}),
        edges AS (
            {edge_sel}),
        reach AS (SELECT hex_id AS u, hex_id AS v FROM kept
                  UNION
                  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
        labels AS (SELECT u AS hex_id, MIN(v) AS region_id
                   FROM reach GROUP BY 1)
        SELECT l.region_id AS region_id,
               COUNT(*) AS cell_count,
               CAST(SUM(k.n) AS BIGINT) AS total_n,
               MIN({cx}) AS minx, MIN({cy}) AS miny,
               MAX({cx}) AS maxx, MAX({cy}) AS maxy
        FROM labels l JOIN kept k ON k.hex_id = l.hex_id
        GROUP BY 1
    """


def hex_sql(x: str, y: str, size: float) -> str:
    """The DuckDB twin of hex_axial + hex_id — identical IEEE op order,
    identical ``floor(v + 0.5)`` rounding, integer-exact packing."""
    return f"""(
        SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz
                         ELSE rx END AS BIGINT) * {_SPAN}
               + CAST(CASE WHEN NOT (dx > dy AND dx > dz)
                                AND NOT (dy > dz) THEN -rx - ry
                           ELSE rz END AS BIGINT)
               + {_OFF * _SPAN + _OFF}
        FROM (SELECT rx, ry, rz,
                     ABS(rx - qf) AS dx, ABS(ry - yf) AS dy,
                     ABS(rz - rf) AS dz
              FROM (SELECT qf, rf, yf,
                           FLOOR(qf + 0.5) AS rx, FLOOR(yf + 0.5) AS ry,
                           FLOOR(rf + 0.5) AS rz
                    FROM (SELECT qf, rf, -qf - rf AS yf
                          FROM (SELECT (({x}) * {_C_Q_X!r}
                                        - ({y}) * {_C_Q_Y!r})
                                       / {size!r} AS qf,
                                       (({y}) * {_C_R_Y!r})
                                       / {size!r} AS rf)))))"""
