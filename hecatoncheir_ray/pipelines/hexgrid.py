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
