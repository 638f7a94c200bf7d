"""Hilbert curve index mapping (vectorized).

Standard bit-twiddling xy<->d conversion (the same public-domain algorithm
the reference uses, /root/reference/Hecatoncheir/src/utils.cpp:21-44).
Vectorized over numpy arrays for APRIL rasterization.
"""

from __future__ import annotations

import numpy as np


def xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) cell coords -> Hilbert distance, for a 2^order grid."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        y_f = y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance -> (x, y) cell coords, for a 2^order grid."""
    d = np.asarray(d, dtype=np.int64)
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    top = np.int64(1) << order
    while s < top:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        y_f = y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y
