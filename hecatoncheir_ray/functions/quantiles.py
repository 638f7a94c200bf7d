"""Exact distributed quantiles WITHOUT a global sort.

``exact_quantiles`` computes exact order statistics (DuckDB
``quantile_disc`` semantics: the element at rank ``max(1, ceil(q*n))``)
by histogram range-count refinement instead of sorting:

- map the column to an order-preserving int64 key (identity for ints;
  the IEEE-754 total-order bit trick for doubles), NULL/NaN dropped;
- one aggregate pass gets (n, min, max);
- then O(log_B(range)) streaming passes: each pass histograms the
  active [lo, hi] key interval of every still-open quantile into
  B = 2^16 buckets (a vectorized bincount per batch, summed on the
  driver — the per-pass driver state is num_quantiles * B counts),
  then descends into the bucket containing the target rank.  Doubles
  close in <= 4 passes, narrow int columns in 1-2.

At 100 TB this is the right shape: a global ``Dataset.sort`` is an
all-to-all shuffle of the full column with spill, while each refinement
pass here is a column-pruned scan with a tiny additive result — no
shuffle at all, and passes over ALL requested quantiles share one scan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ray.data import Dataset

_B_BITS = 16
_TOP = np.uint64(1) << np.uint64(63)


def _keys_of(col: np.ndarray) -> np.ndarray:
    """Order-preserving int64 keys; NaN rows must be pre-dropped."""
    if col.dtype.kind in "iu":
        return col.astype(np.int64)
    b = np.ascontiguousarray(col, dtype=np.float64).view(np.uint64)
    u = np.where(b >> np.uint64(63) == 1, ~b, b | _TOP)
    return (u ^ _TOP).view(np.int64)


def _key_to_value(key: int, kind: str):
    if kind == "int":
        return int(key)
    u = np.uint64(np.int64(key)) ^ _TOP
    b = np.where(u >> np.uint64(63) == 1, u & ~_TOP, ~u)
    return float(np.asarray(b, dtype=np.uint64).view(np.float64))


def exact_quantiles(ds: Dataset, col: str,
                    qs: list[float]) -> pd.DataFrame:
    """-> DataFrame(q, value): exact quantile_disc of ``ds[col]``."""
    sel = ds.select_columns([col])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        v = v[~pd.isna(v)]
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        if len(v) == 0:
            return pd.DataFrame({"n": [0], "lo": [0], "hi": [0],
                                 "kind": ["?"]})
        k = _keys_of(v)
        return pd.DataFrame({"n": [len(k)], "lo": [int(k.min())],
                             "hi": [int(k.max())],
                             "kind": ["int" if v.dtype.kind in "iu"
                                      else "float"]})

    parts = sel.map_batches(stats, batch_format="pandas").take_all()
    parts = [p for p in parts if p["n"] > 0]
    if not parts:
        raise ValueError(f"no non-null values in column {col!r}")
    n = sum(p["n"] for p in parts)
    glo = min(p["lo"] for p in parts)
    ghi = max(p["hi"] for p in parts)
    kind = parts[0]["kind"]

    # per-quantile search state: rank (1-based), [lo, hi], count(< lo)
    ranks = [max(1, math.ceil(q * n)) for q in qs]
    st = [{"lo": glo, "hi": ghi, "below": 0, "k": r} for r in ranks]

    while any(s["lo"] < s["hi"] for s in st):
        act = [i for i, s in enumerate(st) if s["lo"] < s["hi"]]
        # exact Python-int interval math (key spans can approach 2^63)
        los = [st[i]["lo"] for i in act]
        his = [st[i]["hi"] for i in act]
        spans = [h - l + 1 for l, h in zip(los, his)]
        shifts = [max(0, (sp - 1).bit_length() - _B_BITS)
                  for sp in spans]
        nb = [((sp - 1) >> sh) + 1 for sp, sh in zip(spans, shifts)]

        def hist(df: pd.DataFrame, los=los, his=his, shifts=shifts,
                 nb=nb) -> pd.DataFrame:
            v = df[col].to_numpy()
            v = v[~pd.isna(v)]
            if v.dtype.kind == "f":
                v = v[~np.isnan(v)]
            k = _keys_of(v)
            rows = []
            for j in range(len(los)):
                m = (k >= los[j]) & (k <= his[j])
                # modular uint64 subtraction: diffs land in [0, span),
                # wrap-free even when [lo, hi] straddles zero
                lo_bits = np.uint64(los[j] & 0xFFFFFFFFFFFFFFFF)
                with np.errstate(over="ignore"):
                    b = ((k[m].view(np.uint64) - lo_bits)
                         >> np.uint64(shifts[j])).astype(np.int64)
                rows.append({"j": j,
                             "counts": np.bincount(b, minlength=nb[j])
                             .astype(np.int64)})
            return pd.DataFrame(rows)

        agg = [np.zeros(nb[j], dtype=np.int64) for j in range(len(act))]
        for r in sel.map_batches(hist, batch_format="pandas").take_all():
            agg[r["j"]] += np.asarray(r["counts"], dtype=np.int64)
        for j, i in enumerate(act):
            s = st[i]
            need = s["k"] - s["below"]
            cum = np.cumsum(agg[j])
            b = int(np.searchsorted(cum, need))
            width = 1 << shifts[j]
            s["below"] += int(cum[b - 1]) if b > 0 else 0
            s["lo"] = los[j] + b * width
            s["hi"] = min(s["hi"], los[j] + (b + 1) * width - 1)

    return pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "value": [_key_to_value(s["lo"], kind) for s in st]})


def exact_group_quantiles(ds: Dataset, col: str, by: str,
                          qs: list[float]) -> pd.DataFrame:
    """-> DataFrame(by, q, value): exact quantile_disc of ``col`` per
    ``by`` group, same histogram refinement as ``exact_quantiles`` —
    every pass is still ONE shared scan (each batch histograms every
    group's open intervals), driver state is O(groups * len(qs) * B).
    Intended for low-cardinality group keys (enums, languages, types);
    high-cardinality keys should go through a groupby shuffle instead."""
    sel = ds.select_columns([by, col])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        g = df[by].to_numpy()
        ok = ~pd.isna(v)
        if v.dtype.kind == "f":
            ok &= ~np.isnan(v)
        v, g = v[ok], g[ok]
        rows = []
        for gv in pd.unique(g):
            k = _keys_of(v[g == gv])
            rows.append({"g": gv, "n": len(k), "lo": int(k.min()),
                         "hi": int(k.max()),
                         "kind": "int" if v.dtype.kind in "iu"
                         else "float"})
        return pd.DataFrame(rows)

    groups: dict = {}
    kind = "int"
    for p in sel.map_batches(stats, batch_format="pandas").take_all():
        s = groups.setdefault(p["g"], {"n": 0, "lo": p["lo"],
                                       "hi": p["hi"]})
        s["n"] += p["n"]
        s["lo"] = min(s["lo"], p["lo"])
        s["hi"] = max(s["hi"], p["hi"])
        kind = p["kind"]
    if not groups:
        raise ValueError(f"no non-null values in column {col!r}")

    st = [{"g": gv, "q": q, "lo": s["lo"], "hi": s["hi"], "below": 0,
           "k": max(1, math.ceil(q * s["n"]))}
          for gv, s in groups.items() for q in qs]

    while any(s["lo"] < s["hi"] for s in st):
        act = [s for s in st if s["lo"] < s["hi"]]
        gvals = [s["g"] for s in act]
        los = [s["lo"] for s in act]
        his = [s["hi"] for s in act]
        shifts = [max(0, (h - l).bit_length() - _B_BITS)
                  for l, h in zip(los, his)]
        nb = [((h - l) >> sh) + 1 for l, h, sh in zip(los, his, shifts)]

        def hist(df: pd.DataFrame, gvals=gvals, los=los, his=his,
                 shifts=shifts, nb=nb) -> pd.DataFrame:
            v = df[col].to_numpy()
            g = df[by].to_numpy()
            ok = ~pd.isna(v)
            if v.dtype.kind == "f":
                ok &= ~np.isnan(v)
            v, g = v[ok], g[ok]
            k = _keys_of(v)
            rows = []
            for j in range(len(los)):
                m = (g == gvals[j]) & (k >= los[j]) & (k <= his[j])
                lo_bits = np.uint64(los[j] & 0xFFFFFFFFFFFFFFFF)
                with np.errstate(over="ignore"):
                    b = ((k[m].view(np.uint64) - lo_bits)
                         >> np.uint64(shifts[j])).astype(np.int64)
                rows.append({"j": j,
                             "counts": np.bincount(b, minlength=nb[j])
                             .astype(np.int64)})
            return pd.DataFrame(rows)

        agg = [np.zeros(nb[j], dtype=np.int64) for j in range(len(act))]
        for r in sel.map_batches(hist, batch_format="pandas").take_all():
            agg[r["j"]] += np.asarray(r["counts"], dtype=np.int64)
        for j, s in enumerate(act):
            need = s["k"] - s["below"]
            cum = np.cumsum(agg[j])
            b = int(np.searchsorted(cum, need))
            width = 1 << shifts[j]
            s["below"] += int(cum[b - 1]) if b > 0 else 0
            s["lo"] = los[j] + b * width
            s["hi"] = min(s["hi"], los[j] + (b + 1) * width - 1)

    out = pd.DataFrame({
        by: [s["g"] for s in st],
        "q": np.asarray([s["q"] for s in st], dtype=np.float64),
        "value": [_key_to_value(s["lo"], kind) for s in st]})
    return out.sort_values([by, "q"]).reset_index(drop=True)


def exact_group_quantiles_sql(table: str, col: str, by: str,
                              qs: list[float],
                              cast: str = "DOUBLE") -> str:
    """DuckDB twin of exact_group_quantiles."""
    selects = [(f"SELECT {by}, CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc({col}, {q}) AS {cast}) AS value "
                f"FROM {table} WHERE {col} IS NOT NULL GROUP BY {by}")
               for q in qs]
    return " UNION ALL ".join(selects)


def exact_quantiles_sql(table: str, col: str, qs: list[float],
                        cast: str = "DOUBLE") -> str:
    """DuckDB twin: one quantile_disc row per q (value cast so int and
    float columns compare under one schema)."""
    selects = [(f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc({col}, {q}) AS {cast}) AS value "
                f"FROM {table} WHERE {col} IS NOT NULL")
               for q in qs]
    return " UNION ALL ".join(selects)
