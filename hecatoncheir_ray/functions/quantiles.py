"""Exact distributed quantiles WITHOUT a global sort.

``exact_quantiles`` computes exact order statistics (DuckDB
``quantile_disc`` semantics: the element at rank ``max(1, ceil(q*n))``)
by histogram range-count refinement instead of sorting:

- map the column to an order-preserving int64 key (identity for ints;
  the IEEE-754 total-order bit trick for doubles), NULL/NaN dropped;
- one aggregate pass gets (n, min, max);
- then O(log_B(range)) streaming passes: each pass histograms the
  active [lo, hi] key interval of every still-open quantile into
  B = 2^16 buckets — one vectorized bincount per ~4M-row coalesced
  batch, emitted as a DENSE int64 array per (task, open quantile) and
  vector-added in a two-level reduce (<= 16 shuffle partitions, then
  the driver sums 16 x open_quantiles arrays) — then descends into the
  bucket containing the target rank.  Doubles close in <= 4 passes,
  narrow int columns in 1-2.

At 100 TB this is the right shape: a global ``Dataset.sort`` is an
all-to-all shuffle of the full column with spill, while each refinement
pass here is a column-pruned scan whose only exchange is
tasks x open_quantiles dense 512 KB arrays; driver state is independent
of block count, and passes over ALL requested quantiles share one scan.
(Design history: per-block driver take_all was the round-3 flaw —
O(blocks) driver bytes; a SPARSE (j, bucket, n) row reduce degenerates
to blocks x B rows on dense data and pays Ray's per-group aggregate
coordination — the dense two-level vector-add is the shape that holds.)

The key kind (int vs float) is resolved ONCE from the Dataset schema,
not per block: an integer parquet column with nulls materializes as
float64 in null-bearing pandas blocks and int64 elsewhere, so per-block
dtype sniffing would mix identity and IEEE-bit keys across blocks.
Every batch is coerced to the schema kind after null-dropping.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

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


def _kind_of(ds: Dataset, col: str) -> str:
    """'int' or 'float' from the DATASET schema (authoritative; per-block
    pandas dtypes are not — see module docstring).  Ray schemas hold
    pa.DataType for Arrow blocks but numpy dtypes for pandas-born
    datasets; handle both."""
    sch = ds.schema()
    t = sch.types[sch.names.index(col)]
    if isinstance(t, pa.DataType):
        return "int" if pa.types.is_integer(t) else "float"
    return "int" if np.issubdtype(np.dtype(t), np.integer) else "float"


def _clean(v: np.ndarray, kind: str) -> np.ndarray:
    """Drop nulls/NaNs and coerce to the schema kind's dtype."""
    v = v[~pd.isna(v)]
    if v.dtype.kind == "f":
        v = v[~np.isnan(v)]
        if kind == "int":
            v = v.astype(np.int64)
    elif v.dtype.kind in "iu" and kind == "float":
        v = v.astype(np.float64)
    elif v.dtype == object:
        v = v.astype(np.int64 if kind == "int" else np.float64)
    return v


_P_HIST = 16
# coalesce input blocks into large per-task batches for the histogram
# scans: partial count (and the reduce's traffic) shrinks by the same
# factor; 4M keys ~ 32 MB per task heap
_HIST_BATCH = 4_000_000

_EMPTY_HIST = pd.DataFrame({"j": pd.Series([], dtype=np.int64),
                            "h": pd.Series([], dtype=object),
                            "part": pd.Series([], dtype=np.int64)})


def _hist_rows(k: np.ndarray, los, his, shifts, nb) -> pd.DataFrame:
    """Batch keys -> ONE dense-int64-histogram row per active interval j
    (counts serialized as bytes; a content-derived part spreads the
    partials over the reduce partitions)."""
    import zlib
    js, hs, ps = [], [], []
    for j in range(len(los)):
        m = (k >= los[j]) & (k <= his[j])
        if not m.any():
            continue                # no zero-buffer rows for idle blocks
        # modular uint64 subtraction: diffs land in [0, span), wrap-free
        # even when [lo, hi] straddles zero
        lo_bits = np.uint64(los[j] & 0xFFFFFFFFFFFFFFFF)
        with np.errstate(over="ignore"):
            b = ((k[m].view(np.uint64) - lo_bits)
                 >> np.uint64(shifts[j])).astype(np.int64)
        buf = np.bincount(b, minlength=nb[j]).astype(np.int64).tobytes()
        js.append(j)
        hs.append(buf)
        ps.append((zlib.crc32(buf) ^ j) % _P_HIST)
    if not js:
        return _EMPTY_HIST.copy()
    return pd.DataFrame({"j": np.asarray(js, dtype=np.int64),
                         "h": np.asarray(hs, dtype=object),
                         "part": np.asarray(ps, dtype=np.int64)})


def _reduce_hist(part_rows: Dataset, nb: list[int]) -> list[np.ndarray]:
    """Two-level DENSE-array reduce of per-block histogram partials:
    each of <= _P_HIST shuffle partitions vector-adds its blocks'
    arrays (C-speed int64 addition — a sparse row-level groupby
    degenerates to blocks x buckets rows on dense data, and a driver
    take_all of every block's partial is the round-3 flaw); the driver
    then sums only _P_HIST x open_quantiles arrays, independent of
    block count."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        out_j, out_h = [], []
        for j, sub in g.groupby("j", sort=False):
            s = np.zeros(nb[int(j)], dtype=np.int64)
            for x in sub["h"]:
                s += np.frombuffer(x, dtype=np.int64)
            out_j.append(int(j))
            out_h.append(s.tobytes())
        return pd.DataFrame({"j": np.asarray(out_j, dtype=np.int64),
                             "h": np.asarray(out_h, dtype=object)})

    agg = [np.zeros(nb[j], dtype=np.int64) for j in range(len(nb))]
    for r in part_rows.groupby("part").map_groups(
            kernel, batch_format="pandas").take_all():
        agg[int(r["j"])] += np.frombuffer(r["h"], dtype=np.int64)
    return agg


def exact_quantiles(ds: Dataset, col: str,
                    qs: list[float]) -> pd.DataFrame:
    """-> DataFrame(q, value): exact quantile_disc of ``ds[col]``."""
    from ray.data.aggregate import Count, Max, Min

    kind = _kind_of(ds, col)
    sel = ds.select_columns([col])

    def to_keys(df: pd.DataFrame) -> pd.DataFrame:
        v = _clean(df[col].to_numpy(), kind)
        return pd.DataFrame({"k": _keys_of(v)})

    keyed = sel.map_batches(to_keys, batch_format="pandas")
    stat = keyed.aggregate(Min("k", alias_name="lo"),
                           Max("k", alias_name="hi"),
                           Count(alias_name="n"))
    n = stat.get("n") or 0
    if n == 0:
        raise ValueError(f"no non-null values in column {col!r}")
    glo, ghi = int(stat["lo"]), int(stat["hi"])

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
            k = _keys_of(_clean(df[col].to_numpy(), kind))
            return _hist_rows(k, los, his, shifts, nb)

        agg = _reduce_hist(
            sel.map_batches(hist, batch_format="pandas",
                            batch_size=_HIST_BATCH), nb)
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
    group's open intervals) and the partials reduce shuffle-side;
    driver state is O(groups * len(qs) * B).  Intended for
    low-cardinality group keys (enums, languages, types);
    high-cardinality keys should go through a groupby shuffle instead."""
    from ray.data.aggregate import Count, Max, Min

    kind = _kind_of(ds, col)
    sel = ds.select_columns([by, col])

    def to_keys(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        g = df[by].to_numpy()
        ok = ~pd.isna(v)
        v, g = v[ok], g[ok]
        v = _clean(v, kind)
        return pd.DataFrame({by: g, "k": _keys_of(v)})

    grows = sel.map_batches(to_keys, batch_format="pandas") \
        .groupby(by).aggregate(Min("k", alias_name="lo"),
                               Max("k", alias_name="hi"),
                               Count(alias_name="n")).take_all()
    if not grows:
        raise ValueError(f"no non-null values in column {col!r}")
    groups = {r[by]: {"n": int(r["n"]), "lo": int(r["lo"]),
                      "hi": int(r["hi"])} for r in grows}

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
            v, g = v[ok], g[ok]
            v = _clean(v, kind)
            k = _keys_of(v)
            out = []
            for j in range(len(los)):
                mg = g == gvals[j]
                part = _hist_rows(k[mg], [los[j]], [his[j]],
                                  [shifts[j]], [nb[j]])
                if len(part):
                    part["j"] = np.int64(j)
                    out.append(part)
            if not out:
                return _EMPTY_HIST.copy()
            return pd.concat(out, ignore_index=True)[["j", "h", "part"]]

        agg = _reduce_hist(
            sel.map_batches(hist, batch_format="pandas",
                            batch_size=_HIST_BATCH), nb)
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
