"""Distributed as-of joins over event streams.

The as-of join (each left row matched to the single most recent right row
with ``r.ts <= l.ts``) is the canonical operator Ray Data lacks and a
training-data pipeline needs (attribution, sessionization, feature
backfill).  Two physical shapes:

* ``asof_join`` (keyed): both sides hash-partitioned on the equality key
  in ONE groupby shuffle; within each partition a composite
  (key-rank, ts-rank) encoding makes the whole multi-key merge a single
  vectorized ``searchsorted`` — no per-key Python loop.  This is the
  100 TB path: the shuffle is the same one a hash join pays, and a hot
  key costs one group (as-of needs the key's full history, so salting
  does not apply; a key whose history exceeds a worker is the pathological
  case to re-bucket by time with the carry trick below).

* ``asof_join_global`` (keyless): right side is bucketed by time; a tiny
  per-bucket "last row" summary (<= one row per bucket per block,
  reduced driver-side to one row per bucket — bounded by
  timespan/bucket_width, NOT by data size) is prefix-scanned into a
  carry table shipped to every bucket group, so each bucket resolves
  left rows that precede its first right row without a second shuffle.

Semantics are inner (unmatched left rows drop) and ties on equal
``(key, ts)`` resolve to the largest tiebreak column value, making the
result deterministic; the DuckDB oracles pre-dedupe the right side the
same way (plain ASOF JOIN leaves equal-ts winners unspecified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

_NS = "datetime64[ns]"


def _ts_int(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=_NS).view(np.int64)


def _empty_out(left_cols, right_cols, prefix) -> pd.DataFrame:
    cols = {}
    for c, dt in left_cols:
        cols[c] = pd.Series([], dtype=dt)
    for c, dt in right_cols:
        cols[prefix + c] = pd.Series([], dtype=dt)
    return pd.DataFrame(cols)


def _asof_merge(lk, lt, rk, rt, rtie):
    """Vectorized multi-key as-of core.

    lk/rk int64 key ranks (or zeros when keyless), lt/rt int64 times,
    rtie int64 tiebreaker (larger wins on equal (key, ts)).  Returns
    (keep mask over left, original-right index per left row, kept left
    row indices)."""
    order_r = np.lexsort((rtie, rt, rk))
    rk, rt = rk[order_r], rt[order_r]
    # rank-compress times across both sides so the composite fits int64
    ut = np.unique(np.concatenate([lt, rt]))
    ltr = np.searchsorted(ut, lt)
    rtr = np.searchsorted(ut, rt)
    m = np.int64(len(ut) + 1)
    rc = rk * m + rtr
    lc = lk * m + ltr
    idx = np.searchsorted(rc, lc, side="right") - 1
    keep = idx >= 0
    idx_c = np.where(keep, idx, 0)
    keep &= (rk[idx_c] == lk)          # match must be in the same key run
    return keep, order_r[idx_c], keep.nonzero()[0]


def asof_join(left: Dataset, right: Dataset, on: str = "ts",
              by: str = "user_id", left_cols=("event_id",),
              right_cols=("event_id", "value"), tiebreak: str = "event_id",
              prefix: str = "r_", num_parts: int = 256) -> Dataset:
    """Keyed as-of join: for every left row, the most recent right row of
    the SAME ``by`` key with ``right.on <= left.on`` (inner; deterministic
    max-``tiebreak`` on equal timestamps).  One hash shuffle, one
    vectorized merge kernel per partition."""
    lsel = [by, on, *left_cols]
    rsel = list(dict.fromkeys([by, on, *right_cols, tiebreak]))
    rtypes = _dtypes_of(right, right_cols)
    ltypes = _dtypes_of(left, left_cols)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lsel].copy()
        out["tag"] = np.int8(0)
        for c in right_cols:
            out[prefix + c] = _neutral_col(len(df), rtypes[c])
        out["_tie"] = np.int64(0)
        k = out[by].to_numpy().astype(np.uint64)
        out["part"] = _part_of(k, num_parts)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[by, on]].copy()
        for c in left_cols:
            out[c] = _neutral_col(len(df), ltypes[c])
        out["tag"] = np.int8(1)
        for c in right_cols:
            out[prefix + c] = df[c].to_numpy()
        out["_tie"] = df[tiebreak].to_numpy().astype(np.int64)
        k = out[by].to_numpy().astype(np.uint64)
        out["part"] = _part_of(k, num_parts)
        return out

    out_left = [(by, np.int64), (on, _NS)] + [(c, None) for c in left_cols]
    out_right = [(c, None) for c in right_cols]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lm = g["tag"].to_numpy() == 0
        gl, gr = g[lm], g[~lm]
        if len(gl) == 0 or len(gr) == 0:
            return _empty_kernel_out(g, lsel, right_cols, prefix)
        keys = np.unique(np.concatenate(
            [gl[by].to_numpy(), gr[by].to_numpy()]).astype(np.int64))
        lk = np.searchsorted(keys, gl[by].to_numpy().astype(np.int64))
        rk = np.searchsorted(keys, gr[by].to_numpy().astype(np.int64))
        keep, ridx, lidx = _asof_merge(
            lk.astype(np.int64), _ts_int(gl[on]),
            rk.astype(np.int64), _ts_int(gr[on]),
            gr["_tie"].to_numpy().astype(np.int64))
        cols = {c: gl[c].to_numpy()[lidx] for c in lsel}
        for c in right_cols:
            cols[prefix + c] = gr[prefix + c].to_numpy()[ridx[keep]]
        return pd.DataFrame(cols)

    tagged = left.select_columns(lsel) \
        .map_batches(tag_left, batch_format="pandas") \
        .union(right.select_columns(rsel)
               .map_batches(tag_right, batch_format="pandas"))
    return tagged.groupby("part").map_groups(kernel, batch_format="pandas")


def asof_join_global(left: Dataset, right: Dataset, on: str = "ts",
                     left_cols=("event_id",),
                     right_cols=("event_id", "value"),
                     tiebreak: str = "event_id", prefix: str = "r_",
                     bucket_us: int = 6 * 3600 * 1_000_000) -> Dataset:
    """Keyless global as-of join via time buckets + a prefix-carry pass.

    Pass 1 streams the right side once and keeps, per time bucket, only
    its last row (max (ts, tiebreak)) — the driver reduces block partials
    to <= timespan/bucket rows and prefix-scans them into carry[b] = last
    right row strictly before bucket b.  Pass 2 is one groupby(bucket)
    whose kernel prepends the carry row, so no left row ever waits on a
    neighboring partition."""
    rsel = list(dict.fromkeys([on, *right_cols, tiebreak]))
    lsel = [on, *left_cols]

    def last_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[rsel].assign(bucket=np.int64(0)).iloc[:0]
        t = _ts_int(df[on])
        b = t // (bucket_us * 1000)
        tie = df[tiebreak].to_numpy().astype(np.int64)
        order = np.lexsort((tie, t, b))
        last = np.concatenate([b[order][1:] != b[order][:-1], [True]])
        pick = order[last]
        out = df.iloc[pick][rsel].copy()
        out["bucket"] = b[pick]
        return out

    partials = right.map_batches(last_per_bucket,
                                 batch_format="pandas").to_pandas()
    if len(partials):
        t = _ts_int(partials[on])
        tie = partials[tiebreak].to_numpy().astype(np.int64)
        b = partials["bucket"].to_numpy().astype(np.int64)
        order = np.lexsort((tie, t, b))
        last = np.concatenate([b[order][1:] != b[order][:-1], [True]])
        partials = partials.iloc[order[last]].reset_index(drop=True)
    carry = partials    # one row per non-empty bucket, ts-ascending

    rtypes = _dtypes_of(right, right_cols)
    ltypes = _dtypes_of(left, left_cols)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lsel].copy()
        out["tag"] = np.int8(0)
        for c in right_cols:
            out[prefix + c] = _neutral_col(len(df), rtypes[c])
        out["_tie"] = np.int64(0)
        out["bucket"] = _ts_int(df[on]) // (bucket_us * 1000)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[on]].copy()
        for c in left_cols:
            out[c] = _neutral_col(len(df), ltypes[c])
        out["tag"] = np.int8(1)
        for c in right_cols:
            out[prefix + c] = df[c].to_numpy()
        out["_tie"] = df[tiebreak].to_numpy().astype(np.int64)
        out["bucket"] = _ts_int(df[on]) // (bucket_us * 1000)
        return out

    cb = carry["bucket"].to_numpy().astype(np.int64) if len(carry) \
        else np.array([], dtype=np.int64)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lm = g["tag"].to_numpy() == 0
        gl, gr = g[lm], g[~lm]
        if len(gl) == 0:
            return _empty_kernel_out(g, lsel, right_cols, prefix)
        bucket = int(g["bucket"].iloc[0])
        # carry row: last right row from any earlier bucket
        ci = np.searchsorted(cb, bucket, side="left") - 1
        rt_list = [_ts_int(gr[on])]
        rtie_list = [gr["_tie"].to_numpy().astype(np.int64)]
        rpay = {c: [gr[prefix + c].to_numpy()] for c in right_cols}
        if ci >= 0:
            crow = carry.iloc[int(ci)]
            rt_list.append(np.array([pd.Timestamp(crow[on]).value],
                                    dtype=np.int64))
            rtie_list.append(np.array([np.int64(crow[tiebreak])]))
            for c in right_cols:
                rpay[c].append(np.array([crow[c]],
                                        dtype=gr[prefix + c].dtype))
        rt = np.concatenate(rt_list)
        rtie = np.concatenate(rtie_list)
        if len(rt) == 0:
            return _empty_kernel_out(g, lsel, right_cols, prefix)
        keep, ridx, lidx = _asof_merge(
            np.zeros(len(gl), dtype=np.int64), _ts_int(gl[on]),
            np.zeros(len(rt), dtype=np.int64), rt, rtie)
        cols = {c: gl[c].to_numpy()[lidx] for c in lsel}
        for c in right_cols:
            pay = np.concatenate(rpay[c])
            cols[prefix + c] = pay[ridx[keep]]
        return pd.DataFrame(cols)

    tagged = left.select_columns(lsel) \
        .map_batches(tag_left, batch_format="pandas") \
        .union(right.select_columns(rsel)
               .map_batches(tag_right, batch_format="pandas"))
    return tagged.groupby("bucket").map_groups(kernel,
                                               batch_format="pandas")


def _part_of(k: np.ndarray, num_parts: int) -> np.ndarray:
    from .dedup import _mix
    return _mix(k).astype(np.int64) % num_parts


def _dtypes_of(ds: Dataset, cols) -> dict:
    """Pandas dtype per column, resolved from the DATASET schema — the
    authoritative source for union-schema fillers (probing the other
    side's frame for a same-named column silently mismatches dtypes
    when, e.g., a right payload column is a string absent on the left)."""
    import pyarrow as pa
    sch = ds.schema()
    out = {}
    for name, typ in zip(sch.names, sch.types):
        if name in cols:
            # Ray Schema holds pa.DataType for Arrow blocks but plain
            # numpy/Python types for pandas-born datasets
            out[name] = (typ.to_pandas_dtype()
                         if isinstance(typ, pa.DataType) else typ)
    return out


def _neutral_col(n: int, dtype):
    """Neutral filler column of the given pandas dtype."""
    if dtype is object or dtype == np.object_:
        return np.full(n, "", dtype=object)
    return np.zeros(n, dtype=dtype)


def _empty_kernel_out(g: pd.DataFrame, lsel, right_cols,
                      prefix) -> pd.DataFrame:
    cols = {c: g[c].iloc[:0] for c in lsel}
    for c in right_cols:
        cols[prefix + c] = g[prefix + c].iloc[:0]
    return pd.DataFrame(cols)


def asof_join_sql(left_type: str = "click", right_type: str = "view",
                  by: bool = True) -> str:
    """DuckDB twin over the events view: ASOF JOIN with the right side
    pre-deduped to max event_id per (key, ts) — the same deterministic
    tie rule the Ray kernels apply."""
    key = "l.user_id = r.user_id AND " if by else ""
    part = "user_id, ts" if by else "ts"
    ucol = "l.user_id, " if by else ""
    return f"""
        WITH l AS (SELECT * FROM events WHERE event_type = '{left_type}'),
        r0 AS (SELECT *, row_number() OVER (PARTITION BY {part}
                         ORDER BY event_id DESC) AS rn
               FROM events WHERE event_type = '{right_type}'),
        r AS (SELECT * FROM r0 WHERE rn = 1)
        SELECT l.event_id, {ucol}l.ts,
               r.event_id AS r_event_id, r.value AS r_value
        FROM l ASOF JOIN r ON {key}r.ts <= l.ts
    """
