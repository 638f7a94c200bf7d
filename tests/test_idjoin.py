"""Reduce-side id joins + high-cardinality group reduce (functions/idjoin)."""

import pytest
import numpy as np
import pandas as pd
import ray.data as rd

from hecatoncheir_ray.functions.idjoin import (attach_bytes_by_id,
                                               filter_by_ids,
                                               hash_group_reduce)


def test_filter_by_ids_semi_anti(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                         "text": [f"t{i}" for i in range(500)],
                         "score": rng.normal(size=500)})
    ids = pd.DataFrame({"keep": rng.choice(500, 120, replace=False)
                        .astype(np.int64)})
    keep_set = set(ids["keep"])
    semi = filter_by_ids(rd.from_pandas(left).repartition(5), "doc_id",
                         rd.from_pandas(ids), "keep", keep=True,
                         num_parts=16).to_pandas()
    anti = filter_by_ids(rd.from_pandas(left).repartition(5), "doc_id",
                         rd.from_pandas(ids), "keep", keep=False,
                         num_parts=16).to_pandas()
    assert set(semi["doc_id"]) == keep_set
    assert set(anti["doc_id"]) == set(range(500)) - keep_set
    assert sorted(semi.columns) == sorted(left.columns)
    # payloads intact
    m = semi.set_index("doc_id")["text"].to_dict()
    assert all(m[i] == f"t{i}" for i in list(keep_set)[:10])


def test_filter_by_ids_empty_ids(ray_session):
    left = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                         "x": np.arange(10) * 1.0})
    ids = pd.DataFrame({"keep": pd.Series([], dtype=np.int64)})
    semi = filter_by_ids(rd.from_pandas(left), "doc_id",
                         rd.from_pandas(ids), "keep", keep=True)
    anti = filter_by_ids(rd.from_pandas(left), "doc_id",
                         rd.from_pandas(ids), "keep", keep=False)
    assert semi.count() == 0 and anti.count() == 10


def test_attach_bytes_by_id(ray_session):
    rows = pd.DataFrame({"a": np.array([3, 1, 4, 1], dtype=np.int64),
                         "b": np.array([10, 20, 30, 40], dtype=np.int64)})
    look = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                         "pay": [bytes([i]) * 3 for i in range(5)]})
    out = attach_bytes_by_id(rd.from_pandas(rows), "a",
                             rd.from_pandas(look), "id", "pay", "pa",
                             num_parts=8).to_pandas() \
        .sort_values("b").reset_index(drop=True)
    assert out["pa"].tolist() == [bytes([3]) * 3, bytes([1]) * 3,
                                  bytes([4]) * 3, bytes([1]) * 3]


def test_hash_group_reduce_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k1": rng.integers(0, 5000, 40_000).astype(np.int64),
        "k2": rng.choice(["x", "y"], 40_000),
        "v": rng.integers(-100, 100, 40_000).astype(np.int64)})
    got = hash_group_reduce(
        rd.from_pandas(df).repartition(9), ["k1", "k2"],
        {"s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max"),
         "n": ("v", "count")}, num_parts=16).to_pandas() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    exp = df.groupby(["k1", "k2"], as_index=False).agg(
        s=("v", "sum"), mn=("v", "min"), mx=("v", "max"),
        n=("v", "size")).sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


def test_attach_bytes_by_id_missing_key_raises(ray_session):
    """A rows[key] absent from lookup must raise, not silently attach a
    neighboring key's payload (unchecked searchsorted regression)."""
    rows = pd.DataFrame({"a": np.array([3, 5, 7], dtype=np.int64)})
    look = pd.DataFrame({"id": np.array([3, 7], dtype=np.int64),
                         "pay": [b"three", b"seven"]})
    ds = attach_bytes_by_id(rd.from_pandas(rows), "a",
                            rd.from_pandas(look), "id", "pay", "pa",
                            num_parts=1)
    with pytest.raises(Exception, match="missing from lookup"):
        ds.materialize()


def test_hash_group_reduce_keeps_null_keys(ray_session):
    """Null keys aggregate as their own group (SQL GROUP BY semantics),
    not silently dropped by the pandas dropna default."""
    df = pd.DataFrame({"k": pd.array([1, 1, None, None, 2],
                                     dtype="Int64"),
                       "v": np.array([10, 20, 5, 7, 1],
                                     dtype=np.int64)})
    got = hash_group_reduce(rd.from_pandas(df), ["k"],
                            {"s": ("v", "sum")}, num_parts=4).to_pandas()
    by_key = {(-1 if pd.isna(r["k"]) else int(r["k"])): int(r["s"])
              for _, r in got.iterrows()}
    assert by_key == {1: 30, -1: 12, 2: 1}
