"""Exact distributed quantiles (histogram range-count refinement, no
global sort): DuckDB quantile_disc parity on ints and doubles."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hecatoncheir_ray.functions.quantiles import (
    exact_group_quantiles, exact_group_quantiles_sql, exact_quantiles,
    exact_quantiles_sql)

QS = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]


def _check(df, qs=QS, parts=7, isnan_guard=False):
    con = duckdb.connect()
    con.register("t", df)
    sql = exact_quantiles_sql("t", "x", qs)
    if isnan_guard:
        sql = sql.replace("IS NOT NULL", "IS NOT NULL AND NOT isnan(x)")
    exp = con.execute(sql).df()
    got = exact_quantiles(rd.from_pandas(df).repartition(parts), "x", qs)
    got = got.assign(value=got["value"].astype(float))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_int_quantiles_match_duckdb(ray_session):
    rng = np.random.default_rng(11)
    _check(pd.DataFrame({"x": rng.integers(-10**9, 10**9, 5000)}))


def test_small_range_int_single_pass(ray_session):
    rng = np.random.default_rng(5)
    # range fits one 2^16 histogram -> converges in a single pass
    _check(pd.DataFrame({"x": rng.integers(0, 100, 3000)}), parts=3)


def test_double_quantiles_with_nans(ray_session):
    rng = np.random.default_rng(12)
    v = rng.normal(scale=1e5, size=5000)
    v[::97] = np.nan
    _check(pd.DataFrame({"x": v}), isnan_guard=True)


def test_partitioning_invariant(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"x": rng.integers(-500, 500, 2000)})
    a = exact_quantiles(rd.from_pandas(df).repartition(2), "x", QS)
    b = exact_quantiles(rd.from_pandas(df).repartition(17), "x", QS)
    pd.testing.assert_frame_equal(a, b)


def test_partitioning_invariant_many_blocks(ray_session):
    # >= 64 blocks: the sparse shuffle-side Sum reduce must merge partial
    # histograms identically however the rows are sharded
    rng = np.random.default_rng(21)
    df = pd.DataFrame({"x": rng.normal(scale=1e6, size=4000)})
    a = exact_quantiles(rd.from_pandas(df).repartition(1), "x", QS)
    b = exact_quantiles(rd.from_pandas(df).repartition(64), "x", QS)
    pd.testing.assert_frame_equal(a, b)


def test_int_column_with_nulls_schema_kind(ray_session):
    # an int64 parquet/Arrow column with nulls materializes as float64 in
    # null-bearing pandas blocks: kind must come from the schema so every
    # block maps keys identically (identity, not IEEE bits)
    import pyarrow as pa
    vals = list(range(-50, 50)) * 10
    arr = pa.array([None if i % 97 == 0 else v
                    for i, v in enumerate(vals)], type=pa.int64())
    tbl = pa.table({"x": arr})
    ds = rd.from_arrow(tbl).repartition(8)
    got = exact_quantiles(ds, "x", QS)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(exact_quantiles_sql("t", "x", QS)).df()
    got = got.assign(value=got["value"].astype(float))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_group_quantiles_all_null_block(ray_session):
    # a block whose rows are all-null for the value column must not drift
    # the partial schema (ADVICE r3): group "z" is entirely null and the
    # null rows are concentrated in their own partition
    df = pd.DataFrame({
        "g": ["a"] * 100 + ["z"] * 50,
        "x": np.concatenate([np.arange(100, dtype=np.float64),
                             np.full(50, np.nan)])})
    qs = [0.5]
    got = exact_group_quantiles(
        rd.from_pandas(df).repartition(6), "x", "g", qs)
    assert list(got["g"]) == ["a"]
    assert got["value"].iloc[0] == 49.0


def test_duplicates_and_skew(ray_session):
    # heavy ties: rank arithmetic must still pick quantile_disc's element
    x = np.concatenate([np.zeros(900, dtype=np.int64),
                        np.full(90, 7, dtype=np.int64),
                        np.arange(10, dtype=np.int64) + 100])
    _check(pd.DataFrame({"x": x}), parts=5)


def test_group_quantiles_match_duckdb(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 4000),
        "x": rng.normal(scale=1e4, size=4000)})
    qs = [0.1, 0.5, 0.9]
    got = exact_group_quantiles(
        rd.from_pandas(df).repartition(6), "x", "g", qs)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(exact_group_quantiles_sql("t", "x", "g", qs)).df() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_group_quantiles_uneven_groups(ray_session):
    # one tiny group (2 rows) next to a big one: rank math per group
    df = pd.DataFrame({
        "g": ["big"] * 1000 + ["tiny"] * 2,
        "x": np.concatenate([np.arange(1000, dtype=np.int64),
                             np.array([7, -3], dtype=np.int64)])})
    qs = [0.0, 0.5, 1.0]
    got = exact_group_quantiles(
        rd.from_pandas(df).repartition(4), "x", "g", qs)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(exact_group_quantiles_sql("t", "x", "g", qs)).df() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    got = got.assign(value=got["value"].astype(float))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_all_null_raises(ray_session):
    df = pd.DataFrame({"x": np.array([np.nan, np.nan])})
    with pytest.raises(ValueError):
        exact_quantiles(rd.from_pandas(df), "x", [0.5])


def test_pandas_born_dataset_kind(ray_session):
    # pandas-born datasets expose numpy dtypes (not Arrow types) in the
    # Ray schema; _kind_of must handle both (regression: bench --quantiles)
    rng = np.random.default_rng(3)
    dfi = pd.DataFrame({"x": rng.integers(0, 1000, 500)})
    dff = pd.DataFrame({"x": rng.normal(size=500)})
    for df in (dfi, dff):
        got = exact_quantiles(rd.from_pandas(df).repartition(3), "x",
                              [0.5])
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(exact_quantiles_sql("t", "x", [0.5])).df()
        assert float(got["value"].iloc[0]) == float(exp["value"].iloc[0])
