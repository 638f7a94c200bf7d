"""Distributed integer-exact k-means: SQL-twin parity, batch invariance,
empty-cluster carry."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from hecatoncheir_ray.functions.clustering import (
    kmeans_assignments, kmeans_fit, kmeans_sql, kmeans_stratified_sample,
    kmeans_stratified_sample_sql)


def _fixture(n=200, d=16, k=6, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d))
    X = (centers[rng.integers(0, k, n)]
         + 0.15 * rng.normal(size=(n, d))).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [x for x in X]})
    return df, X


def test_kmeans_matches_sql_twin(ray_session):
    df, X = _fixture()
    got = kmeans_assignments(rd.from_pandas(df).repartition(7),
                             k=6, iters=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings",
                 pd.DataFrame({"vec_id": df["vec_id"],
                               "embedding": [list(map(float, x))
                                             for x in X]}))
    exp = con.execute(kmeans_sql(k=6, iters=4)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()],
                                  check_dtype=False)
    # every cluster non-trivially populated on this blobby fixture
    assert got["cluster"].nunique() == 6


def test_kmeans_batch_boundary_invariant(ray_session):
    df, _ = _fixture()
    a = kmeans_assignments(rd.from_pandas(df).repartition(2),
                           k=6, iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = kmeans_assignments(rd.from_pandas(df).repartition(13),
                           k=6, iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stratified_sample_matches_sql_twin(ray_session):
    df, X = _fixture()
    got = kmeans_stratified_sample(rd.from_pandas(df).repartition(5),
                                   k=6, iters=3, per_cluster=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings",
                 pd.DataFrame({"vec_id": df["vec_id"],
                               "embedding": [list(map(float, x))
                                             for x in X]}))
    exp = con.execute(kmeans_stratified_sample_sql(
        k=6, iters=3, per_cluster=4)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()],
                                  check_dtype=False)
    assert (got["cluster"].value_counts() == 4).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    df, _ = _fixture(n=50, d=8, k=1)
    # second seed parked far outside the data: under the Euclidean rule
    # it never attracts a member, so its centroid must carry unchanged
    # through every round while cluster 0 converges to the data mean
    base = kmeans_fit(rd.from_pandas(df), k=1, iters=0)  # seeds only
    far = base[0] + np.int64(10**6)  # >> data range, scores stay exact
    seeds = np.vstack([base[0], far])
    C = kmeans_fit(rd.from_pandas(df), k=2, iters=3, seeds=seeds)
    assert np.array_equal(C[1], far)
    assert not np.array_equal(C[0], seeds[0])
