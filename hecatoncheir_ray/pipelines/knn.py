"""Batch kNN queries over a point dataset.

Reference: uniform-grid kNN with per-partition pruning and a bounded
max-heap merged across workers
(/root/reference/Hecatoncheir/src/UniformGrid/knn_filter.cpp:7-55,
API/containers.h:171-189, host merge src/env/comm_host.cpp:603-696).

Ray-Data shape: queries are a small broadcast list; one map_batches pass
computes a vectorized distance matrix per block and keeps the local top-k
per query (exact: global top-k of locally-top-k blocks), then a tiny
groupby(query_id) reduces to the final k.  Ties broken by (distance, id)
for determinism (the reference heap's tie order is unspecified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..stages.assign import geoms_from_table

KNN_SCHEMA = pa.schema([("query_id", pa.int64()), ("id", pa.int64()),
                        ("dist2", pa.float64())])


def make_knn_fn(queries: list[tuple[int, float, float]], k: int):
    q = np.asarray([(x, y) for _, x, y in queries])
    qids = np.asarray([qid for qid, _, _ in queries], dtype=np.int64)

    def knn_local(t: pa.Table) -> pa.Table:
        ids, gtypes, offs, vals, *_ = geoms_from_table(t)
        if len(ids) == 0:
            return KNN_SCHEMA.empty_table()
        px = vals[offs[:-1]]
        py = vals[offs[:-1] + 1]
        # (Q, N) squared-distance matrix; ranking on dist2 is bit-exact
        # (sqrt only at the end, for display)
        dx = q[:, 0][:, None] - px[None, :]
        dy = q[:, 1][:, None] - py[None, :]
        dist2 = dx * dx + dy * dy
        kk = min(k, dist2.shape[1])
        idx = np.argpartition(dist2, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(qids, kk)
        out_id = ids[idx.ravel()]
        out_d = np.take_along_axis(dist2, idx, axis=1).ravel()
        return pa.table({"query_id": out_q, "id": out_id,
                         "dist2": out_d}, schema=KNN_SCHEMA)

    return knn_local


def knn_query(ds: Dataset, queries, k: int) -> Dataset:
    """queries: [(query_id, x, y), ...] -> (query_id, id, distance), k rows
    per query, ordered by (dist2, id) within each query (deterministic)."""
    local = ds.map_batches(make_knn_fn(queries, k), batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist2", "id"]).head(k)
        g["distance"] = np.sqrt(g["dist2"])
        return g[["query_id", "id", "distance"]]

    return local.groupby("query_id").map_groups(final_topk,
                                                batch_format="pandas")
