"""Distributed k-means over an embedding column — integer-exact Lloyd.

The missing piece between the ANN operators (``functions/simsearch``) and
corpus curation: cluster the corpus embeddings so downstream stages can
diversity-sample, stratify, or build IVF lists from *full-corpus*
centroids instead of a driver-side sample.

Every step is exact integer arithmetic, so the result is invariant to
batch boundaries, block order, and parallelism — which is what makes a
bit-exact DuckDB twin possible (``kmeans_sql`` unrolls the same Lloyd
iterations as chained CTEs, the same full-pipeline-rebuilt-in-SQL
technique as ``minhash_near_dups_sql``):

- vectors quantize once: ``q = floor(v * QS + 0.5)`` per dim (int64);
- assignment is the true Euclidean Lloyd rule via the integer score
  ``2*(q·c) - |c|^2`` (argmax of it = argmin squared distance; computed
  as a float64 matmul, exact because |score| <= 3 * d * QS^2 ~ 2^40
  << 2^53); argmax ties break to the lowest cluster id;
- centroid updates are exact integer sums (order-independent, unlike
  float accumulation) followed by round-half-up division
  ``c = (2*S + n) // (2*n)`` — floor division, identical semantics in
  numpy ``//`` and DuckDB ``//`` (both floor; verified on negatives);
- empty clusters keep their previous centroid;
- seeds are the k vectors with the smallest ``(_mix(vec_id), vec_id)``
  — deterministic and data-order-independent.

Scale shape: each Lloyd round is ONE streaming pass over the corpus
(``map_batches`` emits <= k partial-sum rows per block; the driver merges
O(k * blocks) rows of d ints — never corpus-sized).  The corpus is
re-scanned per round rather than pinned: for a handful of rounds over
100 TB, re-reading column-pruned parquet beats holding the working set
in the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from .dedup import _mix, _sql_mix_ctes
from .simsearch import _EMB_LONG_SQL

_QS = 65536  # 2^16: |q| ~ 2^16, dots ~ d * 2^32 — exact in float64


def _quantize(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = df["vec_id"].to_numpy().astype(np.int64)
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, np.floor(E * _QS + 0.5).astype(np.int64)


def kmeans_seeds(vecs: Dataset, k: int) -> np.ndarray:
    """(k, d) int64 seed centroids: the quantized vectors of the k ids
    with the smallest (_mix(id), id) — per-batch local top-k, tiny driver
    merge (k rows per block)."""

    def local_k(df: pd.DataFrame) -> pd.DataFrame:
        ids, Q = _quantize(df)
        # rank on the EXACT uint64 hash (a float64 downcast can collide
        # two hashes that differ only below 2^-53, flipping the tiebreak
        # vs the exact-UBIGINT SQL twin)
        h = _mix(ids.astype(np.uint64))
        order = np.lexsort((ids, h))[:k]
        return pd.DataFrame({"h": h[order], "vec_id": ids[order],
                             "qv": list(Q[order])})

    cand = vecs.select_columns(["vec_id", "embedding"]) \
        .map_batches(local_k, batch_format="pandas").take_all()
    cand.sort(key=lambda r: (int(r["h"]), int(r["vec_id"])))
    if len(cand) < k:
        raise ValueError(f"k={k} > corpus size {len(cand)}")
    return np.stack([np.asarray(r["qv"], dtype=np.int64)
                     for r in cand[:k]])


def _assign_rows(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    # Euclidean argmin via the integer score 2*(q.c) - |c|^2 (the |q|^2
    # term is constant per row).  float64 matmul of integer-valued
    # operands: every product and the d-term sums stay far below 2^53,
    # so scores are exact; np.argmax returns the FIRST maximum = lowest
    # cluster id on ties.
    Cf = C.astype(np.float64)
    score = 2.0 * (Q.astype(np.float64) @ Cf.T) - (Cf * Cf).sum(axis=1)
    return np.argmax(score, axis=1)


def kmeans_fit(vecs: Dataset, k: int = 8, iters: int = 4,
               seeds: np.ndarray | None = None) -> np.ndarray:
    """``iters`` exact Lloyd rounds -> (k, d) int64 centroids."""
    C = kmeans_seeds(vecs, k) if seeds is None else seeds
    sel = vecs.select_columns(["vec_id", "embedding"])
    for _ in range(iters):
        Cc = C.copy()

        def partials(df: pd.DataFrame, Cc=Cc) -> pd.DataFrame:
            _, Q = _quantize(df)
            a = _assign_rows(Q, Cc)
            rows = []
            for j in np.unique(a):
                m = a == j
                rows.append({"cluster": int(j),
                             "s": Q[m].sum(axis=0, dtype=np.int64),
                             "n": int(m.sum())})
            return pd.DataFrame(rows)

        S = np.zeros_like(C)
        n = np.zeros(len(C), dtype=np.int64)
        for r in sel.map_batches(partials,
                                 batch_format="pandas").take_all():
            S[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
            n[r["cluster"]] += r["n"]
        nz = n > 0
        C = C.copy()
        C[nz] = (2 * S[nz] + n[nz, None]) // (2 * n[nz, None])
    return C


def kmeans_assign(vecs: Dataset, C: np.ndarray) -> Dataset:
    """-> Dataset(vec_id, cluster) under fixed centroids ``C``."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids, Q = _quantize(df)
        return pd.DataFrame({"vec_id": ids,
                             "cluster": _assign_rows(Q, C)
                             .astype(np.int64)})

    return vecs.select_columns(["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pandas")


def kmeans_assignments(vecs: Dataset, k: int = 8,
                       iters: int = 4) -> Dataset:
    """fit + final assignment: Dataset(vec_id, cluster)."""
    return kmeans_assign(vecs, kmeans_fit(vecs, k, iters))


def kmeans_stratified_sample(vecs: Dataset, k: int = 8, iters: int = 4,
                             per_cluster: int = 10) -> Dataset:
    """Diversity sampling: k-means the corpus, keep the ``per_cluster``
    members with the smallest (_mix(vec_id), vec_id) from EVERY cluster —
    a cluster-balanced subsample (the standard recipe for trimming
    over-represented modes from a training corpus), deterministic across
    reshards.  Two-level top-m: per-batch local candidates, then one
    k-group shuffle of <= per_cluster * blocks candidate rows."""
    asg = kmeans_assignments(vecs, k, iters)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy().astype(np.int64)
        cl = df["cluster"].to_numpy().astype(np.int64)
        h = _mix(ids.astype(np.uint64))      # exact uint64 rank (no f64)
        order = np.lexsort((ids, h, cl))
        ids, cl, h = ids[order], cl[order], h[order]
        new = np.concatenate([[True], cl[1:] != cl[:-1]])
        starts = np.flatnonzero(new)
        rank = np.arange(len(cl)) - starts[np.cumsum(new) - 1]
        keep = rank < per_cluster
        return pd.DataFrame({"vec_id": ids[keep], "cluster": cl[keep],
                             "h": h[keep]})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "vec_id"]).head(per_cluster)
        return g[["vec_id", "cluster"]]

    return asg.map_batches(local, batch_format="pandas") \
        .groupby("cluster").map_groups(final, batch_format="pandas")


def kmeans_stratified_sample_sql(k: int = 8, iters: int = 4,
                                 per_cluster: int = 10) -> str:
    """DuckDB twin: rank each kmeans_sql cluster by the same _mix hash."""
    mix = _sql_mix_ctes("smx", "(SELECT DISTINCT vec_id FROM embeddings)",
                        "vec_id", "CAST(vec_id AS UBIGINT)")
    return f"""
        WITH asg AS ({kmeans_sql(k, iters)}),{mix}
        SELECT vec_id, cluster FROM (
            SELECT a.vec_id, a.cluster,
                   ROW_NUMBER() OVER (PARTITION BY a.cluster
                                      ORDER BY m.v, a.vec_id) AS rn
            FROM asg a JOIN smx m USING (vec_id))
        WHERE rn <= {per_cluster}"""


def kmeans_sql(k: int = 8, iters: int = 4,
               src_long: str | None = None) -> str:
    """DuckDB twin of ``kmeans_assignments`` — the full Lloyd loop
    unrolled as CTEs over the ``embeddings`` view: quantize, _mix-hash
    seed ranking, per-round (integer Euclidean-score assignment ->
    exact-sum round-half-up centroid update with empty-cluster carry),
    final
    assignment.  Output (vec_id, cluster) is bit-exact vs the Ray path
    because both sides are pure integer arithmetic."""
    long_src = src_long or _EMB_LONG_SQL
    mix = _sql_mix_ctes("mx", "(SELECT DISTINCT vec_id FROM embeddings)",
                        "vec_id", "CAST(vec_id AS UBIGINT)")
    parts = [f"""
        qlong AS (SELECT vec_id, i,
                         CAST(FLOOR(v * {_QS} + 0.5) AS BIGINT) AS qv
                  FROM ({long_src})),{mix},
        seeds AS (SELECT vec_id, rn - 1 AS cluster FROM (
                    SELECT vec_id,
                           ROW_NUMBER() OVER (ORDER BY v, vec_id) AS rn
                    FROM mx) WHERE rn <= {k}),
        c0 AS (SELECT s.cluster, q.i, q.qv AS w
               FROM seeds s JOIN qlong q USING (vec_id))"""]

    def assign_cte(name: str, cent: str) -> str:
        return f"""
        {name} AS (SELECT vec_id, cluster FROM (
            SELECT q.vec_id, c.cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY SUM(2 * q.qv * c.w - c.w * c.w) DESC,
                            c.cluster) AS rn
            FROM qlong q JOIN {cent} c ON c.i = q.i
            GROUP BY q.vec_id, c.cluster) WHERE rn = 1)"""

    for t in range(1, iters + 1):
        parts.append(assign_cte(f"a{t}", f"c{t - 1}"))
        parts.append(f"""
        n{t} AS (SELECT cluster, i, SUM(qv) AS s, COUNT(*) AS n
                 FROM a{t} JOIN qlong USING (vec_id) GROUP BY 1, 2),
        c{t} AS (SELECT cluster, i,
                        CAST((2 * s + n) // (2 * n) AS BIGINT) AS w
                 FROM n{t}
                 UNION ALL
                 SELECT p.cluster, p.i, p.w FROM c{t - 1} p
                 WHERE p.cluster NOT IN (SELECT cluster FROM n{t}))""")
    parts.append(assign_cte("afinal", f"c{iters}"))
    return ("WITH " + ",".join(parts)
            + "\nSELECT vec_id, cluster FROM afinal")
