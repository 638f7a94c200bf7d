"""Similarity search over an embedding column (list<float>).

* Brute-force top-k: the query matrix is broadcast once (ray.put) and every
  batch does ONE numpy matmul; per-batch local top-k then a tiny driver
  merge — exact, no shuffle.
* Quantized inner-product variant (``topk_ip_quantized``): scores are
  int64 dot products of FLOOR(v*10000+0.5) quantized vectors, bit-identical
  to the DuckDB oracle (float matmul ties are engine-dependent; integers
  are not).
* LSH-bucketed variant (``topk_cosine_lsh``): random-hyperplane buckets
  with multiprobe-by-band — the scale path; recall measured in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _emb_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _merge_topk(parts: list[tuple], k: int, by_score_desc=True):
    """parts: (query_id, vec_id, score) tuples -> per-query top-k rows."""
    best: dict[int, list] = {}
    for qid, vid, sc in parts:
        best.setdefault(qid, []).append((-sc, vid))
    rows = []
    for qid in sorted(best):
        for negsc, vid in sorted(best[qid])[:k]:
            rows.append((qid, vid, -negsc))
    return rows


def _merge_topk_shuffled(parts_ds: Dataset, qids: list[int], k: int,
                         keep_score: bool = False) -> pd.DataFrame:
    """Shuffle-side merge of per-block top-k partials: one
    groupby(query_id) keeps the k best (score desc, vec_id asc) per
    query, so the driver sees only the final Q*k rows — not
    blocks x Q x k partials (which scale with block count)."""

    def merge_group(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        order = np.lexsort((g["vec_id"].to_numpy(),
                            -g["score"].to_numpy()))[:_k]
        out = g.iloc[order].copy()
        out["rank"] = np.arange(len(out), dtype=np.int64)
        return out

    merged = parts_ds.groupby("query_id").map_groups(
        merge_group, batch_format="pandas").to_pandas()
    pos = {q: i for i, q in enumerate(qids)}
    merged["ord"] = merged["query_id"].map(pos)
    merged = merged.sort_values(["ord", "rank"])
    if keep_score:
        return merged[["query_id", "vec_id", "score"]] \
            .reset_index(drop=True)
    return merged[["query_id", "vec_id"]].astype(np.int64) \
        .reset_index(drop=True)


def topk_ip_quantized(vecs: Dataset, query_ids: list[int],
                      k: int = 10) -> pd.DataFrame:
    """Exact top-k by quantized inner product (MIPS).

    score = sum_i floor(a_i*1e4+0.5) * floor(b_i*1e4+0.5)  (int64, exact).
    Ties broken by vec_id ascending.  -> (query_id, vec_id)."""
    wanted = pa.array(sorted(set(query_ids)), type=pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["vec_id"], value_set=wanted))

    qrows = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
             for r in vecs.map_batches(pick,
                                       batch_format="pyarrow").take_all()}
    Q = np.stack([np.floor(qrows[q] * 10000 + 0.5) for q in query_ids]) \
        .astype(np.int64)
    qids = list(query_ids)
    q_ref = ray.put(Q)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        emb = np.floor(_emb_matrix(df) * 10000 + 0.5).astype(np.int64)
        scores = emb @ Qm.T                       # (n, Q) int64
        vid = df["vec_id"].to_numpy().astype(np.int64)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(df))
        for qi in range(scores.shape[1]):
            # top-k by (score desc, vec_id asc)
            order = np.lexsort((vid, -scores[:, qi]))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(vid[order])
            out_s.extend(scores[order, qi])
        return pd.DataFrame({"query_id": np.array(out_q, dtype=np.int64),
                             "vec_id": np.array(out_v, dtype=np.int64),
                             "score": np.array(out_s, dtype=np.int64)})

    return _merge_topk_shuffled(
        vecs.map_batches(local_topk, batch_format="pandas"), qids, k)


def topk_ip_quantized_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(q) for q in query_ids)
    return f"""
        WITH E AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(FLOOR(unnest(embedding) * 10000 + 0.5) AS BIGINT)
                       AS q
            FROM embeddings),
        QS AS (SELECT vec_id AS query_id, i, q FROM E
               WHERE vec_id IN ({ids})),
        SC AS (SELECT QS.query_id, E.vec_id,
                      SUM(QS.q * E.q) AS score
               FROM QS JOIN E USING (i) GROUP BY 1, 2)
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rn
            FROM SC) WHERE rn <= {k}
    """


def topk_cosine_brute(vecs: Dataset, queries: np.ndarray,
                      k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k: broadcast normalized query matrix, one matmul
    per batch, shuffle-side per-query merge.  queries: (Q, dim)."""
    Qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)
    q_ref = ray.put(Qn)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        emb = _emb_matrix(df)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                               1e-300)
        scores = emb @ Qm.T
        vid = df["vec_id"].to_numpy().astype(np.int64)
        kk = min(k, len(df))
        out = []
        for qi in range(scores.shape[1]):
            order = np.lexsort((vid, -scores[:, qi]))[:kk]
            out.extend((qi, int(vid[o]), float(scores[o, qi]))
                       for o in order)
        return pd.DataFrame(out, columns=["query_id", "vec_id", "score"])

    return _merge_topk_shuffled(
        vecs.map_batches(local_topk, batch_format="pandas"),
        list(range(len(queries))), k, keep_score=True)


def topk_cosine_ivf(vecs: Dataset, queries: np.ndarray, k: int = 10,
                    nlist: int = 16, nprobe: int = 4,
                    train_sample: int = 512, seed: int = 13) -> pd.DataFrame:
    """Approximate cosine top-k via an IVF index (the other scale path).

    Train: k-means-lite centroids on a driver-side sample (few iterations,
    spherical).  Assign: one map_batches pass tags each vector with its
    nearest-centroid list.  Query: only vectors in each query's ``nprobe``
    closest lists are exact-rescored.  Recall vs brute is measured in tests.
    """
    rng = np.random.default_rng(seed)
    sample = vecs.limit(train_sample).take_all()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in sample])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    nlist = min(nlist, len(X))
    C = X[rng.choice(len(X), nlist, replace=False)]
    for _ in range(8):                       # spherical k-means iterations
        assign = (X @ C.T).argmax(axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                v = X[m].sum(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-300)
    c_ref = ray.put(C)
    Qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)
    probe_lists = set()
    qsims = Qn @ C.T
    for qi in range(len(Qn)):
        probe_lists.update(np.argsort(-qsims[qi])[:nprobe].tolist())
    probes_ref = ray.put(np.array(sorted(probe_lists)))

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        probes = ray.get(probes_ref)
        emb = _emb_matrix(df)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                               1e-300)
        lists = (emb @ Cm.T).argmax(axis=1)
        return df[np.isin(lists, probes)]

    cands = vecs.map_batches(prefilter, batch_format="pandas")
    return topk_cosine_brute(cands, queries, k)


def topk_cosine_lsh(vecs: Dataset, queries: np.ndarray, k: int = 10,
                    planes: int = 16, seed: int = 11) -> pd.DataFrame:
    """Approximate cosine top-k: hyperplane LSH prefilter (candidates =
    rows sharing >= 1 of 4 signature bands with the query), exact rescore.

    The scale path: the filter drops most rows before the matmul; recall
    vs brute force is measured in tests (not guaranteed 1.0)."""
    rng = np.random.default_rng(seed)
    first = vecs.take(1)[0]
    dim = len(first["embedding"])
    H = rng.standard_normal((dim, planes))
    bands = 4
    r = planes // bands
    # band signatures as integers (r <= 64 bits) -> vectorized membership
    w = (np.uint64(1) << np.arange(r, dtype=np.uint64))

    def band_codes(bits):
        return (bits.reshape(len(bits), bands, r).astype(np.uint64)
                * w[None, None, :]).sum(axis=2)

    qcodes = band_codes((queries @ H) > 0)          # (Q, bands)
    qsets = [np.unique(qcodes[:, b]) for b in range(bands)]
    sets_ref = ray.put(qsets)
    h_ref = ray.put(H)

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        Hm = ray.get(h_ref)
        qs = ray.get(sets_ref)
        emb = _emb_matrix(df)
        codes = band_codes((emb @ Hm) > 0)
        keep = np.zeros(len(df), dtype=bool)
        for b in range(bands):                      # 4 vectorized passes
            keep |= np.isin(codes[:, b], qs[b])
        return df[keep]

    cands = vecs.map_batches(prefilter, batch_format="pandas")
    return topk_cosine_brute(cands, queries, k)


def train_centroids(vecs: Dataset, nlist: int = 16,
                    train_sample: int = 512, seed: int = 13) -> np.ndarray:
    """Spherical k-means-lite centroids on a driver-side sample (the train
    phase of IVF; tiny by construction — the sample, not the corpus)."""
    rng = np.random.default_rng(seed)
    sample = vecs.limit(train_sample).take_all()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in sample])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    nlist = min(nlist, len(X))
    C = X[rng.choice(len(X), nlist, replace=False)]
    for _ in range(8):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                v = X[m].sum(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-300)
    return C


def write_ivf_store(vecs: Dataset, out_dir: str, nlist: int = 16,
                    train_sample: int = 512, seed: int = 13,
                    centroids: np.ndarray | None = None) -> str:
    """IVF-partitioned embedding store: one parquet partition directory per
    inverted list (nearest centroid), centroids in a sidecar.

    The ANN scale path for 10^12 embeddings: queries read ONLY their
    nprobe probed list directories — storage-level pruning, the embedding
    analog of sources.store's cell-partitioned spatial layout.

    ``centroids`` overrides the sample trainer with externally trained
    rows (any scale — they are re-normalized here); pass
    ``clustering.kmeans_fit(...) / QS`` to build the lists from
    FULL-CORPUS Lloyd centroids instead of a driver-side sample."""
    import json
    import os
    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                           1e-300)
    else:
        C = train_centroids(vecs, nlist, train_sample, seed)
    c_ref = ray.put(C)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        emb = _emb_matrix(df)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                               1e-300)
        df = df.copy()
        df["ivf_list"] = (emb @ Cm.T).argmax(axis=1).astype(np.int64)
        return df

    vecs.map_batches(tag, batch_format="pandas") \
        .write_parquet(out_dir, partition_cols=["ivf_list"])
    with open(os.path.join(out_dir, "_centroids.json"), "w") as f:
        json.dump(C.tolist(), f)
    return out_dir


def ivf_probe_dirs(out_dir: str, queries: np.ndarray,
                   nprobe: int) -> list[str]:
    """Partition directories for the union of every query's nprobe closest
    lists (only these are read)."""
    import json
    import os
    with open(os.path.join(out_dir, "_centroids.json")) as f:
        C = np.asarray(json.load(f))
    Qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)
    sims = Qn @ C.T
    probes = set()
    for qi in range(len(Qn)):
        probes.update(np.argsort(-sims[qi])[:nprobe].tolist())
    dirs = [os.path.join(out_dir, f"ivf_list={j}") for j in sorted(probes)]
    return [d for d in dirs if os.path.isdir(d)]


def topk_cosine_ivf_store(out_dir: str, queries: np.ndarray, k: int = 10,
                          nprobe: int = 4) -> pd.DataFrame:
    """ANN top-k over the IVF store: read only probed list partitions,
    exact cosine rescore inside them.  nprobe == nlist -> exact brute
    result (every partition read)."""
    import os
    import ray.data as rd
    files = [os.path.join(d, f)
             for d in ivf_probe_dirs(out_dir, queries, nprobe)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    ds = rd.read_parquet(files)
    return topk_cosine_brute(ds, queries, k)


# ---------------------------------------------------------------------------
# quantized-normalized cosine (qnorm): the bit-exact family
# ---------------------------------------------------------------------------
# Float cosine has no stable SQL twin (summation order / tie behavior are
# engine-dependent).  The qnorm trick makes ranking integer-exact while
# staying elementwise-IEEE (hence bit-identical in numpy and DuckDB):
#
#   u_i = FLOOR(v_i * 1e6 + 0.5)                 (int64; |v|<=1 => |u|<=1e6)
#   D   = SUM(u_i^2)                             (int64 — order-independent)
#   w_i = FLOOR(u_i / SQRT(D) * 1e6 + 0.5)       (int64; ||w|| ~= 1e6)
#   score(a, b) = SUM(w_ai * w_bi)               (int64 ~= 1e12 * cosine)
#
# Every step is either exact integer math or a single-scalar IEEE op with
# the same literal order of operations on both sides — verified bit-equal
# against DuckDB 1.0.  dim * (0.5e6)^2 * 64 ~ 6e12 << 2^63: no overflow.

_QS = 1_000_000          # quantization scale (score scale = _QS^2 = 1e12)


def qnorm_matrix(emb_f64: np.ndarray) -> np.ndarray:
    """(n, d) float64 -> (n, d) int64 quantized-normalized vectors."""
    u = np.floor(emb_f64 * _QS + 0.5).astype(np.int64)
    D = (u * u).sum(axis=1)
    nrm = np.sqrt(D.astype(np.float64))
    w = np.floor(u / np.maximum(nrm, 1.0)[:, None] * _QS + 0.5) \
        .astype(np.int64)
    w[D == 0] = 0
    return w


def qnorm_sql_ctes(long_src: str) -> str:
    """CTE text (U, DD, W) computing qnorm from a long-form source
    (vec_id, i, v DOUBLE).  Paste after WITH; W = (vec_id, i, w)."""
    return f"""
        U AS (SELECT vec_id, i,
                     CAST(FLOOR(v * {_QS} + 0.5) AS BIGINT) AS u
              FROM ({long_src})),
        DD AS (SELECT vec_id, SUM(u * u) AS d FROM U GROUP BY 1),
        W AS (SELECT U.vec_id, i,
                     CASE WHEN d = 0 THEN 0
                          ELSE CAST(FLOOR(u / SQRT(CAST(d AS DOUBLE))
                                          * {_QS} + 0.5) AS BIGINT)
                     END AS w
              FROM U JOIN DD USING (vec_id))"""


_EMB_LONG_SQL = ("SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
                 "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings")


def topk_cosine_qnorm(vecs: Dataset, query_ids: list[int],
                      k: int = 10) -> pd.DataFrame:
    """Exact top-k by quantized-normalized cosine — bit-exact SQL twin
    (``topk_cosine_qnorm_sql``).  Ties broken by vec_id ascending.
    -> (query_id, vec_id); query_id is the query row's vec_id."""
    wanted = pa.array(sorted(set(query_ids)), type=pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["vec_id"], value_set=wanted))

    qrows = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
             for r in vecs.map_batches(pick,
                                       batch_format="pyarrow").take_all()}
    Q = qnorm_matrix(np.stack([qrows[q] for q in query_ids]))
    qids = list(query_ids)
    q_ref = ray.put(Q)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        w = qnorm_matrix(_emb_matrix(df))
        scores = w @ Qm.T                         # (n, Q) int64
        vid = df["vec_id"].to_numpy().astype(np.int64)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(df))
        for qi in range(scores.shape[1]):
            order = np.lexsort((vid, -scores[:, qi]))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(vid[order])
            out_s.extend(scores[order, qi])
        return pd.DataFrame({"query_id": np.array(out_q, dtype=np.int64),
                             "vec_id": np.array(out_v, dtype=np.int64),
                             "score": np.array(out_s, dtype=np.int64)})

    return _merge_topk_shuffled(
        vecs.map_batches(local_topk, batch_format="pandas"), qids, k)


def topk_cosine_qnorm_sql(query_ids: list[int], k: int = 10,
                          long_src: str = _EMB_LONG_SQL) -> str:
    ids = ", ".join(str(q) for q in query_ids)
    return f"""
        WITH {qnorm_sql_ctes(long_src)},
        QS AS (SELECT vec_id AS query_id, i, w FROM W
               WHERE vec_id IN ({ids})),
        SC AS (SELECT QS.query_id, W.vec_id, SUM(QS.w * W.w) AS score
               FROM QS JOIN W USING (i) GROUP BY 1, 2)
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rn
            FROM SC) WHERE rn <= {k}
    """


# --- IVF store, exact via sound per-list bounds ------------------------------
# Per-list metadata: alpha_j = max angle(member, centroid_j).  For query q
# and any member x of list j:  angle(q, x) >= theta(q, c_j) - alpha_j, so
#   score_int(q, x) <= 1e12 * cos(max(0, theta_qj - alpha_j - A)) + S
# with A = 2e-5 rad (quantization can rotate each vector by <= ~4e-6 rad,
# plus arccos rounding) and S = 2e7 (|score - 1e12*cos| <= 0.5*(||w_a||_1 +
# ||w_b||_1) + d/4 <= 8e6 + 16 at d = 64).  A list is skipped only when its
# bound is strictly below the query's current kth score — the result is
# provably identical to the full scan, so the brute qnorm SQL twin applies.
# On clustered corpora (alpha small) most lists prune; on a random fixture
# alpha ~ pi/2 and every list is read (correct, just unpruned).

_QN_ANGLE_SLACK = 2e-5
_QN_INT_SLACK = 20_000_000


def write_ivf_store_v2(vecs: Dataset, out_dir: str, nlist: int = 16,
                       train_sample: int = 512, seed: int = 13) -> str:
    """IVF-partitioned store + sidecar with centroids AND per-list max
    member angle (enables sound pruning in the exact query path)."""
    import json
    import os
    from ray.data.aggregate import Max
    C = train_centroids(vecs, nlist, train_sample, seed)
    c_ref = ray.put(C)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(c_ref)
        emb = _emb_matrix(df)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                               1e-300)
        df = df.copy()
        sims = emb @ Cm.T
        lists = sims.argmax(axis=1)
        df["ivf_list"] = lists.astype(np.int64)
        df["angle"] = np.arccos(np.clip(sims[np.arange(len(df)), lists],
                                        -1.0, 1.0))
        return df

    tagged = vecs.map_batches(tag, batch_format="pandas")
    tagged.drop_columns(["angle"]) \
        .write_parquet(out_dir, partition_cols=["ivf_list"])
    amax = tagged.select_columns(["ivf_list", "angle"]).groupby("ivf_list") \
        .aggregate(Max("angle", alias_name="alpha")).take_all()
    alphas = [float(np.pi)] * len(C)
    for r in amax:
        alphas[int(r["ivf_list"])] = float(r["alpha"])
    with open(os.path.join(out_dir, "_centroids.json"), "w") as f:
        json.dump({"centroids": C.tolist(), "alphas": alphas}, f)
    return out_dir


def _ivf_score_dirs(dirs: list[str], Q: np.ndarray, qids: list[int],
                    k: int) -> list[tuple]:
    """Exact qnorm scores of the vectors in `dirs` vs queries Q (int64
    qnorm matrix): per-batch local top-k, then a shuffle-side
    groupby(query) merge so the driver receives only the final Q*k rows
    (not blocks x Q x k partials — an IVF list can span many files at
    corpus scale).  Returns (qid, -score, vec_id)."""
    import os
    import ray.data as rd
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return []
    q_ref = ray.put(Q)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        w = qnorm_matrix(_emb_matrix(df))
        scores = w @ Qm.T
        vid = df["vec_id"].to_numpy().astype(np.int64)
        kk = min(k, len(df))
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            order = np.lexsort((vid, -scores[:, qi]))[:kk]
            out_q.extend([qi] * len(order))
            out_v.extend(vid[order])
            out_s.extend(scores[order, qi])
        return pd.DataFrame({"query_id": np.array(out_q, dtype=np.int64),
                             "vec_id": np.array(out_v, dtype=np.int64),
                             "score": np.array(out_s, dtype=np.int64)})

    ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    merged = _merge_topk_shuffled(
        ds.map_batches(local_topk, batch_format="pandas"),
        list(range(len(qids))), k, keep_score=True)
    return [(qids[int(qi)], -int(sc), int(vid))
            for qi, vid, sc in zip(merged["query_id"], merged["vec_id"],
                                   merged["score"])]


def topk_cosine_ivf_store_qnorm(out_dir: str, query_vecs: np.ndarray,
                                query_ids: list[int], k: int = 10,
                                nprobe: int = 4) -> pd.DataFrame:
    """EXACT qnorm-cosine top-k over the IVF store with sound pruning.

    Phase 1 reads the nprobe closest lists per query; phase 2 reads only
    lists whose sound score bound reaches the current kth score.  Result is
    bit-identical to ``topk_cosine_qnorm`` over the whole table (SQL twin:
    ``topk_cosine_qnorm_sql``).  Returns (query_id, vec_id); the number of
    pruned lists is exposed on the DataFrame as ``.attrs['pruned_lists']``.
    """
    import json
    import os
    with open(os.path.join(out_dir, "_centroids.json")) as f:
        side = json.load(f)
    C = np.asarray(side["centroids"])
    alphas = np.asarray(side["alphas"])
    nlist = len(C)
    Q64 = np.asarray(query_vecs, dtype=np.float64)
    Wq = qnorm_matrix(Q64)
    Qn = Q64 / np.maximum(np.linalg.norm(Q64, axis=1, keepdims=True), 1e-300)
    theta = np.arccos(np.clip(Qn @ C.T, -1.0, 1.0))     # (Q, nlist)
    probe = set()
    for qi in range(len(Qn)):
        probe.update(np.argsort(theta[qi])[:nprobe].tolist())

    def dirs_of(lists):
        ds = [os.path.join(out_dir, f"ivf_list={j}") for j in sorted(lists)]
        return [d for d in ds if os.path.isdir(d)]

    heap = {qid: [] for qid in query_ids}
    for qid, negsc, vid in _ivf_score_dirs(dirs_of(probe), Wq, query_ids, k):
        heap[qid].append((negsc, vid))
    kth = {}
    for qid in query_ids:
        heap[qid].sort()
        kth[qid] = (-heap[qid][k - 1][0] if len(heap[qid]) >= k
                    else -(1 << 62))
    rest = [j for j in range(nlist) if j not in probe]
    need = set()
    for jj, j in enumerate(rest):
        for qi, qid in enumerate(query_ids):
            ang = max(0.0, theta[qi, j] - alphas[j] - _QN_ANGLE_SLACK)
            bound = int(np.floor(_QS * _QS * np.cos(ang))) + _QN_INT_SLACK
            if bound >= kth[qid]:
                need.add(j)
                break
    for qid, negsc, vid in _ivf_score_dirs(dirs_of(need), Wq, query_ids, k):
        heap[qid].append((negsc, vid))
    rows = []
    for qid in query_ids:
        for negsc, vid in sorted(heap[qid])[:k]:
            rows.append((qid, vid))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id"]).astype(np.int64)
    out.attrs["pruned_lists"] = nlist - len(probe) - len(need)
    return out
