"""Deduplication operators for training-data pipelines.

Scale pattern (ray_guide 'Aggregation at scale'): per-batch vectorized
signatures -> explode to (band, key) rows -> ONE groupby shuffle on the
band key -> per-group candidate pairs -> exact verification.  Only
signatures ride the shuffle, never documents.

* exact:     content-hash groupby, keep min id per group (SQL twin).
* MinHash+LSH: char-shingle -> k permutations -> b bands x r rows; a pair
  collides with prob 1-(1-J^r)^b.  Candidates verified with EXACT Jaccard.
* SimHash:   64-bit token-hash majority; 4x16-bit bands guarantee (by
  pigeonhole) that hamming distance <= 3 collides in >= 1 band ->
  candidate set is EXACT for threshold 3.
* n-gram Jaccard: the exact verifier, usable standalone.
* embedding near-dup: random-hyperplane signature bands -> exact cosine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * _P1 & _MASK
        x = (x ^ (x >> np.uint64(29))) * _P2 & _MASK
    return x ^ (x >> np.uint64(32))


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-grams (uint64 set)."""
    b = text.encode("utf-8")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    n = len(a) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for i in range(k):
            h = (h * np.uint64(1099511628211) + a[i:i + n]) & _MASK
    return np.unique(_mix(h))


def jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    """Exact Jaccard of two shingle sets (sorted-unique uint64 arrays)."""
    inter = len(np.intersect1d(sh_a, sh_b, assume_unique=True))
    union = len(sh_a) + len(sh_b) - inter
    return inter / union if union else 1.0


def minhash_signature(shingles: np.ndarray, num_perm: int = 64,
                      seed: int = 1) -> np.ndarray:
    """k permutations via h_i(x) = mix(x ^ salt_i); min per permutation."""
    with np.errstate(over="ignore"):
        salts = _mix(np.arange(1, num_perm + 1, dtype=np.uint64)
                     * np.uint64(seed * 2 + 1) * _P1)
        m = _mix(shingles[None, :] ^ salts[:, None])
    return m.min(axis=1)


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over whitespace tokens."""
    toks = text.lower().split()
    if not toks:
        return np.uint64(0)
    hs = np.array([int.from_bytes(
        hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    vote = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if vote[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# Ray pipelines
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: Dataset) -> Dataset:
    """-> (h, keep_id, dup_count): md5 content groups, min doc_id kept.

    SQL twin: SELECT md5(text) h, MIN(doc_id) keep_id, COUNT(*) dup_count
    FROM documents GROUP BY 1."""
    import hashlib as _h
    from ray.data.aggregate import Count, Min

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": df["text"].fillna("").map(
                lambda s: _h.md5(s.encode()).hexdigest()),
            "doc_id": df["doc_id"].astype(np.int64)})

    return docs.map_batches(add_hash, batch_format="pandas") \
        .groupby("h").aggregate(Min("doc_id", alias_name="keep_id"),
                                Count(alias_name="dup_count"))


EXACT_DEDUP_SQL = ("SELECT md5(text) AS h, MIN(doc_id) AS keep_id, "
                   "COUNT(*) AS dup_count FROM documents GROUP BY 1")


def _pairs_from_groups(grouped: Dataset, verify_fn) -> pd.DataFrame:
    """Collect candidate buckets, form pairs, verify, dedupe (driver-side
    final step; candidate volume is tiny relative to the corpus)."""
    seen = set()
    out_a, out_b = [], []
    for row in grouped.take_all():
        ids = sorted(row["ids"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                key = (ids[i], ids[j])
                if key in seen:
                    continue
                seen.add(key)
                if verify_fn(*key):
                    out_a.append(key[0])
                    out_b.append(key[1])
    df = pd.DataFrame({"doc_id_a": np.array(out_a, dtype=np.int64),
                       "doc_id_b": np.array(out_b, dtype=np.int64)})
    return df.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)


def minhash_near_dups(docs: Dataset, threshold: float = 0.6,
                      num_perm: int = 64, bands: int = 32,
                      shingle_k: int = 5, seed: int = 1) -> pd.DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    bands x rows = num_perm; recall for J >= t is 1-(1-J^r)^b (with r=2,
    b=32: ~1.0 for J >= 0.8, 0.97 for J = 0.6).  Verification is exact, so
    precision is 1.0."""
    r = num_perm // bands

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            sig = minhash_signature(char_shingles(text, shingle_k),
                                    num_perm, seed)
            for b in range(bands):
                band = sig[b * r:(b + 1) * r]
                key = hashlib.blake2b(band.tobytes(),
                                      digest_size=8).hexdigest()
                rows.append((f"{b}:{key}", int(did)))
        return pd.DataFrame(rows, columns=["bucket", "doc_id"])

    buckets = docs.map_batches(sig_rows, batch_format="pandas")

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"ids": pd.Series([], dtype=object)})
        return pd.DataFrame({"ids": [g["doc_id"].tolist()]})

    grouped = buckets.groupby("bucket").map_groups(collect,
                                                   batch_format="pandas")
    texts = {int(r["doc_id"]): r["text"]
             for r in docs.select_columns(["doc_id", "text"]).take_all()}
    sh = {d: char_shingles(t or "", shingle_k) for d, t in texts.items()}

    def verify(a, b):
        return jaccard(sh[a], sh[b]) >= threshold

    return _pairs_from_groups(grouped, verify)


def simhash_near_dups(docs: Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dups: EXACT for max_hamming <= 3 (4-band pigeonhole)."""

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            h = simhash64(text)
            for b in range(4):
                part = int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                rows.append((f"{b}:{part}", int(did), int(h)))
        return pd.DataFrame(rows, columns=["bucket", "doc_id", "sig"])

    buckets = docs.map_batches(sig_rows, batch_format="pandas")

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"ids": pd.Series([], dtype=object)})
        return pd.DataFrame({"ids": [g["doc_id"].tolist()]})

    grouped = buckets.groupby("bucket").map_groups(collect,
                                                   batch_format="pandas")
    sigs = {}
    for r in buckets.take_all():
        sigs[int(r["doc_id"])] = np.uint64(r["sig"] & 0xFFFFFFFFFFFFFFFF)

    def verify(a, b):
        return int(hamming64(np.array([sigs[a]]),
                             np.array([sigs[b]]))[0]) <= max_hamming

    return _pairs_from_groups(grouped, verify)


def embedding_near_dups(vecs: Dataset, threshold: float = 0.95,
                        planes: int = 64, bands: int = 16,
                        seed: int = 7) -> pd.DataFrame:
    """Embedding near-dups: random-hyperplane signature bands -> exact
    cosine verification (the SimHash-for-vectors scale path)."""
    rng = np.random.default_rng(seed)
    first = vecs.take(1)[0]
    dim = len(first["embedding"])
    H = rng.standard_normal((dim, planes))
    r = planes // bands

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bits = (emb @ H) > 0
        rows = []
        for k, vid in enumerate(df["vec_id"]):
            for b in range(bands):
                key = np.packbits(bits[k, b * r:(b + 1) * r]).tobytes()
                rows.append((f"{b}:{key.hex()}", int(vid)))
        return pd.DataFrame(rows, columns=["bucket", "vec_id"])

    buckets = vecs.map_batches(sig_rows, batch_format="pandas")

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"ids": pd.Series([], dtype=object)})
        return pd.DataFrame({"ids": [g["vec_id"].tolist()]})

    grouped = buckets.groupby("bucket").map_groups(collect,
                                                   batch_format="pandas")
    emb = {}
    for row in vecs.take_all():
        v = np.asarray(row["embedding"], dtype=np.float64)
        emb[int(row["vec_id"])] = v / max(np.linalg.norm(v), 1e-300)

    def verify(a, b):
        return float(emb[a] @ emb[b]) >= threshold

    df = _pairs_from_groups(grouped, verify)
    return df.rename(columns={"doc_id_a": "vec_id_a",
                              "doc_id_b": "vec_id_b"})
