"""Deduplication operators for training-data pipelines.

Scale pattern: per-batch vectorized signatures -> explode to (band, key)
rows carrying the verification payload (shingle set / simhash / normalized
embedding) as a column -> ONE groupby shuffle on the band key -> pairs are
formed AND exactly verified inside ``map_groups``.  Nothing corpus-sized
ever lands on the driver: the driver sees only the verified pair list.

Exactly-once emission without a second shuffle: every row also carries the
FULL signature, so band b's bucket can check whether a pair already
collides in some band b' < b (vectorized slice compare) and skip it —
each pair is emitted by its lowest colliding band only.

Memory bound per bucket: a bucket's population is the set of docs sharing
one band signature, i.e. a near-duplicate cluster (plus hash-collision
noise, ~ n/2^64 expected).  Verification builds an (n x U) membership
matrix (U = union of the cluster's shingle sets); for a cluster of n docs
of ~S shingles each that is n * n*S int32 — safe for real clusters (n in
the tens).  A corpus dominated by byte-identical docs should run
``exact_dedup_groups`` first so clusters enter the LSH stage collapsed.

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


def _word_ngrams(text: str, k: int) -> set:
    """Distinct word k-grams, split on single spaces (DuckDB string_split
    parity: consecutive spaces yield empty tokens)."""
    w = text.split(" ")
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def ngram_jaccard_pairs(docs: Dataset, threshold_num: int = 3,
                        threshold_den: int = 5, k: int = 3) -> Dataset:
    """EXACT all-pairs word-k-gram Jaccard dedup via inverted index.

    The brute-force oracle of the LSH family, distributed: explode each doc
    into its DISTINCT word k-grams -> groupby(gram) emits the doc pairs
    sharing that gram with contribution 1 -> Count aggregate per pair gives
    the intersection size -> Jaccard tested in integer arithmetic
    ``den*inter >= num*(|A|+|B|-inter)`` (bit-exact SQL twin, no float
    boundary).  Per-doc distinct-gram counts ride via a broadcast dict
    (ray.put once, read per batch); docs' gram sets never leave their
    groups.  Docs with fewer than k words have no grams.

    Scale note: a gram shared by g docs emits g(g-1)/2 pair rows — this is
    the exact-oracle path for verification and modest corpora; the LSH
    operators above are the 100 TB path (word k-grams, not char k-grams,
    precisely because boilerplate-heavy corpora make char grams near-flat).
    """
    import ray

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        dids, grams = [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            gs = _word_ngrams(text, k)
            dids.extend([int(did)] * len(gs))
            grams.extend(gs)
        out = pd.DataFrame({"doc_id": np.array(dids, dtype=np.int64),
                            "gram": grams})
        # coarse shuffle key: one map_groups call per hash partition (256)
        # instead of one per distinct gram (millions at scale)
        out["gpart"] = pd.util.hash_array(
            out["gram"].to_numpy(dtype=object)).astype(np.int64) % 256
        return out

    def size_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = [len(_word_ngrams(t, k)) for t in df["text"].fillna("")]
        return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                             "n": np.array(n, dtype=np.int64)})

    txt = docs.select_columns(["doc_id", "text"])
    sizes_df = txt.map_batches(size_rows, batch_format="pandas").to_pandas()
    sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n"])))

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        """All (a<b) doc pairs per gram, vectorized across this hash
        partition's grams (segments grouped by size -> one triu gather per
        distinct segment size)."""
        g = g.sort_values(["gram", "doc_id"])
        ids = g["doc_id"].to_numpy().astype(np.int64)
        grams = g["gram"].to_numpy()
        if len(ids) < 2:
            return _EMPTY_PAIRS.copy()
        new = np.concatenate([[True], grams[1:] != grams[:-1]])
        seg = np.cumsum(new) - 1
        cnt = np.bincount(seg)
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        out_a, out_b = [], []
        for n in np.unique(cnt):
            if n < 2:
                continue
            base = starts[cnt == n]
            iu, ju = np.triu_indices(int(n), 1)
            out_a.append(ids[base[:, None] + iu[None, :]].ravel())
            out_b.append(ids[base[:, None] + ju[None, :]].ravel())
        if not out_a:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame({"doc_id_a": np.concatenate(out_a),
                             "doc_id_b": np.concatenate(out_b)})

    def verify_batch(df: pd.DataFrame) -> pd.DataFrame:
        sizes = ray.get(sizes_ref)
        a = df["doc_id_a"].to_numpy().astype(np.int64)
        b = df["doc_id_b"].to_numpy().astype(np.int64)
        inter = df["inter"].to_numpy().astype(np.int64)
        na = np.array([sizes[x] for x in a], dtype=np.int64)
        nb = np.array([sizes[x] for x in b], dtype=np.int64)
        keep = threshold_den * inter >= threshold_num * (na + nb - inter)
        return pd.DataFrame({"doc_id_a": a[keep], "doc_id_b": b[keep]})

    from ray.data.aggregate import Count
    return txt.map_batches(gram_rows, batch_format="pandas") \
        .groupby("gpart").map_groups(pairs_in_part, batch_format="pandas") \
        .groupby(["doc_id_a", "doc_id_b"]) \
        .aggregate(Count(alias_name="inter")) \
        .map_batches(verify_batch, batch_format="pandas")


def ngram_jaccard_sql(threshold_num: int = 3, threshold_den: int = 5,
                      k: int = 3) -> str:
    """DuckDB twin of ngram_jaccard_pairs (same integer threshold test).

    k is the word-gram width; the gram expression must concatenate exactly
    k tokens (built below) because generate_series can't take lateral
    column args in this DuckDB."""
    gram = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return f"""
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        idx AS (
          SELECT doc_id, w, unnest(generate_series(1, len(w) - {k - 1}))
                 AS i
          FROM words WHERE len(w) >= {k}
        ),
        sh AS (SELECT DISTINCT doc_id, {gram} AS gram FROM idx),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
          FROM sh a JOIN sh b USING (gram)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT ia AS doc_id_a, ib AS doc_id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = ia
        JOIN sizes sb ON sb.doc_id = ib
        WHERE {threshold_den} * c >= {threshold_num} * (sa.n + sb.n - c)
    """


_EMPTY_PAIRS = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                             "doc_id_b": pd.Series([], dtype=np.int64)})


def _sorted_pairs_df(pairs: Dataset) -> pd.DataFrame:
    """Materialize the (tiny) verified pair list on the driver, sorted."""
    df = pairs.to_pandas()
    if len(df) == 0:
        return _EMPTY_PAIRS.copy()
    return df.astype(np.int64).sort_values(["doc_id_a", "doc_id_b"]) \
        .reset_index(drop=True)


def minhash_near_dups(docs: Dataset, threshold: float = 0.6,
                      num_perm: int = 64, bands: int = 32,
                      shingle_k: int = 5, seed: int = 1) -> pd.DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified in-shuffle.

    bands x rows = num_perm; recall for J >= t is 1-(1-J^r)^b (with r=2,
    b=32: ~1.0 for J >= 0.8, 0.97 for J = 0.6).  Verification is exact, so
    precision is 1.0.  Each bucket row carries the doc's shingle set and
    full signature; verification happens inside the band-bucket map_groups
    (membership-matrix Jaccard) and each pair is emitted from its lowest
    colliding band only — the driver never sees documents or shingles."""
    r = num_perm // bands

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        bks, dids, sigs, shs = [], [], [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            sh = char_shingles(text, shingle_k)
            sig = minhash_signature(sh, num_perm, seed)
            for b in range(bands):
                band = sig[b * r:(b + 1) * r]
                key = hashlib.blake2b(band.tobytes(),
                                      digest_size=8).hexdigest()
                bks.append(f"{b:02d}:{key}")
                dids.append(int(did))
                sigs.append(sig)
                shs.append(sh)
        return pd.DataFrame({"bucket": bks, "doc_id": dids,
                             "sig": sigs, "shingles": shs})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return _EMPTY_PAIRS.copy()
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order].astype(np.int64)
        b = int(g["bucket"].iloc[0].split(":", 1)[0])
        iu, ju = np.triu_indices(n, 1)
        if b > 0:
            S = np.stack([np.asarray(s, dtype=np.uint64)
                          for s in g["sig"].to_numpy()[order]])
            Sb = S.reshape(n, bands, r)[:, :b, :]
            dup = (Sb[iu] == Sb[ju]).all(axis=2).any(axis=1)
            iu, ju = iu[~dup], ju[~dup]
            if len(iu) == 0:
                return _EMPTY_PAIRS.copy()
        sh = [np.asarray(s, dtype=np.uint64)
              for s in g["shingles"].to_numpy()[order]]
        uni = np.unique(np.concatenate(sh))
        B = np.zeros((n, len(uni)), dtype=np.int32)
        for k, s in enumerate(sh):
            B[k, np.searchsorted(uni, s)] = 1
        inter = B @ B.T
        sizes = B.sum(axis=1)
        union = sizes[iu] + sizes[ju] - inter[iu, ju]
        # same float expression as jaccard() so thresholds round identically
        jac = np.where(union > 0, inter[iu, ju] / np.maximum(union, 1), 1.0)
        ok = jac >= threshold
        return pd.DataFrame({"doc_id_a": ids[iu[ok]],
                             "doc_id_b": ids[ju[ok]]})

    pairs = docs.select_columns(["doc_id", "text"]) \
        .map_batches(sig_rows, batch_format="pandas") \
        .groupby("bucket").map_groups(verify_group, batch_format="pandas")
    return _sorted_pairs_df(pairs)


def simhash_near_dups(docs: Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dups: EXACT for max_hamming <= 3 (4-band pigeonhole).

    Hamming verification runs inside the band-bucket map_groups on the
    uint64 signatures carried on the bucket rows; a pair is emitted only by
    its lowest colliding 16-bit band."""

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        bks, dids, sigs = [], [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            h = simhash64(text)
            for b in range(4):
                part = int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                bks.append(f"{b}:{part}")
                dids.append(int(did))
                sigs.append(int(h))
        return pd.DataFrame({"bucket": bks, "doc_id": dids,
                             "sig": np.array(sigs, dtype=np.uint64)})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return _EMPTY_PAIRS.copy()
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order].astype(np.int64)
        sig = np.asarray(g["sig"].to_numpy()[order]).astype(np.uint64)
        b = int(g["bucket"].iloc[0].split(":", 1)[0])
        iu, ju = np.triu_indices(n, 1)
        if b > 0:
            sh = (sig[:, None] >> (np.uint64(16)
                                   * np.arange(b, dtype=np.uint64)[None, :])
                  ) & np.uint64(0xFFFF)
            dup = (sh[iu] == sh[ju]).any(axis=1)
            iu, ju = iu[~dup], ju[~dup]
            if len(iu) == 0:
                return _EMPTY_PAIRS.copy()
        ok = hamming64(sig[iu], sig[ju]) <= max_hamming
        return pd.DataFrame({"doc_id_a": ids[iu[ok]],
                             "doc_id_b": ids[ju[ok]]})

    pairs = docs.select_columns(["doc_id", "text"]) \
        .map_batches(sig_rows, batch_format="pandas") \
        .groupby("bucket").map_groups(verify_group, batch_format="pandas")
    return _sorted_pairs_df(pairs)


def embedding_near_dups(vecs: Dataset, threshold: float = 0.95,
                        planes: int = 64, bands: int = 16,
                        seed: int = 7) -> pd.DataFrame:
    """Embedding near-dups: random-hyperplane signature bands -> exact
    cosine verification (the SimHash-for-vectors scale path).

    Bucket rows carry the normalized float64 embedding and the raw plane
    bits; cosine verification is one (n x d)(d x n) matmul inside each
    band-bucket map_groups, lowest-band exactly-once emission as above."""
    rng = np.random.default_rng(seed)
    first = vecs.take(1)[0]
    dim = len(first["embedding"])
    H = rng.standard_normal((dim, planes))
    r = planes // bands

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norm = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-300)
        bits = (emb @ H) > 0
        bks, vids, nvs, bvs = [], [], [], []
        for k, vid in enumerate(df["vec_id"]):
            for b in range(bands):
                key = np.packbits(bits[k, b * r:(b + 1) * r]).tobytes()
                bks.append(f"{b:02d}:{key.hex()}")
                vids.append(int(vid))
                nvs.append(norm[k])
                bvs.append(bits[k].astype(np.uint8))
        return pd.DataFrame({"bucket": bks, "vec_id": vids,
                             "nvec": nvs, "bits": bvs})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return _EMPTY_PAIRS.copy()
        order = np.argsort(g["vec_id"].to_numpy())
        ids = g["vec_id"].to_numpy()[order].astype(np.int64)
        b = int(g["bucket"].iloc[0].split(":", 1)[0])
        iu, ju = np.triu_indices(n, 1)
        if b > 0:
            bits = np.stack([np.asarray(x, dtype=np.uint8)
                             for x in g["bits"].to_numpy()[order]])
            Bb = bits.reshape(n, bands, r)[:, :b, :]
            dup = (Bb[iu] == Bb[ju]).all(axis=2).any(axis=1)
            iu, ju = iu[~dup], ju[~dup]
            if len(iu) == 0:
                return _EMPTY_PAIRS.copy()
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["nvec"].to_numpy()[order]])
        cos = E @ E.T
        ok = cos[iu, ju] >= threshold
        return pd.DataFrame({"doc_id_a": ids[iu[ok]],
                             "doc_id_b": ids[ju[ok]]})

    pairs = vecs.select_columns(["vec_id", "embedding"]) \
        .map_batches(sig_rows, batch_format="pandas") \
        .groupby("bucket").map_groups(verify_group, batch_format="pandas")
    return _sorted_pairs_df(pairs).rename(
        columns={"doc_id_a": "vec_id_a", "doc_id_b": "vec_id_b"})
