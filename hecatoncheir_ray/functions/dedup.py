"""Deduplication operators for training-data pipelines.

Scale pattern (MinHash, round 4): per-batch vectorized signatures ->
explode to 3-int (band, h, doc_id) rows -> ONE hash-partitioned groupby
whose kernel segments all of its buckets vectorized (never one Python
call per bucket: bucket count is corpus x bands) -> candidate pairs
dedup in a pair-scale groupby -> shingle sets hash-join back for exact
Jaccard verification.  Nothing corpus-sized ever lands on the driver:
the driver sees only the verified pair list, and nothing heavier than
3 ints per band row ever rides the xbands-amplified shuffle.

Memory bound per bucket: a bucket's population is the set of docs
sharing one band signature, i.e. a near-duplicate cluster (plus
hash-collision noise, ~ n/2^64 expected).  A corpus dominated by
byte-identical docs should run ``exact_dedup_groups`` first so clusters
enter the LSH stage collapsed.

* exact:     content-hash groupby, keep min id per group (SQL twin).
* MinHash+LSH: char-shingle -> k permutations -> b bands x r rows; a pair
  collides with prob 1-(1-J^r)^b.  Candidates verified with EXACT Jaccard.
  Bit-exact SQL twin (``minhash_near_dups_sql``) rebuilds the whole
  pipeline in DuckDB, LSH banding included.
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


def _md5_low64(token: str) -> int:
    """int.from_bytes(md5[8:16], little) == DuckDB md5_number_lower."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[8:16],
                          "little")


def simhash64_batch(texts, token_hash: str = "fast") -> np.ndarray:
    """Vectorized 64-bit SimHash for a batch of texts.

    Tokenization: lower().split(' ') — single-space split with empty tokens
    kept, matching DuckDB string_split(lower(text), ' ') exactly.
    token_hash='fast' hashes all tokens in one pd.util.hash_array call
    (vectorized C siphash — the scale path); 'md5' uses md5[8:16] per token,
    bit-identical to DuckDB md5_number_lower (the oracle path,
    ``simhash_sql_ctes``).  Bit i is set iff 2*ones_i > n_tokens."""
    toks_per_doc = [t.lower().split(" ") for t in texts]
    counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = np.array([t for ts in toks_per_doc for t in ts], dtype=object)
    if len(flat) == 0:
        return np.zeros(len(texts), dtype=np.uint64)
    if token_hash == "fast":
        hv = pd.util.hash_array(flat)
    else:
        hv = np.array([_md5_low64(t) for t in flat], dtype=np.uint64)
    seg = np.repeat(np.arange(len(texts)), counts)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    ones = np.zeros((len(texts), 64), dtype=np.int64)
    np.add.at(ones, seg, bits)
    majority = (2 * ones > counts[:, None])
    return (majority.astype(np.uint64)
            << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64(text: str, token_hash: str = "fast") -> np.uint64:
    """64-bit SimHash over single-space tokens (batch kernel, one doc)."""
    return simhash64_batch([text], token_hash)[0]


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of xor via a per-byte lookup table (no 64-step loop)."""
    x = np.ascontiguousarray(
        np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64)))
    if x.size == 0:
        return np.zeros(x.shape, dtype=np.int64)
    return _POP8[x.view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1)


# ---------------------------------------------------------------------------
# Ray pipelines
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: Dataset) -> Dataset:
    """-> (h, keep_id, dup_count): md5 content groups, min doc_id kept.

    Group cardinality ~= corpus size (every distinct document is a
    group), so the reduce is a hash-partitioned pandas groupby
    (idjoin.hash_group_reduce) — Ray's sort-based aggregate pays
    ~0.3 ms/group, which at corpus cardinality is the whole job.

    SQL twin: SELECT md5(text) h, MIN(doc_id) keep_id, COUNT(*) dup_count
    FROM documents GROUP BY 1."""
    import hashlib as _h
    from .idjoin import hash_group_reduce

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": df["text"].fillna("").map(
                lambda s: _h.md5(s.encode()).hexdigest()),
            "doc_id": df["doc_id"].astype(np.int64)})

    return hash_group_reduce(
        docs.map_batches(add_hash, batch_format="pandas"), ["h"],
        {"keep_id": ("doc_id", "min"), "dup_count": ("doc_id", "count")})


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
    boundary).  Per-doc distinct-gram counts ride ON the gram rows (each
    gram row carries its doc's total), flow through the pair groupby as a
    Min aggregate, and the threshold test runs on the aggregated rows —
    no driver-side state, nothing corpus-sized leaves the shuffle.  Docs
    with fewer than k words have no grams.

    Scale note: a gram shared by g docs emits g(g-1)/2 pair rows — this is
    the exact-oracle path for verification and modest corpora; the LSH
    operators above are the 100 TB path (word k-grams, not char k-grams,
    precisely because boilerplate-heavy corpora make char grams near-flat).
    """

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        dids, grams, sizes = [], [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            gs = _word_ngrams(text, k)
            dids.extend([int(did)] * len(gs))
            sizes.extend([len(gs)] * len(gs))
            grams.extend(gs)
        out = pd.DataFrame({"doc_id": np.array(dids, dtype=np.int64),
                            "gram": grams,
                            "n": np.array(sizes, dtype=np.int64)})
        # coarse shuffle key: one map_groups call per hash partition (256)
        # instead of one per distinct gram (millions at scale)
        out["gpart"] = pd.util.hash_array(
            out["gram"].to_numpy(dtype=object)).astype(np.int64) % 256
        return out

    txt = docs.select_columns(["doc_id", "text"])

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        """All (a<b) doc pairs per gram, vectorized across this hash
        partition's grams (segments grouped by size -> one triu gather per
        distinct segment size).  Each pair row carries both docs' gram-set
        sizes (na, nb)."""
        g = g.sort_values(["gram", "doc_id"])
        ids = g["doc_id"].to_numpy().astype(np.int64)
        szs = g["n"].to_numpy().astype(np.int64)
        grams = g["gram"].to_numpy()
        if len(ids) < 2:
            return _EMPTY_PAIR_SIZES.copy()
        new = np.concatenate([[True], grams[1:] != grams[:-1]])
        seg = np.cumsum(new) - 1
        cnt = np.bincount(seg)
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        out_a, out_b, out_na, out_nb = [], [], [], []
        for n in np.unique(cnt):
            if n < 2:
                continue
            base = starts[cnt == n]
            iu, ju = np.triu_indices(int(n), 1)
            ia = (base[:, None] + iu[None, :]).ravel()
            ib = (base[:, None] + ju[None, :]).ravel()
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_na.append(szs[ia])
            out_nb.append(szs[ib])
        if not out_a:
            return _EMPTY_PAIR_SIZES.copy()
        return pd.DataFrame({"doc_id_a": np.concatenate(out_a),
                             "doc_id_b": np.concatenate(out_b),
                             "na": np.concatenate(out_na),
                             "nb": np.concatenate(out_nb)})

    def verify_batch(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_id_a"].to_numpy().astype(np.int64)
        b = df["doc_id_b"].to_numpy().astype(np.int64)
        inter = df["inter"].to_numpy().astype(np.int64)
        na = df["na"].to_numpy().astype(np.int64)
        nb = df["nb"].to_numpy().astype(np.int64)
        keep = threshold_den * inter >= threshold_num * (na + nb - inter)
        return pd.DataFrame({"doc_id_a": a[keep], "doc_id_b": b[keep]})

    from .idjoin import hash_group_reduce
    reduced = hash_group_reduce(
        txt.map_batches(gram_rows, batch_format="pandas")
        .groupby("gpart").map_groups(pairs_in_part,
                                     batch_format="pandas"),
        ["doc_id_a", "doc_id_b"],
        # na/nb are functions of their doc id — identical on every row
        # of a pair; "min" just picks the value
        {"inter": ("doc_id_a", "count"), "na": ("na", "min"),
         "nb": ("nb", "min")})
    return reduced.map_batches(verify_batch, batch_format="pandas")


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

_EMPTY_PAIR_SIZES = pd.DataFrame(
    {"doc_id_a": pd.Series([], dtype=np.int64),
     "doc_id_b": pd.Series([], dtype=np.int64),
     "na": pd.Series([], dtype=np.int64),
     "nb": pd.Series([], dtype=np.int64)})


def _sorted_pairs_df(pairs: Dataset) -> pd.DataFrame:
    """Materialize the (tiny) verified pair list on the driver, sorted."""
    df = pairs.to_pandas()
    if len(df) == 0:
        return _EMPTY_PAIRS.copy()
    return df.astype(np.int64).sort_values(["doc_id_a", "doc_id_b"]) \
        .reset_index(drop=True)


def minhash_band_rows(docs: Dataset, num_perm: int = 128, bands: int = 32,
                      shingle_k: int = 5, seed: int = 1,
                      num_parts: int = 256) -> Dataset:
    """Stage 1 of MinHash-LSH: (band, h, doc_id, part) band rows — 3 int
    columns per row are the ONLY thing the LSH shuffle moves (~1 KB/doc
    at 32 bands).  Neither signatures nor shingle sets ride: candidate
    pairs are deduped by a pair-level groupby afterwards and shingles are
    hash-joined back for verification (minhash_near_dup_pairs).

    Bucket identity is (band, h) with h = blake2b-64 of the band's
    signature slice — identical collision semantics to the round-3
    string key, kept as int64 so the shuffle sorts machine words."""
    r = num_perm // bands

    def sig_rows(df: pd.DataFrame) -> pa.Table:
        bnd, hs, dids = [], [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            sh = char_shingles(text, shingle_k)
            sig = minhash_signature(sh, num_perm, seed)
            for b in range(bands):
                key = int.from_bytes(
                    hashlib.blake2b(sig[b * r:(b + 1) * r].tobytes(),
                                    digest_size=8).digest(), "little")
                bnd.append(b)
                hs.append(np.uint64(key))
                dids.append(int(did))
        h = np.array(hs, dtype=np.uint64)
        # Arrow out: these 4 int columns are EXACTLY what the xbands LSH
        # shuffle moves — no pandas->Arrow re-conversion at the exchange
        return pa.table({
            "band": pa.array(np.array(bnd, dtype=np.int16)),
            "h": pa.array(h.view(np.int64)),
            "doc_id": pa.array(np.array(dids, dtype=np.int64)),
            "part": pa.array((_mix(h ^ np.uint64(0xB00))
                              % np.uint64(num_parts)).astype(np.int64))})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(sig_rows, batch_format="pandas")


_SHINGLE_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("sh", pa.large_binary())])


def shingle_table(docs: Dataset, shingle_k: int = 5) -> Dataset:
    """(doc_id, sh: binary) — each doc's sorted-unique uint64 shingle set
    serialized once (np.tobytes), for hash-joining onto candidate pairs."""

    def rows(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy().astype(np.int64)),
            "sh": pa.array([char_shingles(t, shingle_k).tobytes()
                            for t in df["text"].fillna("")],
                           type=pa.large_binary())},
            schema=_SHINGLE_SCHEMA)

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(rows, batch_format="pandas")


def minhash_near_dup_pairs(docs: Dataset, threshold: float = 0.6,
                           num_perm: int = 128, bands: int = 32,
                           shingle_k: int = 5, seed: int = 1,
                           join_parts: int | None = None) -> Dataset:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    bands x rows = num_perm; recall for J >= t is 1-(1-J^r)^b.  The
    default is r=4, b=32 (num_perm=128): recall 0.9999 at J = 0.7 and
    0.988 at J = 0.6, while a NON-duplicate J = 0.2 pair collides with
    probability ~5% — r=2 floods the candidate set with low-J pairs
    (~73% collision at J = 0.2), which at corpus scale turns the exact
    verification into an all-pairs job.  Verification is exact, so
    precision is 1.0 regardless.

    Shuffle shape (the 100 TB path): band rows carry (band, h, doc_id)
    int columns ONLY — neither shingle sets nor signatures ride the
    xbands-amplified LSH shuffle (~1 KB/doc total at 32 bands).  One
    hash-partitioned groupby segments every bucket inside a vectorized
    kernel (NOT one Python call per bucket — bucket count is corpus x
    bands); colliding buckets emit candidate pairs, a pair-level groupby
    dedups the multi-band repeats (pair-scale), and the candidates are
    hash-joined back against a once-computed (doc_id, shingles) table
    for exact-Jaccard verification.  The driver never sees documents,
    shingles, or candidates.  (Shingles are computed twice — once under
    the signature, once for the verify table — trading cheap recompute
    for the shuffle-byte drop.)

    Returns the (doc_id_a, doc_id_b) pair DATASET (stays in the object
    store — feed it to near_dup_clusters/dedup_canonical at scale);
    ``minhash_near_dups`` is the driver-materializing wrapper."""

    def cand_kernel(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy()
        h = g["h"].to_numpy()
        did = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((did, h, band))
        band, h, did = band[order], h[order], did[order]
        new = np.concatenate([[True], (band[1:] != band[:-1])
                              | (h[1:] != h[:-1])])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(h)]])
        out_a, out_b = [], []
        for a, b in zip(starts.tolist(), ends.tolist()):
            n = b - a
            if n < 2:
                continue
            ids = did[a:b]
            iu, ju = np.triu_indices(n, 1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return _EMPTY_PAIRS.copy()
        pairs = np.unique(np.stack([np.concatenate(out_a),
                                    np.concatenate(out_b)], axis=1),
                          axis=0)
        return pd.DataFrame({"doc_id_a": pairs[:, 0],
                             "doc_id_b": pairs[:, 1]})

    from .idjoin import _part_of
    parts = join_parts or 256
    cand = minhash_band_rows(docs, num_perm, bands, shingle_k, seed,
                             num_parts=parts) \
        .groupby("part").map_groups(cand_kernel, batch_format="pandas") \
        .materialize()
    # empty inputs break downstream shapes; the count is a scalar and
    # cand is pair-scale + materialized (may still hold multi-band
    # duplicate pairs — deduped inside the attach-A kernel, which
    # co-locates every copy of a pair by hash(doc_id_a))
    if cand.count() == 0:
        import ray.data
        return ray.data.from_pandas(_EMPTY_PAIRS.copy())

    # pinned ONCE: stages A and B both consume the shingle table, and an
    # unmaterialized Dataset would re-run the docs scan + shingling per
    # consumer (3 corpus passes total); pinning lets the object store
    # spill instead — the same multi-consumer rule curation uses
    sh = shingle_table(docs, shingle_k).materialize()

    # stage A: co-partition pairs + shingles on doc_id_a; the kernel
    # DEDUPS the pair set (exactly-once emission) and attaches sh_a
    # taggers are Arrow (int-column appends; the shingle blobs pass
    # through as large_binary with no pandas round trip — VERDICT r4
    # finding 2); the REDUCE kernels stay pandas (measured win)
    def tag_pairs_a(t: pa.Table) -> pa.Table:
        kv = t["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_b": t["doc_id_b"].combine_chunks().cast(pa.int64()),
            "sh_a": pa.array(np.full(len(kv), b"", dtype=object),
                             type=pa.large_binary()),
            "_tag": pa.array(np.zeros(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, parts))})

    def tag_sh_a(t: pa.Table) -> pa.Table:
        kv = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_b": pa.array(np.zeros(len(kv), dtype=np.int64)),
            "sh_a": t["sh"].combine_chunks().cast(pa.large_binary()),
            "_tag": pa.array(np.ones(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, parts))})

    # attach output and stage-B taggers stay PANDAS deliberately: sh_a
    # repeats ONE bytes object per (a, partition) across its ~cluster-size
    # pair rows, and pandas-block pickle memoizes repeated references —
    # the stage-B exchange ships each blob once per block instead of once
    # per pair (measured: an Arrow large_binary attach output materialized
    # 890 MB on the sf0.1 fixture and doubled the pipeline wall)
    def attach_a_kernel(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        if len(data) == 0:
            return pd.DataFrame({
                "doc_id_a": pd.Series([], dtype=np.int64),
                "doc_id_b": pd.Series([], dtype=np.int64),
                "sh_a": pd.Series([], dtype=object)})
        look = g[tags == 1]
        lk = look["key"].to_numpy().astype(np.int64)
        order = np.argsort(lk)
        lk, pay = lk[order], look["sh_a"].to_numpy()[order]
        pairs = np.unique(np.stack(
            [data["key"].to_numpy().astype(np.int64),
             data["doc_id_b"].to_numpy().astype(np.int64)], axis=1),
            axis=0)
        idx = np.searchsorted(lk, pairs[:, 0])
        return pd.DataFrame({"doc_id_a": pairs[:, 0],
                             "doc_id_b": pairs[:, 1],
                             "sh_a": pay[idx]})

    withA = cand.map_batches(tag_pairs_a, batch_format="pyarrow") \
        .union(sh.map_batches(tag_sh_a, batch_format="pyarrow")) \
        .groupby("_part").map_groups(attach_a_kernel,
                                     batch_format="pandas")

    # stage B FUSES the lookup with verification: pair rows co-partition
    # with the shingle table on doc_id_b and the kernel emits only the
    # verified (a, b) ids — doc B's shingles are looked up in the
    # kernel, never materialized onto pair rows
    def tag_pairs_b(df: pd.DataFrame) -> pd.DataFrame:
        kv = df["doc_id_b"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": kv,
            "doc_id_a": df["doc_id_a"].to_numpy().astype(np.int64),
            "sh_a": df["sh_a"].to_numpy(),
            "sh": np.full(len(df), b"", dtype=object),
            "_tag": np.int8(0),
            "_part": _part_of(kv, parts)})

    def tag_sh_b(df: pd.DataFrame) -> pd.DataFrame:
        kv = df["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": kv,
            "doc_id_a": np.zeros(len(df), dtype=np.int64),
            "sh_a": np.full(len(df), b"", dtype=object),
            "sh": df["sh"].to_numpy(),
            "_tag": np.int8(1),
            "_part": _part_of(kv, parts)})

    def verify_kernel(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        if len(data) == 0:
            return _EMPTY_PAIRS.copy()
        look = g[tags == 1]
        lk = look["key"].to_numpy().astype(np.int64)
        order = np.argsort(lk)
        lk = lk[order]
        pay = look["sh"].to_numpy()[order]
        kb = data["key"].to_numpy().astype(np.int64)
        ka = data["doc_id_a"].to_numpy().astype(np.int64)
        sa_col = data["sh_a"].to_numpy()
        sb_col = pay[np.searchsorted(lk, kb)]
        n = len(data)
        # vectorized pairwise intersection: each blob is a UNIQUE uint64
        # shingle set, so a value duplicated within one (pair, a+b)
        # segment appears exactly twice = one intersection hit.  One
        # lexsort over all elements replaces a per-pair Python loop.
        na = (np.frompyfunc(len, 1, 1)(sa_col).astype(np.int64)) // 8
        nb = (np.frompyfunc(len, 1, 1)(sb_col).astype(np.int64)) // 8
        vals = np.concatenate([
            np.frombuffer(b"".join(sa_col), dtype=np.uint64),
            np.frombuffer(b"".join(sb_col), dtype=np.uint64)])
        pid = np.concatenate([np.repeat(np.arange(n), na),
                              np.repeat(np.arange(n), nb)])
        order = np.lexsort((vals, pid))
        pv, vv = pid[order], vals[order]
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(pv[1:][dup], minlength=n).astype(np.int64)
        union = na + nb - inter
        # same float expression as jaccard() so thresholds round
        # identically to the in-bucket verifier this replaced
        jac = np.where(union > 0,
                       inter / np.maximum(union, 1), 1.0)
        ok = jac >= threshold
        return pd.DataFrame({"doc_id_a": ka[ok], "doc_id_b": kb[ok]})

    tagged = withA.map_batches(tag_pairs_b, batch_format="pandas") \
        .union(sh.map_batches(tag_sh_b, batch_format="pandas"))
    return tagged.groupby("_part").map_groups(verify_kernel,
                                              batch_format="pandas")


def minhash_near_dups(docs: Dataset, threshold: float = 0.6,
                      num_perm: int = 128, bands: int = 32,
                      shingle_k: int = 5, seed: int = 1) -> pd.DataFrame:
    """Driver-materialized (sorted) minhash_near_dup_pairs — for result
    inspection and the oracle queries; cluster pipelines should consume
    the Dataset variant."""
    return _sorted_pairs_df(minhash_near_dup_pairs(
        docs, threshold, num_perm, bands, shingle_k, seed))


def _sql_umul64(a: str) -> str:
    """HUGEINT expression for (a * {b}) mod 2**64 with a in [0, 2**64).

    DuckDB UBIGINT multiply overflows instead of wrapping, and
    HUGEINT*HUGEINT of two 64-bit values overflows the 128-bit type, so
    wrap-around multiply is done by 32-bit limb decomposition — every
    intermediate stays < 2**97.  Returns a format string with one ``{b}``
    slot for the (constant) multiplier."""
    return (f"CAST(((({a})%4294967296)*(({{b}})%4294967296)"
            f"+(((({a})%4294967296)*(({{b}})//4294967296)"
            f"+(({a})//4294967296)*(({{b}})%4294967296))%4294967296)"
            f"*4294967296)%18446744073709551616 AS UBIGINT)")


def _sql_mix_ctes(name: str, src: str, keys: str, expr: str) -> str:
    """CTE chain applying ``_mix`` (xor-shift / wrap-multiply avalanche) to
    UBIGINT expression ``expr`` of relation ``src``; the final CTE is
    ``{name}`` with columns ``{keys}, v``.  Bit-exact vs the numpy `_mix`
    (verified for the full uint64 range boundaries in tests)."""
    p1 = int(_P1)
    p2 = int(_P2)
    m1 = _sql_umul64("CAST(v AS HUGEINT)").format(b=p1)
    m2 = _sql_umul64("CAST(v AS HUGEINT)").format(b=p2)
    return f"""
        {name}_s1 AS (SELECT {keys}, CAST({expr} AS UBIGINT) AS v
                      FROM {src}),
        {name}_s2 AS (SELECT {keys}, xor(v, v >> 33) AS v FROM {name}_s1),
        {name}_s3 AS (SELECT {keys}, {m1} AS v FROM {name}_s2),
        {name}_s4 AS (SELECT {keys}, xor(v, v >> 29) AS v FROM {name}_s3),
        {name}_s5 AS (SELECT {keys}, {m2} AS v FROM {name}_s4),
        {name} AS (SELECT {keys}, xor(v, v >> 32) AS v FROM {name}_s5)"""


def minhash_near_dups_sql(threshold: float = 0.6, num_perm: int = 128,
                          bands: int = 32, shingle_k: int = 5,
                          seed: int = 1, src: str = "documents") -> str:
    """DuckDB twin of ``minhash_near_dups`` — the FULL pipeline rebuilt in
    SQL, not a brute-force stand-in: FNV-1a-style char-shingle hashes,
    `_mix` avalanche (wrap-around 64-bit multiplies via 32-bit limbs),
    the 64 MinHash permutations, LSH banding (a pair is a candidate iff
    some band's r signature values are all equal — exactly the Ray
    bucket-key collision, since the blake2b band key collides iff the band
    bytes are equal), and the identical IEEE-double Jaccard threshold test.
    Candidate sets therefore match by construction, not by measured recall.

    Assumes ASCII text (fixture-checked: utf-8 bytes == code points, so
    ``ord(substr())`` reproduces the byte-level shingles) and
    len(text) >= shingle_k (no zero-padding branch)."""
    k = shingle_k
    fnv = 1099511628211
    m64 = 1 << 64
    # h = c0*F^(k-1) + ... + c_{k-1}  (mod 2^64); ci < 128 so each term
    # fits HUGEINT without limb tricks
    pows = [pow(fnv, k - 1 - j, m64) for j in range(k)]
    hterms = " + ".join(
        f"CAST(ord(substr(t, i+{j}, 1)) AS HUGEINT)*{p}"
        for j, p in enumerate(pows))
    salt_mult = ((seed * 2 + 1) * int(_P1)) % m64
    r = num_perm // bands
    shingle_mix = _sql_mix_ctes(
        "shv", "fnv", "doc_id", "v")
    salt_mix = _sql_mix_ctes(
        "salt", "perm", "p",
        f"CAST((CAST(p AS HUGEINT) * {salt_mult}) % {m64} AS UBIGINT)")
    perm_mix = _sql_mix_ctes(
        "pmx", "shsalt", "doc_id, p", "xor(s, salt)")
    return f"""
        WITH docs0 AS (SELECT doc_id, COALESCE(text, '') AS t
                       FROM {src}),
        pos AS (SELECT doc_id, t,
                       unnest(generate_series(1, length(t) - {k - 1}))
                       AS i
                FROM docs0),
        fnv AS (SELECT doc_id,
                       CAST(({hterms}) % {m64} AS UBIGINT) AS v
                FROM pos),
        {shingle_mix},
        sh AS (SELECT DISTINCT doc_id, v AS s FROM shv),
        nsz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        perm AS (SELECT unnest(generate_series(1, {num_perm})) AS p),
        {salt_mix},
        shsalt AS (SELECT sh.doc_id, salt.p, sh.s, salt.v AS salt
                   FROM sh CROSS JOIN salt),
        {perm_mix},
        sig AS (SELECT doc_id, p, MIN(v) AS m FROM pmx GROUP BY 1, 2),
        band AS (SELECT doc_id, (p - 1) // {r} AS b,
                        LIST(m ORDER BY p) AS ms
                 FROM sig GROUP BY 1, 2),
        cand AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
                 FROM band x JOIN band y
                   ON x.b = y.b AND x.ms = y.ms AND x.doc_id < y.doc_id),
        ints AS (SELECT c.ida, c.idb, COUNT(*) AS isz
                 FROM cand c
                 JOIN sh a ON a.doc_id = c.ida
                 JOIN sh b2 ON b2.doc_id = c.idb AND b2.s = a.s
                 GROUP BY 1, 2)
        SELECT i.ida AS doc_id_a, i.idb AS doc_id_b
        FROM ints i
        JOIN nsz na ON na.doc_id = i.ida
        JOIN nsz nb ON nb.doc_id = i.idb
        WHERE CAST(i.isz AS DOUBLE)
              / CAST(na.n + nb.n - i.isz AS DOUBLE) >= {threshold}
        ORDER BY 1, 2
    """


def simhash_near_dups(docs: Dataset, max_hamming: int = 3,
                      token_hash: str = "fast",
                      num_parts: int = 256) -> pd.DataFrame:
    """SimHash near-dups: EXACT for max_hamming <= 3 (4-band pigeonhole).

    Band rows carry (band, key, doc_id, sig) ints only; ONE
    hash-partitioned groupby segments every 16-bit-band bucket inside a
    vectorized kernel (never one Python call per bucket — there are up
    to 4 x 2^16 of them).  Hamming verification runs in the kernel on
    the 8-byte signatures; a pair is emitted only by its lowest
    colliding band (the sig rides cheaply, so exactly-once needs no
    extra pair shuffle).  token_hash='md5' makes the whole pipeline
    bit-identical to ``simhash_near_dups_sql`` (the candidate set is
    exhaustive by pigeonhole, so SQL's brute-force pair scan matches).

    All of the above now lives in :func:`hamming_near_dup_pairs` (the
    fingerprint-agnostic generalization, 4 bands x 16-bit here); this
    function just computes the simhash column and delegates — same
    bucket identities, partition keys, and emission rule, so the pair
    set is unchanged."""

    def sig_col(df: pd.DataFrame) -> pd.DataFrame:
        hs = simhash64_batch(df["text"].fillna("").tolist(), token_hash)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy().astype(np.int64),
            "sh": hs.astype(np.uint64).view(np.int64)})

    kv = docs.select_columns(["doc_id", "text"]) \
        .map_batches(sig_col, batch_format="pandas")
    return hamming_near_dup_pairs(kv, "doc_id", "sh",
                                  max_hamming=max_hamming, num_bands=4,
                                  num_parts=num_parts)


def simhash_near_dups_sql(max_hamming: int = 3) -> str:
    """DuckDB twin of simhash_near_dups(token_hash='md5'): rebuild every
    64-bit signature in SQL (md5_number_lower token hash, per-bit majority
    vote) and emit all pairs with bit_count(xor) <= max_hamming.  Valid
    because the 4x16-bit pigeonhole makes the Ray candidate set exhaustive
    for hamming <= 3 — both sides enumerate the SAME complete pair set."""
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(COALESCE(text, '')),
                                             ' ')) AS t
          FROM documents),
        h AS (SELECT doc_id, md5_number_lower(t) AS hv FROM toks),
        nb AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY 1),
        bits AS (
          SELECT doc_id, b.bit,
                 SUM(CAST((hv >> b.bit) & 1 AS BIGINT)) AS ones
          FROM h CROSS JOIN
               (SELECT unnest(generate_series(0, 63)) AS bit) b
          GROUP BY 1, 2),
        sig AS (
          SELECT bits.doc_id,
                 CAST(SUM(CASE WHEN 2 * ones > n
                               THEN CAST(1 AS UBIGINT) << bit
                               ELSE 0 END) AS UBIGINT) AS s
          FROM bits JOIN nb USING (doc_id) GROUP BY 1)
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
    """


def hamming_near_dup_pairs(ds: Dataset, id_col: str, hash_col: str,
                           max_hamming: int = 6, num_bands: int = 8,
                           num_parts: int = 256) -> pd.DataFrame:
    """Near-dup pairs over ANY int64 fingerprint column (e.g. the image
    table's ``phash``) by banded hamming LSH — EXACT (complete) for
    ``max_hamming < num_bands`` by pigeonhole: a pair differing in h
    bits has some clean band whenever h < num_bands.

    Generalizes the simhash kernel to a caller-supplied fingerprint:
    band rows carry (band, key, id, sig) ints only, ONE hash-partitioned
    groupby, vectorized bucket segmentation, in-kernel hamming verify,
    lowest-colliding-band exactly-once emission.  Band width =
    64/num_bands: wider bands (fewer of them) spread buckets thinner —
    at corpus scale pick the widest band satisfying
    ``max_hamming < num_bands`` (e.g. 8x8-bit for h <= 7); perceptual
    hashes are biased toward a few hot buckets, so the hash-salted
    partition key keeps groups bounded either way."""
    if num_bands not in (4, 8, 16):
        raise ValueError("num_bands must divide 64: one of 4, 8, 16")
    if max_hamming >= num_bands:
        raise ValueError(f"exactness needs max_hamming < num_bands "
                         f"({max_hamming} >= {num_bands})")
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)

    def sig_rows(t: pa.Table) -> pa.Table:
        # pure int transform: Arrow in, Arrow out (no pandas round trip
        # on the rows entering the band shuffle)
        dids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = t[hash_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        n = len(dids)
        band = np.tile(np.arange(num_bands, dtype=np.int16), n)
        didn = np.repeat(dids, num_bands)
        sign = np.repeat(hs, num_bands)
        key = ((sign >> (np.uint64(width) * band.astype(np.uint64)))
               & mask).astype(np.int64)
        bid = band.astype(np.uint64) * (mask + np.uint64(1)) \
            + key.astype(np.uint64)
        return pa.table({
            "band": pa.array(band), "key": pa.array(key),
            "doc_id": pa.array(didn),
            "sig": pa.array(sign.view(np.int64)),
            "part": pa.array((_mix(bid)
                              % np.uint64(num_parts)).astype(np.int64))})

    def verify_kernel(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy()
        key = g["key"].to_numpy()
        did = g["doc_id"].to_numpy().astype(np.int64)
        sig = g["sig"].to_numpy().view(np.uint64)
        order = np.lexsort((did, key, band))
        band, key, did, sig = (band[order], key[order], did[order],
                               sig[order])
        new = np.concatenate([[True], (band[1:] != band[:-1])
                              | (key[1:] != key[:-1])])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(did)]])
        out_a, out_b = [], []
        for a, e in zip(starts.tolist(), ends.tolist()):
            n = e - a
            if n < 2:
                continue
            ids = did[a:e]
            sg = sig[a:e]
            b = int(band[a])
            iu, ju = np.triu_indices(n, 1)
            if b > 0:
                sh = (sg[:, None] >> (np.uint64(width)
                                      * np.arange(b, dtype=np.uint64)
                                      [None, :])) & mask
                dup = (sh[iu] == sh[ju]).any(axis=1)
                iu, ju = iu[~dup], ju[~dup]
                if len(iu) == 0:
                    continue
            ok = hamming64(sg[iu], sg[ju]) <= max_hamming
            same = ids[iu] == ids[ju]     # identical fingerprints under
            ok &= ~same                   # duplicate ids never self-pair
            out_a.append(ids[iu[ok]])
            out_b.append(ids[ju[ok]])
        if not out_a:
            return _EMPTY_PAIRS.copy()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"doc_id_a": lo, "doc_id_b": hi})

    pairs = ds.select_columns([id_col, hash_col]) \
        .map_batches(sig_rows, batch_format="pyarrow") \
        .groupby("part").map_groups(verify_kernel, batch_format="pandas")
    return _sorted_pairs_df(pairs)


def embedding_near_dups(vecs: Dataset, threshold: float = 0.95,
                        planes: int = 64, bands: int = 16,
                        seed: int = 7,
                        num_parts: int = 256) -> pd.DataFrame:
    """Embedding near-dups: random-hyperplane signature bands -> exact
    INTEGER-cosine verification (the SimHash-for-vectors scale path).

    Shuffle shape mirrors MinHash (round 4): band rows carry
    (band, key, vec_id, bits64) ints only — the 64 plane bits pack into
    ONE uint64 that both keys the buckets and drives the
    lowest-colliding-band exactly-once rule, so neither the quantized
    vector nor a bit array rides the xbands shuffle.  Buckets are
    segmented vectorized inside hash-partition kernels; candidates then
    attach w_a from a once-computed qnorm table and a FUSED lookup+
    verify kernel on vec_id_b computes the integer score
    ``w_a . w_b >= round(threshold*1e12)`` — the identical test DuckDB
    runs in ``embedding_near_dups_sql``, so the verified pair set is
    bit-exact.  Candidate generation is LSH (recall < 1 in theory; with
    16 bands of 4 planes a cosine-0.95 pair is missed with prob ~1e-20
    — measured recall 1.0 on the fixtures)."""
    from .idjoin import _part_of
    from .simsearch import qnorm_matrix
    t_int = int(round(threshold * 1_000_000_000_000))
    rng = np.random.default_rng(seed)
    first = vecs.take(1)[0]
    dim = len(first["embedding"])
    H = rng.standard_normal((dim, planes))
    r = planes // bands
    assert planes <= 64
    sel = vecs.select_columns(["vec_id", "embedding"])

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bits = ((emb @ H) > 0)
        n = len(emb)
        # pack plane bits little-endian: bit p of bits64 = plane p sign
        pw = (np.uint64(1) << np.arange(planes, dtype=np.uint64))
        bits64 = (bits.astype(np.uint64) * pw[None, :]).sum(
            axis=1, dtype=np.uint64)
        band = np.tile(np.arange(bands, dtype=np.int16), n)
        vid = np.repeat(df["vec_id"].to_numpy().astype(np.int64), bands)
        b64 = np.repeat(bits64, bands)
        key = ((b64 >> (band.astype(np.uint64) * np.uint64(r)))
               & np.uint64((1 << r) - 1)).astype(np.int32)
        bid = band.astype(np.uint64) * np.uint64(1 << r) \
            + key.astype(np.uint64)
        return pa.table({
            "band": pa.array(band), "key": pa.array(key),
            "vec_id": pa.array(vid),
            "bits64": pa.array(b64.view(np.int64)),
            "part": pa.array((_mix(bid ^ np.uint64(0xE3))
                              % np.uint64(num_parts)).astype(np.int64))})

    def cand_kernel(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy()
        key = g["key"].to_numpy()
        vid = g["vec_id"].to_numpy().astype(np.int64)
        b64 = g["bits64"].to_numpy().view(np.uint64)
        order = np.lexsort((vid, key, band))
        band, key, vid, b64 = (band[order], key[order], vid[order],
                               b64[order])
        new = np.concatenate([[True], (band[1:] != band[:-1])
                              | (key[1:] != key[:-1])])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(vid)]])
        out_a, out_b = [], []
        for a, e in zip(starts.tolist(), ends.tolist()):
            n = e - a
            if n < 2:
                continue
            ids = vid[a:e]
            bb = b64[a:e]
            b = int(band[a])
            iu, ju = np.triu_indices(n, 1)
            if b > 0:
                # lowest colliding band: some earlier band's r bits equal
                mask_lo = np.uint64((1 << (b * r)) - 1)
                lo = bb & mask_lo
                x = (lo[iu] ^ lo[ju])
                dup = np.zeros(len(iu), dtype=bool)
                for bb2 in range(b):
                    m = np.uint64(((1 << r) - 1) << (bb2 * r))
                    dup |= (x & m) == 0
                iu, ju = iu[~dup], ju[~dup]
                if len(iu) == 0:
                    continue
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame({"doc_id_a": np.concatenate(out_a),
                             "doc_id_b": np.concatenate(out_b)})

    cand = sel.map_batches(sig_rows, batch_format="pandas") \
        .groupby("part").map_groups(cand_kernel, batch_format="pandas") \
        .materialize()
    if cand.count() == 0:
        return _EMPTY_PAIRS.copy().rename(
            columns={"doc_id_a": "vec_id_a", "doc_id_b": "vec_id_b"})

    def wrows(df: pd.DataFrame) -> pa.Table:
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy().astype(np.int64)),
            "w": pa.array([x.tobytes() for x in qnorm_matrix(emb)],
                          type=pa.large_binary())})

    # pinned ONCE (two consumers: tag_w_a + tag_w_b) — same rule as the
    # minhash shingle table above
    wt = sel.map_batches(wrows, batch_format="pandas").materialize()

    # attach w_a (pairs co-partitioned with the qnorm table on the A id);
    # Arrow taggers, pandas reduce kernels — same split as minhash above
    def tag_pairs_a(t: pa.Table) -> pa.Table:
        kv = t["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_b": t["doc_id_b"].combine_chunks().cast(pa.int64()),
            "w_a": pa.array(np.full(len(kv), b"", dtype=object),
                            type=pa.large_binary()),
            "_tag": pa.array(np.zeros(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, num_parts))})

    def tag_w_a(t: pa.Table) -> pa.Table:
        kv = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_b": pa.array(np.zeros(len(kv), dtype=np.int64)),
            "w_a": t["w"].combine_chunks().cast(pa.large_binary()),
            "_tag": pa.array(np.ones(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, num_parts))})

    _ATTACH_W = pa.schema([("doc_id_a", pa.int64()),
                           ("doc_id_b", pa.int64()),
                           ("w_a", pa.large_binary())])

    def attach_a_kernel(g: pd.DataFrame) -> pa.Table:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        if len(data) == 0:
            return _ATTACH_W.empty_table()
        look = g[tags == 1]
        lk = look["key"].to_numpy().astype(np.int64)
        order = np.argsort(lk)
        lk, pay = lk[order], look["w_a"].to_numpy()[order]
        pairs_arr = np.unique(np.stack(
            [data["key"].to_numpy().astype(np.int64),
             data["doc_id_b"].to_numpy().astype(np.int64)], axis=1),
            axis=0)
        idx = np.searchsorted(lk, pairs_arr[:, 0])
        return pa.table({"doc_id_a": pa.array(pairs_arr[:, 0]),
                         "doc_id_b": pa.array(pairs_arr[:, 1]),
                         "w_a": pa.array(pay[idx],
                                         type=pa.large_binary())},
                        schema=_ATTACH_W)

    withA = cand.map_batches(tag_pairs_a, batch_format="pyarrow") \
        .union(wt.map_batches(tag_w_a, batch_format="pyarrow")) \
        .groupby("_part").map_groups(attach_a_kernel,
                                     batch_format="pandas")

    def tag_pairs_b(t: pa.Table) -> pa.Table:
        kv = t["doc_id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_a": t["doc_id_a"].combine_chunks().cast(pa.int64()),
            "w_a": t["w_a"].combine_chunks().cast(pa.large_binary()),
            "w": pa.array(np.full(len(kv), b"", dtype=object),
                          type=pa.large_binary()),
            "_tag": pa.array(np.zeros(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, num_parts))})

    def tag_w_b(t: pa.Table) -> pa.Table:
        kv = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(kv),
            "doc_id_a": pa.array(np.zeros(len(kv), dtype=np.int64)),
            "w_a": pa.array(np.full(len(kv), b"", dtype=object),
                            type=pa.large_binary()),
            "w": t["w"].combine_chunks().cast(pa.large_binary()),
            "_tag": pa.array(np.ones(len(kv), dtype=np.int8)),
            "_part": pa.array(_part_of(kv, num_parts))})

    def verify_kernel(g: pd.DataFrame) -> pd.DataFrame:
        tags = g["_tag"].to_numpy()
        data = g[tags == 0]
        if len(data) == 0:
            return _EMPTY_PAIRS.copy()
        look = g[tags == 1]
        lk = look["key"].to_numpy().astype(np.int64)
        order = np.argsort(lk)
        lk, pay = lk[order], look["w"].to_numpy()[order]
        kb = data["key"].to_numpy().astype(np.int64)
        ka = data["doc_id_a"].to_numpy().astype(np.int64)
        wa_col = data["w_a"].to_numpy()
        idx = np.searchsorted(lk, kb)
        # qnorm vectors are fixed-dim int64: one reshaped batch + a
        # row-wise integer dot replaces the per-pair Python loop
        wa_m = np.frombuffer(b"".join(wa_col), dtype=np.int64) \
            .reshape(len(data), -1)
        wb_m = np.frombuffer(b"".join(pay[idx]), dtype=np.int64) \
            .reshape(len(data), -1)
        ok = np.einsum("ij,ij->i", wa_m, wb_m) >= t_int
        return pd.DataFrame({"doc_id_a": ka[ok], "doc_id_b": kb[ok]})

    pairs = withA.map_batches(tag_pairs_b, batch_format="pyarrow") \
        .union(wt.map_batches(tag_w_b, batch_format="pyarrow")) \
        .groupby("_part").map_groups(verify_kernel,
                                     batch_format="pandas")
    return _sorted_pairs_df(pairs).rename(
        columns={"doc_id_a": "vec_id_a", "doc_id_b": "vec_id_b"})


_EMPTY_EDGES = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64)})


def _star_partition(g: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One alternating-star step over a hash partition's adjacency rows
    (columns k = group node, v = neighbor), vectorized with sorted-segment
    numpy.  large=True: emit (v, min(N(k) u {k})) for v > k.  large=False
    (small-star over larger->smaller edges): emit (x, min(N(k))) for
    x in N(k) u {k}, x != min."""
    if len(g) == 0:
        return _EMPTY_EDGES.copy()
    k = g["k"].to_numpy().astype(np.int64)
    v = g["v"].to_numpy().astype(np.int64)
    order = np.lexsort((v, k))
    k, v = k[order], v[order]
    new = np.concatenate([[True], k[1:] != k[:-1]])
    seg = np.cumsum(new) - 1
    nseg = seg[-1] + 1 if len(seg) else 0
    m = np.full(nseg, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(m, seg, v)
    if large:
        m = np.minimum(m, k[new])          # min(N(k) u {k})
        keep = v > k
        out_u, out_v = v[keep], m[seg][keep]
    else:
        keep = v != m[seg]                 # N(k) \ {min}
        out_u = np.concatenate([v[keep], k[new]])
        out_v = np.concatenate([m[seg][keep], m])
    if len(out_u) == 0:
        return _EMPTY_EDGES.copy()
    e = np.unique(np.stack([out_u, out_v], axis=1), axis=0)
    return pd.DataFrame({"u": e[:, 0], "v": e[:, 1]})


def connected_components(edges: Dataset, num_parts: int = 256,
                         max_rounds: int = 50) -> Dataset:
    """Distributed connected components over an (u, v) edge Dataset ->
    star edges (node, comp) with comp = the component's minimum node id
    (every non-minimum node gets exactly one output row).

    Alternating large-star / small-star (Kiveris et al., 'Connected
    Components in MapReduce and Beyond'): each half-round is ONE
    hash-partitioned groupby + a vectorized segment kernel — no driver-side
    graph, no label-propagation join per hop, O(log^2 n) rounds worst case
    (2-3 in practice for near-dup clusters).  The edge set (pair-scale,
    not corpus-scale) is the only thing materialized per round.

    Convergence is detected by a (count, checksum) fixpoint over the edge
    multiset; the checksum is an order-independent sum of 32-bit-masked
    `_mix` hashes so a changed edge set collides with probability ~2^-32
    per round (and a missed fixpoint only costs one extra identical
    round)."""
    from ray.data.aggregate import Sum

    def key_large(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        kk = np.concatenate([u, v])
        vv = np.concatenate([v, u])
        keep = kk != vv
        kk, vv = kk[keep], vv[keep]
        return pd.DataFrame({"k": kk, "v": vv,
                             "part": _mix(kk.astype(np.uint64))
                             .astype(np.int64) % num_parts})

    def key_small(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        hi, lo = np.maximum(u, v), np.minimum(u, v)
        return pd.DataFrame({"k": hi, "v": lo,
                             "part": _mix(hi.astype(np.uint64))
                             .astype(np.int64) % num_parts})

    def chk_col(df: pd.DataFrame) -> pd.DataFrame:
        h = (_mix(df["u"].to_numpy().astype(np.uint64) * np.uint64(3))
             ^ _mix(df["v"].to_numpy().astype(np.uint64)))
        return pd.DataFrame({"c": (h & np.uint64(0xFFFFFFFF))
                             .astype(np.int64), "n": 1})

    prev = None
    for _ in range(max_rounds):
        for large in (True, False):
            edges = edges \
                .map_batches(key_large if large else key_small,
                             batch_format="pandas") \
                .groupby("part") \
                .map_groups(lambda g, lg=large: _star_partition(g, lg),
                            batch_format="pandas") \
                .materialize()
        stat = edges.map_batches(chk_col, batch_format="pandas") \
            .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
        cur = (stat.get("c"), stat.get("n"))
        if cur == prev or cur == (None, None):
            break
        prev = cur
    return edges


def near_dup_clusters(docs: Dataset, pairs) -> Dataset:
    """(doc_id, cluster_id) for EVERY document: cluster_id = min doc_id of
    the near-duplicate connected component (own id for singletons).

    ``pairs`` is any near-dup pair table — a Dataset or pandas frame with
    (doc_id_a, doc_id_b) — e.g. the output of minhash_near_dups.  The
    star edges from connected_components are unioned with identity rows
    and reduced by a single Min groupby (hash-partitioned pandas reduce:
    the group key is EVERY doc_id, i.e. corpus cardinality); nothing
    corpus-sized lands on the driver."""
    import ray.data

    if isinstance(pairs, pd.DataFrame):
        edges_in = ray.data.from_pandas(
            pairs if len(pairs) else _EMPTY_PAIRS.copy())
    else:
        edges_in = pairs

    def as_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"u": df["doc_id_a"].to_numpy().astype(np.int64),
             "v": df["doc_id_b"].to_numpy().astype(np.int64)})

    stars = connected_components(
        edges_in.map_batches(as_edges, batch_format="pandas"))

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"u": i, "v": i})

    from .idjoin import hash_group_reduce
    return hash_group_reduce(
        docs.select_columns(["doc_id"])
        .map_batches(ident, batch_format="pandas")
        .union(stars),
        ["u"], {"cluster_id": ("v", "min")}) \
        .map_batches(lambda df: df.rename(columns={"u": "doc_id"}),
                     batch_format="pandas")


def dedup_canonical(docs: Dataset, pairs,
                    broadcast_threshold: int = 1_000_000,
                    join_parts: int | None = None) -> Dataset:
    """Corpus minus near-duplicates: keep only each cluster's minimum
    doc_id (the canonical representative), payload intact — the standard
    final step of a dedup pipeline.

    Scale shape: the corpus is LEFT-SEMI hash-joined against the canonical
    side of the cluster table (rows with doc_id == cluster_id) — the drop
    set never lands on the driver.  Web-corpus near-dup drop rates of
    10-40% make the drop set corpus-scale, so a driver take_all is not an
    option at 100 TB.  Only when the drop set is VERIFIABLY small (a
    scalar count <= ``broadcast_threshold``) does it ship as a broadcast
    sorted-id mask instead, skipping the corpus-wide join shuffle."""
    clusters = near_dup_clusters(docs, pairs).materialize()

    def drop_ids(df: pd.DataFrame) -> pd.DataFrame:
        bad = df[df["doc_id"].to_numpy() != df["cluster_id"].to_numpy()]
        return pd.DataFrame({"doc_id":
                             bad["doc_id"].to_numpy().astype(np.int64)})

    drop_ds = clusters.map_batches(drop_ids, batch_format="pandas")
    n_drop = drop_ds.count()                       # scalar on the driver
    if n_drop == 0:
        return docs
    if n_drop <= broadcast_threshold:
        drop = np.sort(
            drop_ds.to_pandas()["doc_id"].to_numpy().astype(np.int64))

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].to_numpy().astype(np.int64)
            idx = np.searchsorted(drop, ids)
            idx[idx >= len(drop)] = len(drop) - 1
            return df[~(drop[idx] == ids)]

        return docs.map_batches(keep, batch_format="pandas")

    def canon_ids(df: pd.DataFrame) -> pd.DataFrame:
        good = df[df["doc_id"].to_numpy() == df["cluster_id"].to_numpy()]
        return pd.DataFrame({"doc_id":
                             good["doc_id"].to_numpy().astype(np.int64)})

    from .idjoin import filter_by_ids
    canon = clusters.map_batches(canon_ids, batch_format="pandas")
    return filter_by_ids(docs, "doc_id", canon, "doc_id", keep=True,
                         num_parts=join_parts or 256)


def near_dup_clusters_sql(pairs_sql: str, src: str = "documents") -> str:
    """DuckDB twin of near_dup_clusters: min reachable doc_id per node via
    a recursive CTE over the (embedded) pair query — e.g.
    near_dup_clusters_sql(minhash_near_dups_sql())."""
    return f"""
        WITH RECURSIVE pairs AS (SELECT * FROM ({pairs_sql})),
        edges AS (SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
                  UNION ALL
                  SELECT doc_id_b, doc_id_a FROM pairs),
        reach AS (SELECT doc_id AS u, doc_id AS v FROM {src}
                  UNION
                  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v)
        SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY 1
    """


def embedding_near_dups_sql(long_src: str, threshold: float = 0.95) -> str:
    """DuckDB twin of embedding_near_dups over a long-form vector source
    (vec_id, i, v DOUBLE): brute-force all-pairs integer-cosine test with
    the same threshold integer."""
    from .simsearch import qnorm_sql_ctes
    t_int = int(round(threshold * 1_000_000_000_000))
    return f"""
        WITH {qnorm_sql_ctes(long_src)}
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM W a JOIN W b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2
        HAVING SUM(a.w * b.w) >= {t_int}
    """
