"""Text analysis, dedup, and similarity-search operators vs oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _docs_ds():
    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet")


def _vecs_ds():
    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def _corpus_with_dupes(n=60, seed=5):
    """Synthetic corpus with planted near/exact duplicates."""
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts, ids = [], []
    for i in range(n):
        base = " ".join(rng.choice(words, 30))
        texts.append(base)
        ids.append(3 * i)
        if i % 4 == 0:       # near-dup: mutate one word
            toks = base.split()
            toks[rng.integers(0, len(toks))] = "mutant"
            texts.append(" ".join(toks))
            ids.append(3 * i + 1)
        if i % 7 == 0:       # exact dup
            texts.append(base)
            ids.append(3 * i + 2)
    return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                         "text": texts})


def test_text_stats_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.text import (ray_text_stats,
                                                 text_stats_sql)
    got = ray_text_stats(_docs_ds()).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = con.execute(text_stats_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False, check_exact=True)


def test_lang_id_and_fingerprints_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.text import (FINGERPRINTS_SQL,
                                                 lang_id_sql,
                                                 ray_fingerprints,
                                                 ray_lang_id)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    for stage, sql in [(ray_lang_id, lang_id_sql()),
                       (ray_fingerprints, FINGERPRINTS_SQL)]:
        got = stage(_docs_ds()).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = con.execute(sql).df() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rolling_fingerprint_oracle():
    from hecatoncheir_ray.functions.text import rolling_fingerprint
    text = "the quick brown fox jumps over the lazy dog"
    got = rolling_fingerprint(text, window=8)
    data = text.encode()
    mod = (1 << 61) - 1
    exp = []
    for i in range(len(data) - 7):
        h = 0
        for c in data[i:i + 8]:
            h = (h * 257 + c) % mod
        exp.append(h)
    assert got.tolist() == exp


def test_exact_dedup(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.dedup import (EXACT_DEDUP_SQL,
                                                  exact_dedup_groups)
    df = _corpus_with_dupes()
    got = exact_dedup_groups(rd.from_pandas(df)).to_pandas() \
        .sort_values("h").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(EXACT_DEDUP_SQL).df() \
        .sort_values("h").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False)
    assert (exp["dup_count"] > 1).any()


def test_minhash_vs_brute(ray_session):
    from hecatoncheir_ray.functions.dedup import (char_shingles, jaccard,
                                                  minhash_near_dups)
    df = _corpus_with_dupes()
    got = minhash_near_dups(rd.from_pandas(df), threshold=0.7)
    sh = {int(r.doc_id): char_shingles(r.text) for r in df.itertuples()}
    ids = sorted(sh)
    exp = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
           if jaccard(sh[a], sh[b]) >= 0.7]
    got_pairs = list(zip(got["doc_id_a"], got["doc_id_b"]))
    # precision exact (verified); recall 1.0 expected for J>=0.7 with
    # 32 bands x 2 rows on planted dupes
    assert set(got_pairs) == set(exp)
    assert len(exp) > 0


def test_minhash_sql_twin(ray_session):
    """Full-pipeline DuckDB twin: FNV shingles + _mix + 64 perms + LSH
    banding rebuilt in SQL must emit the identical pair set."""
    import duckdb
    from hecatoncheir_ray.functions.dedup import (minhash_near_dups,
                                                  minhash_near_dups_sql)
    df = _corpus_with_dupes()
    got = minhash_near_dups(rd.from_pandas(df), threshold=0.7)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(minhash_near_dups_sql(threshold=0.7)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"))
    assert len(exp) > 0


def test_mix_sql_parity():
    """SQL limb-decomposed wrap-multiply mix == numpy _mix at the uint64
    boundaries (the overflow-sensitive inputs)."""
    import duckdb
    from hecatoncheir_ray.functions.dedup import _mix, _sql_mix_ctes
    vals = [0, 1, 2**32 - 1, 2**32, 2**63, 2**64 - 1, 0xDEADBEEF12345678]
    con = duckdb.connect()
    con.register("vin", pd.DataFrame({"k": range(len(vals)),
                                      "x": np.array(vals,
                                                    dtype=np.uint64)}))
    sql = ("WITH " + _sql_mix_ctes("mx", "vin", "k", "x")
           + " SELECT v FROM mx ORDER BY k")
    got = [int(r[0]) for r in con.execute(sql).fetchall()]
    want = _mix(np.array(vals, dtype=np.uint64)).tolist()
    assert got == want


def _uf_oracle(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return [find(i) for i in range(n_nodes)]


def test_connected_components_vs_union_find(ray_session):
    from hecatoncheir_ray.functions.dedup import near_dup_clusters
    rng = np.random.default_rng(0)
    for n, m in [(50, 40), (120, 200), (30, 0)]:
        e = rng.integers(0, n, size=(m, 2))
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
        pairs = pd.DataFrame({"doc_id_a": e[:, 0].astype(np.int64),
                              "doc_id_b": e[:, 1].astype(np.int64)})
        got = near_dup_clusters(docs, pairs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == n
        assert got["cluster_id"].tolist() == _uf_oracle(n, e.tolist())


def test_connected_components_chain(ray_session):
    """512-node path graph: label propagation would need 511 hops; the
    alternating-star rounds collapse it within the round cap."""
    from hecatoncheir_ray.functions.dedup import (dedup_canonical,
                                                  near_dup_clusters)
    n = 512
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
    pairs = pd.DataFrame(
        {"doc_id_a": np.arange(n - 1, dtype=np.int64),
         "doc_id_b": np.arange(1, n, dtype=np.int64)})
    got = near_dup_clusters(docs, pairs).to_pandas()
    assert len(got) == n and (got["cluster_id"] == 0).all()
    surv = dedup_canonical(docs, pairs).to_pandas()
    assert surv["doc_id"].tolist() == [0]


def test_near_dup_clusters_sql_twin(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.dedup import (minhash_near_dups,
                                                  minhash_near_dups_sql,
                                                  near_dup_clusters,
                                                  near_dup_clusters_sql)
    df = _corpus_with_dupes()
    docs = rd.from_pandas(df)
    pairs = minhash_near_dups(docs, threshold=0.7)
    got = near_dup_clusters(docs, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(
        near_dup_clusters_sql(minhash_near_dups_sql(threshold=0.7))
        + " ORDER BY 1").df()
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))
    assert (exp["doc_id"] != exp["cluster_id"]).any()


def test_simhash_exact_for_hamming3(ray_session):
    from hecatoncheir_ray.functions.dedup import (hamming64,
                                                  simhash64,
                                                  simhash_near_dups)
    df = _corpus_with_dupes()
    got = simhash_near_dups(rd.from_pandas(df), max_hamming=3)
    sigs = {int(r.doc_id): simhash64(r.text) for r in df.itertuples()}
    ids = sorted(sigs)
    exp = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
           if hamming64(np.array([sigs[a]]),
                        np.array([sigs[b]]))[0] <= 3]
    assert set(zip(got["doc_id_a"], got["doc_id_b"])) == set(exp)
    assert len(exp) > 0


def test_embedding_near_dups(ray_session):
    from hecatoncheir_ray.functions.dedup import embedding_near_dups
    rng = np.random.default_rng(0)
    base = rng.standard_normal((40, 16))
    vecs, ids = [], []
    for i in range(40):
        vecs.append(base[i])
        ids.append(2 * i)
        if i % 5 == 0:       # planted near-dup
            vecs.append(base[i] + 0.01 * rng.standard_normal(16))
            ids.append(2 * i + 1)
    df = pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                       "embedding": [v.astype(np.float32).tolist()
                                     for v in vecs]})
    got = embedding_near_dups(rd.from_pandas(df), threshold=0.98)
    norm = {i: np.asarray(v) / np.linalg.norm(v)
            for i, v in zip(ids, [np.asarray(v, dtype=np.float64)
                                  for v in df["embedding"]])}
    exp = [(a, b) for i, a in enumerate(sorted(norm))
           for b in sorted(norm)[i + 1:]
           if float(norm[a] @ norm[b]) >= 0.98]
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == set(exp)
    assert len(exp) >= 8


def test_topk_ip_quantized_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.simsearch import (topk_ip_quantized,
                                                      topk_ip_quantized_sql)
    got = topk_ip_quantized(_vecs_ds(), [0, 1, 2], k=8) \
        .sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/embeddings.parquet')")
    exp = con.execute(topk_ip_quantized_sql([0, 1, 2], k=8)).df() \
        .sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_topk_cosine_brute_and_lsh(ray_session):
    from hecatoncheir_ray.functions.simsearch import (topk_cosine_brute,
                                                      topk_cosine_lsh)
    rows = _vecs_ds().take_all()
    queries = np.stack([np.asarray(rows[i]["embedding"], dtype=np.float64)
                        for i in (0, 5)])
    brute = topk_cosine_brute(_vecs_ds(), queries, k=10)
    # query 0's own vector must rank first with score ~1
    q0 = brute[brute.query_id == 0].iloc[0]
    assert q0["vec_id"] == rows[0]["vec_id"]
    assert q0["score"] == pytest.approx(1.0)
    lsh = topk_cosine_lsh(_vecs_ds(), queries, k=10)
    # recall of the LSH path vs brute
    r = len(set(zip(lsh.query_id, lsh.vec_id))
            & set(zip(brute.query_id, brute.vec_id))) / len(brute)
    assert r >= 0.5


def test_topk_cosine_ivf(ray_session):
    from hecatoncheir_ray.functions.simsearch import (topk_cosine_brute,
                                                      topk_cosine_ivf)
    rows = _vecs_ds().take_all()
    queries = np.stack([np.asarray(rows[i]["embedding"], dtype=np.float64)
                        for i in (0, 7)])
    brute = topk_cosine_brute(_vecs_ds(), queries, k=10)
    ivf = topk_cosine_ivf(_vecs_ds(), queries, k=10, nlist=8, nprobe=4)
    # the query's own vector must survive the IVF prefilter and rank first
    assert ivf[ivf.query_id == 0].iloc[0]["vec_id"] == rows[0]["vec_id"]
    r = len(set(zip(ivf.query_id, ivf.vec_id))
            & set(zip(brute.query_id, brute.vec_id))) / len(brute)
    assert r >= 0.5


def test_ngram_jaccard_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.dedup import (ngram_jaccard_pairs,
                                                  ngram_jaccard_sql)
    df = _corpus_with_dupes()
    got = ngram_jaccard_pairs(rd.from_pandas(df), threshold_num=3,
                              threshold_den=5).to_pandas() \
        .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(ngram_jaccard_sql(3, 5)).df() \
        .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(exp) > 0


def test_ngram_jaccard_short_docs(ray_session):
    from hecatoncheir_ray.functions.dedup import ngram_jaccard_pairs
    df = pd.DataFrame({"doc_id": np.array([1, 2, 3], dtype=np.int64),
                       "text": ["ab", "ab", "one two"]})
    # docs with fewer than k=3 words have no grams -> no pairs from them
    got = ngram_jaccard_pairs(rd.from_pandas(df)).to_pandas()
    assert len(got) == 0


def test_hopping_window_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.windows import (hopping_window_agg,
                                                    hopping_window_agg_sql)
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    got = hopping_window_agg(ev)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    exp = con.execute(hopping_window_agg_sql()).df() \
        .sort_values(["window_id", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every event lands in window/hop = 4 windows
    assert got["n"].sum() == 4 * ev.count()


def test_session_window_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.windows import (session_window_agg,
                                                    session_window_agg_sql)
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    got = session_window_agg(ev)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    exp = con.execute(session_window_agg_sql()).df() \
        .sort_values(["user_id", "session_start_us"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) > 0
    # block-layout invariance: the one hash shuffle co-locates users
    got16 = session_window_agg(ev.repartition(16))
    pd.testing.assert_frame_equal(got16, got)


def test_session_window_gap_semantics(ray_session):
    """Handcrafted: gaps == gap keep the session; gaps > gap break it;
    users never merge."""
    from hecatoncheir_ray.functions.windows import session_window_agg
    base = np.datetime64("2024-01-01T00:00:00", "us")
    gap = 1_800_000_000  # 30 min (the default)
    ts = [base, base + gap, base + 2 * gap,          # user 1: one session
          base + 4 * gap + 1,                        # user 1: break (> gap)
          base, base + gap + 1]                      # user 2: break at 2nd
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime(np.array(ts)),
        "event_id": np.arange(6, dtype=np.int64),
        "value": np.zeros(6)})
    got = session_window_agg(rd.from_pandas(df), gap_us=gap)
    assert list(got["user_id"]) == [1, 1, 2, 2]
    assert list(got["n"]) == [3, 1, 1, 1]


def test_doc_sample_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.text import doc_sample_sql, ray_doc_sample
    got = ray_doc_sample(_docs_ds()).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = con.execute(doc_sample_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert 0 < len(got) < _docs_ds().count()


def test_top_tokens_vs_duckdb(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.text import ray_top_tokens, top_tokens_sql
    got = ray_top_tokens(_docs_ds(), k=20).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = con.execute(top_tokens_sql(20)).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 20


def test_ivf_store_prunes_and_recalls(ray_session, tmp_path):
    from hecatoncheir_ray.functions.simsearch import (ivf_probe_dirs,
                                                      topk_cosine_brute,
                                                      topk_cosine_ivf_store,
                                                      write_ivf_store)
    out = str(tmp_path / "ivf")
    write_ivf_store(_vecs_ds(), out, nlist=8)
    rows = _vecs_ds().take(3)
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    # nprobe == nlist reads every list -> exact brute parity
    got = topk_cosine_ivf_store(out, Q, k=10, nprobe=8)
    exp = topk_cosine_brute(_vecs_ds(), Q, k=10)
    assert list(zip(got["query_id"], got["vec_id"])) \
        == list(zip(exp["query_id"], exp["vec_id"]))
    # pruning actually prunes at small nprobe
    assert len(ivf_probe_dirs(out, Q, 2)) < len(ivf_probe_dirs(out, Q, 8))
    # and the self-vector is still found (it lives in a probed list)
    got2 = topk_cosine_ivf_store(out, Q, k=1, nprobe=2)
    self_ids = [int(r["vec_id"]) for r in rows]
    assert list(got2["vec_id"]) == self_ids


def test_ivf_store_from_kmeans_centroids(ray_session, tmp_path):
    """Full-corpus Lloyd centroids as the IVF trainer: nprobe == nlist
    stays exact, and every vector lands in its nearest-centroid list."""
    from hecatoncheir_ray.functions.clustering import kmeans_fit, _QS
    from hecatoncheir_ray.functions.simsearch import (topk_cosine_brute,
                                                      topk_cosine_ivf_store,
                                                      write_ivf_store)
    out = str(tmp_path / "ivf_km")
    C = kmeans_fit(_vecs_ds(), k=8, iters=3).astype(np.float64) / _QS
    write_ivf_store(_vecs_ds(), out, nlist=8, centroids=C)
    rows = _vecs_ds().take(3)
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    got = topk_cosine_ivf_store(out, Q, k=10, nprobe=8)
    exp = topk_cosine_brute(_vecs_ds(), Q, k=10)
    assert list(zip(got["query_id"], got["vec_id"])) \
        == list(zip(exp["query_id"], exp["vec_id"]))


def test_dedup_canonical_no_pairs(ray_session):
    # zero near-dup pairs must be a no-op, not a crash (ADVICE r3:
    # the isin mask indexed into an empty drop array)
    from hecatoncheir_ray.functions.dedup import dedup_canonical
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(20, dtype=np.int64),
         "text": [f"unique text {i}" for i in range(20)]}))
    pairs = pd.DataFrame({"doc_id_a": pd.Series([], dtype=np.int64),
                          "doc_id_b": pd.Series([], dtype=np.int64)})
    surv = dedup_canonical(docs, pairs).to_pandas()
    assert sorted(surv["doc_id"]) == list(range(20))


def test_dedup_canonical_join_path(ray_session):
    # broadcast_threshold=0 forces the left-semi hash-join (the 100 TB
    # path); result must match the broadcast path exactly
    from hecatoncheir_ray.functions.dedup import dedup_canonical
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(30, dtype=np.int64),
         "text": [f"t{i}" for i in range(30)]}))
    pairs = pd.DataFrame({"doc_id_a": np.array([0, 5, 5], dtype=np.int64),
                          "doc_id_b": np.array([7, 9, 21], dtype=np.int64)})
    via_join = dedup_canonical(docs, pairs,
                               broadcast_threshold=0).to_pandas()
    via_bcast = dedup_canonical(docs, pairs).to_pandas()
    assert sorted(via_join["doc_id"]) == sorted(via_bcast["doc_id"])
    assert 7 not in set(via_join["doc_id"])
    assert 9 not in set(via_join["doc_id"])
    assert 21 not in set(via_join["doc_id"])
    assert 0 in set(via_join["doc_id"]) and 5 in set(via_join["doc_id"])
