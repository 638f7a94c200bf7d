"""End-to-end corpus curation: the flagship training-data composition.

``curate_corpus`` chains the engine's text operators exactly the way a
100 TB pretraining pipeline does, each stage streaming into the next:

1. quality gate      — vectorized text stats (quality ratio, token count)
2. language gate     — n-gram-marker language ID
3. exact dedup       — md5 content groups, min doc_id survives (vectorized
                       per hash-partition, not per-group Python)
4. near-dup dedup    — MinHash-LSH pairs -> distributed connected
                       components -> canonical (min id) per cluster
5. deterministic sample — content-hash prefix, stable across reshards

Every stage is the already-oracled operator from ``functions/text`` /
``functions/dedup``; ``curate_corpus_sql`` composes their SQL twins in the
same order, so the whole pipeline is bit-exact checkable end-to-end."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data import Dataset

from ..functions.dedup import (dedup_canonical, minhash_near_dup_pairs,
                               minhash_near_dups_sql, near_dup_clusters_sql)
from ..functions.text import lang_id, lang_id_sql, text_stats, text_stats_sql


def gate_exact_dedup(docs: Dataset, min_quality: int = 815,
                     min_tokens: int = 20, lang: str = "en",
                     num_parts: int = 256) -> Dataset:
    """Stages 1-3 (quality gate -> language gate -> exact dedup) as one
    lazy Dataset of survivors (doc_id, text, token_count, quality_x1000,
    h).  Split out so the resumable runner (state.checkpoint.
    resumable_curation) can persist this stage boundary."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        st = text_stats(df)
        lg = lang_id(df)
        keep = ((st["quality_x1000"].to_numpy() >= min_quality)
                & (st["token_count"].to_numpy() >= min_tokens)
                & (lg["lang_guess"].to_numpy() == lang))
        text = df["text"].fillna("")
        h = text.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "text": text,
            "token_count": st["token_count"],
            "quality_x1000": st["quality_x1000"],
            "h": h})
        out = out[keep]
        out["hpart"] = pd.util.hash_array(
            out["h"].to_numpy(dtype=object)).astype(np.int64) % num_parts
        return out

    def exact_keep_min(g: pd.DataFrame) -> pd.DataFrame:
        """Min doc_id per content hash, vectorized over the partition."""
        if len(g) == 0:
            return g.drop(columns=["hpart"])
        g = g.sort_values(["h", "doc_id"])
        hs = g["h"].to_numpy()
        first = np.concatenate([[True], hs[1:] != hs[:-1]])
        return g[first].drop(columns=["hpart"])

    gated = docs.select_columns(["doc_id", "text"]) \
        .map_batches(gate, batch_format="pandas")
    return gated.groupby("hpart") \
        .map_groups(exact_keep_min, batch_format="pandas")


def sample_survivors(canon: Dataset, sample_hex_lt: str = "80") -> Dataset:
    """Stage 5: deterministic content-hash sample + final projection
    (doc_id, token_count, quality_x1000)."""
    k = len(sample_hex_lt)

    def sample_project(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["h"].str[:k] < sample_hex_lt
        out = df[keep]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy().astype(np.int64),
            "token_count": out["token_count"].to_numpy()
            .astype(np.int64),
            "quality_x1000": out["quality_x1000"].to_numpy()
            .astype(np.int64)})

    return canon.map_batches(sample_project, batch_format="pandas")


def curate_corpus(docs: Dataset, min_quality: int = 815,
                  min_tokens: int = 20, lang: str = "en",
                  threshold: float = 0.6, sample_hex_lt: str = "80",
                  num_parts: int = 256) -> Dataset:
    """-> Dataset(doc_id, token_count, quality_x1000) of surviving docs."""
    # Three downstream consumers fan out from the survivor set (pair
    # generation, cluster identity rows, canonical keep filter); pin the
    # blocks once so the gate + exact-dedup shuffle doesn't re-execute per
    # consumer.  Survivors are the post-gate minority of the corpus and
    # the object store spills, so this is cheaper than 3x recomputation.
    surv = gate_exact_dedup(docs, min_quality, min_tokens, lang,
                            num_parts).materialize()

    # pair set stays a Dataset in the object store — the driver never
    # sees documents, shingles, or pairs on this path
    pairs = minhash_near_dup_pairs(surv, threshold=threshold)
    canon = dedup_canonical(surv, pairs)
    return sample_survivors(canon, sample_hex_lt)


def curate_corpus_sql(min_quality: int = 815, min_tokens: int = 20,
                      lang: str = "en", threshold: float = 0.6,
                      sample_hex_lt: str = "80") -> str:
    """Composition of the stage oracles in pipeline order (stats/lang
    gates -> exact-dedup window -> embedded minhash + recursive-CTE
    clusters over the survivors -> canonical filter -> hash sample)."""
    k = len(sample_hex_lt)
    clusters = near_dup_clusters_sql(
        minhash_near_dups_sql(threshold=threshold, src="surv2"),
        src="surv2")
    return f"""
        WITH stats AS ({text_stats_sql()}),
        lang AS ({lang_id_sql()}),
        surv1 AS (
          SELECT d.doc_id, d.text
          FROM documents d
          JOIN stats s USING (doc_id) JOIN lang l USING (doc_id)
          WHERE s.quality_x1000 >= {min_quality}
            AND s.token_count >= {min_tokens}
            AND l.lang_guess = '{lang}'),
        surv2 AS (
          SELECT doc_id, text FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM surv1) WHERE rn = 1),
        clusters AS ({clusters})
        SELECT c.doc_id,
               s.token_count, s.quality_x1000
        FROM clusters c
        JOIN surv2 v USING (doc_id)
        JOIN stats s USING (doc_id)
        WHERE c.doc_id = c.cluster_id
          AND substr(md5(v.text), 1, {k}) < '{sample_hex_lt}'
    """
