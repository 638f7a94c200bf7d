"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Every operator ships in two forms:
* a vectorized Ray stage (``map_batches`` over pandas/arrow), and
* for the driver's correctness gate, an exact ANSI-SQL twin
  (``*_SQL`` strings) whose arithmetic is written to be bit-identical
  (integer scores, fixed marker lists, md5 fingerprints).

Stats columns are integers on purpose: float ratios would make the value
hash fragile across engines; the integer forms (x1000 scaled, counts) are
exact in both.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_WS = re.compile(r"\s")

# language marker tokens (padded-space matching), fixed priority order for
# argmax ties: en > de > fr > es > zh
LANG_MARKERS = {
    "en": ["the", "a", "value", "row"],
    "de": ["der", "und", "tabelle", "wert"],
    "fr": ["le", "et", "valeur", "ligne"],
    "es": ["el", "y", "valor", "fila"],
    "zh": ["big", "merge", "window", "join"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]

STOPWORDS = ["the", "a", "and", "of", "to"]


def _count_sub(padded: pd.Series, token: str) -> pd.Series:
    pat = f" {token} "
    return ((padded.str.len() - padded.str.replace(pat, "", regex=False)
             .str.len()) // len(pat)).astype(np.int64)


def text_stats(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> integer stats columns."""
    text = df["text"].fillna("")
    stripped = text.str.strip()
    token_count = stripped.str.split().str.len().fillna(0).astype(np.int64)
    token_count = token_count.where(stripped.str.len() > 0, 0)
    char_count = text.str.len().astype(np.int64)
    token_chars = text.str.replace(_WS, "", regex=True).str.len() \
        .astype(np.int64)
    quality = (token_chars * 1000) // np.maximum(char_count, 1)
    padded = " " + text.str.lower() + " "
    stop_count = sum(_count_sub(padded, t) for t in STOPWORDS) \
        .astype(np.int64)
    return pd.DataFrame({
        "doc_id": df["doc_id"].astype(np.int64),
        "token_count": token_count,
        "char_count": char_count,
        "token_chars": token_chars,
        "quality_x1000": quality.astype(np.int64),
        "stop_count": stop_count,
    })


TEXT_STATS_SQL = """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS token_count,
           length(text) AS char_count,
           length(regexp_replace(text, '\\s', '', 'g')) AS token_chars,
           CAST(FLOOR((length(regexp_replace(text, '\\s', '', 'g'))
                       * 1000.0)
                      / GREATEST(length(text), 1)) AS BIGINT)
               AS quality_x1000,
           {stop_expr} AS stop_count
    FROM documents
"""


def _sql_count_sub(token: str) -> str:
    pat = f" {token} "
    return (f"(length(' ' || lower(text) || ' ') - "
            f"length(replace(' ' || lower(text) || ' ', '{pat}', '')))"
            f" / {len(pat)}")


def text_stats_sql() -> str:
    stop = " + ".join(_sql_count_sub(t) for t in STOPWORDS)
    return TEXT_STATS_SQL.format(stop_expr=f"CAST({stop} AS BIGINT)")


def lang_id(df: pd.DataFrame) -> pd.DataFrame:
    """Marker-count language heuristic, deterministic priority tiebreak."""
    padded = " " + df["text"].fillna("").str.lower() + " "
    counts = {}
    for lang in LANG_ORDER:
        c = sum(_count_sub(padded, t) for t in LANG_MARKERS[lang])
        counts[lang] = c.astype(np.int64)
    best = pd.Series("en", index=df.index)
    best_n = counts["en"].copy()
    for lang in LANG_ORDER[1:]:
        better = counts[lang] > best_n
        best = best.where(~better, lang)
        best_n = best_n.where(~better, counts[lang])
    return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                         "lang_guess": best})


def lang_id_sql() -> str:
    exprs = {lang: "(" + " + ".join(_sql_count_sub(t)
                                    for t in LANG_MARKERS[lang]) + ")"
             for lang in LANG_ORDER}
    # strict > against current best, in priority order == argmax-first-wins
    cond_de = f"{exprs['de']} > {exprs['en']}"
    cond_fr = (f"{exprs['fr']} > GREATEST({exprs['en']}, {exprs['de']})")
    cond_es = (f"{exprs['es']} > GREATEST({exprs['en']}, {exprs['de']}, "
               f"{exprs['fr']})")
    cond_zh = (f"{exprs['zh']} > GREATEST({exprs['en']}, {exprs['de']}, "
               f"{exprs['fr']}, {exprs['es']})")
    return f"""
        SELECT doc_id,
               CASE WHEN {cond_zh} THEN 'zh'
                    WHEN {cond_es} THEN 'es'
                    WHEN {cond_fr} THEN 'fr'
                    WHEN {cond_de} THEN 'de'
                    ELSE 'en' END AS lang_guess
        FROM documents
    """


def fingerprints(df: pd.DataFrame) -> pd.DataFrame:
    """md5 content fingerprint (exact-dedup key; SQL twin: md5(text))."""
    fp = df["text"].fillna("").map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                         "fp": fp})


FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


# BPE-ish subword pre-tokenization: letter runs, digit runs, single other
# non-space chars (the GPT-2 pre-tokenizer shape, simplified to a class
# pattern both Python re and DuckDB's RE2 interpret identically)
_BPE_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_counts(df: pd.DataFrame) -> pd.DataFrame:
    counts = df["text"].fillna("").str.count(_BPE_PAT).astype(np.int64)
    return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                         "bpe_tokens": counts})


BPE_TOKENS_SQL = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT)
               AS bpe_tokens
    FROM documents
"""

ray_bpe_token_counts = None  # set below after _pandas_stage is defined


def rolling_fingerprint(text: str, window: int = 16,
                        base: int = 257, mod: int = (1 << 61) - 1
                        ) -> np.ndarray:
    """Rabin-Karp rolling hashes of every ``window``-byte span (library
    function for content-defined chunking; tested against a naive oracle)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8) \
        .astype(np.int64)
    n = len(data)
    if n < window:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(n - window + 1, dtype=np.int64)
    h = 0
    for i in range(window):
        h = (h * base + int(data[i])) % mod
    out[0] = h
    top = pow(base, window - 1, mod)
    for i in range(1, n - window + 1):
        h = ((h - int(data[i - 1]) * top) * base + int(data[i + window - 1])) % mod
        out[i] = h % mod
    return out


# ---------------------------------------------------------------------------
# Ray wrappers
# ---------------------------------------------------------------------------

def _pandas_stage(fn):
    def stage(ds: Dataset) -> Dataset:
        return ds.map_batches(fn, batch_format="pandas")
    return stage


ray_text_stats = _pandas_stage(text_stats)
ray_lang_id = _pandas_stage(lang_id)
ray_fingerprints = _pandas_stage(fingerprints)
ray_bpe_token_counts = _pandas_stage(bpe_token_counts)


def ray_doc_sample(docs, hex_lt: str = "29"):
    """Deterministic content-hash sampling: keep rows whose md5(text) hex
    prefix is lexicographically below ``hex_lt`` (p = int(hex_lt,16)/256
    for a 2-char prefix).  Content-keyed, so the sample is stable across
    reshards/reruns — the property a training-data pipeline needs from a
    sampler (row-position sampling changes under repartition).

    SQL twin: WHERE substr(md5(text), 1, len) < hex_lt."""
    import pandas as pd

    k = len(hex_lt)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _h
        pref = df["text"].fillna("").map(
            lambda s: _h.md5(s.encode()).hexdigest()[:k])
        keep = pref < hex_lt
        return pd.DataFrame({"doc_id": df["doc_id"][keep].astype("int64"),
                             "h_prefix": pref[keep]})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(pick, batch_format="pandas")


def doc_sample_sql(hex_lt: str = "29") -> str:
    k = len(hex_lt)
    return (f"SELECT doc_id, substr(md5(text), 1, {k}) AS h_prefix "
            f"FROM documents WHERE substr(md5(text), 1, {k}) < '{hex_lt}'")


def ray_top_tokens(docs, k: int = 20):
    """Top-k corpus tokens by count (whitespace split, single-space
    semantics for SQL parity; empty tokens from runs of spaces excluded).

    Scale shape: per-batch token-count partials -> ONE hash-partitioned
    pandas groupby-sum (vocabulary cardinality — far past Ray's
    sort-aggregate per-group cost) -> per-partition top-k (sound: every
    token is fully reduced inside one partition) -> the driver merges
    only partitions x k rows, never the vocabulary.
    Deterministic order: count desc, token asc."""
    import pandas as pd

    from .idjoin import hash_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ").explode()
        toks = toks[toks.astype(bool)]          # drop empty tokens
        c = toks.value_counts()
        return pd.DataFrame({"token": c.index.astype(str),
                             "n": c.to_numpy().astype("int64")})

    agg = hash_group_reduce(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pandas"),
        ["token"], {"n": ("n", "sum")}, num_parts=64)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)

    out = agg.map_batches(local_topk, batch_format="pandas").to_pandas()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "token"],
                          ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def top_tokens_sql(k: int = 20) -> str:
    return f"""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY 1 ORDER BY n DESC, token ASC LIMIT {k}
    """
