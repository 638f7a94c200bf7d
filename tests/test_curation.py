"""End-to-end corpus curation: SQL-twin parity and per-stage behavior
(exact-dup drop, near-dup drop, sample) on a corpus built to exercise
every stage."""
import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _curation_corpus() -> pd.DataFrame:
    """English + German docs, exact duplicates, near duplicates, short and
    low-quality rows — every gate has work to do."""
    rng = np.random.default_rng(42)
    vocab = [f"w{c}{d}" for c in "abcdefghij" for d in range(10)]
    de = ("der schnelle braune fuchs springt und der hund schlaeft "
          "waehrend die und der katze das ist nicht ein gutes ende "
          "aber die geschichte ist der beste freund und das war es")
    rows = []
    for i in range(8):                       # genuinely distinct english
        words = rng.choice(vocab, size=40, replace=False).tolist()
        rows.append((i, "the value row " + " ".join(words)
                     + " the a value"))
    rows.append((100, rows[0][1]))           # exact duplicate of doc 0
    rows.append((101, rows[1][1]))           # exact duplicate of doc 1
    near = rows[2][1]
    # near-dup of 2: change ONE word out of ~46 (char-Jaccard >> 0.6)
    rows.append((102, near.replace(near.split()[10], "changedword", 1)))
    rows.append((200, de + " " + de))        # german -> lang gate
    rows.append((201, "short text"))         # token gate
    rows.append((202, "a b " * 120))         # works either way (quality)
    return pd.DataFrame({"doc_id": np.array([r[0] for r in rows],
                                            dtype=np.int64),
                         "text": [r[1] for r in rows]})


def test_curation_sql_twin(ray_session):
    from hecatoncheir_ray.pipelines.curation import (curate_corpus,
                                                     curate_corpus_sql)
    df = _curation_corpus()
    kwargs = dict(min_quality=700, min_tokens=10, lang="en",
                  threshold=0.6, sample_hex_lt="c0")
    got = curate_corpus(rd.from_pandas(df), **kwargs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(curate_corpus_sql(**kwargs) + " ORDER BY 1").df()
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    surv = set(exp["doc_id"])
    assert 100 not in surv and 101 not in surv     # exact dups dropped
    assert 102 not in surv                         # near dup dropped
    assert 200 not in surv and 201 not in surv     # lang/token gates
    assert len(surv) > 0


def test_curation_stages_drop_correct_rows(ray_session):
    """With a permissive sample the survivor set is exactly the gated,
    deduped doc ids."""
    from hecatoncheir_ray.pipelines.curation import curate_corpus
    df = _curation_corpus()
    got = curate_corpus(rd.from_pandas(df), min_quality=700,
                        min_tokens=10, lang="en", threshold=0.6,
                        sample_hex_lt="zz").to_pandas()
    surv = set(got["doc_id"])
    # docs 0..7 unique english; 100/101 exact dups of 0/1; 102 near-dup
    # of 2; 200 german; 201 too short; 202 quality-dependent but english
    assert set(range(8)).issubset(surv)
    assert surv.isdisjoint({100, 101, 102, 200, 201})
