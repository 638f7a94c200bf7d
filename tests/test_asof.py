"""As-of join tests: brute-force parity, ties, bucket-boundary carries,
and the DuckDB ASOF twin."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame, by=None):
    """Reference: per left row, right row with max (ts, event_id) among
    ts <= left.ts (and same key when keyed); inner."""
    out = []
    for lrow in left.itertuples():
        cand = right[right["ts"] <= lrow.ts]
        if by is not None:
            cand = cand[cand[by] == getattr(lrow, by)]
        if len(cand) == 0:
            continue
        best = cand.sort_values(["ts", "event_id"]).iloc[-1]
        rec = {"event_id": lrow.event_id, "ts": lrow.ts,
               "r_event_id": int(best["event_id"]),
               "r_value": float(best["value"])}
        if by is not None:
            rec[by] = getattr(lrow, by)
        out.append(rec)
    return pd.DataFrame(out)


def _rand_events(rng, n, users, tie_every=0):
    ts = pd.Timestamp("2024-01-01").value // 1000 \
        + rng.integers(0, 10_000_000, size=n)
    if tie_every:
        ts[::tie_every] = ts[0]          # force equal-timestamp groups
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, users, size=n).astype(np.int64),
        "value": rng.random(n).round(3)})


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("tie_every", [0, 7])
def test_asof_keyed_vs_brute(ray_session, tie_every):
    from hecatoncheir_ray.functions.asof import asof_join
    rng = np.random.default_rng(3)
    left = _rand_events(rng, 150, users=12)
    right = _rand_events(rng, 200, users=12, tie_every=tie_every)
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right)) \
        .to_pandas()
    want = _brute_asof(left, right, by="user_id")
    assert len(want) > 0
    _cmp(got, want)


@pytest.mark.parametrize("bucket_us", [3600 * 1_000_000, 250_000_000])
def test_asof_global_vs_brute(ray_session, bucket_us):
    """Small buckets force most matches through the carry path."""
    from hecatoncheir_ray.functions.asof import asof_join_global
    rng = np.random.default_rng(5)
    left = _rand_events(rng, 120, users=3)
    right = _rand_events(rng, 40, users=3, tie_every=9)
    got = asof_join_global(rd.from_pandas(left), rd.from_pandas(right),
                           bucket_us=bucket_us).to_pandas()
    want = _brute_asof(left, right, by=None)
    assert len(want) > 0
    _cmp(got, want[[c for c in want.columns if c != "user_id"]])


def test_asof_empty_sides(ray_session):
    from hecatoncheir_ray.functions.asof import (asof_join,
                                                 asof_join_global)
    rng = np.random.default_rng(1)
    ev = _rand_events(rng, 30, users=4)
    empty = ev.iloc[:0]
    for fn in (asof_join, asof_join_global):
        assert fn(rd.from_pandas(ev), rd.from_pandas(empty)).count() == 0


def test_asof_duckdb_twin(ray_session):
    import duckdb
    from hecatoncheir_ray.functions.asof import (asof_join,
                                                 asof_join_global,
                                                 asof_join_sql)
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    con = duckdb.connect()
    con.register("events", ev)
    clicks = rd.from_pandas(ev[ev.event_type == "click"]
                            .reset_index(drop=True))
    views = rd.from_pandas(ev[ev.event_type == "view"]
                           .reset_index(drop=True))
    _cmp(asof_join(clicks, views).to_pandas(),
         con.execute(asof_join_sql("click", "view", by=True)).df())
    errors = rd.from_pandas(ev[ev.event_type == "error"]
                            .reset_index(drop=True))
    _cmp(asof_join_global(errors, clicks).to_pandas(),
         con.execute(asof_join_sql("error", "click", by=False)).df())


def test_asof_string_right_payload(ray_session):
    # right payload column with a dtype the left side doesn't carry
    # (ADVICE r3: fillers probed the LEFT frame, so a string column got
    # float64 zeros on left batches and broke the union schema)
    from hecatoncheir_ray.functions.asof import asof_join
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame({
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=s) for s in (10, 20, 30)],
        "event_id": np.array([100, 101, 102], dtype=np.int64)})
    right = pd.DataFrame({
        "user_id": np.array([1, 2], dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=s) for s in (5, 25)],
        "event_id": np.array([7, 8], dtype=np.int64),
        "label": ["alpha", "beta"]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    right_cols=("event_id", "label")).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["r_label"].tolist() == ["alpha", "alpha", "beta"]
