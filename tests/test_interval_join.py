"""Interval join (1-D spatial-engine embedding): brute parity with
boundary timestamps and intervals spanning many grid slices."""
import numpy as np
import pandas as pd
import ray.data as rd


def test_interval_join_vs_brute(ray_session):
    from hecatoncheir_ray.pipelines.interval_join import interval_join
    rng = np.random.default_rng(11)
    nl, nr = 300, 60
    t = rng.integers(0, 1_000_000, size=nl)
    s = rng.integers(0, 1_000_000, size=nr)
    # mix of tiny and huge intervals (huge ones overlap many grid slices)
    w = np.where(rng.random(nr) < 0.2,
                 rng.integers(200_000, 800_000, size=nr),
                 rng.integers(10, 5_000, size=nr))
    # force exact boundary hits: some left points ON starts and ends
    t[:10] = s[:10]
    t[10:20] = s[10:20] + w[10:20]
    left = pd.DataFrame({"event_id": np.arange(nl, dtype=np.int64),
                         "ts": t.astype(np.float64)})
    right = pd.DataFrame({"event_id": np.arange(nr, dtype=np.int64),
                          "start": s.astype(np.float64),
                          "end": (s + w).astype(np.float64)})
    got = interval_join(rd.from_pandas(left), rd.from_pandas(right),
                        ppd=32).to_pandas()
    exp = {(int(a), int(b))
           for a, tt in zip(left.event_id, left.ts)
           for b, ss, ee in zip(right.event_id, right.start, right.end)
           if ss <= tt <= ee}
    assert set(zip(got["r_id"], got["s_id"])) == exp
    assert len(got) == len(exp)          # no duplicate pairs
    assert len(exp) > 50


def test_interval_join_timestamps(ray_session):
    """datetime64 columns take the exact microsecond-epoch path."""
    from hecatoncheir_ray.pipelines.interval_join import interval_join
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": [base, base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=10, microseconds=1)]})
    right = pd.DataFrame({
        "event_id": np.array([100], dtype=np.int64),
        "start": [base],
        "end": [base + pd.Timedelta(minutes=10)]})
    got = interval_join(rd.from_pandas(left), rd.from_pandas(right)) \
        .to_pandas()
    assert sorted(got["r_id"]) == [0, 1, 2]   # end-inclusive, +1us is out


def test_interval_join_empty_side(ray_session):
    # an upstream filter matching nothing must yield an empty pair
    # Dataset, not a TypeError in the dataspace math (ADVICE r3)
    import ray.data as rd
    from hecatoncheir_ray.pipelines.interval_join import interval_join
    left = pd.DataFrame({"event_id": np.array([1, 2], dtype=np.int64),
                         "ts": np.array([5.0, 6.0])})
    right = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                          "start": pd.Series([], dtype=np.float64),
                          "end": pd.Series([], dtype=np.float64)})
    out = interval_join(rd.from_pandas(left), rd.from_pandas(right))
    assert out.count() == 0
    assert set(out.schema().names) == {"r_id", "s_id"}
