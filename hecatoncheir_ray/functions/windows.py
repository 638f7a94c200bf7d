"""Windowed aggregation over the events stream table.

The reference has no streaming features (SURVEY §2.9); this is the
training-pipeline-shaped extension per the Ray guide's streaming-batch
pattern: the events log is treated as an ordered, partitioned stream;
tumbling windows become a per-batch partial aggregation followed by a
shuffle-side groupby-Sum over the already-collapsed (window x type)
partials — the driver only ever sees the final result rows, so the
pattern holds at any timespan x cardinality.

Integer arithmetic throughout for bit-exact SQL parity:
window_id = floor(epoch_us / window_us); values summed as
floor(value*1000 + 0.5) millis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

HOUR_US = 3_600_000_000


def _merge_partials(parts: Dataset) -> pd.DataFrame:
    """(window_id, event_type, n, value_milli) partials -> final sums,
    shuffle-side and integer-exact (sums of int64 partials are
    order-independent); driver-side only the final (windows x types)
    rows.  The merge is a hash-partitioned pandas reduce
    (idjoin.hash_group_reduce): window cardinality grows with the
    stream's timespan, past where Ray's sort-based aggregate's
    per-group coordination cost dominates."""
    from .idjoin import hash_group_reduce
    out = hash_group_reduce(
        parts, ["window_id", "event_type"],
        {"n": ("n", "sum"), "value_milli": ("value_milli", "sum")},
        num_parts=64).to_pandas()
    for c in ("window_id", "n", "value_milli"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["window_id", "event_type"]) \
        .reset_index(drop=True)


def tumbling_window_agg(events: Dataset,
                        window_us: int = HOUR_US) -> pd.DataFrame:
    """-> DataFrame(window_id, event_type, n, value_milli), sorted."""

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view("int64")
        win = ts // window_us
        typ = t["event_type"].to_pylist()
        val = t["value"].to_numpy(zero_copy_only=False)
        vm = np.floor(val * 1000 + 0.5).astype(np.int64)
        df = pd.DataFrame({"window_id": win, "event_type": typ,
                           "v": vm})
        g = df.groupby(["window_id", "event_type"], as_index=False).agg(
            n=("v", "size"), value_milli=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events.select_columns(["ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _merge_partials(parts)


def hopping_window_agg(events: Dataset, window_us: int = HOUR_US,
                       hop_us: int = HOUR_US // 4) -> pd.DataFrame:
    """Hopping (sliding) windows: window w covers [w*hop, w*hop + window).

    Each event explodes into the window/hop windows containing it inside
    the per-batch partial (np.repeat — no extra dataset pass), then the
    (windows x types) partials merge in a shuffle-side groupby Sum.
    Integer arithmetic matches the SQL twin exactly.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view("int64")
        w_hi = ts // hop_us
        w_lo = np.maximum((ts - window_us) // hop_us + 1, 0)
        reps = (w_hi - w_lo + 1).astype(np.int64)
        rows = np.repeat(np.arange(len(ts)), reps)
        offs = np.zeros(len(ts), dtype=np.int64)
        np.cumsum(reps[:-1], out=offs[1:])
        win = w_lo[rows] + (np.arange(len(rows)) - offs[rows])
        typ = np.asarray(t["event_type"].to_pylist(), dtype=object)[rows]
        vm = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000
                      + 0.5).astype(np.int64)[rows]
        g = pd.DataFrame({"window_id": win, "event_type": typ, "v": vm}) \
            .groupby(["window_id", "event_type"], as_index=False) \
            .agg(n=("v", "size"), value_milli=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events.select_columns(["ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow")
    return _merge_partials(parts)


def session_window_agg(events: Dataset, gap_us: int = HOUR_US // 2,
                       num_parts: int = 64) -> pd.DataFrame:
    """Gap-based session windows per user: a session is a maximal run of
    a user's events with consecutive gaps <= ``gap_us``.

    -> DataFrame(user_id, session_start_us, session_end_us, n,
    value_milli), sorted.

    Physical shape: ONE hash shuffle on user_id (sessionization needs a
    user's events co-located, nothing more — no global sort), then a
    fully vectorized per-partition kernel: sort by (user, ts, event_id),
    boundary flags via diff > gap, session ids via cumsum, one pandas
    groupby reduce.  Per-partition state is O(rows in partition); the
    driver sees only final session rows.  Ties on ts break by event_id
    on both sides, so the SQL twin is bit-exact."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy().astype(np.uint64)
        h = (u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        out = df[["user_id", "ts", "event_id", "value"]].copy()
        out["part"] = (h % np.uint64(num_parts)).astype(np.int64)
        return out

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").view("int64")
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        vm = np.floor(g["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        ts, uid, vm = ts[order], uid[order], vm[order]
        brk = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sess = np.cumsum(brk) - 1
        df = pd.DataFrame({"sess": sess, "user_id": uid, "tus": ts,
                           "vm": vm})
        red = df.groupby("sess", as_index=False, sort=False).agg(
            user_id=("user_id", "first"),
            session_start_us=("tus", "min"),
            session_end_us=("tus", "max"),
            n=("vm", "size"), value_milli=("vm", "sum"))
        return red.drop(columns=["sess"])

    out = events.select_columns(["user_id", "ts", "event_id", "value"]) \
        .map_batches(tag, batch_format="pandas") \
        .groupby("part").map_groups(kernel, batch_format="pandas") \
        .to_pandas()
    for c in ("user_id", "session_start_us", "session_end_us", "n",
              "value_milli"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "session_start_us"]) \
        .reset_index(drop=True)


def session_window_agg_sql(gap_us: int = HOUR_US // 2) -> str:
    """DuckDB twin: LAG-gap boundary flags + running SUM session ids."""
    return f"""
        WITH e AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus, event_id,
                 CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
          FROM events
        ),
        m AS (
          SELECT *, CASE WHEN tus - LAG(tus) OVER w > {gap_us}
                           OR LAG(tus) OVER w IS NULL
                    THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        ),
        s AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                   ORDER BY tus, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess
          FROM m
        )
        SELECT user_id, MIN(tus) AS session_start_us,
               MAX(tus) AS session_end_us, COUNT(*) AS n,
               CAST(SUM(vm) AS BIGINT) AS value_milli
        FROM s GROUP BY user_id, sess
    """


def hopping_window_agg_sql(window_us: int = HOUR_US,
                           hop_us: int = HOUR_US // 4) -> str:
    """DuckDB twin: explode via unnest(generate_series(w_lo, w_hi))."""
    return f"""
        WITH e AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS tus, event_type,
                 CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
          FROM events
        ),
        x AS (
          SELECT unnest(generate_series(
                     GREATEST((tus - {window_us}) // {hop_us} + 1, 0),
                     tus // {hop_us})) AS window_id,
                 event_type, vm
          FROM e
        )
        SELECT window_id, event_type, COUNT(*) AS n,
               CAST(SUM(vm) AS BIGINT) AS value_milli
        FROM x GROUP BY 1, 2
    """


def tumbling_window_agg_sql(window_us: int = HOUR_US) -> str:
    return f"""
        SELECT CAST(FLOOR(epoch_us(ts) / {window_us}) AS BIGINT)
                   AS window_id,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT))
                    AS BIGINT) AS value_milli
        FROM events GROUP BY 1, 2
    """
