"""Benchmark harness (BASELINE.md): headline spatial joins at sf0.1.

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...}, "sf": ..., "num_cpus": N, "rows_per_sec": {...}}

--scaling: runs the headline twice in fresh subprocesses at 8 and 32 CPUs
and reports throughputs + scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# polygon layer sizing: rows tied to the sf tier via the orders table
_POLY_KW = dict(min_edge=0.02, max_edge=0.12, min_v=5, max_v=24)


def _calibrate(reps: int = 3) -> float:
    """Machine-speed probe: min wall-time (ms) of a fixed single-thread
    numpy sort over a seeded 4M-float array.  On a quiet box the min is
    stable run-to-run, so co-tenant CPU steal during a bench run shows
    up in the recorded number itself (the load-normalized protocol of
    BENCH/BASELINE.md — container loadavg is blind to sibling
    containers, this probe is not)."""
    import numpy as np

    arr = np.random.default_rng(42).random(4_000_000)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.sort(arr)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000.0, 1)


def _load_1m() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return -1.0


def _tune_context(ctx):
    """Session tuning measured in BENCH/BASELINE.md:

    * small target block sizes -> the sort emits ~4x num_cpus reduce blocks
      so the join kernel packs without stragglers (default 128 MiB blocks
      collapsed the kernel stage to 16 tasks with a 17 s straggler);
    * op resource reservation off -> the streaming executor stops holding
      CPU slots for idle downstream operators in these short multi-stage
      pipelines (~2.5 s per query at 8 CPUs).
    """
    ctx.target_min_block_size = 1
    ctx.target_max_block_size = 16 * 1024 * 1024
    ctx.op_resource_reservation_enabled = False


def _table_rows(name: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(f"{SF_DIR}/{name}.parquet").num_rows


def _wait_for_quiet(max_wait_s: float, threshold_ms: float = 75.0):
    """Bounded launch gate: if the calibration probe shows co-tenant CPU
    steal (>= threshold_ms; quiet band on this box is 49-67 ms, see
    BENCH/BASELINE.md), sleep and re-probe for up to max_wait_s before
    starting the timed run.  Multi-minute sibling-container bursts are
    the one thing min-of-2-alternated reps cannot absorb; a short wait
    dodges launching straight into one.  Returns (probes, waited_s)."""
    probes = [_calibrate()]
    t0 = time.time()
    while probes[-1] >= threshold_ms and time.time() - t0 < max_wait_s:
        time.sleep(45)
        probes.append(_calibrate())
    return probes, round(time.time() - t0, 1)


def run_bench() -> dict:
    import ray

    # calibrate BEFORE ray.init: the worker-pool fork/import burst at
    # session start otherwise inflates the probe by ~30%
    load0 = _load_1m()
    probes, waited = _wait_for_quiet(
        float(os.environ.get("BENCH_QUIET_WAIT_S", "240")))
    calib0 = probes[-1]

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.pipelines.distance_join import distance_join
    from hecatoncheir_ray.sources import derive
    from hecatoncheir_ray.sources.synth import ray_layer
    from hecatoncheir_ray.config import TIGER_US_BOUNDS

    n_orders = _table_rows("orders")
    n_events = _table_rows("events")
    bounds = (TIGER_US_BOUNDS[0] - 0.5, TIGER_US_BOUNDS[1] - 0.5,
              TIGER_US_BOUNDS[2] + 0.5, TIGER_US_BOUNDS[3] + 0.5)

    def cfg(ppd):
        # synthetic layers are uniform by construction: skip the auto-salt
        # detection pass so the timing stays kernel-bound
        return EngineConfig(dataspace=bounds, ppd=ppd, auto_salt=False)

    # warm page cache (untimed)
    derive.ray_points_events(SF_DIR).count()

    # Q1: polygon x polygon intersection join (T1NA/T2NA-style headline)
    def poly_poly():
        r = ray_layer("polygons", n_orders, seed=1, **_POLY_KW)
        s = ray_layer("polygons", n_orders, seed=2, **_POLY_KW)
        return spatial_join(r, s, "intersects", cfg(192)).count()

    # Q2: point x polygon join (point-in-polygon headline)
    def point_poly():
        pts = derive.ray_points_events(SF_DIR)
        polys = ray_layer("polygons", n_orders, seed=2, **_POLY_KW)
        return spatial_join(pts, polys, "intersects", cfg(192)).count()

    # Q3: box x box join over testdata-derived layers
    def box_join():
        return spatial_join(derive.ray_boxes_orders(SF_DIR),
                            derive.ray_boxes_part(SF_DIR),
                            "intersects", cfg(128)).count()

    # Q4: distance join (epsilon) on event points
    def dist_join():
        return distance_join(derive.ray_points_events(SF_DIR),
                             derive.ray_points_events(SF_DIR), 0.05,
                             cfg(128)).count()

    NAMED = [("poly_poly_join", poly_poly), ("point_poly_join", point_poly),
             ("box_join", box_join), ("distance_join", dist_join)]
    # min of 2 ALTERNATED reps per query (the BENCH/BASELINE.md noise
    # protocol): one co-tenant burst can no longer poison the recorded
    # suite number, and first-rep warmup (fresh-process numpy/JIT paths)
    # stops leaking into the measurement
    queries, rows_per_sec, result_rows = {}, {}, {}
    for rep in range(2):
        for name, fn in NAMED:
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            if name in result_rows and result_rows[name] != n:
                raise AssertionError(f"{name}: row count changed between "
                                     f"reps ({result_rows[name]} vs {n})")
            result_rows[name] = n
            if name not in queries or dt < queries[name]:
                queries[name] = dt
    for name, _ in NAMED:
        dt = queries[name]
        queries[name] = round(dt, 3)
        rows_per_sec[name] = round(result_rows[name] / dt, 1)

    total = round(sum(queries.values()), 3)
    out = {"metric": "spatial_join_suite_seconds", "value": total,
           "unit": "sec", "queries": queries, "rows_per_sec": rows_per_sec,
           "result_rows": result_rows, "reps": 2, "agg": "min",
           "sf": SF_DIR, "num_cpus": NUM_CPUS,
           # co-tenant interference evidence (see _calibrate): quiet-box
           # reference for calib_ms is recorded in BENCH/BASELINE.md
           "load_1m": [load0, _load_1m()],
           "calib_ms": [calib0, _calibrate()],
           # launch gate: calib probes taken before starting (>= 75 ms
           # means co-tenant steal; bounded wait, see _wait_for_quiet)
           "launch_probes_ms": probes, "quiet_waited_s": waited}
    ray.shutdown()
    return out


def run_heavy() -> dict:
    """Scaling-criterion workload: compute-dominated joins, 2 warm reps per
    query, min taken (absorbs session startup + scheduler noise so the
    measurement reflects throughput, not fixed overhead)."""
    import ray

    load0, calib0 = _load_1m(), _calibrate()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune_context(ctx)

    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.sources.synth import ray_layer
    from hecatoncheir_ray.config import TIGER_US_BOUNDS

    bounds = (TIGER_US_BOUNDS[0] - 0.5, TIGER_US_BOUNDS[1] - 0.5,
              TIGER_US_BOUNDS[2] + 0.5, TIGER_US_BOUNDS[3] + 0.5)
    cfg = EngineConfig(dataspace=bounds, ppd=192, auto_salt=False)
    KW = dict(min_edge=0.03, max_edge=0.3, min_v=8, max_v=48)
    N_POLY = 300000
    N_PTS = 4000000
    # blocks sized to the session's parallelism: the streaming executor's
    # driver loop is single-threaded, so hundreds of excess tiny tasks put
    # a fixed serial floor under every run (dominant at low CPU counts)
    PAR = max(4 * NUM_CPUS, 8)

    def poly_poly():
        return spatial_join(
            ray_layer("polygons", N_POLY, seed=1, parallelism=PAR, **KW),
            ray_layer("polygons", N_POLY, seed=2, parallelism=PAR, **KW),
            "intersects", cfg)

    def point_poly():
        return spatial_join(
            ray_layer("points", N_PTS, seed=3, parallelism=PAR),
            ray_layer("polygons", N_POLY, seed=2, parallelism=PAR, **KW),
            "intersects", cfg)

    # warm the worker pool
    ray_layer("points", 10000, seed=9).count()
    queries, rows_per_sec, result_rows = {}, {}, {}
    for name, make in [("poly_poly_join", poly_poly),
                       ("point_poly_join", point_poly)]:
        best, rows = None, 0
        for _ in range(3):
            t0 = time.time()
            rows = make().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        rows_per_sec[name] = round(rows / best, 1)
        result_rows[name] = rows
    total = round(sum(queries.values()), 3)
    out = {"metric": "heavy_join_seconds", "value": total, "unit": "sec",
           "queries": queries, "rows_per_sec": rows_per_sec,
           "result_rows": result_rows, "num_cpus": NUM_CPUS,
           "load_1m": [load0, _load_1m()],
           "calib_ms": [calib0, _calibrate()]}
    ray.shutdown()
    return out


def run_april() -> dict:
    """APRIL pays-for-itself demonstration (reference raison d'être,
    src/APRIL/generate.cpp + join.cpp, S8/S9 persist usage): dense
    many-vertex polygon join with the intermediate filter off vs on
    reading PERSISTED APRIL columns (generation is the one-time S8 pass,
    exactly how the reference amortizes it)."""
    import shutil
    import time as _t

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune_context(ctx)

    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.april import load_april, persist_april
    from hecatoncheir_ray.sources.synth import ray_layer
    from hecatoncheir_ray.config import TIGER_US_BOUNDS

    b = (TIGER_US_BOUNDS[0] - 0.5, TIGER_US_BOUNDS[1] - 0.5,
         TIGER_US_BOUNDS[2] + 0.5, TIGER_US_BOUNDS[3] + 0.5)
    N, ORDER = 20000, 10
    # raster resolution matched to geometry extent: ~5 cells across a
    # polygon keeps interval lists in the tens (decisive yet cheap to ship
    # through the shuffle); higher orders make list volume dominate
    KW = dict(min_edge=0.05, max_edge=0.5, min_v=48, max_v=160)
    ray_layer("points", 10000, seed=9).count()
    import json as _json
    import os as _os
    meta = {"N": N, "order": ORDER, **KW}
    t0 = _t.time()
    for seed, name in [(1, "r"), (2, "s")]:
        mpath = f"/tmp/hec_april_{name}/_APRIL_META.json"
        try:
            if _json.load(open(mpath)) == meta:
                continue          # S8 output cached from a previous run
        except (OSError, ValueError):
            pass
        shutil.rmtree(f"/tmp/hec_april_{name}", ignore_errors=True)
        persist_april(ray_layer("polygons", N, seed=seed, parallelism=16,
                                **KW),
                      f"/tmp/hec_april_{name}", b, ORDER)
        _json.dump(meta, open(mpath, "w"))
    persist_sec = round(_t.time() - t0, 3)
    # persisted list columns make Ray's size estimate ~10x pessimistic ->
    # SplitBlocks shards reads into ~150-row blocks and task dispatch
    # dominates; restore coarse block targets for the query phase
    ctx.target_min_block_size = 1024 * 1024
    ctx.target_max_block_size = 128 * 1024 * 1024
    out = {"metric": "april_filter_seconds", "unit": "sec", "N": N,
           "order": ORDER, "persist_sec": persist_sec,
           "num_cpus": NUM_CPUS}
    best = {"filter_off": None, "filter_on": None}
    rows = 0
    for _ in range(3):            # alternate: co-tenant noise pairs off
        for label, flt in [("filter_off", False), ("filter_on", True)]:
            cfg = EngineConfig(dataspace=b, ppd=128, auto_salt=False,
                               intermediate_filter=flt, april_n=ORDER)
            if flt:
                r = load_april("/tmp/hec_april_r")
                s = load_april("/tmp/hec_april_s")
            else:
                r = ray_layer("polygons", N, seed=1, parallelism=16, **KW)
                s = ray_layer("polygons", N, seed=2, parallelism=16, **KW)
            t0 = _t.time()
            rows = spatial_join(r, s, "intersects", cfg).count()
            dt = _t.time() - t0
            if best[label] is None or dt < best[label]:
                best[label] = dt
    out["filter_off"] = round(best["filter_off"], 3)
    out["filter_on"] = round(best["filter_on"], 3)
    out["rows"] = rows
    out["value"] = out["filter_on"]
    out["speedup"] = round(out["filter_off"] / out["filter_on"], 3)

    # broadcast path, same persisted layers (r5: APRIL on the zero-
    # shuffle join — S interval lists built once before the pin, R's per
    # batch).  Same alternated min-of-3 protocol.
    from hecatoncheir_ray.pipelines.spatial_join import \
        spatial_join_broadcast
    bbest = {"bcast_off": None, "bcast_on": None}
    brows = 0
    for _ in range(3):
        for label, flt in [("bcast_off", False), ("bcast_on", True)]:
            cfg = EngineConfig(dataspace=b, ppd=128, auto_salt=False,
                               intermediate_filter=flt, april_n=ORDER)
            if flt:
                r = load_april("/tmp/hec_april_r")
                s = load_april("/tmp/hec_april_s")
            else:
                r = ray_layer("polygons", N, seed=1, parallelism=16, **KW)
                s = ray_layer("polygons", N, seed=2, parallelism=16, **KW)
            t0 = _t.time()
            brows = spatial_join_broadcast(r, s, "intersects", cfg,
                                           concurrency=NUM_CPUS).count()
            dt = _t.time() - t0
            if bbest[label] is None or dt < bbest[label]:
                bbest[label] = dt
    assert brows == rows, "broadcast/shuffle row-count divergence"
    out["bcast_filter_off"] = round(bbest["bcast_off"], 3)
    out["bcast_filter_on"] = round(bbest["bcast_on"], 3)
    out["bcast_speedup"] = round(bbest["bcast_off"] / bbest["bcast_on"],
                                 3)
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """North-rule criterion, sandbox form (BASELINE.md): the identical heavy
    job at N and 4N CPUs in fresh processes; efficiency =
    (T_N / T_4N) / 4.  Measured at two N-to-4N pairs: 2->8 and 8->32
    (the single box shares one DRAM bus across all cores, so the high-core
    pair understates multi-node scaling where every node brings its own
    memory bandwidth; both are reported).

    Runs the full 2->8->32 cycle SCALING_CYCLES times (default 2) and takes
    the per-level minimum across cycles — the default suite's
    min-of-alternated-reps protocol lifted to level granularity.  A
    co-tenant burst long enough to contaminate one whole level (observed:
    multi-minute sibling-container steal, BENCH/BASELINE.md round-5
    addenda) rarely spans the same level in both cycles; the min per level
    estimates the quiet-box time.  Every cycle's raw seconds and calib/load
    probes are reported so a contaminated cycle stays auditable."""

    cycles = int(os.environ.get("SCALING_CYCLES", "2"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__, "--heavy"],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    runs = {2: [], 8: [], 32: []}
    for _ in range(cycles):
        for ncpu in (2, 8, 32):
            runs[ncpu].append(run(ncpu))

    def best(ncpu: int) -> dict:
        # per-level min across cycles, picked on total seconds; per-query
        # seconds are minimized independently (a burst can straddle the
        # boundary between the two queries within a level)
        rs = runs[ncpu]
        b = dict(min(rs, key=lambda r: r["value"]))
        b["queries"] = {q: min(r["queries"][q] for r in rs)
                        for q in rs[0]["queries"]}
        b["rows_per_sec"] = {
            q: round(rs[0]["result_rows"][q] / b["queries"][q], 1)
            for q in b["queries"]}
        b["value"] = round(sum(b["queries"].values()), 3)
        return b

    r2, r8, r32 = best(2), best(8), best(32)
    eff_2_8 = (r2["value"] / r8["value"]) / 4
    eff_8_32 = (r8["value"] / r32["value"]) / 4
    per_q = {q: round((r2["queries"][q] / r8["queries"][q]) / 4, 3)
             for q in r2["queries"]}
    return {"metric": "scaling_efficiency",
            "sec_2": r2["value"], "sec_8": r8["value"],
            "sec_32": r32["value"],
            "value": round(eff_2_8, 3), "unit": "efficiency",
            "efficiency_2_to_8": round(eff_2_8, 3),
            "efficiency_8_to_32": round(eff_8_32, 3),
            "efficiency_2_to_8_per_query": per_q,
            "queries_2": r2["queries"], "queries_8": r8["queries"],
            "queries_32": r32["queries"],
            "rows_per_sec_2": r2["rows_per_sec"],
            "rows_per_sec_8": r8["rows_per_sec"],
            "rows_per_sec_32": r32["rows_per_sec"], "sf": SF_DIR,
            "cycles": cycles,
            "cycle_sec": {str(n): [r["value"] for r in runs[n]]
                          for n in (2, 8, 32)},
            "load_1m": {str(n): [r["load_1m"] for r in runs[n]]
                        for n in (2, 8, 32)},
            "calib_ms": {str(n): [r["calib_ms"] for r in runs[n]]
                         for n in (2, 8, 32)}}


def run_skew() -> dict:
    """Skew-handling benchmark: a pathological point layer (60% of rows
    stacked on ONE coordinate — identical MBRs, the case geometric
    sub-cell splitting cannot separate) joined against a box layer, under
    the three skew modes.  Result parity is asserted; walls show the
    strategies' effect.  Min of 2 alternated reps per mode."""
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    import ray.data as rd
    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.sources.synth import synth_points
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune_context(ctx)

    B = (0.0, 0.0, 64.0, 64.0)
    n = 200_000
    ids = np.arange(n, dtype=np.int64)
    pts = synth_points(ids, seed=11, bounds=B)
    x = pts["minx"].to_numpy(zero_copy_only=False).copy()
    y = pts["miny"].to_numpy(zero_copy_only=False).copy()
    x[:int(n * 0.6)] = 13.37          # degenerate hot spot
    y[:int(n * 0.6)] = 13.37
    flat = np.empty(2 * n)
    flat[0::2] = x
    flat[1::2] = y
    offs = np.arange(0, 2 * n + 1, 2, dtype=np.int32)
    stacked = pa.table({
        "id": pts["id"], "gtype": pts["gtype"],
        "coords": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
        "minx": pa.array(x), "miny": pa.array(y),
        "maxx": pa.array(x), "maxy": pa.array(y)})
    # S side: a background grid PLUS 20k tiny boxes stacked at the same
    # hot coordinate (offset so they match no point: the blowup is the
    # n_r x n_s candidate work inside one group, not the result size).
    # Both sides identical-MBR at one spot => geometric splitting leaves
    # one sub-cell with ALL the work; only hash-salting spreads it.
    k = np.arange(4096, dtype=np.int64)
    bx = (k % 64).astype(float)
    by = (k // 64).astype(float)
    hs = 20_000
    hminx = np.concatenate([bx, np.full(hs, 13.3705)])
    hminy = np.concatenate([by, np.full(hs, 13.3705)])
    hmaxx = np.concatenate([bx + 1.0, np.full(hs, 13.3710)])
    hmaxy = np.concatenate([by + 1.0, np.full(hs, 13.3710)])
    nb = 4096 + hs
    boxes = pa.table({
        "id": pa.array(np.arange(nb, dtype=np.int64) + 1_000_000),
        "gtype": pa.array(np.full(nb, 4, np.int8)),
        "coords": pa.ListArray.from_arrays(
            pa.array(np.arange(0, 4 * nb + 1, 4, dtype=np.int32)),
            pa.array(np.stack([hminx, hminy, hmaxx, hmaxy],
                              axis=1).ravel())),
        "minx": pa.array(hminx), "miny": pa.array(hminy),
        "maxx": pa.array(hmaxx), "maxy": pa.array(hmaxy)})

    modes = {
        "no_salting": dict(auto_salt=False),
        "split": dict(skew_strategy="split", hot_cell_rows=4096),
        "salt": dict(skew_strategy="salt", hot_cell_rows=4096),
    }
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(2):
        for label, kw in modes.items():
            cfg = EngineConfig(dataspace=B, ppd=64, salt_factor=16, **kw)
            t0 = time.time()
            n_out = spatial_join(
                rd.from_arrow(stacked).map_batches(
                    lambda t: t, batch_format="pyarrow", batch_size=8192),
                rd.from_arrow(boxes), "covered_by", cfg).count()
            dt = time.time() - t0
            rows[label] = n_out
            if label not in best or dt < best[label]:
                best[label] = dt
    assert len(set(rows.values())) == 1, rows   # parity across modes
    ray.shutdown()
    return {"metric": "skew_join_seconds", "unit": "sec",
            "value": round(best["salt"], 3),
            "queries": {m: round(s, 3) for m, s in best.items()},
            "result_rows": rows["salt"], "stacked_fraction": 0.6,
            "num_cpus": NUM_CPUS}


def run_knnjoin() -> dict:
    """kNN-join throughput at the bench tier: events subset (id % 25 == 0)
    vs all event points, k=5 (same shape as the driver query)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import __ray_entry__ as entrymod

    best, rows = None, 0
    for _ in range(2):
        t0 = time.time()
        rows = len(entrymod.queries()["knn_join_points"](SF_DIR)
                   .to_pandas())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ray.shutdown()
    return {"metric": "knn_join_seconds", "value": round(best, 3),
            "unit": "sec", "result_rows": rows,
            "rows_per_sec": round(rows / best, 1),
            "sf": SF_DIR, "num_cpus": NUM_CPUS}


def run_quantiles(n: int = 20_000_000):
    """Exact-quantile throughput on a synthetic double column (n rows,
    deterministic splitmix values).  Reports wall, refinement passes, and
    rows/sec — the operator is pass-bound: total work ~ passes * one
    column scan, zero shuffle."""
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hecatoncheir_ray.functions import quantiles as qmod
    from hecatoncheir_ray.functions.dedup import _mix

    def gen(b):
        i = b["id"].to_numpy().astype(np.uint64)
        return __import__("pandas").DataFrame(
            {"x": _mix(i).astype(np.float64) / 2**64 * 2e6 - 1e6})

    ds = rd.range(n).map_batches(gen, batch_format="pandas") \
        .materialize()  # pin so reps time the operator, not generation
    qs = [0.1, 0.5, 0.9, 0.99]

    best = None
    for _ in range(2):
        t0 = time.time()
        res = qmod.exact_quantiles(ds, "x", qs)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ray.shutdown()
    return {"metric": "exact_quantiles_seconds", "value": round(best, 3),
            "unit": "sec", "rows": n, "quantiles": qs,
            "rows_per_sec": round(n / best, 1),
            "values": res["value"].round(3).tolist(),
            "num_cpus": NUM_CPUS}


def run_minhash() -> dict:
    """MinHash-LSH shuffle-volume accounting (VERDICT r3 #1): bytes that
    cross the all-to-all under the round-4 layout (3-int band rows + the
    shingle table shipped once per attach side) vs the round-3 layout
    (full shingle set + signature riding EVERY band row), plus end-to-end
    wall and the verified pair count (which must not change)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from hecatoncheir_ray.functions.dedup import (char_shingles,
                                                  minhash_band_rows,
                                                  minhash_near_dups,
                                                  minhash_signature,
                                                  shingle_table)

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    n_docs = docs.count()

    band = minhash_band_rows(docs).materialize()
    sh = shingle_table(docs).materialize()
    # new layout: band rows cross the LSH groupby once; the shingle table
    # crosses one attach shuffle per pair side (pair rows are pair-scale)
    new_bytes = band.size_bytes() + 2 * sh.size_bytes()

    bands, num_perm, r, seed, k = 32, 64, 2, 1, 5

    def old_rows(df: pd.DataFrame) -> pd.DataFrame:
        # the round-3 row layout, rebuilt for measurement only
        bks, dids, sigs, shs = [], [], [], []
        for did, text in zip(df["doc_id"], df["text"].fillna("")):
            s = char_shingles(text, k)
            sig = minhash_signature(s, num_perm, seed)
            for b in range(bands):
                key = hashlib.blake2b(sig[b * r:(b + 1) * r].tobytes(),
                                      digest_size=8).hexdigest()
                bks.append(f"{b:02d}:{key}")
                dids.append(int(did))
                sigs.append(sig)
                shs.append(s)
        return pd.DataFrame({"bucket": bks, "doc_id": dids,
                             "sig": sigs, "shingles": shs})

    old = docs.map_batches(old_rows, batch_format="pandas").materialize()
    old_bytes = old.size_bytes()

    t0 = time.time()
    pairs = minhash_near_dups(docs)
    wall = time.time() - t0
    ray.shutdown()
    return {"metric": "minhash_shuffle_bytes", "docs": n_docs,
            "new_shuffle_bytes": new_bytes, "old_shuffle_bytes": old_bytes,
            "new_bytes_per_doc": round(new_bytes / n_docs, 1),
            "old_bytes_per_doc": round(old_bytes / n_docs, 1),
            "amplification_drop": round(old_bytes / new_bytes, 2),
            "pipeline_seconds": round(wall, 3), "pairs": len(pairs),
            "sf": SF_DIR, "num_cpus": NUM_CPUS}


def run_multimodal() -> dict:
    """Multimodal actor-pool stage throughput (input_hint path): mixed
    PNG/JPEG decode, JPEG verify (PSNR invariant), WAV feature
    extraction, HECV frame sampling — rows/s per stage, pure-Python
    codecs."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from hecatoncheir_ray.sources.audio import AudioFeatures, \
        ray_audio_table
    from hecatoncheir_ray.sources.images import (DecodeImages,
                                                 make_verify_fn,
                                                 ray_image_table)
    from hecatoncheir_ray.sources.video import (SampleVideoFrames,
                                                ray_video_table)

    stages = {}

    def timed(name, build):
        t0 = time.time()
        n = build().count()
        dt = time.time() - t0
        stages[name] = {"rows": n, "sec": round(dt, 3),
                        "rows_per_sec": round(n / dt, 1)}

    n_img, n_aud, n_vid = 2000, 1200, 400
    imgs = ray_image_table(n_img, seed=42, fmt="mixed").materialize()
    timed("image_decode_mixed", lambda: imgs.map_batches(
        DecodeImages, concurrency=(2, 8), batch_size=64,
        batch_format="pyarrow"))
    jpg = ray_image_table(n_img // 2, seed=42, fmt="jpeg").materialize()
    timed("jpeg_verify_psnr", lambda: jpg.map_batches(
        make_verify_fn(42), batch_format="pyarrow", batch_size=64))
    aud = ray_audio_table(n_aud, seed=42, fmts="mixed").materialize()
    timed("audio_features_mixed_codec", lambda: aud.map_batches(
        AudioFeatures, concurrency=(2, 8), batch_format="pyarrow",
        batch_size=128))
    vid = ray_video_table(n_vid, seed=42, fmts="mixed").materialize()
    timed("video_frame_sample_mixed_codec", lambda: vid.map_batches(
        SampleVideoFrames, concurrency=(2, 8), batch_format="pyarrow",
        batch_size=64))
    ray.shutdown()
    return {"metric": "multimodal_stage_throughput", "stages": stages,
            "num_cpus": NUM_CPUS}


def run_raster() -> dict:
    """Raster <-> vector throughput at SF_DIR scale: density raster
    build (tile_counts_ds), polygonize (raster_regions), zonal stats
    over the orders octagons (broadcast + shuffle paths), exact tile
    cover of the part octagons and event polylines."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from hecatoncheir_ray.config import EngineConfig, GridSpec
    from hecatoncheir_ray.config import TIGER_US_BOUNDS
    from hecatoncheir_ray.pipelines.tiling import (raster_regions,
                                                   tile_assignments,
                                                   tile_cover_exact,
                                                   tile_counts_ds,
                                                   zonal_stats)
    from hecatoncheir_ray.sources import derive

    grid = GridSpec(*TIGER_US_BOUNDS, ppd=64)   # 4096 tiles at sf0.1
    cfg = EngineConfig(dataspace=TIGER_US_BOUNDS, ppd=64)
    n_pts = _table_rows("events")
    stages = {}

    def timed(name, build, rows=None):
        t0 = time.time()
        n = build().count()
        dt = time.time() - t0
        r = rows if rows is not None else n
        stages[name] = {"result_rows": n, "sec": round(dt, 3),
                        "rows_per_sec": round(r / dt, 1)}

    tiles = tile_counts_ds(
        tile_assignments(derive.ray_points_events(SF_DIR), grid))
    # time the materialize itself: the artifact every later stage uses
    # (a timed count() would re-execute the point shuffle a second time)
    t0 = time.time()
    tiles = tiles.materialize()
    dt = time.time() - t0
    stages["tile_counts_raster"] = {
        "result_rows": tiles.count(), "sec": round(dt, 3),
        "rows_per_sec": round(n_pts / dt, 1)}
    thr = 1 + n_pts // (grid.ppd * grid.ppd)
    timed("raster_regions", lambda: raster_regions(tiles, grid, thr),
          rows=n_pts)
    zones = derive.ray_octagons_orders(SF_DIR)
    timed("zonal_stats_broadcast",
          lambda: zonal_stats(tiles, zones, grid, cfg=cfg))
    timed("zonal_stats_shuffle",
          lambda: zonal_stats(tiles, zones, grid, cfg=cfg,
                              broadcast=False))
    timed("tile_cover_exact_polygons",
          lambda: tile_cover_exact(derive.ray_octagons_part(SF_DIR),
                                   grid, cfg))
    timed("tile_cover_exact_lines",
          lambda: tile_cover_exact(derive.ray_lines_events(SF_DIR),
                                   grid, cfg))
    from hecatoncheir_ray.pipelines.tiling import zonal_area_weights
    timed("zonal_area_weights",
          lambda: zonal_area_weights(zones, grid))
    from hecatoncheir_ray.pipelines.hexgrid import (hex_assignments,
                                                    hex_counts,
                                                    hex_regions)
    cells = hex_counts(
        hex_assignments(derive.ray_points_events(SF_DIR), 0.5)) \
        .materialize()
    timed("hex_regions",
          lambda: hex_regions(cells, 0.5, 2 + n_pts // 3300),
          rows=n_pts)
    ray.shutdown()
    return {"metric": "raster_vector_throughput", "stages": stages,
            "points": n_pts, "ppd": grid.ppd,
            "sf": SF_DIR, "num_cpus": NUM_CPUS}


def _membw_worker(kind: str, barrier, out, slot: int) -> None:
    """One weak-scaling worker: identical work per process; all workers
    start together on the barrier so the max per-worker elapsed is the
    level's wall time with spawn overhead excluded."""
    import numpy as np

    if kind == "stream":
        # DRAM-streaming profile: 3 x 32 MB float64 arrays, elementwise
        # fused ops + reduction — the traffic shape of the padded
        # pre-optimization join kernel (every rep walks ~128 MB).
        rng = np.random.default_rng(1000 + slot)
        a = rng.random(4_000_000)
        b = rng.random(4_000_000)
        c = np.empty_like(a)
        reps = 120
    else:
        # Cache-resident profile: same op mix over a 256 KB array, so
        # the working set lives in L2 — the shape of the shipped
        # per-ring cache-blocked PiP kernel.
        rng = np.random.default_rng(2000 + slot)
        a = rng.random(32_000)
        b = rng.random(32_000)
        c = np.empty_like(a)
        reps = 15000
    barrier.wait()
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        np.multiply(a, b, out=c)
        c += a
        acc += float(c[::1024].sum())
    out[slot] = time.perf_counter() - t0
    if acc == -1.0:  # pragma: no cover - keep acc live against DCE
        print(acc)


def run_membw() -> dict:
    """Ray-free multiprocessing control for the eff(8->32) falloff
    (BENCH/BASELINE.md "why 2->8 is the honest N->4N stand-in").

    Weak scaling at 2/8/32 single-threaded processes, two kernels with
    the SAME instruction mix but different working sets:

      stream — 96 MB/process (DRAM-bandwidth-bound)
      cache  — 256 KB/process (core-bound, L2-resident)

    If `cache` holds near-linear efficiency 8->32 while `stream`
    collapses, the socket's one shared DRAM bus — not Ray, not the
    pipeline — is what caps aggregate eff(8->32); per-node behavior on
    a real N->4N cluster (each node owning its own DRAM) matches the
    <=8-process regime.  Zero Ray imports in this path.
    """
    import multiprocessing as mp

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    ctx = mp.get_context("spawn")
    levels = [2, 8, 32]
    out: dict = {"metric": "membw_control", "levels": levels,
                 "load_1m": {"start": _load_1m()},
                 "calib_ms": {"start": _calibrate()}, "kernels": {}}
    for kind in ("stream", "cache"):
        walls = {}
        for n in levels:
            best = float("inf")
            for _rep in range(3):
                barrier = ctx.Barrier(n)
                arr = ctx.Array("d", n)
                procs = [ctx.Process(target=_membw_worker,
                                     args=(kind, barrier, arr, i))
                         for i in range(n)]
                for p in procs:
                    p.start()
                for p in procs:
                    p.join()
                best = min(best, max(arr[:]))
            walls[n] = round(best, 3)
        # weak scaling: throughput = n / wall; eff(a->b) = (thr_b/thr_a)/(b/a)
        thr = {n: n / walls[n] for n in levels}
        out["kernels"][kind] = {
            "wall_s": walls,
            "eff_2_8": round((thr[8] / thr[2]) / 4, 3),
            "eff_8_32": round((thr[32] / thr[8]) / 4, 3),
        }
    out["load_1m"]["end"] = _load_1m()
    out["calib_ms"]["end"] = _calibrate()
    return out


def run_rowscale() -> dict:
    """Data-size scaling at fixed CPUs — the other axis of the 100 TB
    extrapolation: --scaling shows throughput grows with workers on a
    fixed input; this shows wall time grows ~linearly with input rows
    at constant workers.  The R side is swept 1x/2x/4x with S fixed so
    expected output (and useful work) scales ~linearly; 2 alternated
    cycles, per-level minima.  linearity(1->4) = 4*t_1x/t_4x: 1.0 is
    perfectly linear, >1 means fixed per-query cost amortizes away at
    scale, <0.8 would flag a superlinear blowup."""
    import ray

    load0, calib0 = _load_1m(), _calibrate()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune_context(ctx)

    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.sources.synth import ray_layer
    from hecatoncheir_ray.config import TIGER_US_BOUNDS

    bounds = (TIGER_US_BOUNDS[0] - 0.5, TIGER_US_BOUNDS[1] - 0.5,
              TIGER_US_BOUNDS[2] + 0.5, TIGER_US_BOUNDS[3] + 0.5)
    cfg = EngineConfig(dataspace=bounds, ppd=192, auto_salt=False)
    KW = dict(min_edge=0.03, max_edge=0.3, min_v=8, max_v=48)
    N_POLY, N_PTS = 150000, 2000000
    PAR = max(4 * NUM_CPUS, 8)
    MULTS = (1, 2, 4)

    def poly_poly(k):
        return spatial_join(
            ray_layer("polygons", k * N_POLY, seed=1, parallelism=k * PAR,
                      **KW),
            ray_layer("polygons", 2 * N_POLY, seed=2, parallelism=2 * PAR,
                      **KW),
            "intersects", cfg)

    def point_poly(k):
        return spatial_join(
            ray_layer("points", k * N_PTS, seed=3, parallelism=k * PAR),
            ray_layer("polygons", 2 * N_POLY, seed=2, parallelism=2 * PAR,
                      **KW),
            "intersects", cfg)

    ray_layer("points", 10000, seed=9).count()    # warm the pool
    walls = {name: {k: None for k in MULTS}
             for name in ("poly_poly_join", "point_poly_join")}
    rows = {name: {} for name in walls}
    for _ in range(2):
        for k in MULTS:
            for name, make in [("poly_poly_join", poly_poly),
                               ("point_poly_join", point_poly)]:
                t0 = time.time()
                n = make(k).count()
                dt = time.time() - t0
                w = walls[name][k]
                walls[name][k] = dt if w is None else min(w, dt)
                rows[name][k] = n
    out = {"metric": "rowscale_linearity", "unit": "ratio",
           "multipliers": list(MULTS), "num_cpus": NUM_CPUS,
           "wall_s": {n: {k: round(v, 3) for k, v in w.items()}
                      for n, w in walls.items()},
           "result_rows": rows,
           "pairs_per_sec": {n: {k: round(rows[n][k] / w[k], 1)
                                 for k in MULTS}
                             for n, w in walls.items()},
           "linearity_1_to_4": {n: round(4 * w[1] / w[4], 3)
                                for n, w in walls.items()},
           "load_1m": [load0, _load_1m()],
           "calib_ms": [calib0, _calibrate()]}
    out["value"] = min(out["linearity_1_to_4"].values())
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--heavy" in sys.argv:
        print(json.dumps(run_heavy()))
    elif "--april" in sys.argv:
        print(json.dumps(run_april()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--knnjoin" in sys.argv:
        print(json.dumps(run_knnjoin()))
    elif "--quantiles" in sys.argv:
        print(json.dumps(run_quantiles()))
    elif "--minhash" in sys.argv:
        print(json.dumps(run_minhash()))
    elif "--multimodal" in sys.argv:
        print(json.dumps(run_multimodal()))
    elif "--raster" in sys.argv:
        print(json.dumps(run_raster()))
    elif "--membw" in sys.argv:
        print(json.dumps(run_membw()))
    elif "--rowscale" in sys.argv:
        print(json.dumps(run_rowscale()))
    else:
        print(json.dumps(run_bench()))
