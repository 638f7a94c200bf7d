"""Partitioned spatial join — the engine's core pipeline.

Physical shape (SURVEY.md §3 EP1 rebuild):
``read -> map_batches(cell assign, replicated) -> union(R,S) ->
groupby(cell_id) -> map_groups(MBR candidates + dedup + refine) -> pairs``.

One all-to-all shuffle total (the groupby); the reference's partition +
buildIndex + query phases (MPI batch shipping, per-node TwoLayerIndex,
OpenMP sweeps — src/env/partitioning.cpp, src/containers.cpp:930-1089,
src/TwoLayer/*.cpp) collapse into it.

Scale levers:
* ``cfg.ppd`` sizes shuffle groups (the reference's ppdNum=872 analog).
* hot-cell salting (``detect_hot_cells`` + salted assignment) caps group
  size under skew; dedup still exact (grid.ref_point_key).
* only geometry columns ride the shuffle — payload columns are re-attached
  by id afterwards if needed (attach_payload).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Max, Min

from ..config import EngineConfig
from ..stages.assign import GEOM_COLS, make_assign_fn
from ..stages.sweep import make_join_kernel

PREDICATES = ("intersects", "inside", "disjoint", "equal", "meet",
              "contains", "covers", "covered_by", "find_relation")


def compute_dataspace(*datasets: Dataset) -> tuple[float, float, float, float]:
    """Global bounds via Min/Max aggregation over the MBR columns.

    Reference: the metadata scan + OpenMP min/max reduction
    (src/env/partitioning.cpp:119-199) and
    DatasetOptions::updateDataspace (union of R,S dataspaces).
    Costs one streaming pass over 4 columns per dataset.
    """
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for ds in datasets:
        agg = ds.select_columns(["minx", "miny", "maxx", "maxy"]).aggregate(
            Min("minx", alias_name="minx"), Min("miny", alias_name="miny"),
            Max("maxx", alias_name="maxx"), Max("maxy", alias_name="maxy"))
        minx = min(minx, agg["minx"])
        miny = min(miny, agg["miny"])
        maxx = max(maxx, agg["maxx"])
        maxy = max(maxy, agg["maxy"])
    # widen a hair so max-edge points fall inside the last cell
    w = max(maxx - minx, 1e-9) * 1e-9
    h = max(maxy - miny, 1e-9) * 1e-9
    return (minx - w, miny - h, maxx + w, maxy + h)


def detect_hot_cells(r: Dataset, s: Dataset, cfg: EngineConfig,
                     grid) -> np.ndarray:
    """SAMPLED pre-pass: per-cell replicated-row counts over a
    deterministic coordinate-hash row sample -> cells above the (scaled)
    cfg.hot_cell_rows threshold.

    Hot cells are by definition heavy, so a small sample finds them: at
    the default fraction (cfg.hot_cell_sample = 1/64) a truly hot cell
    (> hot_cell_rows = 4096 replicas) is expected to contribute > 64
    sampled replicas, and we flag at HALF the scaled threshold — a 2x
    safety margin against sample-hash variance (false positives only
    cost splitting a merely-large cell, which is harmless; the fraction
    is floored so the expected hot-cell sample count is >= 32).  With
    fraction 1 (small thresholds, unit tests) the result is bit-identical
    to the exhaustive count with cutoff > hot_cell_rows.

    The sample hash mixes the bit patterns of all 4 MBR coordinates, so
    the decision is stable across resharding / block layout.  Streams
    only the 4 MBR columns once per side; each batch emits a SPARSE
    (cell, n) partial over *sampled* rows, merged sparsely on the driver
    (no ppd^2 dense array — at ppd=4096 that was a 128 MB driver alloc)."""
    from ..functions.dedup import _mix
    from ..grid import explode_cells

    frac = min(1.0, max(float(cfg.hot_cell_sample),
                        32.0 / max(cfg.hot_cell_rows, 1)))
    # threshold in SAMPLED units; margin 0.5 when sampling, exact when not
    cutoff = (float(cfg.hot_cell_rows) if frac >= 1.0
              else max(8.0, frac * cfg.hot_cell_rows * 0.5))
    keep_below = np.uint64(int(frac * 2.0**64)) if frac < 1.0 else None

    def hist(batch):
        import pyarrow as pa
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        if keep_below is not None:
            h = _mix(minx.view(np.uint64)
                     ^ _mix(miny.view(np.uint64)
                            ^ _mix(maxx.view(np.uint64)
                                   ^ _mix(maxy.view(np.uint64)))))
            keep = h < keep_below
            minx, miny = minx[keep], miny[keep]
            maxx, maxy = maxx[keep], maxy[keep]
        _, cells = explode_cells(grid, minx, miny, maxx, maxy)
        uc, cnt = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uc, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    parts_c, parts_n = [], []
    for side in (r, s):
        part = side.select_columns(["minx", "miny", "maxx", "maxy"]) \
            .map_batches(hist, batch_format="pyarrow")
        for b in part.iter_batches(batch_format="pyarrow"):
            parts_c.append(b["cell"].to_numpy(zero_copy_only=False))
            parts_n.append(b["n"].to_numpy(zero_copy_only=False))
    if not parts_c:
        return np.zeros(0, dtype=np.int64)
    cells = np.concatenate(parts_c)
    ns = np.concatenate(parts_n)
    uc, inv = np.unique(cells, return_inverse=True)
    total = np.zeros(len(uc), dtype=np.int64)
    np.add.at(total, inv, ns)
    return uc[total > cutoff].astype(np.int64)


def _april_reusable(ds: Dataset, order: int, bounds) -> bool:
    """True when ``ds`` already carries april_all/april_full columns
    whose persisted raster (bounds, order) matches this join's raster
    space (schema metadata written by persist_april).  A mismatched or
    unverifiable persisted raster must be regenerated — interval lists
    from different raster spaces are not comparable."""
    from ..april import april_meta_of
    if "april_all" not in ds.schema().names:
        return False
    m = april_meta_of(ds)
    if m is None:
        # in-pipeline columns (no persist roundtrip): trust the caller,
        # matching pre-metadata behavior
        return True
    return (m.get("order") == order
            and len(m.get("bounds", [])) == 4
            and all(float(a) == float(b)
                    for a, b in zip(m["bounds"], bounds)))


def spatial_join(r: Dataset, s: Dataset, predicate: str = "intersects",
                 cfg: EngineConfig | None = None,
                 hot_cells: np.ndarray | None = None,
                 slice_id: tuple[int, int] | None = None,
                 metrics_scope: str | None = None) -> Dataset:
    """Predicate join R x S -> Dataset(r_id, s_id[, relation]).

    ``predicate`` one of PREDICATES; 'find_relation' adds a ``relation:int8``
    column (TR_* codes, geometry.predicates.TR_NAMES).
    ``slice_id=(k, n)`` restricts to shuffle partitions with part%n==k (the
    resumable-execution unit, state.checkpoint); ``metrics_scope`` routes
    kernel counters to the named metrics actor.
    """
    if predicate not in PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    cfg = cfg or EngineConfig()
    bounds = cfg.dataspace or compute_dataspace(r, s)
    grid = cfg.make_grid(bounds)
    if hot_cells is None and cfg.auto_salt:
        hot_cells = detect_hot_cells(r, s, cfg, grid)
    r2 = r.select_columns(GEOM_COLS)
    s2 = s.select_columns(GEOM_COLS)
    keep_cols = list(GEOM_COLS)
    if cfg.intermediate_filter:
        # APRIL generation stage (ST2: once per object, BEFORE replication;
        # the interval columns ride the shuffle like the reference ships
        # AprilData with its objects).  Inputs that already carry the
        # columns (load_april, reference S9) skip regeneration — but ONLY
        # when the persisted raster (bounds, order) matches this join's
        # raster space (schema metadata written by persist_april); a
        # mismatched or unverifiable persisted raster is regenerated, as
        # interval lists from different raster spaces are not comparable.
        from ..april import make_april_fn
        gen = make_april_fn(bounds, cfg.april_n)

        def reusable(ds) -> bool:
            return _april_reusable(ds, cfg.april_n, bounds)

        if reusable(r):
            r2 = r.select_columns(GEOM_COLS + ["april_all", "april_full"])
        else:
            r2 = r2.map_batches(gen, batch_format="pyarrow")
        if reusable(s):
            s2 = s.select_columns(GEOM_COLS + ["april_all", "april_full"])
        else:
            s2 = s2.map_batches(gen, batch_format="pyarrow")
        keep_cols += ["april_all", "april_full"]
    # assign is cheap: bundle small input blocks up to assign_batch_size
    # rows per task (fewer tiny tasks).  NEVER when the APRIL generator is
    # fused in the same chain -- bundling would cap the expensive stage to
    # one task per 32k rows (measured: one 24s task for a whole layer).
    bs = None if cfg.intermediate_filter else cfg.assign_batch_size
    r2 = r2.map_batches(
        make_assign_fn(grid, 0, hot_cells, cfg.salt_factor,
                       skew_strategy=cfg.skew_strategy,
                       keep_cols=keep_cols,
                       shuffle_parts=cfg.shuffle_parts),
        batch_format="pyarrow", batch_size=bs)
    s2 = s2.map_batches(
        make_assign_fn(grid, 1, hot_cells, cfg.salt_factor,
                       skew_strategy=cfg.skew_strategy,
                       keep_cols=keep_cols,
                       shuffle_parts=cfg.shuffle_parts),
        batch_format="pyarrow", batch_size=bs)
    both = r2.union(s2)
    if slice_id is not None:
        k, n = slice_id
        import pyarrow as _pa

        def keep_slice(t):
            part = t["part"].to_numpy(zero_copy_only=False)
            return t.filter(_pa.array((part % n) == k))

        both = both.map_batches(keep_slice, batch_format="pyarrow")
    kernel = make_join_kernel(cfg, grid, predicate, hot_cells,
                              metrics_scope=metrics_scope)
    # shuffle on the coarse hashed partition; the kernel fans back out to
    # fine cells internally (numpy sort, no per-cell task overhead)
    return both.groupby("part").map_groups(kernel, batch_format="pyarrow")


# Auto broadcast-vs-shuffle switch point: above this many S rows the
# broadcast path was measured SLOWER than the grid shuffle on this repo's
# own bench (BENCH/BASELINE.md "Zonal path note": 150k zones broadcast =
# 1.2-2.5x the shuffle wall), and every actor pays an S-index build in
# __init__.  32k rows of (id, gtype, coords, mbr) stays comfortably in
# worker heap and amortizes the per-actor build.
BROADCAST_MAX_ROWS = 32768


def spatial_join_auto(r: Dataset, s: Dataset,
                      predicate: str = "intersects",
                      cfg: EngineConfig | None = None,
                      broadcast: bool | str = "auto",
                      broadcast_max_rows: int = BROADCAST_MAX_ROWS,
                      concurrency: int = 32) -> Dataset:
    """Predicate join that picks the physical plan from S's size.

    ``broadcast="auto"`` (default) probes S with a BOUNDED prefix count
    — ``s.limit(max_rows + 1).count()`` — so the decision never scans
    more than ``broadcast_max_rows + 1`` rows no matter how large S is
    (streaming limit; parquet reads push the limit down).  S at or under
    the threshold routes to the zero-shuffle
    :func:`spatial_join_broadcast`; anything larger takes the grid
    shuffle :func:`spatial_join`.  ``broadcast=True`` / ``False`` force
    a path explicitly.  Both paths produce identical pair sets (parity
    tested), so the switch is purely physical.
    """
    if broadcast == "auto":
        broadcast = (s.limit(broadcast_max_rows + 1).count()
                     <= broadcast_max_rows)
    if broadcast:
        return spatial_join_broadcast(r, s, predicate, cfg,
                                      concurrency=concurrency)
    return spatial_join(r, s, predicate, cfg)


def spatial_join_semi(r: Dataset, s: Dataset,
                      predicate: str = "intersects",
                      cfg: EngineConfig | None = None,
                      anti: bool = False,
                      broadcast: bool | str = "auto",
                      num_parts: int = 256) -> Dataset:
    """Spatial semi join (``anti=False``: rows of R with at least one S
    match under ``predicate``) / anti join (``anti=True``: rows of R with
    none).  Output schema == R's schema, one row per qualifying R row —
    never duplicated by match multiplicity.

    The existential form of the reference's predicate joins
    (src/TwoLayer/ — which always emit pairs); the curation filter of the
    north rule's 10^12-image use case ("keep only images inside / outside
    the regions of interest") wants R rows back, not pairs.  Physical
    plan: the pair join (plan picked by :func:`spatial_join_auto` from
    S's size), matched ids deduplicated per batch, then a reduce-side id
    semi/anti join (functions.idjoin.filter_by_ids — one hash shuffle,
    searchsorted membership per partition).  R's payload columns never
    ride the pair exchange: only (r_id) leaves the join; the id filter
    ships R rows once.
    """
    if predicate == "find_relation":
        # find_relation emits one row per candidate pair WHATEVER the
        # relation (including disjoint) — existentially meaningless;
        # filter on a concrete predicate instead
        raise ValueError("spatial_join_semi needs a boolean predicate, "
                         "not find_relation")
    pairs = spatial_join_auto(r, s, predicate, cfg, broadcast=broadcast)

    def dedupe(t: pa.Table) -> pa.Table:
        u = np.unique(t["r_id"].to_numpy(zero_copy_only=False))
        return pa.table({"r_id": pa.array(u, type=pa.int64())})

    matched = pairs.select_columns(["r_id"]).map_batches(
        dedupe, batch_format="pyarrow")
    from ..functions.idjoin import filter_by_ids
    return filter_by_ids(r, "id", matched, "r_id", keep=not anti,
                         num_parts=num_parts)


def spatial_join_broadcast(r: Dataset, s: Dataset,
                           predicate: str = "intersects",
                           cfg: EngineConfig | None = None,
                           concurrency: int = 32) -> Dataset:
    """Zero-shuffle predicate join for a SMALL S side (broadcast join).

    The scale rationale: when one side (typically the polygon layer — a
    country/admin table is thousands of rows against 10^12 points) fits
    in worker memory, the grid shuffle moves the ENTIRE big side through
    the object store for nothing.  Here S is pinned once as Arrow block
    refs (``ray.put`` semantics — one copy in the object store per node,
    every actor maps it zero-copy), each actor builds a cell-bucket
    index over S's MBRs ONCE in ``__init__``, and R streams through
    ``map_batches`` unshuffled and unreplicated.  Exactly-once is
    structural (each R row is seen by exactly one task), so no
    reference-point dedup is needed.  Same candidate generation
    (grid buckets + MBR test) and the SAME refinement kernels
    (stages/sweep.refine_mask / classify_relations) as the shuffle
    path — results are identical by construction.

    ``cfg.intermediate_filter`` turns on the APRIL intermediate filter
    (J5/J6) on this path too: S's interval lists are built ONCE —
    distributed, before the pin — and each actor generates R's lists
    per batch, so the 6x kernel-CPU win ``bench.py --april`` measures
    for heavy polygon sides applies without any shuffle.  Off by
    default: for a small/cheap S the per-batch R rasterization costs
    more than the refinement it skips (see BASELINE.md APRIL notes).
    """
    import pyarrow as pa
    from ..grid import explode_cells
    from ..stages.assign import geoms_from_table
    from ..stages.sweep import (PAIR_SCHEMA, REL_SCHEMA, _list_col_np,
                                classify_relations, refine_mask)
    if predicate not in PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    cfg = cfg or EngineConfig()
    bounds = cfg.dataspace or compute_dataspace(r, s)
    grid = cfg.make_grid(bounds)
    find_rel = predicate == "find_relation"
    schema = REL_SCHEMA if find_rel else PAIR_SCHEMA

    use_april = cfg.intermediate_filter
    gen = None
    if use_april:
        from ..april import make_april_fn
        gen = make_april_fn(bounds, cfg.april_n)
        if _april_reusable(s, cfg.april_n, bounds):
            s_prep = s.select_columns(GEOM_COLS
                                      + ["april_all", "april_full"])
        else:
            # rasterize BEFORE the pin: distributed tasks, once per S row
            s_prep = s.select_columns(GEOM_COLS) \
                .map_batches(gen, batch_format="pyarrow")
    else:
        s_prep = s.select_columns(GEOM_COLS)
    s_mat = s_prep.materialize()
    if s_mat.count() == 0:
        return ray.data.from_arrow(schema.empty_table())
    # block refs, not take_all: blocks stay in the object store; actors
    # deserialize them zero-copy (no driver round-trip of the payload)
    s_refs = s_mat.to_arrow_refs()

    class BroadcastJoin:
        def __init__(self):
            import ray as _ray
            tabs = [t for t in _ray.get(list(s_refs)) if len(t)]
            st = pa.concat_tables(tabs).combine_chunks()
            (self.s_ids, self.s_gt, self.s_offs, self.s_vals,
             self.s_minx, self.s_miny, self.s_maxx,
             self.s_maxy) = geoms_from_table(st)
            # Arrow list offsets are int32; the combined-SoA arithmetic
            # below must not wrap once S+batch values pass 2^31
            self.s_offs = self.s_offs.astype(np.int64)
            self.n_s = len(self.s_ids)
            if use_april:
                sao, sav = _list_col_np(st, "april_all")
                sfo, sfv = _list_col_np(st, "april_full")
                self.s_april = (np.asarray(sao, dtype=np.int64), sav,
                                np.asarray(sfo, dtype=np.int64), sfv)
            # cell -> S-row bucket index (CSR over sorted unique cells)
            srow, scell = explode_cells(grid, self.s_minx, self.s_miny,
                                        self.s_maxx, self.s_maxy)
            order = np.argsort(scell, kind="stable")
            self.bucket_rows = srow[order]
            cells_sorted = scell[order]
            self.cells, starts = np.unique(cells_sorted, return_index=True)
            self.starts = np.concatenate(
                [starts, [len(cells_sorted)]]).astype(np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            geo_r = geoms_from_table(t)
            (r_ids, r_gt, r_offs, r_vals,
             r_minx, r_miny, r_maxx, r_maxy) = geo_r
            if len(r_ids) == 0:
                return schema.empty_table()
            rrow, rcell = explode_cells(grid, r_minx, r_miny,
                                        r_maxx, r_maxy)
            # bucket lookup per (r_row, cell): ragged gather via cumsum
            ci = np.searchsorted(self.cells, rcell)
            ci = np.minimum(ci, max(len(self.cells) - 1, 0))
            hit = self.cells[ci] == rcell
            rrow, ci = rrow[hit], ci[hit]
            cnt = self.starts[ci + 1] - self.starts[ci]
            total = int(cnt.sum())
            if total == 0:
                return schema.empty_table()
            gr = np.repeat(rrow, cnt)
            base = np.repeat(self.starts[ci], cnt)
            csum = np.zeros(len(cnt), dtype=np.int64)
            np.cumsum(cnt[:-1], out=csum[1:])
            local = np.arange(total, dtype=np.int64) - np.repeat(csum, cnt)
            gs = self.bucket_rows[base + local]
            # a (r,s) pair can co-occur in several cells: dedup in-batch
            key = gr * np.int64(self.n_s) + gs
            key = np.unique(key)
            gr, gs = key // self.n_s, key % self.n_s
            # MBR overlap
            ov = ((r_minx[gr] <= self.s_maxx[gs])
                  & (self.s_minx[gs] <= r_maxx[gr])
                  & (r_miny[gr] <= self.s_maxy[gs])
                  & (self.s_miny[gs] <= r_maxy[gr]))
            gr, gs = gr[ov], gs[ov]
            if len(gr) == 0:
                return schema.empty_table()
            # combined geometry SoA: S rows [0, n_s), R batch appended
            geo = (np.concatenate([self.s_ids, r_ids]),
                   np.concatenate([self.s_gt, r_gt]),
                   np.concatenate([self.s_offs,
                                   r_offs[1:].astype(np.int64)
                                   + self.s_offs[-1]]),
                   np.concatenate([self.s_vals, r_vals]),
                   np.concatenate([self.s_minx, r_minx]),
                   np.concatenate([self.s_miny, r_miny]),
                   np.concatenate([self.s_maxx, r_maxx]),
                   np.concatenate([self.s_maxy, r_maxy]))
            gri = gr + self.n_s
            april = None
            if use_april:
                # R's interval lists for THIS batch (S's were built once
                # before the pin); combined S-then-R row indexing mirrors
                # the geometry SoA above.  Pre-rasterized inputs
                # (load_april / persist_april, checked at plan time) pass
                # through; everything else rasterizes here
                t_a = t if "april_all" in t.column_names else gen(t)
                rao, rav = _list_col_np(t_a, "april_all")
                rfo, rfv = _list_col_np(t_a, "april_full")
                sao, sav, sfo, sfv = self.s_april
                rao = np.asarray(rao, dtype=np.int64)
                rfo = np.asarray(rfo, dtype=np.int64)
                april = (np.concatenate([sao, rao[1:] + sao[-1]]),
                         np.concatenate([sav, rav]),
                         np.concatenate([sfo, rfo[1:] + sfo[-1]]),
                         np.concatenate([sfv, rfv]))
            if find_rel:
                rel = classify_relations(cfg, geo, gri, gs, april)
                return pa.table({"r_id": r_ids[gr],
                                 "s_id": self.s_ids[gs],
                                 "relation": rel}, schema=REL_SCHEMA)
            keep = (np.ones(len(gri), dtype=bool) if not cfg.refinement
                    else refine_mask(cfg, geo, gri, gs, predicate, april))
            return pa.table({"r_id": r_ids[gr[keep]],
                             "s_id": self.s_ids[gs[keep]]},
                            schema=PAIR_SCHEMA)

    # autoscaling pool (min 1): a FIXED pool of N actors reserves N CPUs
    # up front, which deadlocks the streaming executor when N equals the
    # cluster's CPU count — the upstream read task can never schedule
    # (observed: 4-actor pool + 4-CPU session hangs on ReadParquet).
    # min=1 always leaves headroom; Ray scales the pool up as CPUs free.
    r_cols = list(GEOM_COLS)
    if use_april and _april_reusable(r, cfg.april_n, bounds):
        r_cols += ["april_all", "april_full"]
    return r.select_columns(r_cols).map_batches(
        BroadcastJoin, batch_format="pyarrow",
        concurrency=(1, max(1, concurrency)))


def relation_histogram(rel_pairs: Dataset):
    """(relation:int8) pairs Dataset -> DataFrame(relation_name, pair_count).

    Per-batch partial bincounts merged on the driver (8 buckets — a ray
    groupby shuffle would cost a barrier for an 8-row result)."""
    import pandas as pd
    import pyarrow as pa2
    from ..geometry.predicates import TR_NAMES

    def partial(t: pa2.Table) -> pa2.Table:
        rel = t["relation"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(rel, minlength=8).astype(np.int64)
        return pa2.table({"h": pa2.array([cnt])})

    total = np.zeros(8, dtype=np.int64)
    for r in rel_pairs.map_batches(partial,
                                   batch_format="pyarrow").take_all():
        total += np.asarray(r["h"])
    nz = np.nonzero(total)[0]
    return pd.DataFrame({"relation_name": [TR_NAMES[int(i)] for i in nz],
                         "pair_count": total[nz]})


def attach_payload(pairs: Dataset, payload: Dataset, pair_key: str,
                   payload_key: str, columns: list[str]) -> Dataset:
    """Re-attach (wide) payload columns to join results by id.

    The join shuffle moves only geometry; image bytes / captions etc. are
    joined back here (hash join on the key).  SURVEY.md §7.4 'wide rows'.
    """
    from ..config import arrow_schema_of, join_parallelism, \
        repair_join_empties
    # the hand-built repair schema below assumes no column-name overlap
    # (Ray's join would suffix duplicates, making repaired empty blocks
    # disagree with real joined blocks) — fail loudly instead
    clash = (set(pairs.schema().names) - {pair_key}) \
        & set(c for c in columns if c != payload_key)
    if clash:
        raise ValueError(f"attach_payload: payload columns {sorted(clash)}"
                         f" collide with pair columns; rename one side")
    rhs = payload.select_columns([payload_key] + columns)
    out = pairs.join(rhs, join_type="inner",
                     num_partitions=join_parallelism(),
                     on=(pair_key,), right_on=(payload_key,))
    # empty hash partitions finalize to zero-column blocks that break a
    # downstream union/join; rebuild the joined schema (left pair cols +
    # payload cols) when both sides expose Arrow schemas
    lsch, rsch = arrow_schema_of(pairs), arrow_schema_of(rhs)
    joined_schema = None
    if lsch is not None and rsch is not None:
        fields = [lsch.field(n) for n in lsch.names] + \
            [rsch.field(n) for n in rsch.names if n != payload_key]
        import pyarrow as _pa
        joined_schema = _pa.schema(fields)
    return repair_join_empties(out, joined_schema)
