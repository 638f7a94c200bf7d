"""Per-partition lineage + counters + resumable execution (north rule).

The reference has no fault tolerance (any error NACKs up and the job aborts,
DB_STATUS propagation, include/def.h:69-143).  Here every job runs as
``num_slices`` key-range slices of the shuffle partition space; each slice:

* writes its output under ``out_dir/slice=<k>/`` (its own parquet files),
* then atomically records a manifest (lineage: inputs + config fingerprint;
  counters: rows in/out, candidate pairs, wall seconds) in the checkpoint
  store (``_ckpt/slice_<k>.json`` via write-temp-then-rename).

A killed job resumes by re-invoking the same call: finished slices are
skipped (manifest present + config fingerprint matches), unfinished slice
directories are overwritten.  Kernel-side counters flow through a named
detached Ray actor (the "checkpoint store" metrics channel).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np

import ray


@ray.remote
class MetricsActor:
    """Tiny named metrics sink: kernels report per-partition counters."""

    def __init__(self):
        self._counters: dict[str, dict[str, int]] = {}

    def add(self, scope: str, **counts):
        c = self._counters.setdefault(scope, {})
        for k, v in counts.items():
            c[k] = c.get(k, 0) + int(v)

    def snapshot(self) -> dict:
        return {k: dict(v) for k, v in self._counters.items()}

    def reset(self, scope: str):
        self._counters.pop(scope, None)


def get_metrics_actor(name: str = "hec_metrics"):
    try:
        return ray.get_actor(name)
    except ValueError:
        return MetricsActor.options(name=name, lifetime="detached").remote()


class CheckpointStore:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.ckpt_dir = os.path.join(out_dir, "_ckpt")
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def _path(self, k: int) -> str:
        return os.path.join(self.ckpt_dir, f"slice_{k:05d}.json")

    def manifest(self, k: int) -> dict | None:
        try:
            with open(self._path(k)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_done(self, k: int, fingerprint: str) -> bool:
        m = self.manifest(k)
        return bool(m and m.get("status") == "done"
                    and m.get("fingerprint") == fingerprint)

    def mark_done(self, k: int, fingerprint: str, lineage: dict,
                  counters: dict):
        tmp = self._path(k) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"status": "done", "slice": k,
                       "fingerprint": fingerprint,
                       "finished_at": time.time(),
                       "lineage": lineage, "counters": counters}, f,
                      indent=1)
        os.replace(tmp, self._path(k))   # atomic

    def manifests(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.ckpt_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.ckpt_dir, name)) as f:
                    out.append(json.load(f))
        return out


def _fingerprint(predicate: str, cfg, num_slices: int, lineage: dict) -> str:
    import hashlib
    blob = json.dumps({"predicate": predicate, "ppd": cfg.ppd,
                       "dataspace": cfg.dataspace,
                       "parts": cfg.shuffle_parts,
                       "filter": cfg.intermediate_filter,
                       "mbr_filter": cfg.mbr_filter,
                       "refinement": cfg.refinement,
                       "num_slices": num_slices,
                       "lineage": lineage}, sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


def resumable_spatial_join(r_factory, s_factory, predicate: str, cfg,
                           out_dir: str, num_slices: int = 8,
                           lineage: dict | None = None) -> dict:
    """Run (or resume) a spatial join as num_slices partition-range slices.

    ``r_factory``/``s_factory``: zero-arg callables returning fresh input
    Datasets (a Dataset cannot be consumed twice).  Returns a summary dict
    {slices_run, slices_skipped, rows, counters}.
    """
    from ..pipelines.spatial_join import spatial_join
    import pyarrow as pa

    lineage = lineage or {}
    store = CheckpointStore(out_dir)
    # detect hot cells ONCE for the whole job, not once per slice — and
    # LAZILY, so a fully-completed resume (every slice already done) never
    # pays the detection pass over the inputs
    hot_cache = []

    def hot_cells():
        if not hot_cache:
            h = None
            if cfg.auto_salt and cfg.dataspace is not None:
                from ..pipelines.spatial_join import detect_hot_cells
                h = detect_hot_cells(r_factory(), s_factory(), cfg,
                                     cfg.make_grid())
            hot_cache.append(h)
        return hot_cache[0]

    fp = _fingerprint(predicate, cfg, num_slices, lineage)
    metrics = get_metrics_actor()
    run, skipped, total_rows = 0, 0, 0
    all_counters = {}
    for k in range(num_slices):
        if store.is_done(k, fp):
            skipped += 1
            m = store.manifest(k)
            total_rows += m["counters"].get("rows_out", 0)
            continue
        t0 = time.time()
        scope = f"{out_dir}:slice{k}"
        metrics.reset.remote(scope)
        pairs = spatial_join(r_factory(), s_factory(), predicate, cfg,
                             hot_cells=hot_cells(),
                             slice_id=(k, num_slices),
                             metrics_scope=scope)
        slice_dir = os.path.join(out_dir, f"slice={k}")
        # A crashed attempt leaves partial parquet files behind and
        # write_parquet APPENDs with unique filenames -- wipe first so a
        # resumed slice can't double-count rows.
        import shutil
        shutil.rmtree(slice_dir, ignore_errors=True)
        pairs.write_parquet(slice_dir)
        # rows written, from the parquet footers (ground truth)
        import pyarrow.parquet as pq
        rows = sum(pq.read_metadata(os.path.join(slice_dir, f)).num_rows
                   for f in os.listdir(slice_dir)
                   if f.endswith(".parquet"))
        counters = ray.get(metrics.snapshot.remote()).get(scope, {})
        counters["rows_out"] = rows
        counters["wall_s"] = round(time.time() - t0, 3)
        store.mark_done(k, fp, lineage, counters)
        total_rows += rows
        all_counters[k] = counters
        run += 1
    return {"slices_run": run, "slices_skipped": skipped,
            "rows": total_rows, "counters": all_counters,
            "out_dir": out_dir}


CURATION_STAGES = ("survivors", "pairs", "final")


def _curation_fingerprint(params: dict, lineage: dict) -> str:
    import hashlib
    blob = json.dumps({"params": params, "lineage": lineage},
                      sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


def _read_stage(out_dir: str, name: str, empty_schema):
    """Read a finished stage's parquet back as a Dataset; typed empty
    when the stage produced zero rows (write_parquet of an empty
    Dataset may leave no readable files)."""
    import ray.data as rd
    sd = os.path.join(out_dir, f"stage={name}")
    files = [os.path.join(sd, f) for f in sorted(os.listdir(sd))
             if f.endswith(".parquet")] if os.path.isdir(sd) else []
    if files:
        # partitioning=None: the stage=<name> directory naming must not
        # be inferred as a hive partition column
        ds = rd.read_parquet(files, partitioning=None)
        if ds.count() > 0:
            return ds
    import pyarrow as pa
    return rd.from_arrow(empty_schema.empty_table())


def resumable_curation(docs_factory, out_dir: str,
                       min_quality: int = 815, min_tokens: int = 20,
                       lang: str = "en", threshold: float = 0.6,
                       sample_hex_lt: str = "80", num_parts: int = 256,
                       lineage: dict | None = None) -> dict:
    """Run (or resume) the corpus-curation pipeline with a checkpoint at
    each stage boundary (north rule: resumable from checkpoint with
    per-partition lineage + metrics — the training-data counterpart of
    ``resumable_spatial_join``).

    Stage slicing: the spatial join slices by shuffle-partition range
    because its output is partition-separable; curation's near-dup
    stages are NOT doc-separable (LSH pairs and connected components
    cross any document slice), so the unit of resumption is the stage
    boundary — each of (survivors, pairs, final) is written as
    partitioned parquet + an atomic manifest, and a killed job re-run
    with the same params skips every finished stage.  Within a stage
    the work is already distributed Ray tasks; a 100 TB deployment
    sizes stage output partitioning via write_parquet's block layout.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil
    from ..functions.dedup import dedup_canonical, minhash_near_dup_pairs
    from ..pipelines.curation import gate_exact_dedup, sample_survivors

    lineage = lineage or {}
    params = {"min_quality": min_quality, "min_tokens": min_tokens,
              "lang": lang, "threshold": threshold,
              "sample_hex_lt": sample_hex_lt, "num_parts": num_parts}
    fp = _curation_fingerprint(params, lineage)
    store = CheckpointStore(out_dir)
    idx = {n: i for i, n in enumerate(CURATION_STAGES)}
    summary = {"stages_run": 0, "stages_skipped": 0, "out_dir": out_dir,
               "counters": {}}

    def run_stage(name: str, factory) -> None:
        k = idx[name]
        if store.is_done(k, fp):
            summary["stages_skipped"] += 1
            summary["counters"][name] = store.manifest(k)["counters"]
            return
        t0 = time.time()
        sd = os.path.join(out_dir, f"stage={name}")
        # a crashed attempt leaves partial parquet behind and
        # write_parquet APPENDs unique filenames — wipe first
        shutil.rmtree(sd, ignore_errors=True)
        factory().write_parquet(sd)
        rows = sum(pq.read_metadata(os.path.join(sd, f)).num_rows
                   for f in os.listdir(sd) if f.endswith(".parquet"))
        counters = {"rows_out": rows,
                    "wall_s": round(time.time() - t0, 3)}
        store.mark_done(k, fp, {**lineage, "stage": name}, counters)
        summary["counters"][name] = counters
        summary["stages_run"] += 1

    SURV = pa.schema([("doc_id", pa.int64()), ("text", pa.large_string()),
                      ("token_count", pa.int64()),
                      ("quality_x1000", pa.int64()),
                      ("h", pa.large_string())])
    PAIRS = pa.schema([("doc_id_a", pa.int64()),
                       ("doc_id_b", pa.int64())])

    run_stage("survivors",
              lambda: gate_exact_dedup(docs_factory(), min_quality,
                                       min_tokens, lang, num_parts))
    surv = _read_stage(out_dir, "survivors", SURV)
    run_stage("pairs",
              lambda: minhash_near_dup_pairs(surv, threshold=threshold))
    pairs = _read_stage(out_dir, "pairs", PAIRS)
    run_stage("final",
              lambda: sample_survivors(dedup_canonical(surv, pairs),
                                       sample_hex_lt))
    m = store.manifest(idx["final"])
    summary["rows"] = m["counters"].get("rows_out", 0) if m else 0
    return summary


def read_curation_output(out_dir: str):
    """Read back the final curated set — only if its manifest says done
    (a crashed final stage may have partial parquet on disk)."""
    import pyarrow as pa
    import ray.data as rd
    store = CheckpointStore(out_dir)
    k = CURATION_STAGES.index("final")
    m = store.manifest(k)
    empty = pa.schema([("doc_id", pa.int64()),
                       ("token_count", pa.int64()),
                       ("quality_x1000", pa.int64())])
    if not (m and m.get("status") == "done"):
        return rd.from_arrow(empty.empty_table())
    return _read_stage(out_dir, "final", empty)


def read_join_output(out_dir: str, predicate: str = "intersects"):
    """Read back only slices whose manifest says 'done' (a crashed slice
    may have partial parquet files on disk -- they must not be read).

    ``predicate`` shapes the schema of the empty fallback (zero done
    slices): a find_relation join's output carries a ``relation:int8``
    column that downstream consumers select."""
    import ray.data as rd
    store = CheckpointStore(out_dir)
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("slice="):
            k = int(d.split("=", 1)[1])
            m = store.manifest(k)
            if not (m and m.get("status") == "done"):
                continue
            sd = os.path.join(out_dir, d)
            files += [os.path.join(sd, f) for f in sorted(os.listdir(sd))
                      if f.endswith(".parquet")]
    if not files:
        import pyarrow as pa
        cols = {"r_id": pa.array([], pa.int64()),
                "s_id": pa.array([], pa.int64())}
        if predicate == "find_relation":
            cols["relation"] = pa.array([], pa.int8())
        return rd.from_arrow(pa.table(cols))
    return rd.read_parquet(files)
