"""Resumable execution: per-partition lineage, counters, skip-if-done."""

import json
import os
import shutil

import numpy as np
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join
from hecatoncheir_ray.sources.synth import table_layer
from hecatoncheir_ray.state.checkpoint import (CheckpointStore,
                                               read_join_output,
                                               resumable_spatial_join)

BOUNDS = (0.0, 0.0, 100.0, 50.0)
KW = dict(bounds=BOUNDS, min_edge=2.0, max_edge=10.0, min_v=4, max_v=10)


def _factories():
    tr = table_layer("polygons", 300, seed=31, **KW)
    ts = table_layer("polygons", 300, seed=32, **KW)
    return (lambda: rd.from_arrow(tr)), (lambda: rd.from_arrow(ts)), tr, ts


def test_resume_skips_done_slices(ray_session, tmp_path):
    out = str(tmp_path / "join_out")
    rf, sf, tr, ts = _factories()
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, shuffle_parts=32)

    # baseline: single-shot join
    base = sorted((r["r_id"], r["s_id"]) for r in
                  spatial_join(rf(), sf(), "intersects", cfg).take_all())

    s1 = resumable_spatial_join(rf, sf, "intersects", cfg, out,
                                num_slices=4)
    assert s1["slices_run"] == 4 and s1["slices_skipped"] == 0
    got = sorted((r["r_id"], r["s_id"]) for r in
                 read_join_output(out).take_all())
    assert got == base
    assert s1["rows"] == len(base)

    # simulate a killed job: delete two slice manifests + their output
    store = CheckpointStore(out)
    for k in (1, 3):
        os.remove(store._path(k))
        shutil.rmtree(os.path.join(out, f"slice={k}"))

    s2 = resumable_spatial_join(rf, sf, "intersects", cfg, out,
                                num_slices=4)
    assert s2["slices_run"] == 2 and s2["slices_skipped"] == 2
    got2 = sorted((r["r_id"], r["s_id"]) for r in
                  read_join_output(out).take_all())
    assert got2 == base

    # third run: everything skipped, output untouched
    s3 = resumable_spatial_join(rf, sf, "intersects", cfg, out,
                                num_slices=4)
    assert s3["slices_run"] == 0 and s3["slices_skipped"] == 4
    assert s3["rows"] == len(base)


def test_manifest_lineage_and_counters(ray_session, tmp_path):
    out = str(tmp_path / "join_out2")
    rf, sf, tr, ts = _factories()
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, shuffle_parts=32)
    resumable_spatial_join(rf, sf, "intersects", cfg, out, num_slices=2,
                           lineage={"left": "layer31", "right": "layer32"})
    store = CheckpointStore(out)
    ms = store.manifests()
    assert len(ms) == 2
    for m in ms:
        assert m["status"] == "done"
        assert m["lineage"] == {"left": "layer31", "right": "layer32"}
        assert "rows_out" in m["counters"] and "wall_s" in m["counters"]
        # kernel-side counters flowed through the metrics actor
        assert m["counters"].get("partitions", 0) > 0
        assert m["counters"].get("candidates", 0) >= \
            m["counters"]["rows_out"]


def test_config_change_invalidates(ray_session, tmp_path):
    out = str(tmp_path / "join_out3")
    rf, sf, *_ = _factories()
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, shuffle_parts=32)
    resumable_spatial_join(rf, sf, "intersects", cfg, out, num_slices=2)
    # different predicate -> different fingerprint -> slices re-run
    s = resumable_spatial_join(rf, sf, "covered_by", cfg, out,
                               num_slices=2)
    assert s["slices_run"] == 2


def test_crashed_slice_partials_not_double_counted(ray_session, tmp_path):
    """ADVICE r1: a crashed attempt leaves partial parquet in slice=<k>/
    with no 'done' manifest; the resume must wipe them (not APPEND beside
    them) and read_join_output must ignore not-done slices."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    out = str(tmp_path / "crash_out")
    rf, sf, tr, ts = _factories()
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, shuffle_parts=32)

    base = sorted((r["r_id"], r["s_id"]) for r in
                  spatial_join(rf(), sf(), "intersects", cfg,
                               hot_cells=np.array([])).take_all())

    # simulate a crashed attempt: stale partial output for slice 1,
    # no manifest
    sd = os.path.join(out, "slice=1")
    os.makedirs(sd, exist_ok=True)
    pq_.write_table(pa_.table({"r_id": pa_.array([999999], pa_.int64()),
                               "s_id": pa_.array([999999], pa_.int64())}),
                    os.path.join(sd, "stale_partial.parquet"))

    # not-done slices are invisible to readers
    assert read_join_output(out).count() == 0

    s = resumable_spatial_join(rf, sf, "intersects", cfg, out,
                               num_slices=4)
    assert s["slices_run"] == 4
    got = sorted((r["r_id"], r["s_id"]) for r in
                 read_join_output(out).take_all())
    assert got == base                     # stale row wiped, no dupes
    assert s["rows"] == len(base)


SF1K = "/root/testdata/sf0.001"


def _docs_factory():
    import ray.data as rd
    return rd.read_parquet(f"{SF1K}/documents.parquet",
                           columns=["doc_id", "text"])


def test_curation_killed_mid_run_resumes(ray_session, tmp_path):
    """Kill the curation job between stages; the resume must complete
    WITHOUT recomputing finished stages (VERDICT r4 #8).  The 'kill' is
    a crash raised out of the pairs stage after survivors checkpointed
    — the same abrupt-death shape a SIGKILL leaves on disk (finished
    manifests present, later stages absent/partial)."""
    from hecatoncheir_ray.pipelines.curation import curate_corpus
    from hecatoncheir_ray.state import checkpoint as ck

    out = str(tmp_path / "cur_out")
    # ground truth: the one-shot pipeline
    base = curate_corpus(_docs_factory()).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # run 1: dies inside the pairs stage (after survivors completed);
    # the patch works because resumable_curation from-imports the stage
    # functions at CALL time
    import hecatoncheir_ray.functions.dedup as dedup_mod
    orig = dedup_mod.minhash_near_dup_pairs
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated mid-job death")

    dedup_mod.minhash_near_dup_pairs = dying
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            ck.resumable_curation(_docs_factory, out)
    finally:
        dedup_mod.minhash_near_dup_pairs = orig
    assert calls["n"] == 1
    store = ck.CheckpointStore(out)
    m0 = store.manifest(0)
    assert m0 and m0["status"] == "done"          # survivors persisted
    assert store.manifest(1) is None              # pairs died
    assert ck.read_curation_output(out).count() == 0   # no final -> empty

    # run 2 (the resume): survivors skipped, pairs+final run
    s = ck.resumable_curation(_docs_factory, out)
    assert s["stages_skipped"] == 1 and s["stages_run"] == 2
    assert store.manifest(0)["finished_at"] == m0["finished_at"]  # noqa: E501  not recomputed
    got = ck.read_curation_output(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(base) and len(got) > 0

    # run 3: everything skipped, output stable
    s3 = ck.resumable_curation(_docs_factory, out)
    assert s3["stages_run"] == 0 and s3["stages_skipped"] == 3
    assert s3["rows"] == len(base)


def test_curation_param_change_invalidates(ray_session, tmp_path):
    from hecatoncheir_ray.state.checkpoint import resumable_curation
    out = str(tmp_path / "cur_out2")
    resumable_curation(_docs_factory, out)
    s = resumable_curation(_docs_factory, out, sample_hex_lt="40")
    assert s["stages_run"] == 3                   # new fingerprint


def test_empty_output_schema_matches_predicate(ray_session, tmp_path):
    """Zero done slices: the empty fallback must still carry the
    find_relation 'relation' column (ADVICE r2)."""
    out = str(tmp_path / "nothing")
    os.makedirs(out, exist_ok=True)
    ds = read_join_output(out, predicate="find_relation")
    assert ds.count() == 0
    assert set(ds.schema().names) == {"r_id", "s_id", "relation"}
    # selecting the relation column on an empty result must not raise
    assert ds.select_columns(["relation"]).count() == 0
    assert set(read_join_output(out).schema().names) == {"r_id", "s_id"}
