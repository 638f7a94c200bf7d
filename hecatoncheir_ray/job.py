"""``ray job submit`` entry point.

Example (cluster):
    ray job submit --working-dir . -- \\
        python -m hecatoncheir_ray.job --pipeline spatial_join \\
        --left-kind polygons --left-n 150000 --right-kind polygons \\
        --right-n 150000 --predicate intersects \\
        --out /mnt/out/join1 --slices 16 --ppd 256

Runs the resumable slice loop (state.checkpoint): re-submitting the same
command after a failure skips finished slices.  This script OWNS the Ray
session (guarded init) — the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _layer(kind: str, n: int, seed: int, sf_dir: str | None):
    from .sources import derive
    from .sources.synth import ray_layer
    if kind in ("points", "polygons", "linestrings"):
        return lambda: ray_layer(kind, n, seed=seed)
    if kind == "events_points":
        return lambda: derive.ray_points_events(sf_dir)
    if kind == "orders_boxes":
        return lambda: derive.ray_boxes_orders(sf_dir)
    if kind == "part_boxes":
        return lambda: derive.ray_boxes_part(sf_dir)
    if kind == "wkt":
        from .sources.readers import read_wkt
        return lambda: read_wkt(sf_dir)
    raise SystemExit(f"unknown layer kind {kind!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hecatoncheir_ray.job")
    ap.add_argument("--pipeline", default="spatial_join",
                    choices=["spatial_join", "curation"])
    ap.add_argument("--left-kind", default=None)
    ap.add_argument("--right-kind", default=None)
    ap.add_argument("--left-n", type=int, default=100000)
    ap.add_argument("--right-n", type=int, default=100000)
    ap.add_argument("--left-seed", type=int, default=1)
    ap.add_argument("--right-seed", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--predicate", default="intersects")
    ap.add_argument("--out", required=True)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--ppd", type=int, default=128)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.pipeline == "curation":
        from .state.checkpoint import resumable_curation

        def docs():
            import ray.data as rd
            return rd.read_parquet(f"{args.sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])

        summary = resumable_curation(
            docs, args.out,
            lineage={"docs": f"{args.sf_dir}/documents.parquet"})
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if not (args.left_kind and args.right_kind):
        raise SystemExit("--left-kind/--right-kind required for "
                         "spatial_join")
    from .config import EngineConfig, TIGER_US_BOUNDS
    from .state.checkpoint import resumable_spatial_join
    b = (TIGER_US_BOUNDS[0] - 0.5, TIGER_US_BOUNDS[1] - 0.5,
         TIGER_US_BOUNDS[2] + 0.5, TIGER_US_BOUNDS[3] + 0.5)
    cfg = EngineConfig(dataspace=b, ppd=args.ppd)
    lineage = {"left": [args.left_kind, args.left_n, args.left_seed],
               "right": [args.right_kind, args.right_n, args.right_seed],
               "sf_dir": args.sf_dir}
    summary = resumable_spatial_join(
        _layer(args.left_kind, args.left_n, args.left_seed, args.sf_dir),
        _layer(args.right_kind, args.right_n, args.right_seed, args.sf_dir),
        args.predicate, cfg, args.out, num_slices=args.slices,
        lineage=lineage)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
