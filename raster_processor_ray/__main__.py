"""CLI entry point — the `ray job submit` target (SURVEY.md §7 M7).

    python -m raster_processor_ray flagship <pages_parquet> <out_dir>
        [--grid res] [--shards N] [--checkpoint DIR] [--resume]
    python -m raster_processor_ray rasterize <pages_parquet> <out_dir> ...

Owns its Ray session (guarded init: on a cluster, `ray job submit` has
RAY_ADDRESS set and the existing session is used).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="raster_processor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("flagship", "rasterize"):
        s = sub.add_parser(name)
        s.add_argument("pages")
        s.add_argument("out_dir")
        s.add_argument("--grid-res", type=float, default=0.5)
        s.add_argument("--tile-size", type=int, default=256)
        s.add_argument("--shards", type=int, default=64)
        s.add_argument("--checkpoint", default=None)
        s.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .geo.cells import GridSpec

        grid = GridSpec(x_min=-180.0, y_min=-90.0, x_max=180.0, y_max=90.0,
                        res=args.grid_res, tile_size=args.tile_size,
                        wrap_lon=True)
        if args.cmd == "flagship":
            from .pipelines.flagship import run_flagship_full

            tiles, zonal = run_flagship_full(
                args.pages, args.out_dir, grid=grid,
                num_out_shards=args.shards)
            print(json.dumps({"tiles_shards": len(tiles),
                              "tile_rows": int(tiles.rows.sum()),
                              "zonal_shards": len(zonal)}))
        else:
            from .pipelines.flagship import run_flagship

            m = run_flagship(args.pages, args.out_dir, grid=grid,
                             num_out_shards=args.shards,
                             checkpoint_partials_dir=args.checkpoint,
                             resume=args.resume)
            print(json.dumps({"shards": len(m), "rows": int(m.rows.sum())}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
