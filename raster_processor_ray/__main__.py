"""CLI entry point — the `ray job submit` target (SURVEY.md §7 M7).

    python -m raster_processor_ray flagship  <pages_parquet> <out_dir>
    python -m raster_processor_ray rasterize <pages_parquet> <out_dir>
        [--grid-res R] [--shards N] [--checkpoint DIR] [--resume]
    python -m raster_processor_ray geoloc    <points_parquet> <out_dir>
        [--mode none|lowres_raster|pixcvec] [--scale-factor K]
    python -m raster_processor_ray utm       <points_parquet> <out_dir>
        [--res-m M] [--padding-m P]
    python -m raster_processor_ray regionmap <points_parquet> <out_dir>
        --labels col1,col2 [--grid-res R]
    python -m raster_processor_ray densify   <pages_parquet> <out_dir>
    python -m raster_processor_ray dedup     <docs_parquet> <out_dir>
        [--id-col C] [--text-col C] [--threshold J]
        [--num-perm P] [--num-bands B]
    python -m raster_processor_ray query     <name|list> [--sf-dir D] [--out D]
    python -m raster_processor_ray diagnose  <parquet> --key COL
        [--buckets B] [--hot-k K]

Owns its Ray session (guarded init: on a cluster, `ray job submit` has
RAY_ADDRESS set and the existing session is used).
"""

from __future__ import annotations

import argparse
import json
import sys


def _grid_args(s):
    s.add_argument("--grid-res", type=float, default=0.5)
    s.add_argument("--tile-size", type=int, default=256)
    s.add_argument("--shards", type=int, default=64)


def main(argv=None):
    p = argparse.ArgumentParser(prog="raster_processor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("flagship", "rasterize", "densify"):
        s = sub.add_parser(name)
        s.add_argument("pages")
        s.add_argument("out_dir")
        _grid_args(s)
        s.add_argument("--checkpoint", default=None)
        s.add_argument("--resume", action="store_true")
    s = sub.add_parser("geoloc")
    s.add_argument("points")
    s.add_argument("out_dir")
    _grid_args(s)
    s.add_argument("--mode", default="none",
                   choices=("none", "lowres_raster", "pixcvec"))
    s.add_argument("--scale-factor", type=int, default=4)
    s = sub.add_parser("utm")
    s.add_argument("points")
    s.add_argument("out_dir")
    s.add_argument("--res-m", type=float, default=100.0)
    s.add_argument("--padding-m", type=float, default=0.0)
    s.add_argument("--tile-size", type=int, default=256)
    s.add_argument("--shards", type=int, default=64)
    s = sub.add_parser("regionmap")
    s.add_argument("points")
    s.add_argument("out_dir")
    _grid_args(s)
    s.add_argument("--labels", required=True,
                   help="comma-separated region label columns")
    s = sub.add_parser("dedup")
    s.add_argument("docs", help="documents parquet (id + text columns)")
    s.add_argument("out_dir")
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--threshold", type=float, default=0.8)
    s.add_argument("--num-perm", type=int, default=128)
    s.add_argument("--num-bands", type=int, default=32)
    s = sub.add_parser("query")
    s.add_argument("name", help="a queries() entry name, or 'list'")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--out", default=None,
                   help="optional parquet output directory")
    s = sub.add_parser("diagnose")
    s.add_argument("table", help="parquet path to diagnose")
    s.add_argument("--key", required=True, help="shuffle key column")
    s.add_argument("--buckets", type=int, default=64)
    s.add_argument("--hot-k", type=int, default=100)
    s = sub.add_parser("scrub")
    s.add_argument("corpus", help="resumable layout directory to audit")
    s.add_argument("--shallow", action="store_true",
                   help="stat-tier only (presence + byte sizes)")
    s = sub.add_parser("report")
    s.add_argument("proc", help="processed raster (resumable dir or parquet)")
    s.add_argument("truth", help="truth raster (resumable dir or parquet)")
    s.add_argument("out_dir")
    _grid_args(s)
    s.add_argument("--value-col", default="wmean_value")
    s.add_argument("--uncert-col", default="wmean_uncert")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        import ray.data as rd

        from .geo.cells import GridSpec
        from .state import lineage

        if args.cmd == "utm":
            from .pipelines.utm_raster import rasterize_utm

            pts = rd.read_parquet(args.points)
            cells, grid, zone, band = rasterize_utm(
                pts, res_m=args.res_m, padding_m=args.padding_m,
                tile_size=args.tile_size)
            m = lineage.write_resumable(cells, args.out_dir,
                                        key_col="tile_id",
                                        num_shards=args.shards)
            print(json.dumps({"zone": zone, "band": band,
                              "shards": len(m), "rows": int(m.rows.sum())}))
            return 0

        if args.cmd == "query":
            from .pipelines.queries import queries

            qs = queries()
            if args.name == "list":
                print(json.dumps(sorted(qs)))
                return 0
            if args.name not in qs:
                print(json.dumps({"error": f"unknown query {args.name!r}",
                                  "available": sorted(qs)}))
                return 2
            res = qs[args.name](args.sf_dir)
            if args.out is not None and hasattr(res, "write_parquet"):
                res.write_parquet(args.out)
                print(json.dumps({"query": args.name, "out": args.out}))
                return 0
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(json.dumps({"query": args.name, "rows": int(len(df)),
                              "columns": list(map(str, df.columns))}))
            return 0

        if args.cmd == "diagnose":
            from .state.diagnose import diagnose_skew

            d = diagnose_skew(rd.read_parquet(args.table), args.key,
                              num_buckets=args.buckets, hot_k=args.hot_k)
            print(json.dumps({
                "table": args.table, "key": args.key,
                "total_rows": d["total_rows"],
                "num_buckets": d["num_buckets"],
                "mean_bucket_rows": d["mean_bucket_rows"],
                "max_bucket_rows": d["max_bucket_rows"],
                "imbalance": round(d["imbalance"], 3),
                "hot_keys": d["hot_keys"].to_dict("records"),
            }))
            return 0

        if args.cmd == "scrub":
            from .state.scrub import scrub_corpus, scrub_ok

            rep = scrub_corpus(args.corpus, deep=not args.shallow)
            bad = rep[rep["status"] != "ok"]
            print(json.dumps({
                "corpus": args.corpus, "ok": scrub_ok(rep),
                "shards": int(len(rep)), "rows": int(rep["rows"].clip(lower=0).sum()),
                "bad": bad.to_dict("records")}))
            return 0 if scrub_ok(rep) else 1

        if args.cmd == "dedup":
            from .stages.cc import component_survivors, connected_components
            from .stages.dedup import minhash_near_dup_verified

            docs = rd.read_parquet(args.docs)
            pairs = minhash_near_dup_verified(
                docs, id_col=args.id_col, text_col=args.text_col,
                num_perm=args.num_perm, num_bands=args.num_bands,
                threshold=args.threshold)
            labels = connected_components(pairs, u_col="id_a", v_col="id_b")
            surv = component_survivors(docs, labels, id_col=args.id_col)
            surv.write_parquet(args.out_dir)
            n_in, n_out = docs.count(), surv.count()
            print(json.dumps({"rows_in": n_in, "rows_out": n_out,
                              "removed": n_in - n_out}))
            return 0

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
        elif args.cmd == "rasterize":
            from .pipelines.flagship import run_flagship

            m = run_flagship(args.pages, args.out_dir, grid=grid,
                             num_out_shards=args.shards,
                             checkpoint_partials_dir=args.checkpoint,
                             resume=args.resume)
            print(json.dumps({"shards": len(m), "rows": int(m.rows.sum())}))
        elif args.cmd == "densify":
            from .pipelines.flagship import rasterize_pages
            from .sources.pages import pages_geotag
            from .state.densify import write_dense_tiles

            ds = rd.read_parquet(args.pages,
                                 columns=["url", "warc_ts", "text"])
            cells = rasterize_pages(ds, grid=grid)
            m = write_dense_tiles(cells, args.out_dir, grid,
                                  num_shards=args.shards)
            print(json.dumps({"tiles": int(m.rows.sum()), "shards": len(m)}))
        elif args.cmd == "regionmap":
            from .pipelines.geoloc import add_cell_column
            from .pipelines.region_map import write_region_map

            pts = add_cell_column(rd.read_parquet(args.points), grid)
            m = write_region_map(pts, grid, args.out_dir,
                                 args.labels.split(","),
                                 num_shards=args.shards)
            print(json.dumps({"tiles": int(m.rows.sum()), "shards": len(m)}))
        elif args.cmd == "report":
            import os

            from .aggregate.report import raster_report

            def load(path):
                if os.path.isdir(path) and any(
                        d.startswith("shard=") for d in os.listdir(path)):
                    return lineage.read_resumable(path)
                return rd.read_parquet(path)

            rep = raster_report(load(args.proc), load(args.truth), grid,
                                args.out_dir, value_col=args.value_col,
                                uncert_col=args.uncert_col)
            print(json.dumps({"global": {
                k: (v if isinstance(v, (str, int)) else float(v))
                for k, v in rep["global"].items()},
                "tiles": len(rep["tile_table"]),
                "paths": rep["paths"]}))
        elif args.cmd == "geoloc":
            from .pipelines.geoloc import (geoloc_refined_rasterize,
                                           synth_nadir_track)

            pts = rd.read_parquet(args.points)
            track = (synth_nadir_track(512)
                     if args.mode == "lowres_raster" else None)
            cells = geoloc_refined_rasterize(
                pts, grid, mode=args.mode, scale_factor=args.scale_factor,
                nadir_track=track)
            m = lineage.write_resumable(cells, args.out_dir,
                                        key_col="tile_id",
                                        num_shards=args.shards)
            print(json.dumps({"shards": len(m), "rows": int(m.rows.sum())}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
