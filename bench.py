#!/usr/bin/env python
"""Benchmark harness (driver contract).

Headline: the flagship spatial-join + tiling pipeline (pages -> geotag ->
cell-encode -> one-shuffle rasterize -> resumable partitioned write) over a
deterministic synthetic pages table, reported as pages/sec. Plus per-query
timings over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

--scaling: runs the bench twice in FRESH processes at num_cpus=8 and 32
on the same cached input and reports both throughputs + scaling
efficiency = (t8/t32)/4 (the sandbox protocol for the N vs 4N cluster
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# Keep large numpy buffers on the reusable glibc heap instead of
# per-allocation mmap/munmap: this node throttles page first-touch
# (~160 MB/s per process), so re-faulting a 64 MiB scratch buffer per
# batch dominated actor UDF time (measured 30x slowdown in the kNN
# stage). Must be set before ray.init so raylet-spawned workers inherit.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("GRAFT_BENCH_PAGES", "16000000"))
PAGES_DIR = f"/tmp/graft_bench/pages_nohtml_{PAGES_ROWS}"

BENCH_QUERIES = [
    "tile_count_mean", "tile_weighted_mean", "pip_semi", "knn_top3",
    "pricing_summary", "weighted_avg_price", "segment_ratio",
    "order_mode_flag", "dedup_users", "sessionize", "asof_dim",
    "hourly_windows", "token_counts", "ann_top5", "minhash_pairs",
    "rasterize_samples", "geoloc_refined", "region_map", "dense_tiles",
    "tile_error_report", "range_join", "knn_bucketed", "dedup_cc",
    "minhash_dedup", "sliding_windows", "value_quantiles",
    "distinct_users", "top_orders_by_priority", "bloom_filter_orders",
    "hll_users", "radius_join_sites", "event_deltas", "rollup_pricing",
    "top_terms", "zorder_keys", "heavy_parts", "user_cumsum",
    "user_rolling", "lineitem_ranks", "price_stats", "props_stats",
    "events_profile", "vocab_encode", "lang_sample", "nation_balance_full",
    "cube_pricing", "doc_keywords", "name_edit_pairs",
    "kmeans_clusters", "pca_coords", "docs_lang_enriched",
    "quality_filtered_counts", "repetition_stats", "decontam_overlap",
    "url_domains", "bpe_top_pieces", "pii_scrub", "para_dedup",
    "bm25_search", "lm_perplexity", "pack_sequences",
    "mixture_sample", "shuffle_shards", "dup_spans", "extract_roundtrip",
    "crawl_diff", "semantic_dedup", "dsir_select", "approx_quantiles",
    "canonical_docs", "group_split", "hybrid_search", "corpus_upsert",
    "pagerank", "triangle_stats", "link_degrees",
    "interval_coverage", "funnel_counts", "cohort_retention",
    "tile_pyramid", "focal_mean", "minhash_probe", "data_quality",
    "pq_top5", "nation_names", "sequence_gaps", "ivf_pq_top5",
    "raster_resample", "track_lengths", "track_simplify",
    "pagerank_personalized", "click_attribution", "label_centroids",
    "link_components",
    # round-4 additions + previously-unbenched registry entries
    "top_collocations", "domain_quality", "media_decode", "langid",
    "quality", "pip_zonal", "pivot_lang", "parts_intersect",
    "event_quartiles", "splat_gaussian", "splat_idw", "raster_regions",
    "embed_near_dup", "embed_dedup", "embed_dim_stats",
    "simhash_fingerprints", "ngram_jaccard", "hex_cells",
    "join_orders_customers", "orders_anti_join", "wse_corrections",
    "brand_consensus", "dedup_docs", "filter_revenue", "lang_counts",
    "pip_anti_count", "pip_labels", "stratified_sample",
    "subsample_docs", "time_coverage", "top_orders", "utm_raster",
    "value_quantiles_cont", "gap_flags", "geoloc_refined_full",
    "minhash_verified", "incremental_curation", "compression_stats", "audio_decode",
    "grouping_sets_pricing", "frame_sample",
    # round-5 additions
    "salted_topk_docs", "unpivot_metrics", "price_histogram",
    "value_outliers", "source_lang_entropy", "lang_drift", "lang_gini",
    "source_lang_mi", "user_lag_corr", "lang_ttr", "event_burstiness",
    "zipf_slope", "weighted_sample", "lang_weighted_sample", "value_mad",
    "dup_rate_by_source", "token_budget", "user_activity_histogram",
    "event_iat_median", "order_seasonality", "event_transitions",
    "user_streaks", "benford_digits", "return_revenue_nation",
    "parts_except", "rolling_active_users", "source_similarity",
    "label_embed_centroid", "event_cooccurrence", "link_hops",
    "fk_integrity", "region_revenue", "user_twap", "brand_skyline",
    "order_growth",
]


def ensure_pages():
    """Materialize (once) + warm the OS page cache. html is omitted: the
    flagship prunes it at the read anyway (columns=[url, warc_ts, text]),
    so generating it would only burn disk."""
    from raster_processor_ray.sources.pages import write_pages_parquet

    paths = write_pages_parquet(PAGES_DIR, PAGES_ROWS, rows_per_file=250_000,
                                with_html=False)
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    return paths


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from raster_processor_ray.geo.cells import GridSpec
    from raster_processor_ray.pipelines import queries as qmod
    from raster_processor_ray.pipelines.flagship import run_flagship

    ensure_pages()

    # pre-warm the worker pool so the headline measures steady-state
    # compute + shuffle, not one-time worker spawn + package import:
    # the warm task runs a real engine kernel so numpy/pyarrow/the
    # package are imported in every worker before the clock starts
    import ray.data as rd

    def warm(b):
        import pyarrow as _pa

        from raster_processor_ray.stages.geotag import geotag_and_cell_encode
        t = _pa.table({"url": _pa.array(["https://w.example/1"])})
        geotag_and_cell_encode(t, grid=None)
        return b

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        warm, batch_format="pyarrow").count()

    # Bench grid: 0.5-degree global cells. The production default
    # (0.01 deg, ~648M cells) is sized for 10^12 docs (~1.5k docs/cell);
    # at bench scale the same DENSITY (~4 docs/cell at 1M pages) needs a
    # coarser grid, otherwise cells are ~unique and the aggregation
    # degenerates to a per-row shuffle.
    bench_grid = GridSpec(x_min=-180.0, y_min=-90.0, x_max=180.0, y_max=90.0,
                          res=0.5, tile_size=64, wrap_lon=True)

    # headline: full spatial-join + tiling pipeline (read -> geotag/cells ->
    # PIP coverage mask -> kNN site join -> rasterize + zonal -> writes)
    from raster_processor_ray.pipelines.flagship import run_flagship_full

    out_dir = f"/tmp/graft_bench/raster_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    # no enrich_concurrency cap: setting map_batches concurrency makes the
    # enrich stage a separate operator (no fusion with ReadParquet), which
    # round-trips every input block through the object store
    # 4 read blocks per CPU: at 1 block/CPU the read/enrich wave has no
    # load-balancing slack and the fold/write tail idles CPUs (measured
    # at 32 CPUs: 20.1/21.2 s at 1x vs 15.9/15.2 s at 2-4x; at 16 CPUs
    # 24.8-27.2 s vs 23.1-23.7 s)
    run_flagship_full(PAGES_DIR, out_dir, num_out_shards=max(16, NUM_CPUS),
                      grid=bench_grid, read_blocks=max(16, 4 * NUM_CPUS))
    headline = time.perf_counter() - t0

    qtimes = {}
    qs = qmod.queries()
    # scaling sub-runs measure the headline only: the efficiency number
    # never used the query timings, and a shorter session makes it far
    # more likely BOTH parallelism levels land inside one quiet window
    # on this bursty-load node (see BASELINE.md variance notes)
    bench_queries = [] if os.environ.get("GRAFT_SKIP_QUERIES") else BENCH_QUERIES
    for name in bench_queries:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume lazily-built results fully
        if hasattr(res, "materialize"):
            res = res.materialize()
            _ = res.count()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": f"flagship spatial-join+tiling wall time ({PAGES_ROWS} synthetic pages)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": PAGES_ROWS,
        "pages_per_sec": round(PAGES_ROWS / headline, 1),
    }


def run_scaling():
    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SKIP_QUERIES="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    ensure_pages()  # shared warm input for both runs
    # N vs 4N protocol (BASELINE.md). Default 4 vs 16: this sandbox's
    # node-wide memory-write throttle saturates near 32 concurrent
    # writers, which would measure the throttle, not the engine.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", str(4 * lo)))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
    # the sandbox throttle is bursty: take the min of `repeats` fresh runs
    # per level (the least-interference measurement), interleaved so both
    # levels see the same phases of background noise
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(sub(lo))
        runs_hi.append(sub(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "metric": f"scaling efficiency, fresh-process num_cpus={lo} vs {hi} "
                  f"(min of {repeats} runs per level)",
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"all_sec_{lo}": [r["value"] for r in runs_lo],
        f"all_sec_{hi}": [r["value"] for r in runs_hi],
        f"pages_per_sec_{lo}": r_lo["pages_per_sec"],
        f"pages_per_sec_{hi}": r_hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pages": PAGES_ROWS,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
