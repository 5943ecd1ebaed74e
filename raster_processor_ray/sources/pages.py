"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Pure-function generator (FIXTURES.md F1): every column derives from the row
index through explicit 64-bit arithmetic — no RNG state, no wall clock —
so any shard can be regenerated independently on any worker, at any scale.
That is what makes the synthetic source usable at bench scale: generation
itself runs distributed as a Ray Dataset (``synth_pages_dataset``), one
task per shard.

Includes a hot-cell skew knob: ``skew_frac`` of urls geotag into one hot
location to exercise salting (FIXTURES.md F1 "Skew knob").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.hashing import geotag_from_hash, fnv1a_64, splitmix64

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
LANGS = np.array(["en", "de", "fr", "zh", "ar", "es", "ru", "pt", "ja", "hi"])
HOT_LAT, HOT_LON = 40.7128, -74.0060  # the hot cell (all skewed urls land here)

_WORDS = np.array([
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "water",
    "raster", "tile", "cell", "river", "lake", "height", "area", "page",
    "crawl", "index", "shard", "naïve", "café", "δεδομένα", "数据", "بيانات",
])


def _row_hashes(start: int, stop: int) -> np.ndarray:
    """Stable per-row uint64 hash stream (splitmix of the row index)."""
    return splitmix64(np.arange(start, stop, dtype=np.uint64))


def make_pages_batch(start: int, stop: int, *, skew_frac: float = 0.05,
                     with_html: bool = True,
                     html_mode: str = "bytes") -> pa.Table:
    """Generate rows [start, stop) of the pages table as an Arrow table.

    ``html_mode``:
    - ``"bytes"`` (default): opaque seeded payload bytes with empty /
      multi-KiB outliers (cheap; what the benches cache on disk);
    - ``"structured"``: real HTML rendered around the escaped ``text``
      (stages/extract.render_html_batch), so
      ``extract_text_batch(html) == text`` byte-for-byte — the
      end-to-end form of the extracted-text invariant.
    """
    n = stop - start
    idx = np.arange(start, stop, dtype=np.int64)
    h = _row_hashes(start, stop)

    site = idx % 1000
    urls = np.char.add(
        np.char.add("https://site", site.astype(str)),
        np.char.add(".example/p/", idx.astype(str)),
    )
    warc_ts = EPOCH_US + idx * 1_000_000  # 1s spacing -> time-gap tests work

    lang = LANGS[(h % np.uint64(len(LANGS))).astype(np.int64)]

    # text: 5-40 seeded words + the url (guarantees per-url uniqueness);
    # byte-identity of this column through every stage is the invariant.
    nwords = 5 + (h >> np.uint64(8)) % np.uint64(36)
    word_idx = ((h[:, None] >> np.uint64(16)) + np.arange(40, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(len(_WORDS))
    texts = []
    wl = _WORDS[word_idx.astype(np.int64)]
    for k in range(n):
        texts.append(" ".join(wl[k, : int(nwords[k])]) + " :: " + urls[k])
    text_arr = pa.array(texts, type=pa.string())

    cols = {
        "url": pa.array(urls.tolist(), type=pa.string()),
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
        "text": text_arr,
        "lang": pa.array(lang.tolist(), type=pa.string()),
    }
    if with_html:
        if html_mode == "structured":
            from ..stages.extract import render_html_batch

            cols["html"] = render_html_batch(text_arr).cast(pa.binary())
        else:
            # html: seeded bytes, log-normal-ish length via hash; includes
            # empty and multi-KiB outliers (FIXTURES.md F1) — CI-sized
            hl = (h >> np.uint64(20)) % np.uint64(512)
            hl = np.where(hl % np.uint64(97) == 0, np.uint64(0), hl)          # empties
            hl = np.where(hl % np.uint64(101) == 0, hl * np.uint64(64), hl)   # outliers
            payload = (h & np.uint64(0xFF)).astype(np.uint8)
            html = [bytes([int(payload[k])]) * int(hl[k]) for k in range(n)]
            cols["html"] = pa.array(html, type=pa.binary())
    order = ["url", "warc_ts", "html", "text", "lang"] if with_html else [
        "url", "warc_ts", "text", "lang"]
    return pa.table({k: cols[k] for k in order})


def pages_geotag(urls: pa.Array | list[str], *, skew_frac: float = 0.05):
    """The canonical url -> (lat, lon) geotag with the hot-cell skew knob:
    urls whose FNV hash falls in the lowest ``skew_frac`` of hash space are
    pinned to (HOT_LAT, HOT_LON)."""
    h = fnv1a_64(urls)
    lat, lon = geotag_from_hash(h)
    if skew_frac > 0:
        hot = splitmix64(h) < np.uint64(int(skew_frac * 2**64))
        lat = np.where(hot, HOT_LAT, lat)
        lon = np.where(hot, HOT_LON, lon)
    return lat, lon


def _write_shard(args) -> str:
    """Module-level so ProcessPoolExecutor can pickle it."""
    out_path, start, stop, with_html = args
    import os
    import pyarrow.parquet as pq

    if not os.path.exists(out_path):
        tmp = out_path + ".tmp"
        pq.write_table(make_pages_batch(start, stop, with_html=with_html), tmp)
        os.replace(tmp, out_path)
    return out_path


def write_pages_parquet(out_dir: str, num_rows: int, *, rows_per_file: int = 250_000,
                        with_html: bool = True, max_workers: int = 16) -> list[str]:
    """Materialize the synthetic pages table as a sharded parquet dataset.
    Shards are independent pure functions, so generation runs in a local
    process pool (one-time cost; bench reuses the cached files)."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for shard, start in enumerate(range(0, num_rows, rows_per_file)):
        stop = min(start + rows_per_file, num_rows)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        jobs.append((path, start, stop, with_html))
    todo = [j for j in jobs if not os.path.exists(j[0])]
    if todo:
        if len(todo) == 1:
            _write_shard(todo[0])
        else:
            with ProcessPoolExecutor(max_workers=min(max_workers, len(todo))) as ex:
                list(ex.map(_write_shard, todo))
    return [j[0] for j in jobs]


def synth_pages_dataset(num_rows: int, *, rows_per_block: int = 100_000,
                        with_html: bool = True):
    """The pages table as a lazy Ray Dataset: one generation task per shard
    (scales to any size — nothing materializes on the driver)."""
    import ray.data as rd

    starts = list(range(0, num_rows, rows_per_block))

    def gen(batch: pa.Table) -> pa.Table:
        s = int(batch["start"][0].as_py())
        return make_pages_batch(s, min(s + rows_per_block, num_rows), with_html=with_html)

    return (
        rd.from_items([{"start": s} for s in starts])
        .repartition(len(starts))
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
    )
