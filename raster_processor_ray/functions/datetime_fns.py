"""Date/time scalar functions (SURVEY.md §2.8).

The reference converts between the SWOT product epoch (2000-01-01) and the
Unix epoch and formats/parses UTC strings (products.py:22-27,
raster_proc.py:527-543, products.py:1196-1210), plus a leap-second window
check (raster_proc.py:552-562). Re-expressed over Arrow ``timestamp[us]``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SWOT_EPOCH_US = 946_684_800_000_000  # 2000-01-01T00:00:00Z in unix microseconds


def swot_seconds_to_timestamp(col) -> pa.Array:
    """float seconds-since-2000 -> timestamp[us] (products.py:22-27 analog)."""
    us = pc.add(pc.cast(pc.round(pc.multiply(col, 1e6)), pa.int64()),
                pa.scalar(SWOT_EPOCH_US, type=pa.int64()))
    return pc.cast(us, pa.timestamp("us"))


def timestamp_to_swot_seconds(col) -> pa.Array:
    us = pc.subtract(pc.cast(col, pa.int64()), pa.scalar(SWOT_EPOCH_US, type=pa.int64()))
    return pc.divide(pc.cast(us, pa.float64()), 1e6)


def format_utc(col) -> pa.Array:
    """timestamp[us] -> 'YYYY-MM-DDTHH:MM:SSZ' strings (products.py:1196-1210).

    Arrow's %S renders fractional seconds on sub-second types, so truncate
    to second precision first."""
    secs = pc.cast(col, pa.timestamp("s"), safe=False)
    return pc.strftime(secs, format="%Y-%m-%dT%H:%M:%SZ")


def parse_utc(col) -> pa.Array:
    return pc.strptime(col, format="%Y-%m-%dT%H:%M:%SZ", unit="us")


def datetime_str_comp(a: str, b: str) -> int:
    """Lexicographic ISO-datetime comparator (products.py:1904-1916 analog:
    ISO-8601 strings compare correctly as strings)."""
    return (a > b) - (a < b)


# leap seconds after 2000-01-01 (public IERS table)
_LEAP_US = [
    1_136_073_600_000_000,  # 2006-01-01
    1_230_768_000_000_000,  # 2009-01-01
    1_341_100_800_000_000,  # 2012-07-01
    1_435_708_800_000_000,  # 2015-07-01
    1_483_228_800_000_000,  # 2017-01-01
]


def in_leap_second_window(col, window_us: int = 1_000_000) -> pa.Array:
    """True where a timestamp falls within +/-window of a leap-second
    boundary (reference raster_proc.py:552-562 flags these)."""
    us = pc.cast(col, pa.int64())
    m = pa.array(np.zeros(len(us), dtype=bool))
    for leap in _LEAP_US:
        near = pc.and_(pc.greater_equal(us, pa.scalar(leap - window_us)),
                       pc.less_equal(us, pa.scalar(leap + window_us)))
        m = pc.or_(m, near)
    return m
