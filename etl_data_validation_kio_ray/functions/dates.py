"""Date/timestamp scalar functions.

The reference's ISO parser tolerates 'Z' suffixes and returns None on
failure (/root/reference/src/app2/utils/dates.py:5-11, used by the
consistency suite at
/root/reference/src/app2/validators/stg/consistency_suite/matches_consistency.py:9-15).
Vectorized here: Arrow strptime with a Z->+00:00 fixup, nulls (not
exceptions) for unparseable rows, UTC-naive output (matches DuckDB —
ray_guide 'Timestamps').
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_iso_timestamp(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """ISO-8601 strings -> timestamp[us] (naive UTC); unparseable -> null."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    fixed = pc.replace_substring_regex(values, r"Z$", "+00:00")
    # try datetime-with-offset, then plain datetime, then date
    out = None
    for fmt in ("%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        parsed = pc.strptime(fixed, format=fmt, unit="us", error_is_null=True)
        if parsed.type.tz is not None:
            parsed = pc.local_timestamp(parsed)
        out = parsed if out is None else pc.if_else(pc.is_valid(out), out, parsed)
    return out


def extract_year(ts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """EXTRACT(YEAR ...) analog (mart_views.sql:70-74)."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    return pc.cast(pc.year(ts), pa.int32())


def iso_year_week(days: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """ISO-8601 (year, week) from int64 days-since-epoch, pure numpy
    (no Python date objects): the ISO week of a date is the week of its
    Thursday, and the ISO year is that Thursday's calendar year —
    1970-01-01 was a Thursday, so Monday-start weekday = (d + 3) % 7.
    Bit-exact with DuckDB isoyear()/week() and Python
    date.isocalendar() for all representable dates."""
    import numpy as np

    days = np.asarray(days, dtype=np.int64)
    wd = (days + 3) % 7
    thu = (days - wd + 3).astype("datetime64[D]")
    iso_year_d = thu.astype("datetime64[Y]")
    week = (thu - iso_year_d.astype("datetime64[D]")).astype(np.int64) // 7 + 1
    iso_year = iso_year_d.astype(np.int64) + 1970
    return iso_year, week
