"""Timestamp helpers matching the reference's BigQuery formatting idioms.

The reference formats timestamps as ``%Y-%m-%d %H:%M:%E6S UTC``
(macros/utils/log_helpers.sql:271,297) and parses them back with the same
pattern for window arithmetic; microsecond precision, always UTC.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

# BigQuery FORMAT_TIMESTAMP('%Y-%m-%d %H:%M:%E6S UTC', ts) equivalent.
TS_FORMAT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'"
TS_FORMAT_PY = "%Y-%m-%d %H:%M:%S.%f UTC"
DEFAULT_WATERMARK = "1900-01-01 00:00:00.000000 UTC"


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def format_timestamp_utc(ts: Column | str) -> Column:
    """Format a timestamp as the reference's canonical UTC string."""
    return F.date_format(_col(ts), TS_FORMAT_SPARK)


def to_timestamp_utc(ts_string: Column | str) -> Column:
    """Inverse of :func:`format_timestamp_utc` (also accepts plain ISO)."""
    c = _col(ts_string)
    return F.to_timestamp(F.regexp_replace(c, " UTC$", ""))


def ts_ns_to_timestamp(ns: Column | str) -> Column:
    """Epoch-nanoseconds (long) → TimestampType, truncating to microseconds.

    Exact decimal division — not ``/`` — because 2024-epoch nanos (~1.7e18)
    exceed double's 53-bit mantissa and float division would corrupt the
    microseconds.
    """
    micros = (_col(ns).cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def parse_ts(s: str) -> datetime:
    """Python-side parse of the canonical string (naive UTC), used by the
    runner's window arithmetic (reference: log_helpers.sql:226-235)."""
    return datetime.strptime(s, TS_FORMAT_PY)


def fmt_ts(dt: datetime) -> str:
    """Python-side format to the canonical string."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt.strftime(TS_FORMAT_PY)


def min_ts_string(timestamps: list[str | None]) -> str | None:
    """Lowest of a list of canonical timestamp strings (None/empty skipped).
    Pure-Python replacement for the reference's BigQuery round-trip
    (macros/utils/log_helpers.sql:255-278)."""
    cleaned = [t for t in timestamps if t and t.strip() and t != "None"]
    if not cleaned:
        return None
    return fmt_ts(min(parse_ts(t) for t in cleaned))


def max_ts_string(timestamps: list[str | None]) -> str | None:
    """Highest of a list of canonical timestamp strings.
    Reference: macros/utils/log_helpers.sql:281-304."""
    cleaned = [t for t in timestamps if t and t.strip() and t != "None"]
    if not cleaned:
        return None
    return fmt_ts(max(parse_ts(t) for t in cleaned))


def minus_microsecond(dt: datetime) -> datetime:
    """Boundary − 1 μs, as used for earliest-partition watermark fallback
    (reference: log_helpers.sql:327-330)."""
    return dt - timedelta(microseconds=1)
