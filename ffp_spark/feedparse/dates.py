"""Date normalization: any feed date string -> ISO-8601 UTC string.

Independent implementation of the reference's date cascade
(``main.py:2011-2304``): ISO fast paths, quirky-feed fixes (Feb-29 in
non-leap years, hour 24 rollover), an RFC-822 fast lane with a named
time-zone table, then email.utils and dateutil fallbacks.  Output is a
*string* (``datetime.isoformat()`` of a UTC-aware datetime), matching
the reference's serialization-friendly choice byte for byte.

Designed to be called on deduplicated numpy/pandas batches from the
Arrow UDF (`parse_date_unique`), replacing the reference's lru_cache
with set-level vectorization.
"""

from __future__ import annotations

import datetime as _dt
import re
from email.utils import parsedate_to_datetime
from functools import lru_cache
from typing import Iterable, Optional

try:
    from dateutil import parser as _du_parser

    _HAS_DATEUTIL = True
except ImportError:  # pragma: no cover
    _HAS_DATEUTIL = False

UTC = _dt.timezone.utc

_WS = re.compile(r"\s+")
_FEB29 = re.compile(r"(\d{4})-02-29")
_H24 = re.compile(r"(\d{4}-\d{2}-\d{2})[T ]24:(\d{2}):(\d{2})")
_TZ4 = re.compile(r"([+-]\d{2})(\d{2})$")
_TZ2 = re.compile(r"([+-]\d{2})$")
_FRAC7 = re.compile(r"\.(\d{7,})(?=(?:[+-]\d{2}:?\d{2}|Z|$))", re.IGNORECASE)
_RFC822 = re.compile(
    r"(?:\w{3},\s+)?(\d{1,2})\s+(\w{3})\s+(\d{4})\s+(\d{2}):(\d{2}):(\d{2})\s+([+-]\d{4}|[A-Z]{2,5})"
)

_MONTH_NUM = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

# Named zones seen in real-world RSS pubDates (offsets in seconds).
TZ_OFFSETS: dict[str, int] = {
    "UTC": 0, "UT": 0, "GMT": 0, "WET": 0,
    "WEST": 3600, "BST": 3600, "CET": 3600,
    "CEST": 7200, "EET": 7200,
    "EEST": 10800, "MSK": 10800,
    "IST": 19800,
    "PST": -28800, "PDT": -25200, "MST": -25200,
    "MDT": -21600, "CST": -21600,
    "CDT": -18000, "EST": -18000,
    "EDT": -14400,
    "AKST": -32400, "AKDT": -28800,
    "HST": -36000, "HAST": -36000, "HADT": -32400,
    "AEST": 36000, "AEDT": 39600,
    "ACST": 34200, "ACDT": 37800,
    "AWST": 28800,
    "NZST": 43200, "NZDT": 46800,
    "JST": 32400, "KST": 32400,
    "SGT": 28800, "SST": 28800,
    "China Standard Time": 28800,
    "Australian Eastern Standard Time": 36000,
    "Australian Eastern Daylight Time": 39600,
}


def _to_utc(dt: _dt.datetime) -> Optional[_dt.datetime]:
    try:
        if dt.tzinfo is None:
            return dt.replace(tzinfo=UTC)
        return dt.astimezone(UTC)
    except (ValueError, OverflowError):
        return None


def _iso_friendly(value: str) -> str:
    """Massage loose ISO-8601 variants into fromisoformat territory."""
    s = value.strip()
    if not s:
        return s
    if s[-1] in "Zz":
        return s[:-1] + "+00:00"
    if len(s) > 6 and s[-6] in "+-" and s[-3] == ":":
        return s
    upper = s.upper()
    for suffix in (" UTC", " GMT", " Z"):
        if upper.endswith(suffix):
            s = s[: -len(suffix)].rstrip() + "+00:00"
            upper = s.upper()
            break
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    if (
        " " in s
        and "T" not in s[:11]
        and len(s) >= 10
        and s[4] == "-"
        and s[0:4].isdigit()
    ):
        day_part, clock = s.split(" ", 1)
        if clock and clock[0].isdigit():
            s = f"{day_part}T{clock}"
    m = _TZ4.search(s)
    if m:
        s = s[:-5] + f"{m.group(1)}:{m.group(2)}"
    else:
        m = _TZ2.search(s)
        if m:
            s = s[:-3] + f"{m.group(1)}:00"
    return _FRAC7.sub(lambda mm: "." + mm.group(1)[:6], s, count=1)


def _rfc822_fast(value: str) -> Optional[str]:
    """Regex RFC-822 lane; formats UTC results without datetime objects."""
    m = _RFC822.match(value)
    if not m:
        return None
    day_s, mon_s, year_s, hh, mm, ss, tz = m.groups()
    month = _MONTH_NUM.get(mon_s.lower())
    if month is None:
        return None
    if tz[0] in "+-":
        offset = (int(tz[1:3]) * 3600 + int(tz[3:5]) * 60) * (1 if tz[0] == "+" else -1)
    else:
        maybe = TZ_OFFSETS.get(tz)
        if maybe is None:
            return None
        offset = maybe
    if not (-86400 < offset < 86400):
        return None
    day, hour, minute, sec = int(day_s), int(hh), int(mm), int(ss)
    if hour == 24:  # roll to next day 00:mm:ss
        rolled = _dt.date(int(year_s), month, day) + _dt.timedelta(days=1)
        if offset == 0:
            return f"{rolled.year:04d}-{rolled.month:02d}-{rolled.day:02d}T00:{minute:02d}:{sec:02d}+00:00"
        aware = _dt.datetime(
            rolled.year, rolled.month, rolled.day, 0, minute, sec,
            tzinfo=_dt.timezone(_dt.timedelta(seconds=offset)),
        ).astimezone(UTC)
        return f"{aware.year:04d}-{aware.month:02d}-{aware.day:02d}T{aware.hour:02d}:{aware.minute:02d}:{aware.second:02d}+00:00"
    if offset == 0:
        return f"{year_s}-{month:02d}-{day:02d}T{hh}:{mm}:{ss}+00:00"
    aware = _dt.datetime(
        int(year_s), month, day, hour, minute, sec,
        tzinfo=_dt.timezone(_dt.timedelta(seconds=offset)),
    ).astimezone(UTC)
    return f"{aware.year:04d}-{aware.month:02d}-{aware.day:02d}T{aware.hour:02d}:{aware.minute:02d}:{aware.second:02d}+00:00"


@lru_cache(maxsize=512)
def _dateutil_fallback(value: str) -> Optional[_dt.datetime]:
    if not _HAS_DATEUTIL:
        return None
    try:
        return _du_parser.parse(value, tzinfos=TZ_OFFSETS, ignoretz=False)
    except (ValueError, TypeError, OverflowError):
        return None


def to_iso_utc(date_str: Optional[str]) -> Optional[str]:
    """Full cascade; returns ISO-8601 UTC string or None.  Memoized —
    feed corpora repeat pubDates heavily (reference uses lru 8192)."""
    if not date_str:
        return None
    return _cascade_cached(date_str)


@lru_cache(maxsize=16384)
def _cascade_cached(date_str: str) -> Optional[str]:
    s = date_str.strip()
    if not s:
        return None

    # fast lane 1: clean ISO with Z or +HH:MM (the vast majority)
    n = len(s)
    if n >= 20 and s[4] == "-" and s[0:4].isdigit():
        if s[-1] in "Zz":
            try:
                return _dt.datetime.fromisoformat(s[:-1] + "+00:00").isoformat()
            except ValueError:
                pass
        elif n > 6 and s[-6] in "+-" and s[-3] == ":":
            try:
                dt = _dt.datetime.fromisoformat(s)
                return dt.isoformat() if dt.tzinfo is UTC else dt.astimezone(UTC).isoformat()
            except (ValueError, OverflowError):
                pass

    if "\n" in s or "\r" in s or "\t" in s or "  " in s:
        s = _WS.sub(" ", s)

    # quirk: Feb 29 in a non-leap year -> Feb 28
    if "-02-29" in s:
        m = _FEB29.match(s)
        if m:
            y = int(m.group(1))
            if not ((y % 4 == 0 and y % 100 != 0) or (y % 400 == 0)):
                s = s.replace(f"{y}-02-29", f"{y}-02-28")

    # quirk: hour 24 -> next day 00:mm:ss
    if "T24:" in s or " 24:" in s:
        m = _H24.search(s)
        if m:
            base = _dt.date.fromisoformat(m.group(1)) + _dt.timedelta(days=1)
            s = f"{s[:m.start()]}{base}T00:{int(m.group(2)):02d}:{int(m.group(3)):02d}{s[m.end():]}"

    if len(s) >= 10 and s[4] == "-" and s[0:4].isdigit():
        try:
            dt = _dt.datetime.fromisoformat(_iso_friendly(s))
        except ValueError:
            dt = None
        if dt is not None:
            utc = _to_utc(dt)
            if utc is not None:
                return utc.isoformat()

    fast = _rfc822_fast(s)
    if fast is not None:
        return fast

    try:
        parsed = parsedate_to_datetime(s)
    except (TypeError, ValueError, IndexError):
        parsed = None
    if parsed is not None:
        utc = _to_utc(parsed)
        if utc is not None:
            return utc.isoformat()

    slow = _dateutil_fallback(s)
    if slow is not None:
        utc = _to_utc(slow)
        if utc is not None:
            return utc.isoformat()

    return None


def parse_date_unique(values: Iterable[Optional[str]]) -> dict[str, Optional[str]]:
    """Vectorization hook: parse each *unique* string once per Arrow batch
    (columnar replacement for the reference's per-call lru_cache)."""
    out: dict[str, Optional[str]] = {}
    for v in values:
        if v is not None and v not in out:
            out[v] = to_iso_utc(v)
    return out
