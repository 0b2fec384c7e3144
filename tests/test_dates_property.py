"""Property-based date-cascade tests: any RFC-822 / ISO-8601 rendering
of a known UTC instant must normalize back to exactly that instant."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from ffp_spark.feedparse.dates import TZ_OFFSETS, to_iso_utc

_instants = st.datetimes(
    min_value=dt.datetime(1980, 1, 3),
    max_value=dt.datetime(2100, 12, 28),
).map(lambda d: d.replace(microsecond=0))

_offsets_min = st.integers(min_value=-14 * 60, max_value=14 * 60).filter(
    lambda m: m % 15 == 0
)

_WEEKDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _expected_iso(instant: dt.datetime, offset_min: int) -> str:
    aware = instant.replace(tzinfo=dt.timezone(dt.timedelta(minutes=offset_min)))
    return aware.astimezone(dt.timezone.utc).isoformat()


@settings(max_examples=300, deadline=None)
@given(_instants, _offsets_min)
def test_iso_with_numeric_offset_roundtrips(instant, offset_min):
    sign = "+" if offset_min >= 0 else "-"
    hh, mm = divmod(abs(offset_min), 60)
    raw = instant.strftime("%Y-%m-%dT%H:%M:%S") + f"{sign}{hh:02d}:{mm:02d}"
    assert to_iso_utc(raw) == _expected_iso(instant, offset_min)


@settings(max_examples=300, deadline=None)
@given(_instants, _offsets_min)
def test_iso_compact_offset_roundtrips(instant, offset_min):
    sign = "+" if offset_min >= 0 else "-"
    hh, mm = divmod(abs(offset_min), 60)
    raw = instant.strftime("%Y-%m-%d %H:%M:%S") + f"{sign}{hh:02d}{mm:02d}"
    assert to_iso_utc(raw) == _expected_iso(instant, offset_min)


@settings(max_examples=300, deadline=None)
@given(_instants)
def test_iso_zulu_roundtrips(instant):
    raw = instant.strftime("%Y-%m-%dT%H:%M:%SZ")
    assert to_iso_utc(raw) == _expected_iso(instant, 0)


@settings(max_examples=300, deadline=None)
@given(_instants, _offsets_min)
def test_rfc822_numeric_offset_roundtrips(instant, offset_min):
    sign = "+" if offset_min >= 0 else "-"
    hh, mm = divmod(abs(offset_min), 60)
    wd = _WEEKDAYS[instant.weekday()]
    raw = (
        f"{wd}, {instant.day:02d} {_MONTHS[instant.month - 1]} {instant.year} "
        f"{instant:%H:%M:%S} {sign}{hh:02d}{mm:02d}"
    )
    assert to_iso_utc(raw) == _expected_iso(instant, offset_min)


@settings(max_examples=200, deadline=None)
@given(_instants, st.sampled_from(sorted(k for k in TZ_OFFSETS if k.isupper() and " " not in k)))
def test_rfc822_named_zone_roundtrips(instant, zone):
    wd = _WEEKDAYS[instant.weekday()]
    raw = (
        f"{wd}, {instant.day:02d} {_MONTHS[instant.month - 1]} {instant.year} "
        f"{instant:%H:%M:%S} {zone}"
    )
    assert to_iso_utc(raw) == _expected_iso(instant, TZ_OFFSETS[zone] // 60)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_garbage_never_raises(s):
    out = to_iso_utc(s)
    assert out is None or isinstance(out, str)
