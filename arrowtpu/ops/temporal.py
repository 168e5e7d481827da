"""Temporal kernels: date_part extraction.

Capability mirror of /root/reference/arrow-arith/src/temporal.rs:207
(`date_part(array, DatePart)` for all temporal types) re-designed TPU-first:
civil-calendar decomposition runs as pure integer arithmetic on the uint32
limb plane (core/wide.py) — exact, fully fused by XLA, no host round-trip.
The day-count -> (year, month, day) conversion uses the civil-from-days
algorithm (Howard Hinnant's public-domain date algorithms, the same one
chrono uses under the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import schema as st
from ..core import column as col
from ..core import wide as wd
from .cast import _UNIT_NS, _const_limbs, _i64_scale

# DatePart names (reference temporal.rs DatePart enum)
PARTS = (
    "year", "quarter", "month", "week", "day", "day_of_week_sunday0",
    "day_of_week_monday0", "day_of_year", "hour", "minute", "second",
    "millisecond", "microsecond", "nanosecond",
)


def _to_days_and_subsec_ns(c: col.PrimitiveColumn):
    """column -> (days int32, nanos-of-day as i64 limbs)."""
    dt = c.dtype
    if isinstance(dt, st.Date32):
        days = c.values.astype(jnp.int32)
        return days, wd.zeros(days.shape)
    if isinstance(dt, st.Date64):
        ms = c.values
        days_l = _i64_scale(ms, 1, 86_400_000, floor=True)
        days = wd.to_int32_wrap(days_l)
        rem_ms = wd.sub(ms, _i64_scale(days_l, 86_400_000, 1))
        return days, _i64_scale(rem_ms, 10**6, 1)
    if isinstance(dt, (st.Timestamp, st.Duration)):
        unit_ns = _UNIT_NS[dt.unit]
        ns = _i64_scale(c.values, unit_ns, 1)
        if isinstance(dt, st.Timestamp) and dt.tz:
            ns = _apply_tz(ns, dt.tz)
        day_ns = 86_400_000_000_000
        days_l = _i64_scale(ns, 1, day_ns, floor=True)
        days = wd.to_int32_wrap(days_l)
        rem = wd.sub(ns, _i64_scale(days_l, day_ns, 1))
        return days, rem
    if isinstance(dt, (st.Time32, st.Time64)):
        unit_ns = _UNIT_NS[dt.unit]
        vals = c.values if c.wide is not None else wd.from_int32(c.values)
        return jnp.zeros(c.capacity, jnp.int32), _i64_scale(vals, unit_ns, 1)
    raise st.ComputeError(f"date_part: not a temporal column ({dt})")


def _apply_tz(ns_utc, tz: str):
    """UTC instant (i64 ns limbs) -> local wall-clock ns for extraction
    (reference arrow-array/src/timezone.rs + temporal.rs date_part on
    tz-aware timestamps).

    TPU-native: the zone's transition list (ops/tzdb.py, TZif from host
    tzdata) becomes  offset(t) = base + sum_i delta_i * [t_sec >= T_i],
    a fused elementwise pass over ~10-250 transition constants — exact at
    transition edges (the comparison is on whole UTC seconds, which is
    the granularity TZif transitions are defined at), no device gather."""
    from . import tzdb

    base, times, deltas = tzdb.offsets_for(tz)
    sec = _i64_scale(ns_utc, 1, 10**9, floor=True)
    off = jnp.full(sec.shape[:-1], base, jnp.int32)
    for t, d in zip(times.tolist(), deltas.tolist()):
        ge = ~wd.lt_signed(sec, jnp.broadcast_to(_const_limbs(t), sec.shape))
        off = off + jnp.where(ge, jnp.int32(d), jnp.int32(0))
    return wd.add(ns_utc, _i64_scale(wd.from_int32(off), 10**9, 1))


def _civil_from_days(z):
    """days-since-epoch (int32) -> (year, month, day, day_of_year) int32.
    civil_from_days, exact for +/- ~5.8M years — plain int32 VPU math."""
    z = z.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097  # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365  # [0, 399]
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)  # [0, 365]
    mp = (5 * doy + 2) // 153  # [0, 11] (March = 0)
    d = doy - (153 * mp + 2) // 5 + 1  # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)  # [1, 12]
    y = jnp.where(m <= 2, y + 1, y)
    # day-of-year with January 1 = 1
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    cum = jnp.asarray(
        np.concatenate([[0], np.cumsum([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30])])
    )
    day_of_year = cum[m - 1] + d + jnp.where(leap & (m > 2), 1, 0)
    return (
        y.astype(jnp.int32),
        m.astype(jnp.int32),
        d.astype(jnp.int32),
        day_of_year.astype(jnp.int32),
    )


def date_part(c: col.PrimitiveColumn, part: str) -> col.PrimitiveColumn:
    """reference temporal.rs:207.  Returns Int32 (nanosecond/microsecond/
    millisecond parts are the sub-second remainder scaled, like the
    reference)."""
    if part not in PARTS:
        raise st.ComputeError(f"unknown date part {part!r} (have {PARTS})")
    days, ns = _to_days_and_subsec_ns(c)
    if part in ("hour", "minute", "second", "millisecond", "microsecond", "nanosecond"):
        sec_l = _i64_scale(ns, 1, 10**9, floor=True)
        sec = wd.to_int32_wrap(sec_l)  # [0, 86400)
        subsec_ns = wd.to_int32_wrap(wd.sub(ns, _i64_scale(sec_l, 10**9, 1)))
        out = {
            "hour": lambda: sec // 3600,
            "minute": lambda: (sec // 60) % 60,
            "second": lambda: sec % 60,
            "millisecond": lambda: subsec_ns // 10**6,
            "microsecond": lambda: subsec_ns // 10**3,
            "nanosecond": lambda: subsec_ns,
        }[part]()
        return col.PrimitiveColumn(out.astype(jnp.int32), c.validity, c.length, st.int32)
    y, m, d, doy = _civil_from_days(days)
    if part == "year":
        out = y
    elif part == "quarter":
        out = (m - 1) // 3 + 1
    elif part == "month":
        out = m
    elif part == "day":
        out = d
    elif part == "day_of_year":
        out = doy
    elif part in ("day_of_week_sunday0", "day_of_week_monday0"):
        # 1970-01-01 was a Thursday
        dow_sun0 = (days.astype(jnp.int64) + 4) % 7
        dow_sun0 = jnp.where(dow_sun0 < 0, dow_sun0 + 7, dow_sun0).astype(jnp.int32)
        out = dow_sun0 if part == "day_of_week_sunday0" else (dow_sun0 + 6) % 7
    elif part == "week":
        # ISO week number: week of the Thursday of this date's week
        dow_mon0 = (days.astype(jnp.int64) + 3) % 7
        dow_mon0 = jnp.where(dow_mon0 < 0, dow_mon0 + 7, dow_mon0)
        thursday = days.astype(jnp.int64) - dow_mon0 + 3
        ty, _, _, tdoy = _civil_from_days(thursday.astype(jnp.int32))
        out = (tdoy - 1) // 7 + 1
    else:  # pragma: no cover
        raise AssertionError(part)
    return col.PrimitiveColumn(out.astype(jnp.int32), c.validity, c.length, st.int32)


def year(c):
    return date_part(c, "year")


def month(c):
    return date_part(c, "month")


def day(c):
    return date_part(c, "day")


def hour(c):
    return date_part(c, "hour")


def minute(c):
    return date_part(c, "minute")


def second(c):
    return date_part(c, "second")
