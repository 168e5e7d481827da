"""Timezone database: TZif (RFC 8536) parser + fixed-offset parsing.

Capability mirror of the reference's timezone layer
(/root/reference/arrow-array/src/timezone.rs: Tz parses fixed offsets
"+HH:MM" and IANA names via chrono-tz; arrow-arith/src/temporal.rs
applies it in date_part).  TPU-native re-design: a zone becomes a small
static table of (UTC transition second, offset delta), and the per-row
offset is computed as  base + sum_i delta_i * [t >= T_i]  — a fully
fused elementwise pass over the transition list (~100-300 entries per
zone), with no device gather and no host round-trip.

The TZif binary format is implemented from RFC 8536 (the stdlib's
zoneinfo does not expose raw transitions).  Files come from the host's
tzdata (/usr/share/zoneinfo).  Version 2+ blocks (64-bit transition
times) are used when present.  Instants beyond the last transition use
the last transition's offset (TZif footer POSIX rules for the far
future are not evaluated; tzdata ships explicit transitions through
2037 for DST zones).
"""

from __future__ import annotations

import functools
import os
import struct
from typing import Tuple

import numpy as np

from .. import schema as st

_ZONEINFO_DIRS = (
    "/usr/share/zoneinfo",
    "/usr/lib/zoneinfo",
    "/etc/zoneinfo",
)


def _parse_fixed(tz: str):
    """'+HH:MM' / '-HH:MM' / '+HH:MM:SS' fixed offsets (reference
    timezone.rs FixedOffset parse)."""
    if not tz or tz[0] not in "+-":
        return None
    sign = 1 if tz[0] == "+" else -1
    body = tz[1:]
    parts = body.split(":")
    try:
        if len(parts) == 1 and len(body) == 4:  # +HHMM
            h, m, s = int(body[:2]), int(body[2:]), 0
        else:
            h = int(parts[0])
            m = int(parts[1]) if len(parts) > 1 else 0
            s = int(parts[2]) if len(parts) > 2 else 0
    except ValueError:
        return None
    if h > 23 or m > 59 or s > 59:
        return None
    return sign * (h * 3600 + m * 60 + s)


def _read_tzif(path: str):
    """RFC 8536: returns (transition_times int64[], offsets int32[]) where
    offsets[i] applies to t >= times[i-1] (offsets[0] = before the first
    transition)."""
    with open(path, "rb") as f:
        data = f.read()

    def parse_block(buf, off, tsize, tfmt):
        (isutcnt, isstdcnt, leapcnt, timecnt, typecnt, charcnt,
         ) = struct.unpack_from(">6I", buf, off + 20)
        p = off + 44
        times = np.frombuffer(buf, tfmt, timecnt, p).astype(np.int64)
        p += timecnt * tsize
        idx = np.frombuffer(buf, np.uint8, timecnt, p)
        p += timecnt
        utoffs = np.zeros(typecnt, np.int32)
        for i in range(typecnt):
            utoff, _isdst, _di = struct.unpack_from(">iBB", buf, p + 6 * i)
            utoffs[i] = utoff
        p += typecnt * 6 + charcnt + leapcnt * (tsize + 4)
        p += isstdcnt + isutcnt
        return times, idx, utoffs, p

    if data[:4] != b"TZif":
        raise st.ArrowTpuError(f"tz: not a TZif file: {path}")
    version = data[4:5]
    times, idx, utoffs, end = parse_block(data, 0, 4, ">i4")
    if version in (b"2", b"3", b"4") and end < len(data) \
            and data[end : end + 4] == b"TZif":
        times, idx, utoffs, _ = parse_block(data, end, 8, ">i8")

    if len(utoffs) == 0:
        raise st.ArrowTpuError(f"tz: no types in {path}")
    # initial offset (before the first transition): type 0, matching
    # zoneinfo/chrono behavior
    init = utoffs[0]
    seq = utoffs[idx] if len(idx) else np.zeros(0, np.int32)
    return times, np.concatenate([[init], seq]).astype(np.int32)


@functools.lru_cache(maxsize=256)
def zone_table(tz: str) -> Tuple[np.ndarray, np.ndarray]:
    """(transition UTC seconds int64[], per-interval offsets int32[]);
    offsets has len(times)+1 entries (offsets[0] = before times[0]).

    Raises ArrowTpuError for unknown zones."""
    fixed = _parse_fixed(tz)
    if fixed is not None:
        return np.zeros(0, np.int64), np.array([fixed], np.int32)
    if tz in ("UTC", "utc", "Etc/UTC", "Z", "+00:00"):
        return np.zeros(0, np.int64), np.array([0], np.int32)
    if "/" not in tz and tz not in ("GMT", "EST", "MST", "HST", "CET",
                                    "EET", "MET", "WET"):
        raise st.ArrowTpuError(f"tz: unknown timezone {tz!r}")
    if ".." in tz or tz.startswith("/"):
        raise st.ArrowTpuError(f"tz: bad timezone name {tz!r}")
    for d in _ZONEINFO_DIRS:
        path = os.path.join(d, tz)
        if os.path.exists(path):
            return _read_tzif(path)
    raise st.ArrowTpuError(f"tz: timezone {tz!r} not in host tzdata")


def offsets_for(tz: str):
    """(base offset int32, transition seconds int64[], deltas int32[]):
    offset(t) = base + sum_i deltas[i] * [t >= times[i]]."""
    times, offs = zone_table(tz)
    base = int(offs[0])
    deltas = np.diff(offs).astype(np.int32)
    return base, times, deltas
