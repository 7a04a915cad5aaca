"""Date-math expression parser — the reference's DateMathParser analog.

Reference: /root/reference/src/main/java/org/elasticsearch/common/joda/
DateMathParser.java (used by range queries / date_range aggs on date
fields): an anchor (``now`` or ``<date>||``) followed by operations
``+N<unit>`` / ``-N<unit>`` (arithmetic) and ``/<unit>`` (round down).
Units: y M w d h H m s (month is capital M, minute lowercase m).

Re-derived from the published syntax, not a port: month arithmetic clamps
the day-of-month like Joda's addMonths; ``/w`` rounds to the ISO week
(Monday), matching Joda weekOfWeekyear roundFloor.

Resolution happens driver-side before the query runs — exactly where the
reference resolves it (on the coordinating node while parsing the request)
— so the executors only ever see a constant timestamp and partition
pruning on a time-partitioned table still applies.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_OP_RE = re.compile(r"([+\-]\d+[yMwdhHms])|(/[yMwdhHms])")
_ANCHOR_FORMATS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    "%Y-%m",
    "%Y",
)


def _add_months(dt: datetime, n: int) -> datetime:
    """Joda addMonths: clamp the day to the target month's last day."""
    month0 = dt.year * 12 + (dt.month - 1) + n
    y, m = divmod(month0, 12)
    day = min(dt.day, calendar.monthrange(y, m + 1)[1])
    return dt.replace(year=y, month=m + 1, day=day)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ISO week, Monday 00:00 (Joda weekOfWeekyear floor)
        floor = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return floor - timedelta(days=dt.weekday())
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    if unit == "s":
        return dt.replace(microsecond=0)
    raise ValueError(f"unknown rounding unit {unit!r}")


def _shift(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "y":
        return _add_months(dt, 12 * n)
    if unit == "M":
        return _add_months(dt, n)
    step = {
        "w": timedelta(weeks=1),
        "d": timedelta(days=1),
        "h": timedelta(hours=1),
        "H": timedelta(hours=1),
        "m": timedelta(minutes=1),
        "s": timedelta(seconds=1),
    }[unit]
    return dt + n * step


def parse_date_math(expr: str, now: datetime | str | None = None) -> datetime:
    """Resolve ``now-1d/d``-style expressions to a concrete datetime.

    ``now`` anchors relative expressions (defaults to datetime.utcnow);
    an explicit date anchor is written ``<date>||<ops>`` per the reference
    grammar, e.g. ``2024-01-01||+1M/d``.
    """
    expr = expr.strip()
    if isinstance(now, str):
        now = _parse_anchor(now)
    if expr.startswith("now"):
        anchor = now if now is not None else datetime.utcnow()
        ops = expr[3:]
    elif "||" in expr:
        date_part, ops = expr.split("||", 1)
        anchor = _parse_anchor(date_part)
    else:
        anchor = _parse_anchor(expr)
        ops = ""
    pos = 0
    dt = anchor
    while pos < len(ops):
        m = _OP_RE.match(ops, pos)
        if not m:
            raise ValueError(f"invalid date-math op at {ops[pos:]!r} in {expr!r}")
        tok = m.group(0)
        if tok.startswith("/"):
            dt = _round_down(dt, tok[1])
        else:
            dt = _shift(dt, int(tok[:-1]), tok[-1])
        pos = m.end()
    return dt


def _parse_anchor(s: str) -> datetime:
    s = s.strip()
    for fmt in _ANCHOR_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date anchor {s!r}")
