"""Human schedule grammar for the sync loop.

The reference accepts ``every 1 hour`` / ``daily at 12:30`` style specs
for scheduled syncs (meerschaum/utils/schedule.py:21-154, APScheduler
under the hood). This is the dependency-free engine equivalent: a tiny
parser producing a ``Schedule`` that yields fire times; ``sync_loop``
drives batch syncs on it. Times are interpreted in UTC — the engine's
canonical timezone everywhere else.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass

_UNIT_SECONDS = {
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
}

_ALIASES = {
    "secondly": "every 1 second",
    "minutely": "every 1 minute",
    "hourly": "every 1 hour",
    "daily": "every 1 day",
    "weekly": "every 1 week",
}

_EVERY_RE = re.compile(
    r"^every\s+(\d+(?:\.\d+)?)\s*"
    r"(second|minute|hour|day|week)s?$")
_AT_RE = re.compile(
    r"^(?:daily|every\s+day)\s+at\s+(\d{1,2}):(\d{2})(?::(\d{2}))?$")


@dataclass(frozen=True)
class Schedule:
    """Either a fixed interval (``seconds``) or a daily wall-clock time
    (``at``, UTC)."""

    seconds: float | None = None
    at: datetime.time | None = None

    def next_fire(self, after: datetime.datetime) -> datetime.datetime:
        """First fire time strictly after ``after`` (naive = UTC)."""
        if self.seconds is not None:
            return after + datetime.timedelta(seconds=self.seconds)
        assert self.at is not None
        candidate = after.replace(hour=self.at.hour, minute=self.at.minute,
                                  second=self.at.second, microsecond=0)
        if candidate <= after:
            candidate += datetime.timedelta(days=1)
        return candidate


def parse_schedule(spec: "str | int | float") -> Schedule:
    """``every N {seconds|minutes|hours|days|weeks}``, ``hourly`` /
    ``daily`` / ``weekly`` aliases, ``daily at HH:MM[:SS]`` /
    ``every day at HH:MM``, or a bare number of seconds."""
    if isinstance(spec, (int, float)):
        if spec <= 0:
            raise ValueError(f"schedule interval must be positive: {spec!r}")
        return Schedule(seconds=float(spec))
    text = " ".join(str(spec).strip().lower().split())
    text = _ALIASES.get(text, text)
    m = _EVERY_RE.match(text)
    if m:
        n, unit = float(m.group(1)), m.group(2)
        if n <= 0:
            raise ValueError(f"schedule interval must be positive: {spec!r}")
        return Schedule(seconds=n * _UNIT_SECONDS[unit])
    m = _AT_RE.match(text)
    if m:
        hh, mm, ss = int(m.group(1)), int(m.group(2)), int(m.group(3) or 0)
        if not (0 <= hh < 24 and 0 <= mm < 60 and 0 <= ss < 60):
            raise ValueError(f"bad time of day in schedule: {spec!r}")
        return Schedule(at=datetime.time(hh, mm, ss))
    try:
        return parse_schedule(float(text))
    except ValueError:
        pass
    raise ValueError(
        f"cannot parse schedule {spec!r}; expected 'every N "
        "seconds|minutes|hours|days|weeks', 'hourly'/'daily'/'weekly', "
        "'daily at HH:MM', or a number of seconds")
