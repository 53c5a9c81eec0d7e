"""Frequency grammar parser.

Mirrors the reference's accepted grammar (``docs/api/22-supported-frequencies.md:22-60``,
parsed in ``src/table_functions/ts_fill_gaps_native.hpp`` — ``ParseFrequencyWithType``):

- Polars-style short codes: ``'1d' '1h' '30m' '1s' '1w' '1mo' '1q' '1y'``
- DuckDB INTERVAL style: ``'1 day' '2 hours' '1 month'`` (plural or singular)
- Raw integers (string or int): integer-ordinal series, step k

Calendar vs fixed frequency is a first-class distinction (``gaps.rs:100-110``):
monthly/quarterly/yearly use real calendar arithmetic with month-end clamping;
everything else is a fixed number of seconds.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SECONDS = {
    "ms": None,  # sub-second not supported by reference; rejected below
    "s": 1,
    "sec": 1,
    "second": 1,
    "seconds": 1,
    "m": 60,
    "min": 60,
    "minute": 60,
    "minutes": 60,
    "h": 3600,
    "hr": 3600,
    "hour": 3600,
    "hours": 3600,
    "d": 86400,
    "day": 86400,
    "days": 86400,
    "w": 7 * 86400,
    "wk": 7 * 86400,
    "week": 7 * 86400,
    "weeks": 7 * 86400,
}

_MONTHS = {
    "mo": 1,
    "mon": 1,
    "month": 1,
    "months": 1,
    "q": 3,
    "quarter": 3,
    "quarters": 3,
    "y": 12,
    "yr": 12,
    "year": 12,
    "years": 12,
}

_PATTERN = re.compile(r"^\s*(\d+)\s*([a-zA-Z]+)\s*$")


@dataclass(frozen=True)
class Frequency:
    """Parsed frequency.

    kind:
      - ``'fixed'``  — ``n`` is the step in seconds
      - ``'month'``  — ``n`` is the step in calendar months (clamped arithmetic)
      - ``'int'``    — ``n`` is the step for integer-ordinal date columns
    """

    kind: str
    n: int

    @property
    def is_calendar(self) -> bool:
        return self.kind == "month"

    def spark_interval(self) -> str:
        """Spark SQL interval literal for fixed frequencies."""
        if self.kind != "fixed":
            raise ValueError(f"no fixed interval for kind={self.kind}")
        return f"INTERVAL {self.n} SECOND"

    def duckdb_interval(self) -> str:
        if self.kind == "fixed":
            return f"INTERVAL {self.n} SECOND"
        if self.kind == "month":
            return f"INTERVAL {self.n} MONTH"
        raise ValueError(f"no interval for kind={self.kind}")


def parse_frequency(freq) -> Frequency:
    """Parse a frequency spec into a :class:`Frequency`.

    Accepts int (integer-ordinal step), numeric string, short code
    (``'1d'``), or verbose interval (``'1 day'``).
    """
    if isinstance(freq, Frequency):
        return freq
    if isinstance(freq, int):
        if freq <= 0:
            raise ValueError(f"frequency step must be positive, got {freq}")
        return Frequency("int", freq)
    if not isinstance(freq, str):
        raise TypeError(f"unsupported frequency type: {type(freq)!r}")
    s = freq.strip()
    if re.fullmatch(r"\d+", s):
        return parse_frequency(int(s))
    m = _PATTERN.match(s)
    if not m:
        raise ValueError(f"invalid frequency: {freq!r}")
    count = int(m.group(1))
    unit = m.group(2).lower()
    if count <= 0:
        raise ValueError(f"frequency step must be positive: {freq!r}")
    if unit in _MONTHS:
        return Frequency("month", count * _MONTHS[unit])
    if unit in _SECONDS:
        secs = _SECONDS[unit]
        if secs is None:
            raise ValueError(f"sub-second frequency not supported: {freq!r}")
        return Frequency("fixed", count * secs)
    raise ValueError(f"invalid frequency unit {unit!r} in {freq!r}")
