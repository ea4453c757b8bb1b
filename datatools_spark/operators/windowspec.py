"""Window-spec normalization (W5: diurnal.py:717-775 ``to_exact_indexing``).

The reference accepts a zoo of window specs — (start, end) tuples of
timestamps/strings, ``'first'``/``'last'`` sentinels, ``pd.Period``-style
day strings, int = days from series start — and snaps them to exact
bounds at the data's sampling resolution. Driver-side parameter logic by
design (SURVEY §2.5): it parameterizes filters, it is not a data-path
operator. The only data touch is one tiny min/max aggregate when a
sentinel or relative spec needs the series bounds.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_window"]


def _parse_point(x):
    if isinstance(x, dt.datetime):
        return x, False
    if isinstance(x, dt.date):
        return dt.datetime(x.year, x.month, x.day), True
    s = str(x)
    for fmt, date_only in (("%Y-%m-%d %H:%M:%S", False), ("%Y-%m-%d %H:%M", False),
                           ("%Y-%m-%d", True), ("%Y-%m", True), ("%Y", True)):
        try:
            return dt.datetime.strptime(s, fmt), date_only
        except ValueError:
            continue
    raise ValueError(f"cannot parse window endpoint {x!r}")


def _series_bounds(df: DataFrame, ts_col: str) -> tuple[dt.datetime, dt.datetime]:
    row = df.agg(F.min(ts_col).alias("a"), F.max(ts_col).alias("b")).collect()[0]
    return row["a"], row["b"]


def normalize_window(window, df: DataFrame | None = None,
                     ts_col: str = "ts") -> tuple[dt.datetime, dt.datetime]:
    """Normalize ``window`` to exact ``(start, end)`` datetimes.

    Accepted forms (diurnal.py:717-775 parity):
    - ``(start, end)`` — strings/datetimes; a date-only *end* extends to
      23:59:59 of that day (diurnal.py:774-775 ``make_end_of_day``);
      ``'first'``/``'last'`` sentinels resolve to the series bounds;
    - a single day/month string → that whole period;
    - ``int n`` → first n days from the series start.
    """
    if isinstance(window, int):
        if df is None:
            raise ValueError("int window requires the series")
        first, _ = _series_bounds(df, ts_col)
        return first, first + dt.timedelta(days=window)
    if isinstance(window, (tuple, list)) and len(window) == 2:
        start, end = window
        bounds = None
        if start in ("first",) or end in ("last",):
            if df is None:
                raise ValueError("'first'/'last' sentinels require the series")
            bounds = _series_bounds(df, ts_col)
        s = bounds[0] if start == "first" else _parse_point(start)[0]
        if end == "last":
            e = bounds[1]
        else:
            e, date_only = _parse_point(end)
            if date_only:
                # PERIOD-aware end like the single-string form: a month
                # or year endpoint covers the whole period — the old
                # flat +23:59:59 silently truncated ('2024-01','2024-03')
                # to March 1st, dropping 30 days from the clip
                es = str(end)
                if len(es) == 4:          # year
                    e = e.replace(year=e.year + 1) - dt.timedelta(seconds=1)
                elif len(es) == 7:        # month
                    nxt = e.replace(year=e.year + (e.month == 12),
                                    month=1 if e.month == 12 else e.month + 1)
                    e = nxt - dt.timedelta(seconds=1)
                else:
                    e = e + dt.timedelta(hours=23, minutes=59, seconds=59)
        if s is None or e is None:
            raise ValueError(
                "normalize_window: 'first'/'last' resolved on an EMPTY "
                "series — no bounds to anchor the window")
        if s > e:
            raise ValueError(f"window start {s} after end {e}")
        return s, e
    # single period string: '2024-01-05' → that day; '2024-01' → that month
    p, date_only = _parse_point(window)
    if not date_only:
        raise ValueError(f"single-point window must be a date/period: {window!r}")
    s = str(window)
    if len(s) == 4:          # year
        return p, p.replace(year=p.year + 1) - dt.timedelta(seconds=1)
    if len(s) == 7:          # month
        nxt = p.replace(year=p.year + (p.month == 12),
                        month=1 if p.month == 12 else p.month + 1)
        return p, nxt - dt.timedelta(seconds=1)
    return p, p + dt.timedelta(hours=23, minutes=59, seconds=59)
