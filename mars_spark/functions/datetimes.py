"""Series.dt accessor — pandas datetime fields on Spark Columns.

Reference parity: mars/dataframe/base/datetimes.py:31 — Mars
auto-registers every property of ``pd.Series.dt`` (datetimes.py:152);
each maps to a JVM-side datetime expression here.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class DatetimeAccessor:
    def __init__(self, series):
        self._s = series

    def __getattr__(self, name):
        """mars/dataframe/base/datetimes.py:152-154 — any other
        ``pd.Series.dt`` property/method dispatches to the vectorized
        pandas fallback (day_name, is_leap_year, round, normalize, …)."""
        if name.startswith("_"):
            raise AttributeError(name)
        import pandas as pd

        from mars_spark.functions._pandas_dispatch import accessor_fallback

        probe = pd.Series(pd.to_datetime(
            ["2024-02-29 13:45:59.123", "2023-06-15 00:00:00.000"]))
        try:
            return accessor_fallback(self._s, "dt", name, probe)
        except AttributeError:
            raise AttributeError(
                f"Series.dt has no attribute {name!r}") from None

    def _wrap(self, col):
        from mars_spark.core.series import Series

        return Series(self._s._frame, col, self._s.name)

    @property
    def year(self):
        return self._wrap(F.year(self._s._col))

    @property
    def month(self):
        return self._wrap(F.month(self._s._col))

    @property
    def day(self):
        return self._wrap(F.dayofmonth(self._s._col))

    @property
    def hour(self):
        return self._wrap(F.hour(self._s._col))

    @property
    def minute(self):
        return self._wrap(F.minute(self._s._col))

    @property
    def second(self):
        return self._wrap(F.second(self._s._col))

    @property
    def date(self):
        return self._wrap(F.to_date(self._s._col))

    @property
    def dayofweek(self):
        # pandas: Monday=0; Spark dayofweek: Sunday=1
        return self._wrap((F.dayofweek(self._s._col) + 5) % 7)

    weekday = dayofweek

    @property
    def dayofyear(self):
        return self._wrap(F.dayofyear(self._s._col))

    @property
    def quarter(self):
        return self._wrap(F.quarter(self._s._col))

    @property
    def week(self):
        return self._wrap(F.weekofyear(self._s._col))

    @property
    def days_in_month(self):
        return self._wrap(F.dayofmonth(F.last_day(self._s._col)))

    @property
    def is_month_start(self):
        return self._wrap(F.dayofmonth(self._s._col) == 1)

    @property
    def is_month_end(self):
        return self._wrap(
            F.to_date(self._s._col) == F.last_day(self._s._col))

    def floor(self, freq: str):
        unit = _FREQ[freq]
        return self._wrap(F.date_trunc(unit, self._s._col))

    def strftime(self, fmt: str):
        return self._wrap(F.date_format(self._s._col, _strftime_to_java(fmt)))


_FREQ = {"D": "day", "H": "hour", "h": "hour", "T": "minute",
         "min": "minute", "S": "second", "s": "second", "W": "week",
         "M": "month", "MS": "month", "Y": "year", "YS": "year",
         "Q": "quarter"}


def _strftime_to_java(fmt: str) -> str:
    subs = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
            "%S": "ss", "%y": "yy", "%j": "DDD", "%B": "MMMM", "%b": "MMM",
            "%A": "EEEE", "%a": "EEE"}
    for k, v in subs.items():
        fmt = fmt.replace(k, v)
    return fmt


def to_datetime(series, format: str | None = None):
    """reference: mars/dataframe/tseries/to_datetime.py:37"""
    from mars_spark.core.series import Series

    col = (F.to_timestamp(series._col, _strftime_to_java(format))
           if format else F.to_timestamp(series._col))
    return Series(series._frame, col, series.name)
