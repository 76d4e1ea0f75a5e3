"""Lookup registry: the predicate vocabulary of the reference's query surface.

One entry per Django lookup actually used by the reference (SURVEY.md §2.2
P3-P11; e.g. ``exact``/``in`` ``api/filters.py:55-104``, ``startswith``
``filters.py:77``, ``endswith`` ``filters.py:125``, ``icontains``
``views.py:1205``, ``gte``/``lte`` ``filters.py:68``, ``isnull``
``filters.py:188``). Each maps to a native Column expression — JVM-side,
whole-stage-codegen friendly; zero Python UDFs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _exact(col: Column, value) -> Column:
    if value is None:
        return col.isNull()
    return col == F.lit(value)


def _iexact(col: Column, value) -> Column:
    return F.lower(col) == F.lit(str(value).lower())


def _isnull(col: Column, value) -> Column:
    return col.isNull() if value else col.isNotNull()


def _range(col: Column, value) -> Column:
    lo, hi = value
    return col.between(F.lit(lo), F.lit(hi))


# Django datetime transforms: applied to the column BEFORE the final lookup
# (``created__year=2019``, ``created__month__gte=6``). dayofweek matches
# Django's week_day numbering (1=Sunday..7=Saturday) exactly.
TRANSFORMS: dict[str, Callable[[Column], Column]] = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "quarter": F.quarter,
    "week_day": F.dayofweek,
    "date": F.to_date,
}

LOOKUPS: dict[str, Callable[[Column, object], Column]] = {
    "exact": _exact,
    "iexact": _iexact,
    "in": lambda c, v: c.isin(list(v)),
    "contains": lambda c, v: c.contains(str(v)),
    "icontains": lambda c, v: F.lower(c).contains(str(v).lower()),
    "startswith": lambda c, v: c.startswith(str(v)),
    "istartswith": lambda c, v: F.lower(c).startswith(str(v).lower()),
    "endswith": lambda c, v: c.endswith(str(v)),
    "iendswith": lambda c, v: F.lower(c).endswith(str(v).lower()),
    "gt": lambda c, v: c > F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "range": _range,
    "isnull": _isnull,
    "regex": lambda c, v: c.rlike(str(v)),
    "iregex": lambda c, v: c.rlike(f"(?i){v}"),
}
