"""Stable pagination (SURVEY.md §2.5 O4, §7 hard part 8).

The reference pins ``order_by('id')`` before paging (api/views.py:62) and
slices with DRF page-number pagination (api/views.py:33-50, page_size=10,
``no_pagination`` escape hatch). Spark has no implicit row order, so the
total ordering is mandatory here, not optional."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 10  # api/views.py:35


@dataclass
class Page:
    rows: DataFrame
    total: int
    page: int
    page_size: int

    @property
    def num_pages(self) -> int:
        return max(1, -(-self.total // self.page_size))


def paginate(
    df: DataFrame,
    order_by: list[str] | None = None,
    page: int = 1,
    page_size: int = DEFAULT_PAGE_SIZE,
    no_pagination: bool = False,
) -> Page:
    """Deterministically ordered page + total count.

    ``offset``/``limit`` push into the plan: with a sort, Spark runs a
    TakeOrderedAndProject for small offsets instead of a global sort — the
    same work a LIMIT-pushdown database does.
    """
    order_by = order_by or ["id"]
    cols = [F.col(c[1:]).desc() if c.startswith("-") else F.col(c)
            for c in order_by]
    ordered = df.orderBy(*cols)
    total = df.count()
    if no_pagination:
        return Page(ordered, total, 1, max(total, 1))
    if page < 1:
        raise ValueError("page numbers are 1-based")
    rows = ordered.offset((page - 1) * page_size).limit(page_size)
    return Page(rows, total, page, page_size)
