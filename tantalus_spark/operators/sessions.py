"""Session-materialized search results (SURVEY.md §3.2 / §7 hard part 7).

The reference stores advanced-search pk lists in the web session
(views.py:1524) and later requests re-hydrate with ``pk__in=session_list``
(views.py:1338-1342, 1543-1553, 1674-1675). The engine-level equivalent is
an explicit handle → cached id-frame store with TTL: downstream operations
semi-join against the cached frame, so a 10⁸-row result set never crosses
to the driver — the "session" is a name for a persisted distinct-pk
DataFrame, not a Python list.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_handle_counter = itertools.count(1)


@dataclass
class _Entry:
    ids: DataFrame
    expires_at: float
    created_at: float = field(default_factory=time.time)


class SearchSessionStore:
    """Handle → cached distinct-id frame with TTL eviction."""

    def __init__(self, ttl_seconds: float = 3600.0) -> None:
        self.ttl = ttl_seconds
        self._entries: dict[str, _Entry] = {}

    def save(self, queryset_or_ids, *, now: float | None = None) -> str:
        """Materialize a search result as a persisted distinct-pk frame and
        return its handle. Accepts a compiler QuerySet or an id DataFrame."""
        now = time.time() if now is None else now
        self._evict(now)
        ids = (queryset_or_ids.pk_df()
               if hasattr(queryset_or_ids, "pk_df") else queryset_or_ids)
        ids = ids.persist()
        ids.count()  # materialize eagerly: later requests reuse, never recompute
        handle = f"search-{next(_handle_counter)}"
        self._entries[handle] = _Entry(ids, expires_at=now + self.ttl)
        return handle

    def ids(self, handle: str, *, now: float | None = None) -> DataFrame:
        now = time.time() if now is None else now
        # sweep on EVERY interaction, not only on save/miss: an
        # expired long-idle session would otherwise pin executor
        # storage memory until someone happens to miss — one expired
        # entry surviving N successful lookups is N requests of wasted
        # cache pressure
        self._evict(now)
        entry = self._entries.get(handle)
        if entry is None:
            raise KeyError(f"unknown or expired search handle {handle!r}")
        return entry.ids

    def rehydrate(self, handle: str, table: DataFrame, pk: str = "id",
                  *, now: float | None = None) -> DataFrame:
        """The ``pk__in=session_list`` analog: semi-join the table against
        the cached id frame (no driver-side id list, any result size)."""
        ids = self.ids(handle, now=now)
        id_col = ids.columns[0]
        return table.join(
            ids.withColumnRenamed(id_col, pk).hint("broadcast"), pk,
            "left_semi")

    def release(self, handle: str, *, now: float | None = None) -> None:
        self._evict(time.time() if now is None else now)
        entry = self._entries.pop(handle, None)
        if entry is not None:
            entry.ids.unpersist()

    def _evict(self, now: float) -> None:
        for h, entry in list(self._entries.items()):
            if entry.expires_at <= now:
                entry.ids.unpersist()
                del self._entries[h]

    def __len__(self) -> int:
        return len(self._entries)
