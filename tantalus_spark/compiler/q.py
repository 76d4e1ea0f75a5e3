"""Q boolean trees and aggregate descriptors for the lookup compiler.

Mirrors the composition surface the reference uses everywhere:
``Q(a__b=1) | Q(c__icontains='x')`` trees reduced with ``&``/``|``
(reference ``tantalus/views.py:1197-1213``, ``search_util/search_helper.py:27-34``),
and ``annotate(Count(..., distinct=True))`` aggregates
(reference ``tantalus/views.py:1343-1348``, ``forms.py:616-643``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Q:
    """Boolean tree over ``path__lookup=value`` conditions.

    ``children`` holds either ``(path, value)`` leaves or nested ``Q`` nodes;
    ``connector`` is ``AND``/``OR``; ``negated`` wraps the node in NOT.
    """

    AND = "AND"
    OR = "OR"

    def __init__(self, **lookups: object) -> None:
        self.children: list = list(lookups.items())
        self.connector: str = Q.AND
        self.negated: bool = False

    @classmethod
    def _combine(cls, left: "Q", right: "Q", connector: str) -> "Q":
        node = cls()
        node.connector = connector
        node.children = [left, right]
        return node

    def __and__(self, other: "Q") -> "Q":
        return Q._combine(self, other, Q.AND)

    def __or__(self, other: "Q") -> "Q":
        return Q._combine(self, other, Q.OR)

    def __invert__(self) -> "Q":
        node = Q()
        node.connector = self.connector
        node.children = list(self.children)
        node.negated = not self.negated
        return node

    def paths(self) -> list[str]:
        out: list[str] = []
        for child in self.children:
            if isinstance(child, Q):
                out.extend(child.paths())
            else:
                out.append(child[0])
        return out

    def is_empty(self) -> bool:
        return not self.children


@dataclass(frozen=True)
class Aggregate:
    """``annotate()`` descriptor over a ``__`` path."""

    path: str
    distinct: bool = False
    kind: str = field(default="count", init=False)


@dataclass(frozen=True)
class Count(Aggregate):
    kind = "count"


@dataclass(frozen=True)
class Sum(Aggregate):
    kind = "sum"


@dataclass(frozen=True)
class Max(Aggregate):
    kind = "max"


@dataclass(frozen=True)
class Min(Aggregate):
    kind = "min"


@dataclass(frozen=True)
class Avg(Aggregate):
    kind = "avg"


@dataclass(frozen=True)
class F_ref:
    """Reference to another (possibly annotated) column in a predicate value,
    like Django's ``F()`` — used for cross-aggregate equality
    (reference ``tantalus/forms.py:643``)."""

    name: str
