"""Relationship catalog: the FK / M2M / O2O graph between entity tables.

The reference's entire join surface is implicit ``__``-path expressions over
Django model relationships (SURVEY.md §2.3; e.g. ``sample__sample_id``,
``file_resources__fileinstance__storage__name`` — reference
``tantalus/api/filters.py:208-223``). This module is the engine-side
equivalent of Django's model meta: a declarative graph the lookup compiler
walks to emit deterministic equi-join chains.

Multiplicity is first-class: a path step is *single-valued* (forward FK, O2O)
or *multi-valued* (reverse FK, M2M). Multi-valued steps force set semantics
(semi/anti joins + distinct) downstream — the correctness pitfall called out
in SURVEY.md §7 (reference ``tantalus/forms.py:583-587``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ForeignKey:
    """1:N edge. ``child.child_col`` references ``parent.parent_col``.

    ``accessor`` is the forward name on the child (``sample`` in
    ``dataset.sample``); ``reverse_accessor`` the name on the parent
    (``sequencedatasets``).
    """

    child: str
    child_col: str
    parent: str
    parent_col: str = "id"
    accessor: str | None = None
    reverse_accessor: str | None = None
    nullable: bool = True


@dataclass(frozen=True)
class OneToOne(ForeignKey):
    """1:1 edge — both directions single-valued (at-most-one invariant)."""


@dataclass(frozen=True)
class ManyToMany:
    """M:N edge through a junction table.

    ``left.left_key`` ↔ ``junction.left_col`` / ``junction.right_col`` ↔
    ``right.right_key``.
    """

    left: str
    right: str
    junction: str
    left_col: str
    right_col: str
    left_key: str = "id"
    right_key: str = "id"
    accessor: str | None = None  # name on left  (e.g. dataset.tags)
    reverse_accessor: str | None = None  # name on right (e.g. tag.sequencedatasets)


@dataclass(frozen=True)
class Step:
    """One resolved hop of a ``__`` path: join from ``src`` to ``dst``.

    ``via`` is ``None`` for a direct FK hop, or the junction table name for an
    M2M hop. ``many`` is True when traversing this step can fan out rows.
    """

    src: str
    dst: str
    src_col: str
    dst_col: str
    via: str | None = None
    via_src_col: str | None = None
    via_dst_col: str | None = None
    many: bool = False
    accessor: str = ""


@dataclass
class RelationshipCatalog:
    """Accessor-name → edge lookup per table, plus table key metadata."""

    primary_keys: dict[str, str] = field(default_factory=dict)
    _edges: dict[tuple[str, str], Step] = field(default_factory=dict)
    tables: set[str] = field(default_factory=set)
    _nonunique_pks: set[str] = field(default_factory=set)

    def add_table(self, name: str, primary_key: str = "id",
                  pk_unique: bool = True) -> None:
        self.tables.add(name)
        self.primary_keys[name] = primary_key
        if not pk_unique:
            self._nonunique_pks.add(name)

    def pk(self, table: str) -> str:
        return self.primary_keys.get(table, "id")

    def pk_unique(self, table: str) -> bool:
        """Whether the declared pk uniquely identifies rows. Compiler
        operations that group or match on the root pk (multi-valued
        filters, annotate, distinct-by-pk) require a unique pk and raise
        otherwise instead of silently aggregating at the wrong grain."""
        return table not in self._nonunique_pks

    def add_fk(self, fk: ForeignKey) -> None:
        accessor = fk.accessor or fk.parent
        reverse = fk.reverse_accessor or f"{fk.child}_set"
        single_reverse = isinstance(fk, OneToOne)
        self._edges[(fk.child, accessor)] = Step(
            src=fk.child,
            dst=fk.parent,
            src_col=fk.child_col,
            dst_col=fk.parent_col,
            many=False,
            accessor=accessor,
        )
        self._edges[(fk.parent, reverse)] = Step(
            src=fk.parent,
            dst=fk.child,
            src_col=fk.parent_col,
            dst_col=fk.child_col,
            many=not single_reverse,
            accessor=reverse,
        )

    def add_m2m(self, m2m: ManyToMany) -> None:
        accessor = m2m.accessor or m2m.right
        reverse = m2m.reverse_accessor or f"{m2m.left}_set"
        self._edges[(m2m.left, accessor)] = Step(
            src=m2m.left,
            dst=m2m.right,
            src_col=m2m.left_key,
            dst_col=m2m.right_key,
            via=m2m.junction,
            via_src_col=m2m.left_col,
            via_dst_col=m2m.right_col,
            many=True,
            accessor=accessor,
        )
        self._edges[(m2m.right, reverse)] = Step(
            src=m2m.right,
            dst=m2m.left,
            src_col=m2m.right_key,
            dst_col=m2m.left_key,
            via=m2m.junction,
            via_src_col=m2m.right_col,
            via_dst_col=m2m.left_col,
            many=True,
            accessor=reverse,
        )

    def step(self, table: str, accessor: str) -> Step | None:
        return self._edges.get((table, accessor))

    def accessors(self, table: str) -> list[str]:
        return [a for (t, a) in self._edges if t == table]
