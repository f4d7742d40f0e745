"""Metadata model: tables, references, and the load-plan IR.

Behavioral parity with the reference's pydantic models
(/root/reference/sql_autoloader/schema.py:38-234), re-expressed as plain
dataclasses. These objects describe *metadata only* — O(#tables) driver
state — and are shared by every connector (Spark catalog, JDBC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import cached_property
from typing import TypedDict

from sql_autoloader_spark.exceptions import (
    InvalidReferenceError,
    InvalidTableError,
)


class TableDict(TypedDict, total=False):
    """Wire format a connector's ``fetch_schema`` emits per table."""

    name: str
    columns: list[str]
    primary_key: str
    foreign_keys: list[str]
    unique_constraints: list[list[str]]


class ReferenceDict(TypedDict):
    """Wire format a connector's ``fetch_schema`` emits per FK reference."""

    from_table: str
    from_key: str
    to_table: str
    to_key: str


@dataclass
class Table:
    """One table in the schema DAG.

    ``columns`` holds only the *payload* columns — the primary key and the
    foreign keys are tracked separately, because the planner treats them
    differently (keys are produced/consumed by the load, payload columns
    come from user data).  ``unique_constraints`` is an extension over the
    reference model: Spark has no UNIQUE enforcement, so the natural key a
    sink dedupes on must be declared here (SURVEY.md §7.4 item 3).
    """

    name: str
    columns: list[str]
    primary_key: str = ""
    foreign_keys: list[str] = field(default_factory=list)
    unique_constraints: list[list[str]] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.columns and not self.foreign_keys:
            msg = f"Table '{self.name}' has no columns or foreign keys; nothing could ever be loaded into it."
            raise InvalidTableError(msg)

    # -- derived views ------------------------------------------------------

    @cached_property
    def columns_and_foreign_keys(self) -> list[str]:
        """Every loadable column: foreign keys first, then payload columns."""
        return self.foreign_keys + self.columns

    @cached_property
    def prefix_column_map(self) -> dict[str, str]:
        """``{"<table>.<col>": "<col>"}`` for every loadable column."""
        return {f"{self.name}.{c}": c for c in self.columns_and_foreign_keys}

    @property
    def has_primary_key(self) -> bool:
        return bool(self.primary_key)

    @property
    def is_linking(self) -> bool:
        """True when the table carries keys only (a many-to-many bridge)."""
        return len(self.columns) == 0

    # -- column matching ----------------------------------------------------

    def __contains__(self, column: str) -> bool:
        """Accepts bare names and ``table.column``-prefixed names."""
        return (
            column in self.columns_and_foreign_keys
            or column in self.prefix_column_map
        )

    def get_common_columns(self, columns: list[str]) -> list[str]:
        """Bare column names shared between *columns* and this table.

        Sorted to pin insert-column order run-to-run (the reference's
        set-intersection order is hash-randomized; deterministic order is
        load-bearing for generated plans, _itertools.py docstring).
        """
        return sorted(set(columns) & set(self.columns_and_foreign_keys))

    def get_prefixed_columns(self, columns: list[str]) -> list[tuple[str, str]]:
        """For each input column on this table, ``(prefixed_name, as_given)``.

        A bare input yields ``("t.col", "col")``; an already-prefixed input
        yields ``("t.col", "t.col")`` — the second element is the output
        alias the compare query must use.
        """
        bare_to_prefixed = {bare: pfx for pfx, bare in self.prefix_column_map.items()}
        out: list[tuple[str, str]] = []
        for col in columns:
            if col not in self:
                continue
            if col in self.prefix_column_map:
                out.append((col, col))
            else:
                out.append((bare_to_prefixed[col], col))
        return out

    def __str__(self) -> str:
        head = [self.primary_key] if self.has_primary_key else []
        body = "\n\t".join(head + self.columns_and_foreign_keys)
        return f"Table {self.name} (\n\t{body}\n)"


@dataclass(frozen=True)
class Reference:
    """A foreign-key edge: ``from_table.from_key -> to_table.to_key``."""

    from_table: str
    from_key: str
    to_table: str
    to_key: str

    def __post_init__(self) -> None:
        for f in ("from_table", "from_key", "to_table", "to_key"):
            value = getattr(self, f)
            if not isinstance(value, str) or not value.strip():
                msg = f"Reference field '{f}' must be a non-empty string, got {value!r}."
                raise InvalidReferenceError(msg)
            object.__setattr__(self, f, value.strip())
        if self.from_table == self.to_table:
            msg = f"{self!r} points at its own table; self-references are not supported."
            raise InvalidReferenceError(msg)

    def __str__(self) -> str:
        """The SQL join predicate this edge contributes."""
        return f"ON {self.from_table}.{self.from_key} = {self.to_table}.{self.to_key}"


GetSchemaFunction = Callable[[], tuple[list[TableDict], list[ReferenceDict]]]


class InsertAndRetrieveDict(TypedDict):
    """Plan step: insert rows, then read surrogate keys back under ``alias``."""

    table: str
    alias: str
    columns: dict[str, str] | None


class InsertDict(TypedDict):
    """Plan step: insert rows only (no key to retrieve)."""

    table: str
    columns: dict[str, str] | None


@dataclass
class LoadInstructions:
    """The load plan IR ``Schema.get_load_instructions`` produces.

    Steps are already in dependency (topological) order: executing
    ``insert_and_retrieve`` first, then ``insert``, satisfies every FK.
    """

    insert_and_retrieve: list[InsertAndRetrieveDict]
    insert: list[InsertDict]

    @property
    def insert_and_retrieve_tables(self) -> list[str]:
        return [step["table"] for step in self.insert_and_retrieve]

    @property
    def insert_tables(self) -> list[str]:
        return [step["table"] for step in self.insert]

    def __repr__(self) -> str:
        lines = ["LoadInstructions("]
        lines.append("insert_and_retrieve:")
        lines.extend(repr(d) for d in self.insert_and_retrieve)
        lines.append("insert:")
        lines.extend(repr(d) for d in self.insert)
        return "\n".join(lines) + ")"
