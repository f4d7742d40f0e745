"""Tiny iterator helpers (stand-ins for the more-itertools functions the
reference leans on; see /root/reference/sql_autoloader/schema.py:7-13).

All of these operate on driver-side metadata sequences of O(#tables)
length — never on data.
"""

from collections.abc import Hashable, Iterable, Iterator
from typing import TypeVar

T = TypeVar("T")


def sorted_unique(items: Iterable[T]) -> list[T]:
    """Unique elements in *sorted* order.

    The reference uses ``more_itertools.unique``, which sorts before
    deduplicating — the sort is load-bearing: it fixes the table order in
    load plans and generated SELECT lists (SURVEY.md §7.4 item 6).
    """
    out: list[T] = []
    prev_set = False
    prev: T | None = None
    for item in sorted(items):  # type: ignore[type-var]
        if not prev_set or item != prev:
            out.append(item)
            prev, prev_set = item, True
    return out


def dedupe_consecutive(items: Iterable[T]) -> list[T]:
    """Collapse runs of equal consecutive elements (unique_justseen)."""
    out: list[T] = []
    for item in items:
        if not out or out[-1] != item:
            out.append(item)
    return out


def first_seen(items: Iterable[T]) -> list[T]:
    """Unique elements in first-seen order (unique_everseen, hashable)."""
    seen: set[Hashable] = set()
    out: list[T] = []
    for item in items:
        if item not in seen:
            seen.add(item)
            out.append(item)
    return out


def pairwise_windows(items: list[T]) -> Iterator[tuple[T, T]]:
    """Overlapping (a, b) windows over a list (windowed(seq, 2))."""
    for i in range(len(items) - 1):
        yield items[i], items[i + 1]
