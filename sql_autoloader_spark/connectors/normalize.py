"""Driver-side value canonicalization shared by the database sinks'
idempotency pre-filters.

The pre-filter (reference sqlite_connector.py:10-25 analogue) decides
"is this payload row already present?" by set membership over collected
rows, so every representation a value can take on either side of the
round trip — Spark ``collect`` vs the database driver's decode — must
map to ONE canonical form.  Numbers are the subtle case: the same
mathematical value arrives as ``int``, ``float``, or ``Decimal``
depending on column types, while two Decimals differing only beyond
float53 precision are genuinely different rows (collapsing them through
``float()`` silently filtered real rows as already-present).
"""

from __future__ import annotations

import decimal

__all__ = ["canonical_number"]


def canonical_number(value: int | float | decimal.Decimal) -> str:
    """One canonical string per mathematical value across int/float/
    Decimal representations, at the precision the value itself carries.

    Floats canonicalize through their shortest round-trip decimal form
    (``repr``) — exactly the text the sinks send as SQL literals — so a
    Spark double and the ``numeric`` the database stored for it land on
    the SAME string, while Decimals keep their full precision and stay
    distinct beyond float53.  ``normalize()`` strips trailing zeros and
    scale so ``1.50`` and ``1.5`` agree; zeros drop their sign (the
    sinks' numeric types have no negative zero).  NaN is the caller's
    business (its non-reflexive equality needs a sentinel).
    """
    if isinstance(value, float):
        value = decimal.Decimal(repr(value))
    elif isinstance(value, int):
        value = decimal.Decimal(value)
    if value.is_zero():
        return "0"
    return str(value.normalize())
