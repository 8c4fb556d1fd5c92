"""HALF_UP decimal rounding matching Spark's `F.round` on doubles.

Spark's ROUND on a double is `BigDecimal.valueOf(x).setScale(s, HALF_UP)`
— BigDecimal.valueOf goes through Double.toString (the shortest decimal
representation that round-trips), then rounds that DECIMAL half away from
zero. Python's `repr(float)` produces the same shortest representation,
so `Decimal(repr(x)).quantize(..., ROUND_HALF_UP)` reproduces Spark's
result bit-for-bit. Python's builtin `round()` (banker's half-even over
the binary value) does NOT: values whose shortest repr ends in ...5 at
the cut digit round differently (ADVICE r4 — the streaming IVF path used
`round()` while the batch path it mirrors uses `F.round`).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

_Q6 = Decimal("0.000001")


def round_half_up6(x: float) -> float:
    """Round to 6 decimal places, half away from zero — bit-identical to
    Spark `F.round(col, 6)` on a double column."""
    return float(Decimal(repr(float(x))).quantize(_Q6, rounding=ROUND_HALF_UP))
