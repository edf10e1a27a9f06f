"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning: interleaving the bits of two join/filter keys makes rows close in
BOTH dimensions land in the same file, so per-file min/max statistics
prune scans for two-dimensional predicates (the effect Delta/Iceberg
``OPTIMIZE ZORDER BY`` exploits; plain "sorted by one key" layouts prune
only that key).

Everything here is a pure column expression — bit shifts, masks, adds —
so layout assignment is map-side at any scale and bit-identical across
engines (the DuckDB twin builds the same arithmetic), which lets the
layout itself be hash-checked, not just eyeballed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Z_BITS = 16


def zvalue(a: Column | str, b: Column | str, bits: int = Z_BITS) -> Column:
    """Morton code: bit i of ``a`` → bit 2i+1, bit i of ``b`` → bit 2i.
    Inputs must be non-negative and fit in ``bits`` bits (the fixture
    keys do; widen ``bits`` for bigger domains — cost is linear)."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`zvalue` — same bit arithmetic, same result."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
