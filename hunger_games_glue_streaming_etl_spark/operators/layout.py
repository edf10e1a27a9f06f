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


# ---- Hilbert curve ----------------------------------------------------------
# 2-D Hilbert index via a 4-state FSM over bit pairs, high bit first: at
# each level the (bx, by) quadrant is looked up in a 16-entry digit/next-
# state table (derived from the classic rotate-and-reflect algorithm and
# verified against it exhaustively in tests).  The FSM form matters for
# engines: the textbook algorithm REWRITES x and y each level, which
# inlines to ~5× expression growth per bit under CollapseProject (4^16
# nodes at 16 bits — a plan-depth bomb, the r13 when-chain class); the
# state lookup references the previous level's 2-bit state exactly once,
# so the whole 16-level unroll stays O(bits²) expression nodes and rides
# whole-stage codegen.  Hilbert beats Morton on locality (no big-jump
# seams), which is why Delta liquid clustering uses it — the layout
# entries measure exactly that difference.
HILBERT_DLUT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]
HILBERT_SLUT = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]


def hvalue(a: Column | str, b: Column | str, bits: int = Z_BITS) -> Column:
    """Hilbert curve index of (a, b), FSM form.  Inputs non-negative,
    < 2^bits (same domain contract as :func:`zvalue`)."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    dlut = F.array(*[F.lit(v) for v in HILBERT_DLUT])
    slut = F.array(*[F.lit(v) for v in HILBERT_SLUT])
    state = F.lit(0)
    d = F.lit(0).cast("long")
    for lvl in range(bits - 1, -1, -1):
        bx = F.shiftright(ca, lvl).bitwiseAND(F.lit(1)).cast("int")
        by = F.shiftright(cb, lvl).bitwiseAND(F.lit(1)).cast("int")
        idx = (state * 4 + bx * 2 + by + 1).cast("int")
        d = d + F.shiftleft(F.element_at(dlut, idx).cast("long"), 2 * lvl)
        state = F.element_at(slut, idx)
    return d


def hvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`hvalue` — same FSM tables, same arithmetic.
    The state expression nests once per level (O(bits²) total text), the
    digit terms sum independently."""
    dl = "[" + ", ".join(str(v) for v in HILBERT_DLUT) + "]"
    sl = "[" + ", ".join(str(v) for v in HILBERT_SLUT) + "]"
    state = "0"
    terms = []
    for lvl in range(bits - 1, -1, -1):
        bx = f"(({a} // {1 << lvl}) % 2)"
        by = f"(({b} // {1 << lvl}) % 2)"
        idx = f"(({state}) * 4 + {bx} * 2 + {by} + 1)"
        terms.append(f"CAST({dl}[{idx}] AS BIGINT) * {1 << (2 * lvl)}")
        state = f"{sl}[{idx}]"
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
