"""Morton (Z-order) codes: interleave the bits of two integer columns so
one sort key preserves locality in BOTH dimensions.

The data-skipping play at lake scale: parquet readers prune row groups
and files on min/max column statistics, but a lake sorted by column A
has useless stats on column B. Sorting by the INTERLEAVED bits of (A, B)
gives every file a narrow range in both columns at once, so selective
predicates on either column skip most files — the same layout trick
behind Delta/Iceberg Z-ordering and the classic UB-tree, expressed here
as pure Catalyst bitwise expressions (JVM-side, whole-stage codegen,
reproducible in any engine — see the DuckDB oracle twin).

Inputs clamp to 31 bits each (non-negative), so the interleaved code
fills bit positions 0..61 and stays a positive int64 — the sign bit can
never flip the sort order. Rank-transform wider or skewed columns
upstream (e.g. bucket ids or quantile ranks) — Z-ordering wants roughly
uniform small integers, not raw long tails.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bit-spreading mask pipeline: (shift, mask) pairs that move each of a
#: 31-bit integer's bits to every second position of an int64.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread a 31-bit non-negative int's bits to even positions (0, 2,
    4, …) of an int64 via the classic shift-and-mask pipeline."""
    x = c.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(a: Column | str, b: Column | str) -> Column:
    """Interleave two non-negative integer columns into one Z-order key:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Values clamp to 31 bits (negative inputs are masked, not errors —
    rank-transform upstream if sign matters)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_bits(ca).bitwiseOR(
        F.shiftleft(_spread_bits(cb), 1)
    )


def sql_morton_code(a: str, b: str) -> str:
    """DuckDB-dialect twin of :func:`morton_code` over two SQL
    expressions — the same shift-and-mask pipeline, bit-exact."""

    def spread(expr: str) -> str:
        x = f"(CAST({expr} AS BIGINT) & 2147483647)"
        for shift, mask in _SPREAD_STEPS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a)} | ({spread(b)} << 1))"
