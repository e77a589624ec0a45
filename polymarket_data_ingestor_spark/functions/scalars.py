"""Shared scalar column helpers (SURVEY §2.8).

``hash32`` is the engine's portable content hash: the first 8 hex chars of
md5 as a non-negative int64. It is chosen over ``xxhash64``/``hash`` because
md5 is identically defined in Spark, DuckDB, and Python — every sketch
operator built on it (MinHash, SimHash, fingerprints) is therefore
oracle-checkable bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 32-bit content hash as int64 (same in DuckDB: see
    ``SQL_HASH32``). ``seed`` derives independent hash functions by
    prefixing the input."""
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(f"s{seed}:"), c)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def sql_hash32(expr: str, seed: int = 0) -> str:
    """DuckDB-dialect equivalent of :func:`hash32` over a SQL expression."""
    if seed:
        expr = f"('s{seed}:' || {expr})"
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT)"


#: doc-string example of the SQL form, for catalog authors.
SQL_HASH32 = sql_hash32("x")


def side_sink_label(wire: Column | str) -> Column:
    """Wire BUY/SELL → sink BID/ASK (``cli/src/tick_generator.rs:85-88``).

    The reference's side is a TOTAL enum (serde rejects anything else
    upstream), so its match is binary; this string-typed helper can see
    NULL or garbage, which map to NULL rather than silently becoming
    ASK (the old ``otherwise`` — a mislabeled order-book side is the
    worst possible silent failure for a market-data consumer)."""
    c = F.col(wire) if isinstance(wire, str) else wire
    return F.when(c == "BUY", "BID").when(c == "SELL", "ASK")


def side_wire_label(sink: Column | str) -> Column:
    """Sink BID/ASK → wire BUY/SELL (inverse of :func:`side_sink_label`);
    NULL/garbage → NULL, same rationale."""
    c = F.col(sink) if isinstance(sink, str) else sink
    return F.when(c == "BID", "BUY").when(c == "ASK", "SELL")
