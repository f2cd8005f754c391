"""Multi-dimensional data layout: Z-order (Morton) interleaving for
min/max-stats file pruning.

A table clustered on ONE column prunes range scans on that column
only; a query filtering on a second dimension reads every file. The
Z-order curve interleaves the bits of two normalized dimensions so
that files (= contiguous z-ranges) are approximate RECTANGLES in
(x, y) space — a box predicate on either or both dimensions skips
most files by their min/max footer stats. This is exactly what
Delta's OPTIMIZE ZORDER / Iceberg's sort-order rewrite do; here it is
an operator whose pruning benefit is MEASURED by a query (scan_hit
per file for the same box under z-order vs single-column layout), not
asserted.

Everything is integer arithmetic: normalization is an affine map to
[0, 2^bits), the z-value is a sum of non-overlapping bit shifts, so a
SQL oracle reproduces the layout bit-for-bit. The same Python
generator emits the Spark column AND the DuckDB SQL fragment — the
two engines cannot drift.

At 100 TB the layout step is a repartitionByRange on z (one range
shuffle, the same cost as any global sort-cluster pass) followed by
per-file stats collection at write; the audit query here keeps the
file assignment deterministic (z div cell) instead of rank-based so
both engines compute it without a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_bits_nd(cols: list[str], bits: int = 8) -> Column:
    """Morton z-value of k already-normalized integer columns in
    [0, 2^bits): column i occupies bit positions i, i+k, i+2k, ...
    (round-robin interleave — the Delta OPTIMIZE ZORDER bit layout
    for arbitrary dimension count). Sum of disjoint shifted bits —
    no overlap, so + == OR. k*bits must fit a long (<= 62)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} dims x {bits} bits overflows a long")
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            terms.append(
                f"shiftleft(shiftright({c}, {j}) & 1, {j * k + i})"
            )
    return F.expr(" + ".join(terms)).cast("long")


def interleave_bits_nd_sql(cols: list[str], bits: int = 8) -> str:
    """The identical n-dim z-value as a DuckDB SQL fragment (same bit
    layout as interleave_bits_nd — one generator, two engines,
    including the overflow guard: the pair must accept and reject the
    same inputs or the parity they exist for is void)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} dims x {bits} bits overflows a long")
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"((({c} >> {j}) & 1) << {j * k + i})")
    return "(" + " + ".join(terms) + ")"


def interleave_bits(x: str, y: str, bits: int = 8) -> Column:
    """Morton z-value of two already-normalized integer columns in
    [0, 2^bits): x occupies even bit positions, y odd. Sum of
    disjoint shifted bits — no overlap, so + == OR."""
    return interleave_bits_nd([x, y], bits)


def interleave_bits_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical z-value as a DuckDB SQL fragment (same bit
    layout as interleave_bits — one generator, two engines)."""
    return interleave_bits_nd_sql([x, y], bits)
