"""Z-order (Morton) clustering key — multi-column data layout.

``TableCatalog.write_sorted`` clusters on ONE column: a range predicate
on it prunes files, but a predicate on any other column reads
everything. Interleaving the bits of two columns into one Morton key
and range-partitioning on THAT gives every file a small rectangle of
the (x, y) value space — a box predicate on EITHER or BOTH columns
skips most files (the lakehouse Z-ORDER feature, e.g. Delta OPTIMIZE
ZORDER BY, built from public bit-twiddling: Morton, 1966).

The key is a pure JVM expression (shiftright/and/shiftleft terms —
whole-stage codegen, no UDF), so computing it scans once and adds no
Python cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    result bit 2i = bit i of x, bit 2i+1 = bit i of y.

    Callers rank/bucketize arbitrary columns into [0, 2^bits) first
    (e.g. ``ntile`` or fixed-width binning); the interleave itself is
    exact. 2×16 bits → a 32-bit key, well inside long range.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("long"), i) % 2, 2 * i))
        terms.append(F.shiftleft(F.shiftright(y.cast("long"), i) % 2, 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
