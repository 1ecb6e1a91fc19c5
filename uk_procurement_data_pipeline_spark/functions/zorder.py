"""Z-order (Morton) interleave key for multi-dimension data clustering.

``write_clustered_parquet`` (sources/sinks.py) gives tight file/row-group
min-max stats for ONE sort key; a second dimension then spans the full
range in every file and gets no skipping. Z-ordering interleaves the bits
of two (or more) dimensions into one sort key so that sorting by the key
keeps BOTH dimensions locally bounded in every file — each dimension's
per-file span shrinks roughly with the square root of the file count
instead of not at all. This is the layout trick behind Delta/Iceberg
``ZORDER BY``; here it is a plain Column expression, so it composes with
``repartitionByRange`` + ``sortWithinPartitions`` with no table format
needed.

The expression is pure JVM bit arithmetic (shift/and/or), built by an
unrolled Python loop at plan-construction time — no UDF, stays inside
codegen. Inputs must already be scaled to unsigned ints of ``bits``
width; ``int_rank`` below does that for arbitrary orderable columns via
min/max scaling (two literals you compute once per write job — at 100 TB
those two numbers come from table statistics, not a scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key of two non-negative int columns in [0, 2**bits).

    Bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i, so the
    key orders by (a, b) jointly at every scale of the bit hierarchy.
    """
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return key


def int_rank(col: Column, lo, hi, bits: int = 16) -> Column:
    """Scale an orderable column into [0, 2**bits) given its bounds.

    ``lo``/``hi`` are plain Python values (from table stats) or Columns
    (e.g. a min/max aggregate attached via a broadcast one-row join — the
    no-collect way to use data-derived bounds in-plan); the mapping is
    monotonic, so range predicates on the original column translate to
    range predicates on the rank.
    """
    lo = lo if isinstance(lo, Column) else F.lit(lo)
    hi = hi if isinstance(hi, Column) else F.lit(hi)
    span = hi - lo
    scaled = (col - lo).cast("double") / span.cast("double")
    n = (1 << bits) - 1
    return F.least(
        F.lit(n), F.greatest(F.lit(0), F.floor(scaled * n).cast("bigint"))
    )
