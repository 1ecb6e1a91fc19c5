"""Hilbert-curve (xy2d) distance as staged Catalyst expressions.

Companion to functions/zorder.py: the Hilbert curve preserves spatial
locality strictly better than the Morton/Z-order interleave (no Z-shaped
jumps between quadrant boundaries), at the cost of an iterative
quadrant-rotation computation instead of a single bit-interleave.

Design for scale: callers apply :func:`with_hilbert_d` to an
ALREADY-AGGREGATED cell table (2^bits x 2^bits rows at most), never to
the raw row population — the curve index is a pure function of the cell
coordinates, so computing it after the first hash-agg is both cheaper
and keeps the unrolled CASE expressions off the hot row path.

The unrolled iteration is the standard xy2d loop: per power-of-two s,
the quadrant contribution s^2 * ((3*rx) XOR ry) accumulates into d and
the (x, y) frame is reflected+swapped when ry == 0 (reflection span
s-1, the orientation-preserving variant — verified bijective with
unit-step adjacency, the defining Hilbert property, in
tests/test_r5c_evaluation.py). The XOR is expanded into a 4-way CASE so
both engines evaluate identical integer arithmetic with no bitwise-op
dialect differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_exprs(s: int) -> tuple[str, str, str, str]:
    """SQL expressions for one xy2d iteration at scale ``s`` (engine-neutral).

    Invariant: on entry hx, hy are in [0, 2s) (the caller feeds bits-wide
    coordinates to the first step and each step reduces mod s), so the
    quadrant bit is a plain >= s comparison and every intermediate stays
    NON-NEGATIVE — critical because the two engines disagree with Python's
    two's-complement semantics for %-of-negative, which silently breaks
    the textbook reflect-then-bit-test formulation.
    """
    rx = f"CASE WHEN hx >= {s} THEN 1 ELSE 0 END"
    ry = f"CASE WHEN hy >= {s} THEN 1 ELSE 0 END"
    # (3*rx) XOR ry without bitwise ops: (0,0)->0 (0,1)->1 (1,0)->3 (1,1)->2
    quad = (
        f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END"
    )
    d_inc = f"hd + {s * s} * ({quad})"
    # reduce to the s-subsquare, then (if ry == 0) reflect when rx == 1
    # and swap(x, y)
    x_new = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s - 1} - (hy % {s}) ELSE hy % {s} END) "
        f"ELSE hx % {s} END"
    )
    y_new = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s - 1} - (hx % {s}) ELSE hx % {s} END) "
        f"ELSE hy % {s} END"
    )
    return d_inc, x_new, y_new, quad


def with_hilbert_d(cells: DataFrame, xcol: str, ycol: str, bits: int) -> DataFrame:
    """Append column ``hd`` = Hilbert distance of (xcol, ycol) on the
    2^bits grid. One projection per unrolled iteration (``bits`` stages)
    keeps every stage's expression tree flat."""
    df = cells.withColumn("hx", F.col(xcol).cast("bigint")).withColumn(
        "hy", F.col(ycol).cast("bigint")
    )
    df = df.withColumn("hd", F.lit(0).cast("bigint"))
    s = 1 << (bits - 1)
    while s > 0:
        d_inc, x_new, y_new, _ = _step_exprs(s)
        keep = [c for c in df.columns if c not in ("hx", "hy", "hd")]
        df = df.selectExpr(
            *keep,
            f"CAST({d_inc} AS BIGINT) AS hd",
            f"CAST({x_new} AS BIGINT) AS hx",
            f"CAST({y_new} AS BIGINT) AS hy",
        )
        s //= 2
    return df.drop("hx", "hy")


def oracle_hilbert_ctes(base_cte: str, bits: int) -> tuple[str, str]:
    """DuckDB CTE chain mirroring :func:`with_hilbert_d` step for step.

    ``base_cte`` must expose columns ``hx, hy`` (plus any payload). Each
    step is MATERIALIZED: step k references step k-1 several times, and
    non-materialized CTEs would inline exponentially (the repo's
    iterative-oracle rule).
    """
    ctes = [f"h0 AS MATERIALIZED (SELECT *, CAST(0 AS BIGINT) AS hd FROM {base_cte})"]
    s = 1 << (bits - 1)
    i = 0
    while s > 0:
        d_inc, x_new, y_new, _ = _step_exprs(s)
        ctes.append(
            f"h{i + 1} AS MATERIALIZED (SELECT * EXCLUDE (hx, hy, hd), "
            f"CAST({d_inc} AS BIGINT) AS hd, "
            f"CAST({x_new} AS BIGINT) AS hx, "
            f"CAST({y_new} AS BIGINT) AS hy FROM h{i})"
        )
        s //= 2
        i += 1
    return ",\n".join(ctes), f"h{i}"
