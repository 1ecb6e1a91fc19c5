"""Round-9 regression pins for the ADVICE r08 fixes.

1. Exact decimal floor division: Spark DECIMAL(38,0)/DECIMAL(38,0) is
   adjusted to DECIMAL(38,6) with HALF_UP rounding, so floor(a/b) rounds a
   true quotient within 5e-7 below an integer UP before flooring — one high
   vs DuckDB's exact HUGEINT //. The (a - pmod(a, b)) / b idiom used by
   cramers_v_matrix must floor exactly at that boundary.
"""

from __future__ import annotations


def test_decimal_floor_division_exact_at_rounding_boundary(spark):
    """a = 3*b - 1 with b = 10^7: a/b = 2.9999999, which DECIMAL(38,6)
    HALF_UP rounds to 3.000000 so floor(a/b) = 3 (wrong); the exact idiom
    must yield 2, and agree with Python's // on a boundary sweep."""
    rows = [(3 * 10_000_000 - 1, 10_000_000)]
    # sweep more boundary shapes: just-below, exact multiple, just-above
    for b in (10_000_000, 123_456_789, 10**15 + 7):
        for q in (1, 7, 10**9):
            for off in (-1, 0, 1):
                a = q * b + off
                if 0 <= a < 2**63:
                    rows.append((a, b))
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.selectExpr(
        "a",
        "b",
        "CAST(floor(CAST(a AS DECIMAL(38,0)) / CAST(b AS DECIMAL(38,0)))"
        " AS BIGINT) AS floored",
        "CAST((CAST(a AS DECIMAL(38,0)) - pmod(CAST(a AS DECIMAL(38,0)),"
        " CAST(b AS DECIMAL(38,0)))) / CAST(b AS DECIMAL(38,0))"
        " AS BIGINT) AS exact_div",
    ).collect()
    mismatch_seen = False
    for r in got:
        assert r["exact_div"] == r["a"] // r["b"], (r["a"], r["b"])
        if r["floored"] != r["a"] // r["b"]:
            mismatch_seen = True  # the bug the idiom exists to avoid
    assert mismatch_seen, (
        "expected floor(a/b) to be wrong for a=29999999, b=1e7 — if Spark "
        "now divides exactly, the idiom (and this pin) can be simplified"
    )


def test_cramers_v_term_micro_boundary(spark, tmp_path):
    """End-to-end pin on the cramers_v_matrix arithmetic shape: a
    contingency cell engineered so (o*n - ra*cb)^2 / (ra*cb) lands within
    5e-7 below an integer must produce the floor, not the round-up."""
    from pyspark.sql import functions as F

    # d^2 / dn = (17*dn - 1) / dn boundary: d = 10^4 gives
    # d^2 + 1 = 100000001 = 17 * 5882353, so with dn = 5882353 the true
    # quotient is 16.99999983 — HALF_UP at 6 decimals would round to 17.
    d = 10_000
    dn = (d * d + 1) // 17
    df = spark.createDataFrame([(d, dn)], "d long, dn long")
    got = df.select(
        F.expr(
            "CAST((CAST(d AS DECIMAL(38,0)) * d"
            " - pmod(CAST(d AS DECIMAL(38,0)) * d,"
            "        CAST(dn AS DECIMAL(38,0))))"
            " / CAST(dn AS DECIMAL(38,0)) AS BIGINT) AS q"
        )
    ).collect()[0]
    assert got["q"] == (d * d) // dn == 16
