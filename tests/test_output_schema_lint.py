"""Registry-wide output-schema lint (VERDICT r06 items 1/7).

The driver's correctness harness canonicalizes both result frames with a
pandas sort over every column before hashing; a list/struct/map cell
raises ``TypeError: unhashable type`` and the row records as ``err`` —
that is how three r06 queries lost their only non-self-graded signal.
Convention: NO array/map/struct columns in any query's output — serialize
with array_join / to_json in BOTH engines.

This test enforces the convention for all 350+ registered queries WITHOUT
starting Spark: DuckDB ``DESCRIBE SELECT`` binds each oracle against the
sf0.001 views and reports the output column types (planning only, no
execution). The driver separately enforces Spark-schema == oracle-schema,
so a green oracle side pins the Spark side too; ``tools/plan_lint.py``
additionally flags ARRAYOUT on the Spark schema per-batch.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

SF_DIR = "/root/testdata/sf0.001"

_UNHASHABLE = ("[]", "STRUCT(", "MAP(", "UNION(", "LIST")


def test_no_unhashable_output_columns():
    from oracle_check import duckdb_conn

    from uk_procurement_data_pipeline_spark.queries import registry

    con = duckdb_conn(SF_DIR)
    offenders: dict[str, list[tuple[str, str]]] = {}
    described = 0
    for name, spec in registry().items():
        if spec.oracle is None:
            continue
        desc = con.sql(f"DESCRIBE {spec.oracle}").fetchall()
        described += 1
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if any(k in typ.upper() for k in _UNHASHABLE)
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "array/map/struct output columns break the driver canonicalizer "
        f"(serialize with array_to_string/to_json): {offenders}"
    )
    assert described >= 350  # the lint actually swept the registry


def test_no_duplicate_output_column_names():
    """Duplicate column names make the driver's per-column compare
    ambiguous (pandas silently keeps both; sort order over them is
    engine-dependent)."""
    from oracle_check import duckdb_conn

    from uk_procurement_data_pipeline_spark.queries import registry

    con = duckdb_conn(SF_DIR)
    offenders = {}
    for name, spec in registry().items():
        if spec.oracle is None:
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE {spec.oracle}").fetchall()]
        if len(cols) != len(set(cols)):
            offenders[name] = cols
    assert offenders == {}
