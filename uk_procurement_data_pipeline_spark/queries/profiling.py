"""Column profiling — the data-quality summary a pipeline runs before
trusting a new drop ([NORTH-STAR]; the Deequ / Great-Expectations
"profile then assert" pattern, and the engine-side form of the
reference's manual eyeballing of daily files).

Two scans total: one aggregate computes every column's null count and
typed min/max (stringified only at the edge for the uniform output
schema); a second keyed pass over stacked (column, value) pairs yields
each column's mode (ties broken by the value string, set-deterministic)
AND its distinct count — so no multi-count_distinct aggregate and no
Expand-multiplied input. Shapes: the stats row is a single
partial+final aggregate; the value pass shuffles once on
(column, value) — high-cardinality keys, linear in table size — then
once on the bounded column domain for the argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


def _duck_stats(c: str) -> str:
    return f"""
        SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders"""


def _duck_mode(c: str) -> str:
    return f"""
        SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value,
               COUNT(*) AS cnt
        FROM orders WHERE {c} IS NOT NULL
        GROUP BY {c}"""


@register(
    name="profile_orders_columns",
    survey="A7 A8 W1 U1",
    doc="Per-column profile of orders (nulls, distinct, min/max, mode): "
    "two scans total — one aggregate for nulls + typed min/max "
    "(stack()ed into per-column rows; count_distinct is kept OUT of it "
    "because multi-distinct aggregates plan an Expand that multiplies "
    "input by the column count), and one stacked (column, value) "
    "keyed count that yields both the mode argmax and the distinct "
    "counts. Output one row per profiled column — the bounded-domain "
    "summary a quality gate asserts against.",
    oracle=f"""
        WITH stats AS ({" UNION ALL ".join(_duck_stats(c) for c in _COLS)}),
        vals AS ({" UNION ALL ".join(_duck_mode(c) for c in _COLS)}),
        modes AS (
            SELECT column_name, value AS top_value, cnt AS top_count
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY column_name
                      ORDER BY cnt DESC, value) AS rk FROM vals)
            WHERE rk = 1)
        SELECT s.column_name, s.n_nulls, s.n_distinct,
               s.min_value, s.max_value, m.top_value, m.top_count
        FROM stats s JOIN modes m USING (column_name)
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Stats scan: one aggregate with nulls + typed min/max per column —
    # deliberately NO count_distinct here: several count_distincts in one
    # aggregate plan an Expand (input rows multiplied by the column
    # count); distinct counts instead fall out of the mode pass below,
    # which already groups by (column, value). stack() pivots the single
    # wide row into one row per column.
    one = orders.agg(
        *[
            e
            for c in _COLS
            for e in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            )
        ]
    )
    stats = one.selectExpr(
        f"stack({len(_COLS)}, "
        + ", ".join(
            f"'{c}', `{c}__nulls`, `{c}__min`, `{c}__max`" for c in _COLS
        )
        + ") AS (column_name, n_nulls, min_value, max_value)"
    )
    # Value scan: each row stacks into (column, value) pairs map-side,
    # then ONE (column, value) shuffle feeds both the mode argmax and the
    # per-column distinct counts (count of groups).
    vals = (
        orders.selectExpr(
            f"stack({len(_COLS)}, "
            + ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _COLS)
            + ") AS (column_name, value)"
        )
        .where(F.col("value").isNotNull())
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("column_name").orderBy(
        F.col("cnt").desc(), F.col("value")
    )
    modes = (
        vals.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_distinct",
            F.count(F.lit(1)).over(Window.partitionBy("column_name")),
        )
        .where(F.col("rk") == 1)
        .select(
            "column_name",
            "n_distinct",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return stats.join(F.broadcast(modes), "column_name").select(
        "column_name",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        "top_value",
        "top_count",
    )


@register(
    name="constraint_check_orders",
    survey="E1 E5 A7 J7 U1",
    doc="Declarative data-quality constraint suite over orders (the "
    "Deequ/expectations VALIDATION stage, companion to "
    "profile_orders_columns): uniqueness of the key, completeness and "
    "referential integrity of the customer FK, value-range and "
    "domain-membership rules — one row per constraint with its "
    "violation count and verdict. Five of the six checks fold into a "
    "SINGLE conditional-aggregate scan; the FK orphan check is one "
    "broadcast-able anti-join. All counts are exact integers.",
    oracle="""
        WITH scan AS (
          SELECT count(*) AS n_rows,
                 count(*) - count(DISTINCT o_orderkey) AS dup_keys,
                 count(*) - count(o_custkey) AS null_cust,
                 count(*) FILTER (WHERE NOT (o_totalprice > 0))
                     AS bad_price,
                 count(*) FILTER (
                     WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                     AS bad_status,
                 count(*) FILTER (
                     WHERE o_orderdate < DATE '1992-01-01'
                        OR o_orderdate > DATE '1998-12-31')
                     AS bad_date
          FROM orders
        ), orphans AS (
          SELECT count(*) AS n
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL
        )
        SELECT 'o_orderkey_unique' AS constraint_name,
               CAST(n_rows AS BIGINT) AS n_checked,
               CAST(dup_keys AS BIGINT) AS n_violations,
               dup_keys = 0 AS passed FROM scan
        UNION ALL SELECT 'o_custkey_complete', n_rows, null_cust,
               null_cust = 0 FROM scan
        UNION ALL SELECT 'o_custkey_referential', n_rows, orphans.n,
               orphans.n = 0 FROM scan, orphans
        UNION ALL SELECT 'o_totalprice_positive', n_rows, bad_price,
               bad_price = 0 FROM scan
        UNION ALL SELECT 'o_orderstatus_domain', n_rows, bad_status,
               bad_status = 0 FROM scan
        UNION ALL SELECT 'o_orderdate_range', n_rows, bad_date,
               bad_date = 0 FROM scan
    """,
)
def constraint_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    scan = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        (F.count(F.lit(1)) - F.count("o_custkey"))
        .cast("bigint")
        .alias("null_cust"),
        F.sum(F.when(~(F.col("o_totalprice") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("bad_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_date"),
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = scan.crossJoin(F.broadcast(orphans))

    def row(name: str, viol: str):
        return s.select(
            F.lit(name).alias("constraint_name"),
            F.col("n_rows").alias("n_checked"),
            F.col(viol).alias("n_violations"),
            (F.col(viol) == 0).alias("passed"),
        )

    return (
        row("o_orderkey_unique", "dup_keys")
        .unionAll(row("o_custkey_complete", "null_cust"))
        .unionAll(row("o_custkey_referential", "n"))
        .unionAll(row("o_totalprice_positive", "bad_price"))
        .unionAll(row("o_orderstatus_domain", "bad_status"))
        .unionAll(row("o_orderdate_range", "bad_date"))
    )


# Benford expected first-digit probabilities log10(1 + 1/d), precomputed
# once in Python and embedded as LITERALS in both engines' expression
# trees, so no runtime log10 (whose last ulp may differ between Java's
# Math and libm) enters the differential comparison.
_BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_CASE_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())
    + " END"
)


@register(
    name="benford_first_digit",
    survey="A7 F9 F28 P4",
    doc="Benford's-law forensic profile of o_totalprice: observed "
    "first-significant-digit distribution vs the expected "
    "log10(1+1/d) frequencies, with each digit's chi-square "
    "contribution (the classic fabricated-data screen applied to "
    "spend values). The digit is taken from the BIGINT string of "
    "floor(value) - integer-to-string is engine-identical, unlike "
    "double formatting or runtime log10(), and the expected "
    "probabilities are Python-precomputed literals shared by both "
    "expression trees. One scan-side projection plus one 9-row "
    "bounded aggregate; nothing else touches row-sized data.",
    oracle=f"""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders WHERE o_totalprice >= 1.0
        ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits),
        obs AS (
          SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
          FROM digits GROUP BY digit
        )
        SELECT o.digit, o.n_obs,
               CAST(o.n_obs AS DOUBLE) / CAST(t.n AS DOUBLE) AS p_obs,
               {_BENFORD_CASE_SQL} AS p_benford,
               (CAST(o.n_obs AS DOUBLE)
                - CAST(t.n AS DOUBLE) * ({_BENFORD_CASE_SQL}))
               * (CAST(o.n_obs AS DOUBLE)
                  - CAST(t.n AS DOUBLE) * ({_BENFORD_CASE_SQL}))
               / (CAST(t.n AS DOUBLE) * ({_BENFORD_CASE_SQL}))
                   AS chi2_term
        FROM obs o CROSS JOIN tot t
        ORDER BY o.digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    digits = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1.0)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    tot = digits.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    p_benford = F.col("digit").cast("int")
    expected = None
    for d, p in _BENFORD_P.items():
        expected = (
            F.when(p_benford == d, F.lit(p))
            if expected is None
            else expected.when(p_benford == d, F.lit(p))
        )
    n = F.col("n").cast("double")
    n_obs = F.col("n_obs").cast("double")
    return (
        obs.join(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            (n_obs / n).alias("p_obs"),
            expected.alias("p_benford"),
            ((n_obs - n * expected) * (n_obs - n * expected) / (n * expected)).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )


_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_duck(table: str, col: str) -> str:
    return f"""
        SELECT '{table}.{col}' AS join_key,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_per_key,
               CAST(SUM(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS avg_per_key,
               CAST(MAX(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
               / CAST(SUM(c) AS DOUBLE) AS skew_ratio,
               CAST(MIN(CASE WHEN is_max THEN k END) AS BIGINT) AS top_key
        FROM (
            SELECT k, c, c = MAX(c) OVER () AS is_max
            FROM (SELECT {col} AS k, CAST(count(*) AS BIGINT) AS c
                  FROM {table} GROUP BY {col}))"""


@register(
    name="join_key_skew_report",
    survey="A7 A8 U1 F28",
    doc="Shuffle-key skew diagnostic over the pipeline's four hottest "
    "join/partition keys (the report you read BEFORE choosing salting "
    "or AQE skew-join thresholds at 100 TB): per-key row counts, key "
    "cardinality, max/avg skew ratio, and the heaviest key itself "
    "(deterministic arg-max: smallest key among those at the max). "
    "Each branch is one linear keyed aggregation plus a bounded "
    "second pass; the is_max marker is a window over the PER-KEY "
    "aggregate, and every emitted ratio is a single int/int IEEE "
    "division.",
    oracle=" UNION ALL ".join(_skew_duck(t, c) for t, c in _SKEW_KEYS)
    + " ORDER BY join_key",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, col in _SKEW_KEYS:
        per_key = (
            load(spark, sf_dir, table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        # Global max via a separate partial+final aggregate broadcast back
        # (NOT an unpartitioned window: per_key has key-cardinality rows,
        # which would all funnel through one WindowExec task at scale).
        mx = per_key.agg(F.max("c").alias("mx"))
        marked = per_key.join(F.broadcast(mx)).withColumn(
            "is_max", F.col("c") == F.col("mx")
        )
        branch = marked.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_per_key"),
            (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avg_per_key"
            ),
            (
                F.max("c").cast("double")
                * F.count(F.lit(1)).cast("double")
                / F.sum("c").cast("double")
            ).alias("skew_ratio"),
            F.min(F.when(F.col("is_max"), F.col("k"))).cast("bigint").alias("top_key"),
        ).select(F.lit(f"{table}.{col}").alias("join_key"), "*")
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("join_key")


_KANON_K = 5
_KANON_LEVELS = (
    ("nation", "CAST(c_nationkey AS VARCHAR)"),
    ("nation+segment", "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment"),
    (
        "nation+segment+balband",
        "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' "
        "|| CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)",
    ),
)


def _kanon_duck(label: str, qid: str) -> str:
    return f"""
        SELECT '{label}' AS quasi_id,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(MIN(c) AS BIGINT) AS min_group_size,
               CAST(SUM(CASE WHEN c < {_KANON_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_small_groups,
               CAST(SUM(CASE WHEN c < {_KANON_K} THEN c ELSE 0 END)
                    AS BIGINT) AS n_rows_at_risk
        FROM (SELECT {qid} AS q, CAST(count(*) AS BIGINT) AS c
              FROM customer GROUP BY 1)"""


@register(
    name="k_anonymity_report",
    survey="A7 A8 U1 F28 F1",
    doc="k-anonymity audit of the customer table under three "
    "progressively finer quasi-identifier generalizations (nation; "
    "nation+segment; nation+segment+balance-band) - the privacy "
    "screen run before releasing or joining user-level data: per "
    "level, the equivalence-class count, smallest class, classes "
    "below k=5, and rows at re-identification risk. Each level is "
    "one linear keyed aggregation plus a bounded rollup; string "
    "quasi-keys concatenate with an explicit separator so distinct "
    "tuples can never collide.",
    oracle=" UNION ALL ".join(_kanon_duck(lb, q) for lb, q in _KANON_LEVELS)
    + " ORDER BY quasi_id",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_exprs = {
        "nation": "CAST(c_nationkey AS STRING)",
        "nation+segment": "CAST(c_nationkey AS STRING) || '|' || c_mktsegment",
        "nation+segment+balband": (
            "CAST(c_nationkey AS STRING) || '|' || c_mktsegment || '|' "
            "|| CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS STRING)"
        ),
    }
    out = None
    for label, _duck_q in _KANON_LEVELS:
        per_group = (
            load(spark, sf_dir, "customer")
            .selectExpr(f"{spark_exprs[label]} AS q")
            .groupBy("q")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        branch = per_group.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.min("c").cast("bigint").alias("min_group_size"),
            F.sum(F.when(F.col("c") < _KANON_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_small_groups"),
            F.sum(F.when(F.col("c") < _KANON_K, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
        ).select(F.lit(label).alias("quasi_id"), "*")
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("quasi_id")


_FD_CHECKS = (
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
)


def _fd_duck(table: str, lhs: str, rhs: str) -> str:
    return f"""
        SELECT '{table}: {lhs} -> {rhs}' AS dependency,
               CAST(count(*) AS BIGINT) AS n_lhs_values,
               CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_lhs,
               CAST(MAX(k) AS BIGINT) AS max_rhs_variants,
               MAX(k) = 1 AS holds
        FROM (SELECT {lhs} AS l, CAST(count(DISTINCT {rhs}) AS BIGINT) AS k
              FROM {table} GROUP BY {lhs})"""


@register(
    name="functional_dependency_check",
    survey="A7 A8 U1 E5",
    doc="Functional-dependency discovery probe (Metanome-style data "
    "profiling, companion to constraint_check_orders): for five "
    "candidate A -> B dependencies, the count of LHS values, how "
    "many map to more than one RHS (violations), the worst fan-out, "
    "and the verdict. Each check is one linear (lhs)-keyed aggregate "
    "with a single count-distinct (no multi-distinct Expand) plus a "
    "bounded rollup; the five branches union to one bounded report.",
    oracle=" UNION ALL ".join(_fd_duck(*fd) for fd in _FD_CHECKS)
    + " ORDER BY dependency",
)
def functional_dependency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, lhs, rhs in _FD_CHECKS:
        per_lhs = (
            load(spark, sf_dir, table)
            .groupBy(F.col(lhs).alias("l"))
            .agg(F.countDistinct(rhs).cast("bigint").alias("k"))
        )
        branch = per_lhs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_values"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_lhs"),
            F.max("k").cast("bigint").alias("max_rhs_variants"),
            (F.max("k") == 1).alias("holds"),
        ).select(F.lit(f"{table}: {lhs} -> {rhs}").alias("dependency"), "*")
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("dependency")


_CHECKSUM_TABLES = (
    ("region", "CAST(r_regionkey AS VARCHAR) || '|' || r_name"),
    ("nation", "CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' "
               "|| CAST(n_regionkey AS VARCHAR)"),
    ("customer", "CAST(c_custkey AS VARCHAR) || '|' "
                 "|| CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment"),
    ("orders", "CAST(o_orderkey AS VARCHAR) || '|' "
               "|| CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus "
               "|| '|' || o_orderpriority"),
)


def _checksum_duck(table: str, key: str) -> str:
    return f"""
        SELECT '{table}' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(bit_xor(CAST('0x' || substr(md5({key}), 1, 15)
                                 AS BIGINT)) AS BIGINT) AS checksum
        FROM {table}"""


@register(
    name="table_checksum_audit",
    survey="A7 U1 E5 F1",
    doc="Order-insensitive table fingerprints (the cross-engine "
    "row-hash-sum trick this repo's own oracle harness is built on, "
    "exposed as an operator): per table, the row count and the exact "
    "BIGINT sum of 60-bit md5 row hashes over the STABLE (non-"
    "float) columns, with explicit '|' separators so distinct rows "
    "can never concatenate equal. Two replicas of a table match iff "
    "counts and checksums match - the cheap pre-diff run before any "
    "row-level reconciliation. One linear aggregation per table; "
    "sums stay far below 2^63 (60-bit terms).",
    oracle=" UNION ALL ".join(_checksum_duck(t, k) for t, k in _CHECKSUM_TABLES)
    + " ORDER BY table_name",
)
def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_keys = {
        "region": "CAST(r_regionkey AS STRING) || '|' || r_name",
        "nation": "CAST(n_nationkey AS STRING) || '|' || n_name || '|' "
                  "|| CAST(n_regionkey AS STRING)",
        "customer": "CAST(c_custkey AS STRING) || '|' "
                    "|| CAST(c_nationkey AS STRING) || '|' || c_mktsegment",
        "orders": "CAST(o_orderkey AS STRING) || '|' "
                  "|| CAST(o_custkey AS STRING) || '|' || o_orderstatus "
                  "|| '|' || o_orderpriority",
    }
    out = None
    for table, _k in _CHECKSUM_TABLES:
        branch = (
            load(spark, sf_dir, table)
            .selectExpr(
                "CAST(conv(substr(md5("
                + spark_keys[table]
                + "), 1, 15), 16, 10) AS BIGINT) AS h"
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.expr("bit_xor(h)").cast("bigint").alias("checksum"),
            )
            .select(F.lit(table).alias("table_name"), "*")
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("table_name")


@register(
    name="referential_integrity_audit",
    survey="J7 A7 U1 F28",
    doc="Star-schema referential-integrity audit — the cross-TABLE "
    "counterpart of constraint_check_orders' single-table rules: for "
    "every foreign-key edge (lineitem->orders, lineitem->part, "
    "lineitem->supplier, orders->customer, customer->nation, "
    "supplier->nation, nation->region), count child rows, orphan "
    "rows (left-anti join on the parent key), and distinct orphan "
    "keys. Each edge is one anti-join keyed on its FK — dimension "
    "parents broadcast, the two fact-side edges shuffle on the key "
    "they would naturally bucket by. Clean fixtures make every "
    "orphan count 0; the audit's value is the nonzero row you see "
    "the day an ingest breaks — and the all-green row proves the "
    "join graph every other query relies on.",
    oracle="""
        WITH edges AS (
          SELECT 'lineitem->orders' AS fk_edge,
                 CAST(count(*) AS BIGINT) AS n_child,
                 CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL)
                      AS BIGINT) AS n_orphans,
                 CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                      THEN l.l_orderkey END) AS BIGINT) AS n_orphan_keys
          FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE p.p_partkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN p.p_partkey IS NULL
                      THEN l.l_partkey END) AS BIGINT)
          FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          UNION ALL
          SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE s.s_suppkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN s.s_suppkey IS NULL
                      THEN l.l_suppkey END) AS BIGINT)
          FROM lineitem l LEFT JOIN supplier s
            ON l.l_suppkey = s.s_suppkey
          UNION ALL
          SELECT 'orders->customer', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE c.c_custkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
                      THEN o.o_custkey END) AS BIGINT)
          FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'customer->nation', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN n.n_nationkey IS NULL
                      THEN c.c_nationkey END) AS BIGINT)
          FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey
          UNION ALL
          SELECT 'supplier->nation', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN n.n_nationkey IS NULL
                      THEN s.s_nationkey END) AS BIGINT)
          FROM supplier s LEFT JOIN nation n
            ON s.s_nationkey = n.n_nationkey
          UNION ALL
          SELECT 'nation->region', CAST(count(*) AS BIGINT),
                 CAST(count(*) FILTER (WHERE r.r_regionkey IS NULL)
                      AS BIGINT),
                 CAST(count(DISTINCT CASE WHEN r.r_regionkey IS NULL
                      THEN n.n_regionkey END) AS BIGINT)
          FROM nation n LEFT JOIN region r
            ON n.n_regionkey = r.r_regionkey
        )
        SELECT fk_edge, n_child, n_orphans, n_orphan_keys,
               (n_orphans = 0) AS is_clean
        FROM edges
        ORDER BY fk_edge
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(name, child, ckey, parent, pkey, broadcast_parent=True):
        p = load(spark, sf_dir, parent).select(F.col(pkey).alias("_pk"))
        if broadcast_parent:
            p = F.broadcast(p)
        j = load(spark, sf_dir, child).select(F.col(ckey).alias("_ck")).join(
            p, F.col("_ck") == F.col("_pk"), "left"
        )
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
            F.countDistinct(
                F.when(F.col("_pk").isNull(), F.col("_ck"))
            )
            .cast("bigint")
            .alias("n_orphan_keys"),
        )

    # dimension parents broadcast; the orders parent of lineitem is
    # fact-sized, so that edge uses a shuffled join (broadcast=False).
    edges = [
        edge("lineitem->orders", "lineitem", "l_orderkey", "orders",
             "o_orderkey", broadcast_parent=False),
        edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
             "s_suppkey"),
        edge("orders->customer", "orders", "o_custkey", "customer",
             "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey", "nation",
             "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey", "nation",
             "n_nationkey"),
        edge("nation->region", "nation", "n_regionkey", "region",
             "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.select(
        "fk_edge",
        "n_child",
        "n_orphans",
        "n_orphan_keys",
        (F.col("n_orphans") == 0).alias("is_clean"),
    ).orderBy("fk_edge")


@register(
    name="dictionary_encoding_advisor",
    survey="A7 A8 U1 F28",
    doc="Columnar-storage encoding advisor — with partition_layout_"
    "planner and zorder_cell_stats this completes the physical-design "
    "audit trio: for each candidate string/low-cardinality column of "
    "the two fact tables, exact row count, exact NDV, exact total "
    "byte length (strlen/octet_length), and the dictionary-vs-plain "
    "size model (dict page = ndv x avg_len + n x 4-byte codes vs "
    "plain = total bytes), recommending ENCODE when the model says "
    "dict is smaller. The per-column stats ride a stack() unpivot "
    "collapsed by map-side partial agg; NDV is an exact "
    "count-distinct per column (the profile contract — sketches are "
    "the separate kmv/hll rows). All integers except the one ratio "
    "division.",
    oracle="""
        WITH cols AS (
          SELECT 'l_returnflag' AS col, l_returnflag AS val
          FROM lineitem
          UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
          UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
          UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        ), stats AS (
          SELECT col,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT val) AS BIGINT) AS ndv,
                 CAST(SUM(strlen(val)) AS BIGINT) AS plain_bytes
          FROM cols GROUP BY col
        )
        SELECT col, n_rows, ndv, plain_bytes,
               ndv * ((plain_bytes + n_rows - 1) // n_rows) + n_rows * 4
                   AS dict_bytes_model,
               CAST(ndv AS DOUBLE) / CAST(n_rows AS DOUBLE) AS ndv_ratio,
               (ndv * ((plain_bytes + n_rows - 1) // n_rows)
                + n_rows * 4 < plain_bytes) AS recommend_dict
        FROM stats
        ORDER BY col
    """,
)
def dictionary_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "stack(2, 'l_returnflag', l_returnflag,"
        " 'l_linestatus', l_linestatus) AS (col, val)"
    )
    od = load(spark, sf_dir, "orders").selectExpr(
        "stack(2, 'o_orderstatus', o_orderstatus,"
        " 'o_orderpriority', o_orderpriority) AS (col, val)"
    )
    stats = (
        li.unionByName(od)
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("val").cast("bigint").alias("ndv"),
            F.sum(F.octet_length("val")).cast("bigint").alias("plain_bytes"),
        )
    )
    dict_model = (
        "ndv * ((plain_bytes + n_rows - 1) div n_rows) + n_rows * 4"
    )
    return stats.select(
        "col",
        "n_rows",
        "ndv",
        "plain_bytes",
        F.expr(dict_model).alias("dict_bytes_model"),
        (F.col("ndv").cast("double") / F.col("n_rows").cast("double")).alias(
            "ndv_ratio"
        ),
        F.expr(f"{dict_model} < plain_bytes").alias("recommend_dict"),
    ).orderBy("col")


@register(
    name="consistent_hash_shard_audit",
    survey="A7 J5 W1 F28",
    doc="Consistent-hashing shard audit (Karger et al. 1997) — the "
    "resharding-cost analysis behind every distributed cache/state "
    "layer: place documents on an 8-shard md5 ring (4 virtual nodes "
    "per shard), grow it to 9 shards, and measure the moved-key "
    "fraction against naive mod-N assignment. The ring property says "
    "~1/9 of keys move vs ~8/9 for mod — this query MEASURES it on "
    "real hashed keys. Successor lookup is a (wrap-flag, vnode-hash) "
    "row_number over the <=36-row broadcast ring per doc — one "
    "doc-keyed window, no shuffle beyond it; every hash is in-engine "
    "md5 (the portable family). Also reports the 8-shard ring's "
    "max shard share as the balance check.",
    oracle="""
        WITH docs AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS h
          FROM documents
        ), ring8 AS (
          SELECT s.s AS shard,
                 CAST('0x' || substr(md5('shard-' || CAST(s.s AS VARCHAR)
                      || '-' || CAST(r.r AS VARCHAR)), 1, 15) AS BIGINT)
                     AS vh
          FROM (SELECT unnest(range(0, 8)) AS s) s,
               (SELECT unnest(range(0, 4)) AS r) r
        ), ring9 AS (
          SELECT s.s AS shard,
                 CAST('0x' || substr(md5('shard-' || CAST(s.s AS VARCHAR)
                      || '-' || CAST(r.r AS VARCHAR)), 1, 15) AS BIGINT)
                     AS vh
          FROM (SELECT unnest(range(0, 9)) AS s) s,
               (SELECT unnest(range(0, 4)) AS r) r
        ), a8 AS (
          SELECT doc_id, shard FROM (
            SELECT d.doc_id, rg.shard,
                   row_number() OVER (PARTITION BY d.doc_id
                     ORDER BY CASE WHEN rg.vh >= d.h THEN 0 ELSE 1 END,
                              rg.vh) AS rn
            FROM docs d CROSS JOIN ring8 rg) t
          WHERE rn = 1
        ), a9 AS (
          SELECT doc_id, shard FROM (
            SELECT d.doc_id, rg.shard,
                   row_number() OVER (PARTITION BY d.doc_id
                     ORDER BY CASE WHEN rg.vh >= d.h THEN 0 ELSE 1 END,
                              rg.vh) AS rn
            FROM docs d CROSS JOIN ring9 rg) t
          WHERE rn = 1
        ), joined AS (
          SELECT d.doc_id, d.h, a8.shard AS s8, a9.shard AS s9
          FROM docs d
          JOIN a8 ON a8.doc_id = d.doc_id
          JOIN a9 ON a9.doc_id = d.doc_id
        ), loads AS (
          SELECT CAST(MAX(cnt) AS BIGINT) AS max_load FROM (
            SELECT s8, count(*) AS cnt FROM joined GROUP BY s8) t
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ring_moved,
               CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS ring_moved_frac,
               CAST(SUM(CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END)
                    AS BIGINT) AS mod_moved,
               CAST(SUM(CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mod_moved_frac,
               CAST(l.max_load AS DOUBLE) * 8.0
                 / CAST(count(*) AS DOUBLE) AS ring8_max_share_x8
        FROM joined CROSS JOIN loads l
        GROUP BY l.max_load
    """,
)
def consistent_hash_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) AS h",
    )

    def ring(n: int) -> DataFrame:
        ss = spark.range(0, n).select(F.col("id").cast("bigint").alias("s"))
        rr = spark.range(0, 4).select(F.col("id").cast("bigint").alias("r"))
        return ss.crossJoin(rr).selectExpr(
            "s AS shard",
            "CAST(conv(substr(md5('shard-' || CAST(s AS STRING) || '-'"
            " || CAST(r AS STRING)), 1, 15), 16, 10) AS BIGINT) AS vh",
        )

    def assign(ring_df: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(
            F.expr("CASE WHEN vh >= h THEN 0 ELSE 1 END"), "vh"
        )
        return (
            docs.crossJoin(F.broadcast(ring_df))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", F.col("shard").alias(out))
        )

    joined = (
        docs.join(assign(ring(8), "s8"), "doc_id")
        .join(assign(ring(9), "s9"), "doc_id")
    )
    loads = (
        joined.groupBy("s8")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").cast("bigint").alias("max_load"))
    )
    return (
        joined.crossJoin(F.broadcast(loads))
        .groupBy("max_load")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
            .cast("bigint")
            .alias("ring_moved"),
            (
                F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("ring_moved_frac"),
            F.sum(F.when(F.expr("h % 8 <> h % 9"), 1).otherwise(0))
            .cast("bigint")
            .alias("mod_moved"),
            (
                F.sum(F.when(F.expr("h % 8 <> h % 9"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("mod_moved_frac"),
            (
                F.max("max_load").cast("double")
                * 8.0
                / F.count(F.lit(1)).cast("double")
            ).alias("ring8_max_share_x8"),
        )
        .drop("max_load")
    )


@register(
    name="t_closeness_report",
    survey="A7 A8 W3 J5 F28",
    doc="t-closeness audit (Li, Li & Venkatasubramanian 2007) — the "
    "third rung of the privacy-release ladder after k_anonymity_report "
    "and l_diversity_report: for every quasi-identifier class "
    "(nation+segment, the k-anonymity level-2 QI), the Earth Mover's "
    "Distance between the class's distribution over the ORDERED "
    "sensitive attribute (account-balance band, floor(acctbal/2000)) "
    "and the global distribution; the release is t-close iff "
    "max EMD <= t. For an ordered attribute with unit ground "
    "distances EMD = (1/(m-1)) * sum_i |cumP_i - cumQ_i|, computed "
    "here with the X144 Wasserstein integer trick: the numerator "
    "sum_i |cum_g_i*N - cum_all_i*n_g| is an EXACT BIGINT (band "
    "spine per class so cumulative sums align over missing bands), "
    "and the single float division is micro-floored. Emits per-class "
    "n, the exact numerator, emd_micro, and the global t_micro = max "
    "over classes as a constant column. At 100 TB: one keyed count "
    "agg + bounded-domain spine joins + per-class windows over <= m "
    "rows.",
    oracle="""
        WITH c AS (
            SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
                       AS quasi_id,
                   CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
            FROM customer),
        bands AS (SELECT DISTINCT band FROM c),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM bands),
        n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        gtot AS (
            SELECT quasi_id, CAST(count(*) AS BIGINT) AS n_g
            FROM c GROUP BY 1),
        gband AS (
            SELECT quasi_id, band, CAST(count(*) AS BIGINT) AS cnt
            FROM c GROUP BY 1, 2),
        aband AS (
            SELECT band, CAST(count(*) AS BIGINT) AS cnt
            FROM c GROUP BY 1),
        spine AS (
            SELECT g.quasi_id, b.band FROM gtot g CROSS JOIN bands b),
        cums AS (
            SELECT s.quasi_id, s.band,
                   SUM(COALESCE(gb.cnt, 0)) OVER (
                       PARTITION BY s.quasi_id ORDER BY s.band) AS cum_g,
                   SUM(ab.cnt) OVER (
                       PARTITION BY s.quasi_id ORDER BY s.band) AS cum_all
            FROM spine s
            LEFT JOIN gband gb
              ON gb.quasi_id = s.quasi_id AND gb.band = s.band
            JOIN aband ab ON ab.band = s.band),
        nums AS (
            SELECT cu.quasi_id,
                   CAST(SUM(abs(cu.cum_g * na.n - cu.cum_all * gt.n_g))
                        AS BIGINT) AS emd_num
            FROM cums cu
            JOIN gtot gt ON gt.quasi_id = cu.quasi_id
            CROSS JOIN n_all na
            CROSS JOIN m
            WHERE cu.band < (SELECT MAX(band) FROM bands)
            GROUP BY cu.quasi_id),
        scored AS (
            SELECT g.quasi_id, g.n_g, COALESCE(nm.emd_num, 0) AS emd_num,
                   CAST(floor(CAST(COALESCE(nm.emd_num, 0) AS DOUBLE)
                              / (CAST(g.n_g AS DOUBLE) * CAST(na.n AS DOUBLE)
                                 * (CAST(m.m AS DOUBLE) - 1.0))
                              * 1000000 + 0.5) AS BIGINT) AS emd_micro
            FROM gtot g
            LEFT JOIN nums nm ON nm.quasi_id = g.quasi_id
            CROSS JOIN n_all na
            CROSS JOIN m)
        SELECT s.quasi_id, s.n_g, s.emd_num, s.emd_micro, t.t_micro
        FROM scored s
        CROSS JOIN (SELECT MAX(emd_micro) AS t_micro FROM scored) t
    """,
)
def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer").selectExpr(
        "CAST(c_nationkey AS STRING) || '|' || c_mktsegment AS quasi_id",
        "CAST(floor(c_acctbal / 2000) AS BIGINT) AS band",
    )
    bands = c.select("band").distinct()
    m = bands.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    n_all = c.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    maxband = bands.agg(F.max("band").alias("max_band"))
    gtot = c.groupBy("quasi_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    gband = c.groupBy("quasi_id", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    aband = c.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("acnt")
    )
    spine = gtot.select("quasi_id").crossJoin(F.broadcast(bands))
    wb = (
        Window.partitionBy("quasi_id")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = (
        spine.join(gband, ["quasi_id", "band"], "left")
        .join(F.broadcast(aband), "band")
        .withColumn("cum_g", F.sum(F.coalesce("cnt", F.lit(0))).over(wb))
        .withColumn("cum_all", F.sum("acnt").over(wb))
    )
    nums = (
        cums.join(gtot, "quasi_id")
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(maxband))
        .where(F.col("band") < F.col("max_band"))
        .groupBy("quasi_id")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n")
                    - F.col("cum_all") * F.col("n_g")
                )
            )
            .cast("bigint")
            .alias("emd_num")
        )
    )
    scored = (
        gtot.join(nums, "quasi_id", "left")
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(m))
        .selectExpr(
            "quasi_id",
            "n_g",
            "CAST(COALESCE(emd_num, 0) AS BIGINT) AS emd_num",
            "CAST(floor(CAST(COALESCE(emd_num, 0) AS DOUBLE)"
            " / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE)"
            " * (CAST(m AS DOUBLE) - 1.0)) * 1000000 + 0.5) AS BIGINT)"
            " AS emd_micro",
        )
    )
    tmax = scored.agg(F.max("emd_micro").alias("t_micro"))
    return scored.crossJoin(F.broadcast(tmax)).select(
        "quasi_id", "n_g", "emd_num", "emd_micro", "t_micro"
    )
