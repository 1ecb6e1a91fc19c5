"""Engine-internal invariants for the Spark 4 SQL-surface queries
(sql_surfaces.py), complementing the cross-engine oracle checks: pipe
syntax must be plan-equivalent to the ANSI form, parameter binding must
constant-fold into pushed scan filters, the session variable must hold
the value the DataFrame API computes, and the scripting loop's integer
postcondition must hold exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.queries import registry


def test_pipe_syntax_equals_ansi_dataframe_form(spark, sf_dir):
    # Pipe syntax is parse-level sugar: the same rows must come back as
    # the DataFrame-API ANSI formulation, and the optimized plan must be
    # an ordinary hash aggregate (no extra exchange introduced by the
    # pipe chain).
    df = registry()["pipe_syntax_returnflag_revenue"].fn(spark, sf_dir)
    got = {tuple(r) for r in df.collect()}

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = {
        tuple(r)
        for r in (
            li.where(
                (F.col("l_shipdate") >= "1995-01-01")
                & (F.col("l_shipdate") < "1996-01-01")
            )
            .withColumn(
                "net_cents",
                F.expr(
                    "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)"
                    " AS BIGINT)"
                ),
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum("net_cents").alias("revenue_cents"),
            )
            .collect()
        )
    }
    assert got == expect
    assert "HashAggregate" in df._jdf.queryExecution().executedPlan().toString()


def test_parameterized_binding_constant_folds_into_scan(spark, sf_dir):
    # The :lo/:hi markers bind at parse time, so the timestamp bounds
    # must reach the parquet scan as pushed filters — the whole point of
    # parameter markers over driver-side string interpolation.
    df = registry()["parameterized_sql_priority_band"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan.split("PushedFilters")[1][:400]
    # Binding is value-faithful: zero rows escape the band.
    ord_df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_band = ord_df.where(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).count()
    assert df.agg(F.sum("n_orders")).collect()[0][0] == n_band


def test_session_variable_holds_dataframe_mean(spark, sf_dir):
    # After fn() runs, the declared variable must equal the mean order
    # cents computed independently via the DataFrame API, and the query
    # must be idempotent across re-runs (DECLARE OR REPLACE semantics).
    fn = registry()["session_variable_threshold_filter"].fn
    first = {tuple(r) for r in fn(spark, sf_dir).collect()}
    second = {tuple(r) for r in fn(spark, sf_dir).collect()}
    assert first == second

    var_val = spark.sql("SELECT sqs_avg_cents AS v").collect()[0]["v"]
    mean_cents = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c")
        )
        .agg(F.round(F.avg("c")).cast("bigint").alias("m"))
        .collect()[0]["m"]
    )
    assert var_val == mean_cents


def test_scripting_loop_postcondition_exact(spark, sf_dir):
    # Integer recurrence postcondition: thr = 10000 * 2^steps, and the
    # loop exits on the FIRST threshold clearing the max order cents —
    # so thr >= max > thr/2 (the previous iterate was still below).
    row = (
        registry()["sql_scripting_doubling_threshold"]
        .fn(spark, sf_dir)
        .collect()[0]
    )
    steps, thr = int(row["n_doublings"]), int(row["final_thr_cents"])
    assert thr == 10000 * (2**steps)
    max_cents = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(
            F.max(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert thr >= max_cents
    assert steps == 0 or thr // 2 < max_cents


def test_group_by_all_partitions_the_table(spark, sf_dir):
    # GROUP BY ALL must tile the table: per-cell counts sum to the row
    # count, and the inferred keys are exactly (order_year, status).
    df = registry()["group_by_all_year_status"].fn(spark, sf_dir)
    assert df.columns == [
        "order_year",
        "o_orderstatus",
        "n_orders",
        "total_cents",
    ]
    total = df.agg(F.sum("n_orders")).collect()[0][0]
    n_rows = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == n_rows
    assert df.count() == df.select("order_year", "o_orderstatus").distinct().count()
