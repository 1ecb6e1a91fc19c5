"""Property tests for the round-5 analytics additions: invariants that
hold for ANY input, complementing the value-level oracle checks."""

from __future__ import annotations

import numpy as np

from uk_procurement_data_pipeline_spark.queries import registry


def test_theil_sen_matches_numpy_median_of_slopes(spark, sf_dir):
    rows = registry()["theil_sen_daily_trend"].fn(spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type", "CAST(date_trunc('day', ts) AS DATE) AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    daily: dict[str, list] = {}
    for r in ev:
        daily.setdefault(r["event_type"], []).append((r["d"].toordinal(), r["count"]))
    for r in rows:
        pts = sorted(daily[r["event_type"]])
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        m = len(slopes)
        assert r["n_pairs"] == m
        expect = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2.0
        assert abs(r["theil_sen_slope"] - expect) < 1e-12


def test_benford_digit_distribution_is_a_distribution(spark, sf_dir):
    rows = registry()["benford_first_digit"].fn(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r["chi2_term"] >= 0.0
        assert 0.0 < r["p_benford"] < 0.32


def test_burst_days_stats_are_self_consistent(spark, sf_dir):
    rows = registry()["burst_day_detection"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["n_events"] >= 6
        assert 0 <= r["span_us"] < 86_400_000_000
        assert abs(r["mean_gap_us"] - r["span_us"] / (r["n_events"] - 1)) < 1e-6


def test_power_iteration_aligns_with_numpy_top_eigvec(spark, sf_dir):
    rows = registry()["power_iteration_top_pc"].fn(spark, sf_dir).collect()
    v = np.array([r["pc1_component"] for r in sorted(rows, key=lambda r: r["dim"])])
    embs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("embedding")
        .collect()
    )
    X = np.array([e["embedding"] for e in embs], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    # The operator is DEFINED as eight L1-normalized power steps from an
    # all-ones start (the fixture's spectrum is near-degenerate, so no
    # step count "converges"); the property is that the distributed
    # quantized arithmetic tracks the float64 reference step-for-step.
    ref = np.ones(64)
    for _ in range(8):
        s = C @ ref
        ref = s / np.abs(s).sum()
    cos = abs(v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos > 0.999999
    # lambda_l1 equals ||C v7||_1 of the reference walk (within the
    # 1e-12 quantization the operator documents)
    lam = rows[0]["lambda_l1"]
    assert abs(lam - np.abs(s).sum()) < 1e-6
    # and the L1 Rayleigh estimate is bounded by the spectral radius
    w, _ = np.linalg.eigh(C)
    assert 0.0 < lam <= np.abs(w).max() * (1.0 + 1e-9)


def test_exact_substr_removes_only_true_duplicate_grams(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in registry()["exact_substr_dedup_spans"].fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = 8
    seen: set[tuple] = set()
    kept_expect: dict[int, int] = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        toks = d["text"].split(" ")
        covered = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            if g in seen:
                for j in range(i, i + n):
                    covered[j] = True
            else:
                seen.add(g)
        kept_expect[d["doc_id"]] = sum(1 for c in covered if not c)
    for doc_id, want in kept_expect.items():
        got = out[doc_id]["n_kept"] if doc_id in out else 0
        assert got == want, (doc_id, got, want)
        if doc_id in out:
            assert out[doc_id]["n_tokens"] == len(
                next(d for d in docs if d["doc_id"] == doc_id)["text"].split(" ")
            )


def test_skew_report_ratios_consistent(spark, sf_dir):
    rows = registry()["join_key_skew_report"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_keys"] <= r["n_rows"]
        assert r["max_per_key"] >= 1
        assert abs(r["avg_per_key"] - r["n_rows"] / r["n_keys"]) < 1e-9
        assert abs(r["skew_ratio"] - r["max_per_key"] / r["avg_per_key"]) < 1e-9
        assert r["skew_ratio"] >= 1.0 - 1e-12


def test_vocab_jaccard_symmetric_domain_and_bounds(spark, sf_dir):
    rows = registry()["source_vocab_jaccard"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["n_inter"] <= min(r["vocab_a"], r["vocab_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_margin_calibration_partitions_the_corpus(spark, sf_dir):
    rows = registry()["nb_margin_calibration"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert abs(r["accuracy"] - r["n_correct"] / r["n_docs"]) < 1e-12
        assert 0 <= r["margin_bin"] <= 9


def test_winsorized_mean_between_clip_bounds(spark, sf_dir):
    rows = registry()["winsorized_stats_per_type"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["p05"] <= r["p95"]
        assert r["p05"] <= r["mean_winsorized"] <= r["p95"]
        # clipping at most 5% each side (integer rank rounding slack: 1 row)
        assert r["n_clipped_lo"] <= r["n"] * 0.05 + 1
        assert r["n_clipped_hi"] <= r["n"] * 0.05 + 1


def test_split_leakage_covers_all_val_docs(spark, sf_dir):
    rows = registry()["split_leakage_report"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_grams"]
        if r["n_grams"] > 0:
            assert abs(r["leak_frac"] - r["n_leaked"] / r["n_grams"]) < 1e-12
        else:
            assert r["leak_frac"] is None


def test_stream_static_enrich_matches_batch_join(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = registry()["stream_static_enrich"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    first = ev.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("d0"))
    batch = (
        ev.join(first, "user_id")
        .groupBy(
            "event_type",
            (F.date_trunc("day", "ts") == F.col("d0")).alias("is_first_day"),
        )
        .count()
        .collect()
    )
    want = {(r["event_type"], r["is_first_day"]): r["count"] for r in batch}
    got = {(r["event_type"], r["is_first_day"]): r["n_events"] for r in rows}
    assert got == want


def test_k_anonymity_monotone_under_refinement(spark, sf_dir):
    rows = {r["quasi_id"]: r for r in registry()["k_anonymity_report"].fn(spark, sf_dir).collect()}
    # refining the quasi-identifier can only fragment groups
    assert rows["nation"]["n_groups"] <= rows["nation+segment"]["n_groups"]
    assert (
        rows["nation+segment"]["n_groups"]
        <= rows["nation+segment+balband"]["n_groups"]
    )
    assert rows["nation"]["min_group_size"] >= rows["nation+segment"]["min_group_size"]
    for r in rows.values():
        assert r["n_small_groups"] <= r["n_groups"]
        assert r["n_rows_at_risk"] < r["n_small_groups"] * 5 + 1


def test_item_cooccurrence_cosine_bounds_and_order(spark, sf_dir):
    rows = registry()["item_cooccurrence_cosine"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 0 < r["n_co"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["cosine"] <= 1.0


def test_centroid_outlier_z_recomputes(spark, sf_dir):
    import numpy as np

    rows = registry()["embedding_norm_outliers"].fn(spark, sf_dir).collect()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array([e["embedding"] for e in embs], dtype=np.float64)
    mu = X.mean(axis=0)
    d = np.sqrt(((X - mu) ** 2).sum(axis=1))
    z = (d - d.mean()) / d.std()
    want = {e["vec_id"] for e, zz in zip(embs, z) if abs(zz) > 2.5}
    got = {r["vec_id"] for r in rows}
    # micro-quantization can flip borderline vectors only
    assert got.symmetric_difference(want) <= {
        e["vec_id"] for e, zz in zip(embs, z) if 2.45 < abs(zz) < 2.55
    }


def test_markov_predictor_at_least_matches_mode_overall(spark, sf_dir):
    rows = registry()["markov_prediction_accuracy"].fn(spark, sf_dir).collect()
    n_m = sum(r["n_markov_hits"] for r in rows)
    n_g = sum(r["n_mode_hits"] for r in rows)
    # per-row argmax can never lose to a single global constant in-sample
    assert n_m >= n_g
    for r in rows:
        assert 0 <= r["n_markov_hits"] <= r["n_transitions"]
        assert abs(r["markov_accuracy"] - r["n_markov_hits"] / r["n_transitions"]) < 1e-12


def test_kmeans_purity_covers_all_vectors(spark, sf_dir):
    rows = registry()["kmeans_label_purity"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == n_vecs
    for r in rows:
        assert 0 < r["n_majority"] <= r["n_vectors"]
        assert abs(r["purity"] - r["n_majority"] / r["n_vectors"]) < 1e-12
        assert 0.0 < r["purity"] <= 1.0


def test_log_odds_top_terms_really_lean_into_their_source(spark, sf_dir):
    rows = registry()["distinctive_terms_log_odds"].fn(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for src, rs in per_source.items():
        assert len(rs) == 5
        ranks = [r["rk"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert ranks == [1, 2, 3, 4, 5]
        zs = [r["z_micro"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert zs == sorted(zs, reverse=True)


def test_fd_check_verdicts_match_counts(spark, sf_dir):
    rows = registry()["functional_dependency_check"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    by_dep = {r["dependency"]: r for r in rows}
    # the key-based dependency must hold on the TPC-H-shaped fixture
    assert by_dep["customer: c_custkey -> c_nationkey"]["holds"]
    for r in rows:
        assert r["holds"] == (r["max_rhs_variants"] == 1)
        assert r["holds"] == (r["n_violating_lhs"] == 0)
        assert r["n_violating_lhs"] <= r["n_lhs_values"]


def test_gap_interpolation_fills_every_calendar_day(spark, sf_dir):
    rows = registry()["daily_gap_interpolation"].fn(spark, sf_dir).collect()
    days = [r["day_idx"] for r in rows]
    assert days == list(range(days[0], days[-1] + 1))
    assert not rows[0]["is_interpolated"] and not rows[-1]["is_interpolated"]
    by_day = {r["day_idx"]: r for r in rows}
    for r in rows:
        if r["is_interpolated"]:
            assert r["n_observed"] is None
            lo = max(d for d in days if d < r["day_idx"] and not by_day[d]["is_interpolated"])
            hi = min(d for d in days if d > r["day_idx"] and not by_day[d]["is_interpolated"])
            a, b = by_day[lo]["n_filled"], by_day[hi]["n_filled"]
            assert min(a, b) - 1e-9 <= r["n_filled"] <= max(a, b) + 1e-9
        else:
            assert r["n_filled"] == float(r["n_observed"])


def test_retention_fit_r2_in_unit_range(spark, sf_dir):
    (r,) = registry()["retention_decay_fit"].fn(spark, sf_dir).collect()
    assert r["n_offsets"] >= 3
    assert 0.0 <= r["r_squared"] <= 1.0
    if r["decay_per_day"] < 0:
        assert r["half_life_days"] is not None and r["half_life_days"] > 0
        assert abs(r["half_life_days"] - 0.6931471805599453 / -r["decay_per_day"]) < 1e-9
    else:
        assert r["half_life_days"] is None


def test_association_rules_metrics_recompute(spark, sf_dir):
    rows = registry()["association_rules_parts"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["n_co"] >= 3
        assert abs(r["conf_a_to_b"] - r["n_co"] / r["n_a"]) < 1e-12
        assert abs(r["conf_b_to_a"] - r["n_co"] / r["n_b"]) < 1e-12
        assert 0.0 < r["support"] <= 1.0


def test_forecast_backtest_mae_recomputes(spark, sf_dir):
    rows = registry()["moving_forecast_backtest"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["n_scored_days"] >= 1
        assert abs(r["mae"] - r["abs_err7_sum"] / (7.0 * r["n_scored_days"])) < 1e-9
        assert r["relative_mae"] >= 0.0


def test_blocking_report_bounds(spark, sf_dir):
    (r,) = registry()["blocking_quality_report"].fn(spark, sf_dir).collect()
    total_pairs = r["n_docs"] * (r["n_docs"] - 1) // 2
    assert 0 <= r["n_candidate_pairs"] <= total_pairs
    assert 0.0 <= r["reduction_ratio"] <= 1.0
    if r["n_true_pairs"] > 0:
        assert 0 <= r["n_true_pairs_blocked"] <= r["n_true_pairs"]
        assert 0.0 <= r["pair_completeness"] <= 1.0
        # identical texts have identical signatures: every truth pair
        # must share all bands, so LSH blocking recovers them all
        assert r["pair_completeness"] == 1.0
    else:
        assert r["pair_completeness"] is None


def test_distinct_ngram_ratios_ordered(spark, sf_dir):
    rows = registry()["distinct_ngram_diversity"].fn(spark, sf_dir).collect()
    for r in rows:
        for n in (1, 2, 3):
            assert 0 < r[f"d{n}"] <= r[f"n{n}"]
            assert 0.0 < r[f"distinct{n}"] <= 1.0
        # higher-order n-grams are at least as distinct per token
        assert r["distinct2"] >= r["distinct1"] - 1e-12
        assert r["n1"] >= r["n2"] >= r["n3"]


def test_conformal_coverage_at_least_nominal(spark, sf_dir):
    rows = registry()["conformal_interval_backtest"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["half_width"] >= 0.0
        assert 0 <= r["n_covered"] <= r["n_calibration_days"]
        # the ceil(0.9*(m+1)) order statistic guarantees >= 90% in-sample
        assert r["empirical_coverage"] >= 0.9 - 1e-12


def test_target_encoding_is_leakage_free(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = registry()["target_encoding_oof"].fn(spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type",
            "value",
            "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 5 AS fold",
        )
        .collect()
    )
    from collections import defaultdict

    sums = defaultdict(float)
    cnts = defaultdict(int)
    for e in ev:
        sums[(e["event_type"], e["fold"])] += e["value"]
        cnts[(e["event_type"], e["fold"])] += 1
    for r in rows:
        others = [
            (sums[(r["event_type"], f)], cnts[(r["event_type"], f)])
            for f in range(5)
            if f != r["fold"]
        ]
        s = sum(x for x, _ in others)
        n = sum(c for _, c in others)
        assert n > 0
        assert abs(r["oof_mean"] - s / n) < 1e-6


def test_attribution_credit_conserves_mass(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = registry()["position_attribution_credit"].fn(spark, sf_dir).collect()
    total_micro = sum(r["credit_micro_sum"] for r in rows)
    # purchases with at least one touch each contribute ~1e6 micro units
    # (up to (k-2) floor-division remainders lost per purchase)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purch = ev.where(F.col("event_type") == "purchase").selectExpr(
        "event_id AS pid", "user_id", "ts AS pts"
    )
    touched = (
        purch.join(
            ev.where(F.col("event_type").isin("view", "click")).select(
                "user_id", F.col("ts").alias("tts")
            ),
            "user_id",
        )
        .where(
            (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 60 MINUTE"))
            & (F.col("tts") < F.col("pts"))
        )
        .select("pid")
        .distinct()
        .count()
    )
    assert touched * 1_000_000 >= total_micro > touched * 990_000


def test_feature_vector_covers_every_customer(spark, sf_dir):
    # long-form (c_custkey, i, feature) rows — reassemble per customer
    rows = registry()["customer_feature_vector"].fn(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    vecs: dict[int, dict[int, float]] = {}
    for r in rows:
        vecs.setdefault(r["c_custkey"], {})[r["i"]] = r["feature"]
    assert len(vecs) == n_cust
    assert len(rows) == n_cust * 6
    for f in vecs.values():
        assert sorted(f) == list(range(6))
        n_orders, total, days, avg = f[1], f[2], f[3], f[4]
        if n_orders == 0.0:
            assert total == 0.0 and days == -1.0 and avg == 0.0
        else:
            assert abs(avg - total / n_orders) < 1e-9
            assert days >= 0.0


def test_cross_source_matrix_is_upper_triangular_rollup(spark, sf_dir):
    rows = registry()["cross_source_dup_matrix"].fn(spark, sf_dir).collect()
    pairs = registry()["minhash_near_dup"].fn(spark, sf_dir).count()
    assert sum(r["n_dup_pairs"] for r in rows) == pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["n_dup_pairs"] > 0


def test_mann_kendall_s_bounds(spark, sf_dir):
    rows = registry()["mann_kendall_trend"].fn(spark, sf_dir).collect()
    for r in rows:
        max_pairs = r["n_days"] * (r["n_days"] - 1) // 2
        assert -max_pairs <= r["s_stat"] <= max_pairs
        # |z| of a corrected S is bounded by the uncorrected normalizer
        var = r["n_days"] * (r["n_days"] - 1) * (2 * r["n_days"] + 5) / 18.0
        assert abs(r["z_stat"]) <= (abs(r["s_stat"]) + 1) / var**0.5 + 1e-12


def test_dow_eta2_in_unit_range(spark, sf_dir):
    rows = registry()["dow_anova_eta2"].fn(spark, sf_dir).collect()
    for r in rows:
        assert -1e-4 <= r["ss_between"] <= r["ss_total"] + 1e-4
        assert 0.0 - 1e-9 <= r["eta2"] <= 1.0 + 1e-9


def test_pareto_8020_crossing_is_minimal(spark, sf_dir):
    import pyspark.sql.functions as F

    (r,) = registry()["pareto_8020_users"].fn(spark, sf_dir).collect()
    assert 1 <= r["top_users_for_80pct"] <= r["n_users"]
    assert r["actual_share"] >= 0.8 - 1e-12
    counts = sorted(
        (
            row["count"]
            for row in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .count()
            .collect()
        ),
        reverse=True,
    )
    cum = 0
    total = sum(counts)
    for i, c in enumerate(counts, 1):
        cum += c
        if 5 * cum >= 4 * total:
            assert r["top_users_for_80pct"] == i
            break


def test_reconciliation_bands_partition_orders(spark, sf_dir):
    rows = registry()["order_total_reconciliation"].fn(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert {r["band"] for r in rows} <= {
        "exact", "within_1pct", "within_10pct", "over_10pct", "no_lineitems"
    }


def test_table_checksum_detects_any_row_change(spark, sf_dir):
    import tempfile

    rows = {r["table_name"]: r for r in registry()["table_checksum_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"region", "nation", "customer", "orders"}
    # mutate one orders row into a copied fixture dir; checksum must move
    tmp = tempfile.mkdtemp()
    import shutil, os

    for t in ("region", "nation", "customer", "orders", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{sf_dir}/{t}.parquet", os.path.join(tmp, f"{t}.parquet"))
    import pandas as pd

    df = pd.read_parquet(os.path.join(tmp, "orders.parquet"))
    df.loc[0, "o_orderstatus"] = "Z"
    df.to_parquet(os.path.join(tmp, "orders.parquet"))
    mutated = {r["table_name"]: r for r in registry()["table_checksum_audit"].fn(spark, tmp).collect()}
    assert mutated["orders"]["n_rows"] == rows["orders"]["n_rows"]
    assert mutated["orders"]["checksum"] != rows["orders"]["checksum"]
    for t in ("region", "nation", "customer"):
        assert mutated[t]["checksum"] == rows[t]["checksum"]


def test_skew_kurtosis_match_numpy(spark, sf_dir):
    import numpy as np

    rows = registry()["skew_kurtosis_per_type"].fn(spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    vals: dict[str, list] = {}
    for e in ev:
        vals.setdefault(e["event_type"], []).append(e["value"])
    for r in rows:
        x = np.array(vals[r["event_type"]])
        m2 = ((x - x.mean()) ** 2).mean()
        g1 = ((x - x.mean()) ** 3).mean() / m2**1.5
        g2 = ((x - x.mean()) ** 4).mean() / m2**2 - 3.0
        assert abs(r["skewness"] - g1) < 1e-4
        assert abs(r["excess_kurtosis"] - g2) < 1e-4


def test_cardinality_estimate_exact_for_fk_joins(spark, sf_dir):
    rows = registry()["join_cardinality_estimate"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["actual_rows"] > 0
        # FK->PK containment joins: the Selinger estimate is exact up to
        # integer-floor rounding of n_left * n_right / max(ndv)
        assert 0.99 <= r["est_over_actual"] <= 1.01


def test_markov_removal_effects_are_probability_drops(spark, sf_dir):
    rows = registry()["markov_removal_attribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0 < r["base_conv_micro"] <= 1_000_000
        assert 0 <= r["removed_conv_micro"] <= r["base_conv_micro"]
        assert 0.0 <= r["removal_effect"] <= 1.0
    shares = sum(r["credit_share"] for r in rows)
    assert abs(shares - 1.0) < 1e-9


def test_char_entropy_bounds(spark, sf_dir):
    import math

    rows = registry()["char_entropy_quality"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["n_distinct_chars"] <= r["n_chars"]
        # entropy bounded by ln(alphabet size); micro-rounding slack
        assert -1e-6 <= r["char_entropy_nats"] <= math.log(r["n_distinct_chars"]) + 1e-4


def test_shipping_percentiles_ordered(spark, sf_dir):
    rows = registry()["shipping_delay_percentiles"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]


def test_mmd_matches_numpy_mean_distance(spark, sf_dir):
    import numpy as np

    rows = registry()["embedding_mmd_linear"].fn(spark, sf_dir).collect()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for e in embs:
        by_label.setdefault(e["label"], []).append(e["embedding"])
    for r in rows[:10]:
        mu_a = np.array(by_label[r["label_a"]], dtype=np.float64).mean(axis=0)
        mu_b = np.array(by_label[r["label_b"]], dtype=np.float64).mean(axis=0)
        want = float(((mu_a - mu_b) ** 2).sum())
        assert abs(r["mmd2_linear"] - want) < 1e-5
        assert r["n_a"] == len(by_label[r["label_a"]])


def test_assortativity_in_valid_range(spark, sf_dir):
    (r,) = registry()["degree_assortativity"].fn(spark, sf_dir).collect()
    assert r["n_edge_ends"] > 0 and r["n_edge_ends"] % 2 == 0
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
