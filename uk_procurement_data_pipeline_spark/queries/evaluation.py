"""Model-evaluation and hypothesis-screening analytics (SURVEY.md §2.13
extended rows X172+).

The reference repo stops at descriptive scrape/flatten output; a
training-data pipeline additionally needs the evaluation loop: ranking
metrics for learned scorers (ROC-AUC), two-sample inference for A/B
readouts (Welch's t), multiple-comparison control when screening many
segments at once (Benjamini-Hochberg), Pareto-frontier extraction for
multi-objective selection (skyline), and audience-overlap accounting for
mixture design. Every query follows the repo's exactness discipline:
money doubles are quantized to integer cents with the blessed
``CAST(ROUND(value * 100) AS BIGINT)`` pattern (proven cross-engine in
huber_mean_per_type), all sums are BIGINT (order-independent), and the
few output doubles are derived from those integers by an identical
expression tree in both engines (IEEE /, *, sqrt only — no libm
transcendentals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


@register(
    name="roc_auc_mannwhitney",
    survey="A7 W3 F28",
    doc="ROC-AUC of `value` as a score separating purchase (positive) "
    "from click (negative) events, via the Mann-Whitney U identity with "
    "tie-correct half-credit. NOT a global per-row rank: rows collapse "
    "to (cents -> pos_c, neg_c) cells first, so the one ordered window "
    "(cumulative negatives below each distinct score) runs over the "
    "BOUNDED score domain (<= 100 x max dollar value cells), never the "
    "row population — the same bounded-cells argument as "
    "event_type_value_chi2. The numerator is kept as an exact integer "
    "(x2 so equal-score pairs contribute 1 instead of 0.5); the only "
    "double is the final division.",
    oracle="""
        WITH v AS (
          SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                     AS is_pos
          FROM events
          WHERE event_type IN ('purchase', 'click')
        ), cells AS (
          SELECT cents,
                 CAST(SUM(is_pos) AS BIGINT) AS pos_c,
                 CAST(SUM(1 - is_pos) AS BIGINT) AS neg_c
          FROM v GROUP BY cents
        ), cum AS (
          SELECT cents, pos_c, neg_c,
                 CAST(COALESCE(SUM(neg_c) OVER (
                   ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS neg_below
          FROM cells
        )
        SELECT CAST(SUM(pos_c) AS BIGINT) AS n_pos,
               CAST(SUM(neg_c) AS BIGINT) AS n_neg,
               CAST(SUM(pos_c * (2 * neg_below + neg_c)) AS BIGINT)
                   AS u_stat_x2,
               CAST(SUM(pos_c * (2 * neg_below + neg_c)) AS DOUBLE)
                 / (2.0 * CAST(SUM(pos_c) AS DOUBLE)
                        * CAST(SUM(neg_c) AS DOUBLE)) AS auc
        FROM cum
    """,
)
def roc_auc_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .selectExpr(
            f"{_CENTS} AS cents",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos",
        )
    )
    cells = v.groupBy("cents").agg(
        F.sum("is_pos").cast("bigint").alias("pos_c"),
        F.sum(F.lit(1) - F.col("is_pos")).cast("bigint").alias("neg_c"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.select(
        "pos_c",
        "neg_c",
        F.coalesce(F.sum("neg_c").over(w), F.lit(0)).cast("bigint").alias("neg_below"),
    )
    num = (F.col("pos_c") * (2 * F.col("neg_below") + F.col("neg_c"))).alias("t")
    return cum.agg(
        F.sum("pos_c").cast("bigint").alias("n_pos"),
        F.sum("neg_c").cast("bigint").alias("n_neg"),
        F.sum(num).cast("bigint").alias("u_stat_x2"),
        (
            F.sum(num).cast("double")
            / (2.0 * F.sum("pos_c").cast("double") * F.sum("neg_c").cast("double"))
        ).alias("auc"),
    )


# Welch variance from exact integer (n, sum, sum-of-squares) triples; the
# double expression tree is written ONCE here and reused verbatim in both
# engines, so every IEEE operation matches bit-for-bit.
_VAR = (
    "((CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)"
    " / CAST(n{i} AS DOUBLE)) / (CAST(n{i} AS DOUBLE) - 1.0))"
)


@register(
    name="welch_ttest_value",
    survey="A7 F28",
    doc="Welch two-sample t-test of mean event value, purchase vs click: "
    "unequal-variance t statistic and Welch-Satterthwaite degrees of "
    "freedom. One linear scan collects exact BIGINT (n, sum-cents, "
    "sum-squared-cents) per arm via conditional aggregation (map-side "
    "partial agg, no shuffle beyond the 2-cell final); means/variances/"
    "t/df are doubles derived from those integers with an identical "
    "expression tree in both engines (/, *, sqrt only). Sum-of-squares "
    "headroom: max cents ~49k so cents^2 < 2.5e9; 2^63 tolerates ~3.8e9 "
    "rows per arm — past that, widen to decimal(38,0) as exact.py "
    "prescribes.",
    oracle=f"""
        WITH v AS (
          SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS arm,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
          WHERE event_type IN ('purchase', 'click')
        ), g AS (
          SELECT
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
                AS s1,
            CAST(SUM(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS ss1,
            CAST(SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(SUM(CASE WHEN arm = 2 THEN cents ELSE 0 END) AS BIGINT)
                AS s2,
            CAST(SUM(CASE WHEN arm = 2 THEN cents * cents ELSE 0 END)
                 AS BIGINT) AS ss2
          FROM v
        ), d AS (
          SELECT n1, n2,
                 CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0
                     AS mean_purchase,
                 CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0
                     AS mean_click,
                 {_VAR.format(i=1)} / CAST(n1 AS DOUBLE) AS se1,
                 {_VAR.format(i=2)} / CAST(n2 AS DOUBLE) AS se2
          FROM g
        )
        SELECT n1 AS n_purchase, n2 AS n_click, mean_purchase, mean_click,
               (mean_purchase - mean_click) * 100.0 / sqrt(se1 + se2)
                 / 100.0 AS t_stat,
               (se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                    + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
        FROM d
    """,
)
def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .selectExpr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS arm",
            f"{_CENTS} AS cents",
        )
    )
    g = v.agg(
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).cast("bigint").alias("n1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN cents ELSE 0 END"))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN cents * cents ELSE 0 END"))
        .cast("bigint")
        .alias("ss1"),
        F.sum(F.expr("CASE WHEN arm = 2 THEN 1 ELSE 0 END")).cast("bigint").alias("n2"),
        F.sum(F.expr("CASE WHEN arm = 2 THEN cents ELSE 0 END"))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.expr("CASE WHEN arm = 2 THEN cents * cents ELSE 0 END"))
        .cast("bigint")
        .alias("ss2"),
    )
    d = g.selectExpr(
        "n1",
        "n2",
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS mean_purchase",
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS mean_click",
        f"{_VAR.format(i=1)} / CAST(n1 AS DOUBLE) AS se1",
        f"{_VAR.format(i=2)} / CAST(n2 AS DOUBLE) AS se2",
    )
    return d.selectExpr(
        "n1 AS n_purchase",
        "n2 AS n_click",
        "mean_purchase",
        "mean_click",
        "(mean_purchase - mean_click) * 100.0 / sqrt(se1 + se2) / 100.0 AS t_stat",
        "(se1 + se2) * (se1 + se2)"
        " / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)"
        "    + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df",
    )


@register(
    name="bh_fdr_screen",
    survey="A7 W1 F28",
    doc="Benjamini-Hochberg FDR screen over per-event-type mean-vs-rest "
    "contrasts. Each type's z-squared against the pooled complement comes "
    "from exact BIGINT (n, sum, sumsq) triples (one hash agg + broadcast "
    "of the 1-row global totals); the p-value proxy is the Chebyshev/"
    "Cantelli bound p = 1/(1+z^2) — rational arithmetic, monotone in |z|, "
    "so the BH step function is applied to exactly comparable doubles in "
    "both engines with zero libm exposure. The BH rank/threshold windows "
    "run over the 5-row type domain (bounded cells). alpha = 0.10.",
    oracle="""
        WITH v AS (
          SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        ), g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s,
                 CAST(SUM(cents * cents) AS BIGINT) AS ss
          FROM v GROUP BY event_type
        ), tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts,
                 CAST(SUM(ss) AS BIGINT) AS tss
          FROM g
        ), z AS (
          SELECT g.event_type, g.n,
                 (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)
                  - CAST(t.ts - g.s AS DOUBLE) / CAST(t.tn - g.n AS DOUBLE))
                 * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)
                  - CAST(t.ts - g.s AS DOUBLE) / CAST(t.tn - g.n AS DOUBLE))
                 / (
                   ((CAST(g.ss AS DOUBLE)
                     - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)
                       / CAST(g.n AS DOUBLE))
                    / (CAST(g.n AS DOUBLE) - 1.0)) / CAST(g.n AS DOUBLE)
                   + ((CAST(t.tss - g.ss AS DOUBLE)
                     - CAST(t.ts - g.s AS DOUBLE) * CAST(t.ts - g.s AS DOUBLE)
                       / CAST(t.tn - g.n AS DOUBLE))
                    / (CAST(t.tn - g.n AS DOUBLE) - 1.0))
                     / CAST(t.tn - g.n AS DOUBLE)
                 ) AS z2
          FROM g CROSS JOIN tot t
        ), p AS (
          SELECT event_type, n, z2, 1.0 / (1.0 + z2) AS p_cheb,
                 CAST(ROW_NUMBER() OVER (ORDER BY 1.0 / (1.0 + z2), event_type)
                      AS BIGINT) AS bh_rank,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
          FROM z
        ), k AS (
          SELECT p.*,
                 MAX(CASE WHEN p_cheb * CAST(m AS DOUBLE)
                              <= CAST(bh_rank AS DOUBLE) * 0.10
                          THEN bh_rank ELSE 0 END) OVER () AS bh_k
          FROM p
        )
        SELECT event_type, n, z2, p_cheb, bh_rank,
               CASE WHEN bh_rank <= bh_k THEN 1 ELSE 0 END AS rejected
        FROM k
        ORDER BY bh_rank
    """,
)
def bh_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load(spark, sf_dir, "events").selectExpr("event_type", f"{_CENTS} AS cents")
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.expr("cents * cents")).cast("bigint").alias("ss"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("s").cast("bigint").alias("ts"),
        F.sum("ss").cast("bigint").alias("tss"),
    )
    z = g.crossJoin(F.broadcast(tot)).selectExpr(
        "event_type",
        "n",
        "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
        " - CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE))"
        " * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
        " - CAST(ts - s AS DOUBLE) / CAST(tn - n AS DOUBLE))"
        " / ("
        "   ((CAST(ss AS DOUBLE)"
        "     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        "    / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE)"
        "   + ((CAST(tss - ss AS DOUBLE)"
        "     - CAST(ts - s AS DOUBLE) * CAST(ts - s AS DOUBLE)"
        "       / CAST(tn - n AS DOUBLE))"
        "    / (CAST(tn - n AS DOUBLE) - 1.0)) / CAST(tn - n AS DOUBLE)"
        " ) AS z2",
    )
    wr = Window.orderBy(F.expr("1.0 / (1.0 + z2)"), "event_type")
    wall = Window.partitionBy()
    p = z.select(
        "event_type",
        "n",
        "z2",
        F.expr("1.0 / (1.0 + z2)").alias("p_cheb"),
        F.row_number().over(wr).cast("bigint").alias("bh_rank"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m"),
    )
    k = p.select(
        "*",
        F.max(
            F.expr(
                "CASE WHEN p_cheb * CAST(m AS DOUBLE)"
                " <= CAST(bh_rank AS DOUBLE) * 0.10 THEN bh_rank ELSE 0 END"
            )
        )
        .over(wall)
        .alias("bh_k"),
    )
    return k.selectExpr(
        "event_type",
        "n",
        "z2",
        "p_cheb",
        "bh_rank",
        "CASE WHEN bh_rank <= bh_k THEN 1 ELSE 0 END AS rejected",
    ).orderBy("bh_rank")


@register(
    name="skyline_parts_pareto",
    survey="A7 W3 J6 F28",
    doc="2-D skyline (Pareto frontier) of parts maximizing (revenue, "
    "quantity): a part survives iff no other part has >= on both axes "
    "with one strict. NOT the naive O(n^2) dominance self-join: phase 1 "
    "bands per-part revenue-cents (div 1e5) and prefix-maxes band-max "
    "quantity over strictly-higher bands — a window over BOUNDED band "
    "cells — pruning every part whose quantity fails its higher-band "
    "ceiling (a higher band implies strictly higher revenue, so ceiling "
    "failure proves a dominator exists); phase 2 resolves same-band "
    "dominance with a band-keyed EQUI-join anti-filter over the pruned "
    "survivors only. At 1000 executors both phases are linear scans plus "
    "one bounded broadcast; no global per-row sort. Revenue uses "
    "l_extendedprice cents (exact BIGINT sums).",
    oracle="""
        WITH pa AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                     AS qty_sum
          FROM lineitem GROUP BY l_partkey
        ), m AS (
          SELECT l_partkey, rev_cents, qty_sum,
                 MAX(qty_sum) OVER (
                   ORDER BY rev_cents
                   RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                 ) AS hi_max,
                 MAX(qty_sum) OVER (PARTITION BY rev_cents) AS same_max
          FROM pa
        )
        SELECT l_partkey, rev_cents, qty_sum
        FROM m
        WHERE (hi_max IS NULL OR qty_sum > hi_max) AND qty_sum = same_max
        ORDER BY rev_cents DESC, l_partkey
    """,
)
def skyline_parts_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = (
        load(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_partkey",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents",
            "CAST(ROUND(l_quantity) AS BIGINT) AS qty",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum("price_cents").cast("bigint").alias("rev_cents"),
            F.sum("qty").cast("bigint").alias("qty_sum"),
        )
        .withColumn("band", F.expr("rev_cents div 100000"))
    )
    band_max = pa.groupBy("band").agg(F.max("qty_sum").alias("band_max"))
    w_hi = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ceilings = band_max.select(
        "band", F.max("band_max").over(w_hi).alias("higher_band_max")
    )
    cand = pa.join(F.broadcast(ceilings), "band").where(
        F.col("higher_band_max").isNull()
        | (F.col("qty_sum") > F.col("higher_band_max"))
    )
    dom = cand.alias("c").join(
        pa.alias("p"),
        (F.col("c.band") == F.col("p.band"))
        & (
            (
                (F.col("p.rev_cents") > F.col("c.rev_cents"))
                & (F.col("p.qty_sum") >= F.col("c.qty_sum"))
            )
            | (
                (F.col("p.rev_cents") == F.col("c.rev_cents"))
                & (F.col("p.qty_sum") > F.col("c.qty_sum"))
            )
        ),
        "left_anti",
    )
    return dom.select("c.l_partkey", "c.rev_cents", "c.qty_sum").orderBy(
        F.col("rev_cents").desc(), "l_partkey"
    )


@register(
    name="audience_overlap_matrix",
    survey="A8 J6 A7",
    doc="Pairwise audience overlap between event types: distinct-user "
    "sets per type, exact intersection sizes via a user-keyed self-join "
    "of the deduped (type, user) pairs (co-partitioned equi-join on "
    "user_id — the distinct and the join reuse one hash partitioning), "
    "and Jaccard from the inclusion-exclusion identity. 10 unordered "
    "type pairs out; sizes join is a broadcast of the 5-row type-size "
    "table. The set-intersection-as-equi-join shape is the scale answer "
    "to bitmap AND at 100 TB (no driver-side bitmaps).",
    oracle="""
        WITH d AS (
          SELECT DISTINCT event_type, user_id FROM events
        ), sizes AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
          FROM d GROUP BY event_type
        ), pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM d a JOIN d b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
               p.n_both,
               CAST(p.n_both AS DOUBLE)
                 / CAST(sa.n_users + sb.n_users - p.n_both AS DOUBLE)
                   AS jaccard
        FROM pairs p
        JOIN sizes sa ON sa.event_type = p.type_a
        JOIN sizes sb ON sb.event_type = p.type_b
        ORDER BY p.type_a, p.type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sizes = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    pairs = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = F.broadcast(sizes).alias("sa")
    sb = F.broadcast(sizes).alias("sb")
    return (
        pairs.join(sa, F.col("sa.event_type") == F.col("type_a"))
        .join(sb, F.col("sb.event_type") == F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.col("sa.n_users").alias("n_a"),
            F.col("sb.n_users").alias("n_b"),
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("sa.n_users") + F.col("sb.n_users") - F.col("n_both")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )
