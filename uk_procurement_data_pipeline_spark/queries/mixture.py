"""Domain-mixture resampling ([NORTH-STAR] training-data pipeline: the
domain-reweighting step that turns a crawled corpus with arbitrary
per-source counts into a training mix with prescribed source
proportions, as in DoReMi/The-Pile-style recipes).

Semantics: each source s carries an integer mixture weight w_s (here a
deterministic function of the source name; in production a side table).
The largest exactly-proportional sample takes k = min_s floor(n_s / w_s)
"units", giving source s a quota of k * w_s documents — ALL-INTEGER
arithmetic, so both engines agree bit-for-bit with no float threshold.
Within a source, documents are chosen by md5-hash rank (the repo's
cross-engine hash family) with doc_id tiebreak: stable under reruns,
uniform over the source, and exactly reproducible in the DuckDB oracle.

Scale shape: counts and the global k are broadcast one-row/tiny
aggregates; the only window partitions by source ordered by the hash.
At 100 TB a hot source funnels through one task's sort — the noted
scale alternative is hash-THRESHOLD acceptance (keep hv < quota/n *
2^32, approximate quota) or the two-stage rank used by
vocab_encode_docs with hash-prefix bands; the exact-rank form is kept
here because it makes the quota certifiable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

# Integer mixture weight per source: 1 + (source ordinal mod 3) in {1,2,3}.
_SPARK_W = (
    "CAST(1 + CAST(substr(source, 4) AS INT) % 3 AS BIGINT)"
)
_DUCK_W = "CAST(1 + CAST(substr(source, 4) AS INT) % 3 AS BIGINT)"

# Cross-engine md5 hash of the doc key (same family as queries/dedup.py).
_SPARK_HV = (
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
)
_DUCK_HV = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"


@register(
    name="domain_mixture_resample",
    survey="A7 W1 J5 F28",
    doc="Exactly-proportional domain reweighting: per-source counts -> "
    "global unit size k = min(floor(n_s/w_s)) as a broadcast one-row "
    "aggregate -> integer quotas k*w_s -> md5-rank selection within "
    "each source. Every retained row carries its source quota and "
    "selection rank, so the oracle certifies membership, not just "
    "counts.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   {_DUCK_W} AS w,
                   {_DUCK_HV} AS hv
            FROM documents),
        per_src AS (
            SELECT source, w, COUNT(*) AS n_s
            FROM d GROUP BY source, w),
        unit AS (
            SELECT MIN(n_s // w) AS k FROM per_src),
        ranked AS (
            SELECT d.doc_id, d.source, per_src.w * unit.k AS quota,
                   row_number() OVER (PARTITION BY d.source
                                      ORDER BY d.hv, d.doc_id) AS sel_rank
            FROM d
            JOIN per_src USING (source)
            CROSS JOIN unit)
        SELECT doc_id, source, quota, sel_rank
        FROM ranked WHERE sel_rank <= quota
    """,
)
def domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", f"{_SPARK_W} AS w", f"{_SPARK_HV} AS hv"
    )
    per_src = d.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n_s"))
    unit = per_src.agg(
        F.min(F.floor(F.col("n_s") / F.col("w"))).alias("k")
    )
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        d.join(F.broadcast(per_src.select("source", "n_s")), "source")
        .join(F.broadcast(unit))
        .withColumn("quota", F.col("w") * F.col("k"))
        .withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= F.col("quota"))
        .select("doc_id", "source", "quota", "sel_rank")
    )


# Per-stratum Neyman weight N_h * S_h quantized to integer micro units
# BEFORE the cross-strata sum, so the denominator is an exact bigint sum
# (a plain double sum over strata would be partial-order-dependent).
# S_h is the sample stddev of n_chars from exact decimal sums (sum at
# scale 4, sum-of-squares at scale 2 — the exact.py scale-budget rule);
# sqrt is IEEE-exact, so w_micro is identical in both engines.
_NEYMAN_W_MICRO = """
    CAST(floor(CAST(n_h AS DOUBLE)
               * sqrt((CAST(n_h AS DOUBLE) * sq - s * s)
                      / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0)))
               * 1000000 + 0.5) AS BIGINT)
"""


@register(
    name="neyman_stratified_sample",
    survey="A7 W1 J5 F28",
    doc="Neyman-allocation stratified sampling: the 10% document budget "
    "is split across source strata proportionally to N_h * S_h (stratum "
    "size times stddev of document length) — the variance-minimizing "
    "allocation for estimating mean length. Weights are micro-quantized "
    "bigints so the cross-strata denominator sums exactly; allocations "
    "are pure integer arithmetic (T * w div sum_w, clamped to N_h); "
    "membership is md5-rank within stratum. Every retained row carries "
    "its stratum's allocation, so the oracle certifies both the "
    "allocation math and the selection.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, n_chars, {_DUCK_HV} AS hv
            FROM documents),
        strata AS (
            SELECT source, COUNT(*) AS n_h,
                   CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(38,8))), 4)
                        AS DOUBLE) AS s,
                   CAST(ROUND(SUM(CAST((CAST(n_chars AS DOUBLE)
                                        * CAST(n_chars AS DOUBLE))
                                       AS DECIMAL(38,8))), 2)
                        AS DOUBLE) AS sq
            FROM d GROUP BY source),
        w AS (SELECT source, n_h, {_NEYMAN_W_MICRO} AS w_micro FROM strata),
        tot AS (
            SELECT CAST(SUM(w_micro) AS BIGINT) AS sum_w,
                   (SELECT COUNT(*) // 10 FROM d) AS budget
            FROM w),
        alloc AS (
            SELECT source, n_h,
                   least(CAST(budget * w_micro // sum_w AS BIGINT),
                         CAST(n_h AS BIGINT)) AS n_take
            FROM w CROSS JOIN tot),
        ranked AS (
            SELECT d.doc_id, d.source, alloc.n_take,
                   row_number() OVER (PARTITION BY d.source
                                      ORDER BY d.hv, d.doc_id) AS sel_rank
            FROM d JOIN alloc USING (source))
        SELECT doc_id, source, n_take, sel_rank
        FROM ranked WHERE sel_rank <= n_take
    """,
)
def neyman_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from uk_procurement_data_pipeline_spark.functions.exact import dec

    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", "n_chars", f"{_SPARK_HV} AS hv"
    )
    strata = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.round(F.sum(dec("n_chars")), 4).cast("double").alias("s"),
        F.round(
            F.sum(dec(F.col("n_chars").cast("double") * F.col("n_chars").cast("double"))),
            2,
        )
        .cast("double")
        .alias("sq"),
    )
    w = strata.select("source", "n_h", F.expr(_NEYMAN_W_MICRO).alias("w_micro"))
    tot = w.agg(F.sum("w_micro").cast("bigint").alias("sum_w")).join(
        F.broadcast(d.agg((F.count(F.lit(1)) / 10).cast("bigint").alias("budget")))
    )
    alloc = (
        w.join(F.broadcast(tot))
        .select(
            "source",
            "n_h",
            F.least(
                F.expr("CAST(budget * w_micro div sum_w AS BIGINT)"),
                F.col("n_h").cast("bigint"),
            ).alias("n_take"),
        )
    )
    win = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        d.join(F.broadcast(alloc), "source")
        .withColumn("sel_rank", F.row_number().over(win))
        .where(F.col("sel_rank") <= F.col("n_take"))
        .select("doc_id", "source", "n_take", "sel_rank")
    )


@register(
    name="hhi_source_concentration",
    survey="A7 F28",
    doc="Herfindahl-Hirschman concentration index of the corpus source "
    "mix (the one-number diversity gate a mixture designer tracks "
    "next to entropy): HHI = sum over sources of share^2, computed as "
    "the exact integer ratio sum(n_s^2) / N^2 — one per-source "
    "aggregate and a 1-row reduction, no doubles until the final "
    "division. 1/HHI is the effective source count.",
    oracle="""
        WITH src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY source)
        SELECT CAST(count(*) AS BIGINT) AS n_sources,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(SUM(n * n) AS BIGINT) AS sum_sq,
               CAST(SUM(n * n) AS DOUBLE)
                   / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
                   AS hhi,
               (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
                   / CAST(SUM(n * n) AS DOUBLE) AS effective_sources
        FROM src
    """,
)
def hhi_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sn = F.sum("n").cast("bigint")
    ssq = F.sum(F.col("n") * F.col("n")).cast("bigint")
    return src.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        sn.alias("n_docs"),
        ssq.alias("sum_sq"),
        (ssq.cast("double") / (sn.cast("double") * sn.cast("double"))).alias(
            "hhi"
        ),
        ((sn.cast("double") * sn.cast("double")) / ssq.cast("double")).alias(
            "effective_sources"
        ),
    )
