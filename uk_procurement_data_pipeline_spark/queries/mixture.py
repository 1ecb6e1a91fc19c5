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
