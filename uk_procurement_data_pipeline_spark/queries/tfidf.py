"""TF-IDF term weighting over the documents corpus ([NORTH-STAR]
text-analysis surface alongside queries/arrays_text.py).

The classic training-data relevance signal: term frequency within a
document times log inverse document frequency across the corpus, top-K
terms kept per document. Expressed as three hash aggregations and one
equi-join — explode to (doc, term), count tf, count df per term, join,
weight, windowed top-K — all JVM-side, shuffles keyed on high-cardinality
(doc_id, term) / term, so the plan is linear in corpus size and survives
a 100x scale-up unchanged. The corpus size N joins in as a broadcast
single-row aggregate (never a driver-side collect).

Cross-engine determinism: ln() is the one transcendental in the repo's
oracle surface, and Java's Math.log and libm's log may legally differ in
the final ulp. The weight is therefore emitted in FIXED-POINT micro
units — floor(x * 1e6 + 0.5) as BIGINT — so the compared value is an
integer in both engines; a mismatch would need the two lns to differ
across a 1e-6 boundary (probability ~1e-10 per distinct (N, df) input,
and there are only as many distinct inputs as distinct df values).
Ranking ties break on the term string, so top-K is set-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_TOP_K = 3


@register(
    name="tfidf_top_terms",
    survey="A7 W1 J5 F17",
    doc="TF-IDF top-3 terms per document: explode -> tf hash-agg -> "
    "df hash-agg -> term equi-join -> broadcast corpus-count join -> "
    "fixed-point weight -> per-doc window top-K with term tiebreak. "
    "Linear shuffles on (doc_id, term) and term; N is a broadcast "
    "1-row aggregate, not a collect.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, term),
        dfreq AS (
            SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
        corpus AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf, df_docs, tfidf_micro, rnk
        FROM (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
                 CAST(floor(tf.tf * ln(CAST(corpus.n_docs AS DOUBLE)
                                       / CAST(dfreq.df_docs AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS tfidf_micro,
                 row_number() OVER (
                     PARTITION BY tf.doc_id
                     ORDER BY floor(tf.tf * ln(CAST(corpus.n_docs AS DOUBLE)
                                               / CAST(dfreq.df_docs AS DOUBLE))
                                    * 1000000 + 0.5) DESC, tf.term) AS rnk
          FROM tf JOIN dfreq USING (term) CROSS JOIN corpus
        )
        WHERE rnk <= {_TOP_K}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    micro = F.expr(
        "CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df_docs AS DOUBLE))"
        " * 1000000 + 0.5) AS BIGINT)"
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(corpus))
        .select("doc_id", "term", "tf", "df_docs", micro.alias("tfidf_micro"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
    )
