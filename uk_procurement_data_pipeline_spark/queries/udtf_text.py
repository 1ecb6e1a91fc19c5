"""Python UDTF surface (SURVEY.md §2.11 completion): the one UDF shape
the engine had not yet exercised — a user-defined TABLE function that
lateral-expands each input row into many output rows from Python.

The repo's UDF triad is now complete: scalar/batch UDFs (pandas_udf in
sources/decode.py, multimodal.py), grouped UDAF (GROUPED_AGG trimmed
mean in corpus_prep.py), grouped-map (ingest.py), and table-valued
(here). UDTFs run row-at-a-time Python, so they are the SLOW path by
this repo's own rules — everything expressible as explode()/transform()
should use those (doc_chunk_overlap is the JVM-side contrast). The
legitimate UDTF niche is expansion logic that genuinely needs Python
(a tokenizer library, a parser producing variable-arity rows), which is
why the demo keeps the Spark-side plumbing real and the Python body
trivial. ``useArrow=True`` batches rows over Arrow instead of pickling
one at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register


@register(
    name="bigram_expand_udtf",
    survey="UD4 F17",
    doc="Word-bigram expansion as a Python UDTF in a SQL LATERAL join: "
    "each document emits (pos, bigram) for every adjacent token pair. "
    "Map-side fan-out (no shuffle); Arrow-batched row transfer; the "
    "oracle is the equivalent list-lateral in DuckDB.",
    oracle="""
        SELECT doc_id, s.pos, parts[s.pos + 1] || ' ' || parts[s.pos + 2]
                   AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
              FROM documents) d,
             LATERAL (SELECT unnest(range(len(parts) - 1)) AS pos) s
    """,
)
def bigram_expand_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, bigram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    # re-registration is idempotent (latest wins) — no session side effect
    # beyond the function name, mirroring how a SQL user would call it
    spark.udtf.register("bigrams_udtf", Bigrams)
    docs = load(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram "
        "FROM {docs} d, LATERAL bigrams_udtf(d.text) b",
        docs=docs,
    )
