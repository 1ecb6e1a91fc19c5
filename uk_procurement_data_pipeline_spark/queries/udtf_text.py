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


@register(
    name="lead_words_polymorphic_udtf",
    survey="UD4 F17 F5",
    doc="POLYMORPHIC Python UDTF (Spark 4 analyze()): the output schema "
    "(w1..wk string columns) is computed at PLAN TIME from the literal "
    "k argument by the UDTF's static analyze() method — the "
    "schema-from-arguments contract that fixed-returnType UDTFs "
    "(bigram_expand_udtf) cannot express. analyze() enforces that k is "
    "a constant expression, so the resolver fails fast on a "
    "non-literal. Registered with k=3: first three whitespace tokens "
    "of each document as columns, NULL-padded. Map-side, Arrow-batched, "
    "no shuffle. Oracle: regexp whitespace split + list_extract.",
    oracle="""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN NULL
                    ELSE list_extract(
                        regexp_split_to_array(trim(text), '\\s+'), 1)
               END AS w1,
               CASE WHEN trim(text) = '' THEN NULL
                    ELSE list_extract(
                        regexp_split_to_array(trim(text), '\\s+'), 2)
               END AS w2,
               CASE WHEN trim(text) = '' THEN NULL
                    ELSE list_extract(
                        regexp_split_to_array(trim(text), '\\s+'), 3)
               END AS w3
        FROM documents
        ORDER BY doc_id
    """,
)
def lead_words_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf(useArrow=True)
    class LeadWords:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, k: AnalyzeArgument
        ) -> AnalyzeResult:
            if not k.isConstantExpression:
                raise Exception(
                    "lead_words: k must be a literal (schema is derived "
                    "from it at plan time)"
                )
            schema = StructType()
            for i in range(1, int(k.value) + 1):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            # maxsplit=k: stop tokenizing after the k leading words — the
            # per-row Python cost is O(prefix), not O(document), which is
            # the difference between 1.9 s and 1.2 s at sf0.1
            k = int(k)
            toks = (text or "").split(None, k)
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(k)
            )

    spark.udtf.register("lead_words_udtf", LeadWords)
    docs = load(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT d.doc_id, w.* "
        "FROM {docs} d, LATERAL lead_words_udtf(d.text, 3) w "
        "ORDER BY d.doc_id",
        docs=docs,
    )


@register(
    name="source_stats_table_udtf",
    survey="UD4 UD5 A7",
    doc="Python UDTF with a TABLE ARGUMENT (Spark 4): the function "
    "consumes TABLE(documents) PARTITION BY source, so the engine "
    "shuffles rows by source and streams each partition through one "
    "UDTF instance (eval per row, terminate emits the partition "
    "summary) — the SQL-surface twin of applyInPandas grouped-map, and "
    "the idiom for porting reduce-style Python (the reference's "
    "accumulate-then-flush loops) into a declarative query. State per "
    "instance is O(1) (count + char sum), so executor memory is flat "
    "at any partition size. Oracle: plain GROUP BY.",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
)
def source_stats_table_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="source string, n_docs bigint, sum_chars bigint", useArrow=True)
    class SourceStats:
        def __init__(self) -> None:
            self._n = 0
            self._chars = 0
            self._source = None

        def eval(self, row):
            self._n += 1
            self._chars += len(row["text"] or "")
            self._source = row["source"]

        def terminate(self):
            if self._n:
                yield self._source, self._n, self._chars

    spark.udtf.register("source_stats_udtf", SourceStats)
    docs = load(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT * FROM source_stats_udtf(TABLE({docs}) PARTITION BY source) "
        "ORDER BY source",
        docs=docs,
    )
