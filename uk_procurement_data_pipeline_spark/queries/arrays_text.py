"""Array higher-order-function and text-analysis queries.

Covers the reference's array-fold surface (SURVEY.md §2.4 A1-A5, §2.9
F17-F21, §2.7 O2/O3) — the idiomatic Spark translation of `pipe_join`
(2a_extract_contracts_finder.py:147-150), `_join_unique`
(2b_extract_find_a_tender_XMLs.py:13-15) and the first-match scans
(2a:75-144) — plus the [NORTH-STAR] text-analysis operators (language-ID
heuristic, quality scoring, token stats, md5-chain fingerprinting) over
the `documents` table.

Everything here is built-in column expressions (whole-stage codegen, no
Python in the hot path); per-row array work never shuffles, so it scales
linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load, spread
from uk_procurement_data_pipeline_spark.queries.base import register

_TOKENS = "split(text, ' ')"  # Spark-side tokens expression
_DTOKENS = "string_split(text, ' ')"  # DuckDB-side tokens expression

# Tiny literal stopword sets for the language-ID heuristic (UD4). The
# fixture vocabulary is synthetic; the operator shape — array_intersect
# against per-language lexicons, argmax with a deterministic tie order —
# is what matters.
_LEXICON = {
    "en": ["the", "a", "of", "and", "order", "key"],
    "fr": ["le", "la", "et", "merge", "slow"],
    "de": ["der", "die", "und", "batch", "window"],
    "es": ["el", "la", "y", "filter", "row"],
    "zh": ["de", "shi", "le", "vector", "hash"],
}


def _arr_sql(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _arr_spark(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


@register(
    name="doc_token_profile",
    survey="A1 A2 F17 F21 O2 O3",
    doc="Per-document token folds: the reference's pipe_join ('|'-join of a "
    "slice, 2a:147-150) and _join_unique (sorted-distinct ';'-join, 2b:13-15) "
    "as pure array expressions.",
    oracle=f"""
        SELECT doc_id,
               len({_DTOKENS}) AS n_tokens,
               len(list_distinct({_DTOKENS})) AS n_distinct,
               {_DTOKENS}[1] AS first_token,
               {_DTOKENS}[-1] AS last_token,
               array_to_string(list_sort(list_distinct({_DTOKENS})), ';') AS uniq_sorted,
               array_to_string({_DTOKENS}[1:5], '|') AS first5_pipe
        FROM documents
    """,
)
def doc_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"size({_TOKENS}) AS n_tokens",
        f"size(array_distinct({_TOKENS})) AS n_distinct",
        f"element_at({_TOKENS}, 1) AS first_token",
        f"element_at({_TOKENS}, -1) AS last_token",
        f"array_join(array_sort(array_distinct({_TOKENS})), ';') AS uniq_sorted",
        f"array_join(slice({_TOKENS}, 1, 5), '|') AS first5_pipe",
    )


@register(
    name="doc_token_hof",
    survey="F17 F18 F19 F20 A5",
    doc="Higher-order functions: aggregate (fold), filter, exists, and a "
    "transform-over-index bigram build with flatten-style dedup (A5).",
    oracle=f"""
        SELECT doc_id,
               CAST(list_sum(list_transform({_DTOKENS}, t -> length(t))) AS BIGINT)
                   AS total_chars,
               len(list_filter({_DTOKENS}, t -> length(t) > 4)) AS n_long,
               list_contains({_DTOKENS}, 'spark') AS has_spark,
               len(list_distinct(list_transform(
                   generate_series(1, len({_DTOKENS}) - 1),
                   i -> {_DTOKENS}[i] || ' ' || {_DTOKENS}[i+1]))) AS n_distinct_bigrams
        FROM documents
    """,
)
def doc_token_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        f"aggregate({_TOKENS}, 0L, (acc, t) -> acc + length(t)) AS total_chars",
        f"size(filter({_TOKENS}, t -> length(t) > 4)) AS n_long",
        f"exists({_TOKENS}, t -> t = 'spark') AS has_spark",
        # Guard: for a 1-token doc sequence(1,0) is the DESCENDING [1,0] in
        # Spark (element_at(...,0) raises), while DuckDB generate_series(1,0)
        # is empty → 0 bigrams. Pin both engines to 0 (ADVICE r01).
        f"""if(size({_TOKENS}) < 2, 0,
            size(array_distinct(transform(
            sequence(1, size({_TOKENS}) - 1),
            i -> concat(element_at({_TOKENS}, i), ' ', element_at({_TOKENS}, i + 1))))))
            AS n_distinct_bigrams""",
    )


@register(
    name="wordcount_top20",
    survey="F17 A7 O4",
    doc="The classic: explode tokens, count, deterministic top-20.",
    oracle=f"""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest({_DTOKENS}) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """,
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.expr(_TOKENS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    name="first_match_pluck",
    survey="J3 O3 A4 P6",
    doc="First-match-by-predicate over an array (the reference's "
    "first-documentType scan 2a:104-117 and first-non-null address scan "
    "2a:120-144): element_at(filter(...), 1) + coalesce fallback.",
    oracle=f"""
        SELECT doc_id,
               list_filter({_DTOKENS}, t -> t LIKE 's%')[1] AS first_s_token,
               COALESCE(list_filter({_DTOKENS}, t -> length(t) > 6)[1],
                        '<none>') AS first_long_or_default
        FROM documents
    """,
)
def first_match_pluck(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"try_element_at(filter({_TOKENS}, t -> t LIKE 's%'), 1) AS first_s_token",
        f"""coalesce(try_element_at(filter({_TOKENS}, t -> length(t) > 6), 1),
                     '<none>') AS first_long_or_default""",
    )


@register(
    name="lang_id_heuristic",
    survey="UD4 F18 F19",
    doc="Language-ID by lexicon overlap: array_intersect sizes per language, "
    "argmax with deterministic tie order (en>fr>de>es>zh).",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {", ".join(
                       f"len(list_intersect(list_distinct({_DTOKENS}), {_arr_sql(w)})) AS hits_{l}"
                       for l, w in _LEXICON.items())}
            FROM documents)
        SELECT doc_id, lang,
               CASE GREATEST(hits_en, hits_fr, hits_de, hits_es, hits_zh)
                    WHEN hits_en THEN 'en' WHEN hits_fr THEN 'fr'
                    WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
                    ELSE 'zh' END AS predicted_lang,
               hits_en, hits_fr, hits_de, hits_es, hits_zh
        FROM scored
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    hit_exprs = [
        f"size(array_intersect(array_distinct({_TOKENS}), {_arr_spark(w)})) AS hits_{l}"
        for l, w in _LEXICON.items()
    ]
    scored = load(spark, sf_dir, "documents").selectExpr("doc_id", "lang", *hit_exprs)
    return scored.selectExpr(
        "doc_id",
        "lang",
        """CASE greatest(hits_en, hits_fr, hits_de, hits_es, hits_zh)
                WHEN hits_en THEN 'en' WHEN hits_fr THEN 'fr'
                WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
                ELSE 'zh' END AS predicted_lang""",
        "hits_en",
        "hits_fr",
        "hits_de",
        "hits_es",
        "hits_zh",
    )


@register(
    name="text_quality_score",
    survey="UD4",
    doc="Quality scoring: char/token counts, mean token length, stopword "
    "ratio, composite score — all integer-derived doubles (exact in both "
    "engines).",
    oracle=f"""
        SELECT doc_id,
               length(text) AS n_chars_measured,
               len({_DTOKENS}) AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / CAST(len({_DTOKENS}) AS DOUBLE) AS mean_token_len,
               CAST(len(list_filter({_DTOKENS},
                        t -> list_contains({_arr_sql(_LEXICON['en'])}, t))) AS DOUBLE)
                   / CAST(len({_DTOKENS}) AS DOUBLE) AS stopword_ratio,
               ROUND(
                   LEAST(CAST(len({_DTOKENS}) AS DOUBLE) / 100.0, 1.0) * 0.5
                   + CAST(len(list_distinct({_DTOKENS})) AS DOUBLE)
                     / CAST(len({_DTOKENS}) AS DOUBLE) * 0.5, 6) AS quality_score
        FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    en = _arr_spark(_LEXICON["en"])
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "length(text) AS n_chars_measured",
        f"size({_TOKENS}) AS n_tokens",
        f"""CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / CAST(size({_TOKENS}) AS DOUBLE) AS mean_token_len""",
        f"""CAST(size(filter({_TOKENS},
                 t -> array_contains({en}, t))) AS DOUBLE)
            / CAST(size({_TOKENS}) AS DOUBLE) AS stopword_ratio""",
        f"""ROUND(
            LEAST(CAST(size({_TOKENS}) AS DOUBLE) / 100.0, 1.0) * 0.5
            + CAST(size(array_distinct({_TOKENS})) AS DOUBLE)
              / CAST(size({_TOKENS}) AS DOUBLE) * 0.5, 6) AS quality_score""",
    )


@register(
    name="doc_fingerprint",
    survey="UD4 F17",
    doc="Order-sensitive document fingerprint: md5 hash-chain fold over "
    "tokens (rolling-hash analog; md5 hex is identical across engines).",
    oracle=f"""
        SELECT doc_id,
               list_reduce(list_prepend('', {_DTOKENS}),
                           (acc, t) -> md5(acc || t)) AS fingerprint
        FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"aggregate({_TOKENS}, '', (acc, t) -> md5(concat(acc, t))) AS fingerprint",
    )


@register(
    name="token_stats_per_source",
    survey="UD4 A7 A8",
    doc="Corpus token statistics per source: doc/token/distinct-token counts "
    "and exact mean tokens per doc.",
    oracle=f"""
        SELECT source,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS total_tokens,
               COUNT(DISTINCT token) AS distinct_tokens,
               CAST(COUNT(*) AS DOUBLE) / CAST(COUNT(DISTINCT doc_id) AS DOUBLE)
                   AS mean_tokens_per_doc
        FROM (SELECT source, doc_id, unnest({_DTOKENS}) AS token FROM documents)
        GROUP BY source
    """,
)
def token_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    exploded = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", F.explode(F.expr(_TOKENS)).alias("token"))
    )
    return exploded.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("token").alias("distinct_tokens"),
        (F.count(F.lit(1)).cast("double") / F.countDistinct("doc_id").cast("double")).alias(
            "mean_tokens_per_doc"
        ),
    )


_CMS_W = 1024  # count-min sketch width (counters per row)
_CMS_D = 2  # depth (independent hash rows)


@register(
    name="countmin_word_sketch",
    survey="A7 A8 F28 J5",
    doc="Count-min sketch over the corpus word stream, checked against "
    "exact counts (the mergeable frequency sketch for 100 TB streams: "
    f"the whole sketch is {_CMS_D}x{_CMS_W} counters — constant memory "
    "regardless of vocabulary size — and partial sketches from any "
    "partitioning merge by cell-wise addition, which is exactly what "
    "the partial+final hash aggregation here does). Each word "
    "increments one counter per hash row (cross-engine md5 family); "
    "the estimate is the MIN over its rows' counters, always >= the "
    "true count. Output: top-20 exact words joined (broadcast — the "
    "sketch is tiny BY CONSTRUCTION) to their estimates plus the "
    "overcount, so the sketch's error behavior is itself pinned "
    "deterministically.",
    oracle=f"""
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        wc AS (
            SELECT word, count(*) AS exact_count FROM w GROUP BY word),
        probes AS (
            SELECT word, exact_count, r.r AS r,
                   CAST('0x' || substr(md5(r.r || ':' || word), 1, 8)
                        AS BIGINT) % {_CMS_W} AS pos
            FROM wc, LATERAL (SELECT unnest(range(0, {_CMS_D})) AS r) r),
        sketch AS (
            SELECT r, pos, CAST(sum(exact_count) AS BIGINT) AS counter
            FROM probes GROUP BY r, pos),
        top20 AS (
            SELECT word, exact_count FROM wc
            ORDER BY exact_count DESC, word LIMIT 20),
        est AS (
            SELECT t.word, t.exact_count,
                   min(s.counter) AS cms_estimate
            FROM top20 t
            JOIN probes p ON p.word = t.word
            JOIN sketch s ON s.r = p.r AND s.pos = p.pos
            GROUP BY t.word, t.exact_count)
        SELECT word,
               CAST(exact_count AS BIGINT) AS exact_count,
               cms_estimate,
               cms_estimate - exact_count AS overcount
        FROM est
    """,
)
def countmin_word_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = wc.selectExpr(
        "word",
        "exact_count",
        f"explode(sequence(0, {_CMS_D - 1})) AS r",
    ).selectExpr(
        "word",
        "exact_count",
        "r",
        "cast(conv(substr(md5(concat(cast(r AS string), ':', word)), 1, 8),"
        f" 16, 10) AS bigint) % {_CMS_W} AS pos",
    )
    sketch = (
        probes.groupBy("r", "pos")
        .agg(F.sum("exact_count").cast("bigint").alias("counter"))
    )
    top20 = wc.orderBy(F.col("exact_count").desc(), "word").limit(20)
    return (
        top20.join(probes.select("word", "r", "pos"), "word")
        .join(F.broadcast(sketch), ["r", "pos"])
        .groupBy("word", "exact_count")
        .agg(F.min("counter").alias("cms_estimate"))
        .select(
            "word",
            F.col("exact_count").cast("bigint").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
        )
    )


@register(
    name="token_length_distribution",
    survey="A7 F17 F28",
    doc="Corpus token-length histogram with per-length share and "
    "cumulative share (the tokenizer-fertility diagnostic: long-tail "
    "token lengths predict high sub-word splits): one explode + "
    "length() + hash aggregation; the share windows run on the "
    "bounded distinct-length domain.",
    oracle="""
        WITH lens AS (
          SELECT length(term) AS token_len
          FROM (SELECT unnest(string_split(text, ' ')) AS term
                FROM documents)
        ), hist AS (
          SELECT CAST(token_len AS BIGINT) AS token_len,
                 CAST(count(*) AS BIGINT) AS n
          FROM lens GROUP BY token_len)
        SELECT token_len, n,
               CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share,
               CAST(SUM(n) OVER (ORDER BY token_len
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE)
                   / CAST(SUM(n) OVER () AS DOUBLE) AS cum_share
        FROM hist
    """,
)
def token_length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    hist = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .select(F.length("term").cast("bigint").alias("token_len"))
        .groupBy("token_len")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # Bounded domain: one row per distinct token LENGTH.
    wall = Window.partitionBy()
    wrun = Window.orderBy("token_len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "token_len",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wall).cast("double")).alias(
            "share"
        ),
        (
            F.sum("n").over(wrun).cast("double")
            / F.sum("n").over(wall).cast("double")
        ).alias("cum_share"),
    )


@register(
    name="lang_id_confusion_matrix",
    survey="UD4 A7 F28",
    doc="Evaluation artifact for the lexicon language-ID: the full "
    "actual x predicted confusion matrix (25 cells max, bounded by "
    "the language domain) with per-cell counts plus the per-ACTUAL-"
    "class recall — the row-normalized view a curation team reads "
    "before trusting a classifier as a corpus filter. Reuses "
    "lang_id_heuristic's exact argmax (same lexicon, same "
    "deterministic tie order), so the two queries stay consistent by "
    "construction. One partial+final aggregate over the row "
    "population; recall is a ratio of exact BIGINTs.",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {", ".join(
                       f"len(list_intersect(list_distinct({_DTOKENS}), {_arr_sql(w)})) AS hits_{l}"
                       for l, w in _LEXICON.items())}
            FROM documents
        ), pred AS (
            SELECT lang,
                   CASE GREATEST(hits_en, hits_fr, hits_de, hits_es,
                                 hits_zh)
                        WHEN hits_en THEN 'en' WHEN hits_fr THEN 'fr'
                        WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
                        ELSE 'zh' END AS predicted_lang
            FROM scored
        ), cells AS (
            SELECT lang, predicted_lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM pred GROUP BY lang, predicted_lang
        ), totals AS (
            SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_actual
            FROM cells GROUP BY lang
        )
        SELECT c.lang, c.predicted_lang, c.n_docs, t.n_actual,
               CAST(c.n_docs AS DOUBLE) / CAST(t.n_actual AS DOUBLE)
                   AS row_share
        FROM cells c JOIN totals t ON t.lang = c.lang
        ORDER BY c.lang, c.predicted_lang
    """,
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    hit_exprs = [
        f"size(array_intersect(array_distinct({_TOKENS}), {_arr_spark(w)})) AS hits_{l}"
        for l, w in _LEXICON.items()
    ]
    pred = (
        load(spark, sf_dir, "documents")
        .selectExpr("lang", *hit_exprs)
        .selectExpr(
            "lang",
            """CASE greatest(hits_en, hits_fr, hits_de, hits_es, hits_zh)
                    WHEN hits_en THEN 'en' WHEN hits_fr THEN 'fr'
                    WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
                    ELSE 'zh' END AS predicted_lang""",
        )
    )
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    totals = cells.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_actual")
    )
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "predicted_lang",
            "n_docs",
            "n_actual",
            F.expr(
                "CAST(n_docs AS DOUBLE) / CAST(n_actual AS DOUBLE)"
            ).alias("row_share"),
        )
        .orderBy("lang", "predicted_lang")
    )
