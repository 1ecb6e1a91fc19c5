"""Corpus-quality signals ([NORTH-STAR] LLM-pipeline surface, the
filter-stage companions to queries/dedup.py and queries/corpus_prep.py).

Three operators a pretraining-data pipeline runs between ingest and
packing, each re-expressed as declarative DataFrame plans:

* ``repetition_signals`` — the Gopher/MassiveText repetition heuristics
  (duplicate-word fraction, most-common-word fraction, duplicate-2-gram
  fraction). Computed with explode + per-(doc, term) hash aggregation
  rather than per-row higher-order loops, so per-document cost is
  O(tokens) even for 10k-token documents and the shuffles are keyed on
  (doc_id, term) — uniformly distributed at any corpus size.
* ``common_word_scrub`` — corpus-level boilerplate removal (the
  word-level form of CCNet's shard-frequency line dedup): terms whose
  document frequency exceeds 78% of the corpus are struck from every
  document, preserving original token order. The document-frequency
  vocabulary is aggregated once and broadcast back — the small side of
  the join by construction (a vocabulary, not a corpus).
* ``quality_linear_score`` — a linear quality classifier over engineered
  features (length, word shape, stopword rate, lexical diversity) with
  fixed public weights: the Spark-side shape of "score every document
  with a cheap model, band, and route". Pure map-side projection, no
  shuffle, no UDF.

Cross-engine determinism: every fraction is a double division of exact
integers evaluated in one fixed textual order, and the linear score is a
fixed left-to-right sum of double products — bit-identical in Spark and
DuckDB, no tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_TOKS = "split(text, ' ')"  # Spark
_DTOKS = "string_split(text, ' ')"  # DuckDB


@register(
    name="repetition_signals",
    survey="A7 A8 F17 UD4",
    doc="Gopher-style repetition quality signals per document: duplicate-"
    "word fraction, top-word fraction, duplicate-2-gram fraction. "
    "explode -> (doc, term) hash agg -> per-doc agg keeps the work "
    "O(tokens) per document (a per-row higher-order frequency loop "
    "would be O(tokens^2) on long documents).",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {_DTOKS} AS t FROM documents
        ), wc AS (
          SELECT doc_id, word, count(*) AS c
          FROM (SELECT doc_id, unnest(t) AS word FROM toks)
          GROUP BY doc_id, word
        ), words AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_words,
                 count(*) AS n_distinct_words,
                 max(c) AS max_wc
          FROM wc GROUP BY doc_id
        ), gc AS (
          SELECT doc_id, gram, count(*) AS c
          FROM (
            SELECT d.doc_id, d.t[s.i] || ' ' || d.t[s.i + 1] AS gram
            FROM toks d, LATERAL (SELECT unnest(range(1, len(d.t))) AS i) s
          )
          GROUP BY doc_id, gram
        ), grams AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_grams,
                 count(*) AS n_distinct_grams
          FROM gc GROUP BY doc_id
        )
        SELECT w.doc_id,
               w.n_words,
               w.n_distinct_words,
               CAST(w.n_words - w.n_distinct_words AS DOUBLE)
                   / CAST(w.n_words AS DOUBLE) AS dup_word_frac,
               CAST(w.max_wc AS DOUBLE) / CAST(w.n_words AS DOUBLE)
                   AS top_word_frac,
               CAST(g.n_grams - g.n_distinct_grams AS DOUBLE)
                   / CAST(g.n_grams AS DOUBLE) AS dup_2gram_frac
        FROM words w LEFT JOIN grams g USING (doc_id)
    """,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.selectExpr("doc_id", f"explode({_TOKS}) AS word")
        .groupBy("doc_id", "word")
        .count()
    )
    words = wc.groupBy("doc_id").agg(
        F.sum("count").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("count").alias("max_wc"),
    )
    gc = (
        docs.selectExpr("doc_id", f"{_TOKS} AS t")
        .selectExpr(
            "doc_id",
            # Guard single-token docs: sequence(1, 0) DESCENDS to [1, 0] in
            # Spark, which would fabricate two NULL grams, while the oracle's
            # range(1, len) is empty. Emitting an empty array makes explode
            # drop the doc from the grams side, so the left join yields NULL
            # dup_2gram_frac in both engines.
            "explode(IF(size(t) < 2, array(),"
            " transform(sequence(1, size(t) - 1),"
            " i -> concat(t[i - 1], ' ', t[i])))) AS gram",
        )
        .groupBy("doc_id", "gram")
        .count()
    )
    grams = gc.groupBy("doc_id").agg(
        F.sum("count").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
    )
    return words.join(grams, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        (
            (F.col("n_words") - F.col("n_distinct_words")).cast("double")
            / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
        (F.col("max_wc").cast("double") / F.col("n_words").cast("double")).alias(
            "top_word_frac"
        ),
        (
            (F.col("n_grams") - F.col("n_distinct_grams")).cast("double")
            / F.col("n_grams").cast("double")
        ).alias("dup_2gram_frac"),
    )


# Document-frequency threshold: a term present in more than 78% of all
# documents is corpus boilerplate. Compared in exact integer arithmetic
# (df * 100 > 78 * n_docs) so the cutoff cannot drift between engines,
# and expressed relative to corpus size so the same query is meaningful
# at any scale.
_DF_PCT = 78


@register(
    name="common_word_scrub",
    survey="A8 J5 J7 A1 F17",
    doc="Corpus-level boilerplate removal (word-level CCNet line dedup): "
    "terms with document frequency > 78% of the corpus are struck from "
    "every document, preserving token order. The DF vocabulary is one "
    "hash aggregation over distinct (doc, word) pairs and is joined "
    "back via broadcast anti-join — the vocabulary is the small side "
    "by construction, so the scrub itself stays map-side at 100 TB.",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {_DTOKS} AS t FROM documents
        ), pos AS (
          SELECT d.doc_id, s.i AS pos, d.t[s.i] AS word
          FROM toks d, LATERAL (SELECT unnest(range(1, len(d.t) + 1)) AS i) s
        ), df AS (
          SELECT word, count(DISTINCT doc_id) AS df FROM pos GROUP BY word
        ), total AS (
          SELECT count(*) AS n_docs FROM documents
        ), boiler AS (
          SELECT word FROM df, total WHERE df * 100 > {_DF_PCT} * n_docs
        ), kept AS (
          SELECT doc_id,
                 count(*) AS n_kept,
                 string_agg(word, ' ' ORDER BY pos) AS scrubbed_text
          FROM pos
          WHERE word NOT IN (SELECT word FROM boiler)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(k.n_kept, 0) AS n_kept,
               COALESCE(k.scrubbed_text, '') AS scrubbed_text
        FROM documents d LEFT JOIN kept k USING (doc_id)
    """,
)
def common_word_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pos = docs.selectExpr(
        "doc_id", f"posexplode({_TOKS}) AS (pos, word)"
    )
    dfreq = pos.select("doc_id", "word").distinct().groupBy("word").agg(
        F.count(F.lit(1)).alias("df")
    )
    # Corpus size as a 1-row broadcast joined on a constant key: the scalar
    # reaches every vocabulary row without a driver-side collect.
    total = docs.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("k", F.lit(1))
    boiler = (
        dfreq.withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .where(F.col("df") * 100 > _DF_PCT * F.col("n_docs"))
        .select("word")
    )
    kept = (
        pos.join(F.broadcast(boiler), "word", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
                " ",
            ).alias("scrubbed_text"),
        )
    )
    return docs.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
    )


# Fixed public weights for the linear quality model. The score is a
# fixed-order chain of double multiply-adds — both engines evaluate the
# identical expression tree, so the result is bit-identical.
_W_BIAS, _W_NWORDS, _W_WLEN, _W_STOP, _W_DISTINCT = -2.0, 0.01, 0.35, -1.5, 2.0


@register(
    name="quality_linear_score",
    survey="P1 F7 F17 F28 UD4",
    doc="Linear quality classifier over engineered features (token count, "
    "mean word length, stopword fraction, lexical diversity) with fixed "
    "public weights and score bands — one map-side projection, no "
    "shuffle, no UDF; the cheap-model routing stage of a corpus "
    "pipeline.",
    oracle=f"""
        SELECT doc_id, score,
               CASE WHEN score >= 1.5 THEN 'high'
                    WHEN score >= 0.5 THEN 'medium'
                    ELSE 'low' END AS band
        FROM (
          SELECT doc_id,
                 {_W_BIAS}
                 + {_W_NWORDS} * CAST(n_words AS DOUBLE)
                 + {_W_WLEN} * (CAST(length(text) - (n_words - 1) AS DOUBLE)
                                / CAST(n_words AS DOUBLE))
                 + {_W_STOP} * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
                 + {_W_DISTINCT} * (CAST(n_distinct AS DOUBLE)
                                    / CAST(n_words AS DOUBLE)) AS score
          FROM (
            SELECT doc_id, text,
                   len({_DTOKS}) AS n_words,
                   len(list_filter({_DTOKS},
                                   w -> w IN ('the', 'a'))) AS n_stop,
                   len(list_distinct({_DTOKS})) AS n_distinct
            FROM documents
          )
        )
    """,
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "text",
        f"size({_TOKS}) AS n_words",
        f"size(filter({_TOKS}, w -> w IN ('the', 'a'))) AS n_stop",
        f"size(array_distinct({_TOKS})) AS n_distinct",
    )
    score = (
        F.lit(_W_BIAS)
        + F.lit(_W_NWORDS) * F.col("n_words").cast("double")
        + F.lit(_W_WLEN)
        * (
            (F.length("text") - (F.col("n_words") - 1)).cast("double")
            / F.col("n_words").cast("double")
        )
        + F.lit(_W_STOP)
        * (F.col("n_stop").cast("double") / F.col("n_words").cast("double"))
        + F.lit(_W_DISTINCT)
        * (F.col("n_distinct").cast("double") / F.col("n_words").cast("double"))
    )
    return feats.select("doc_id", score.alias("score")).select(
        "doc_id",
        "score",
        F.when(F.col("score") >= 1.5, "high")
        .when(F.col("score") >= 0.5, "medium")
        .otherwise("low")
        .alias("band"),
    )


def with_quality_score(df: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, score): the quality_linear_score
    model as a reusable stage (same fixed-order expression tree)."""
    feats = df.selectExpr(
        "doc_id",
        "text",
        f"size({_TOKS}) AS n_words",
        f"size(filter({_TOKS}, w -> w IN ('the', 'a'))) AS n_stop",
        f"size(array_distinct({_TOKS})) AS n_distinct",
    )
    score = (
        F.lit(_W_BIAS)
        + F.lit(_W_NWORDS) * F.col("n_words").cast("double")
        + F.lit(_W_WLEN)
        * (
            (F.length("text") - (F.col("n_words") - 1)).cast("double")
            / F.col("n_words").cast("double")
        )
        + F.lit(_W_STOP)
        * (F.col("n_stop").cast("double") / F.col("n_words").cast("double"))
        + F.lit(_W_DISTINCT)
        * (F.col("n_distinct").cast("double") / F.col("n_words").cast("double"))
    )
    return feats.select("doc_id", "text", score.alias("score"))


# DuckDB fragment mirroring with_quality_score over a relation named {src}.
ORACLE_SCORE_SQL = f"""
    SELECT doc_id, text,
           {_W_BIAS}
           + {_W_NWORDS} * CAST(n_words AS DOUBLE)
           + {_W_WLEN} * (CAST(length(text) - (n_words - 1) AS DOUBLE)
                          / CAST(n_words AS DOUBLE))
           + {_W_STOP} * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
           + {_W_DISTINCT} * (CAST(n_distinct AS DOUBLE)
                              / CAST(n_words AS DOUBLE)) AS score
    FROM (
      SELECT doc_id, text,
             len({_DTOKS}) AS n_words,
             len(list_filter({_DTOKS}, w -> w IN ('the', 'a'))) AS n_stop,
             len(list_distinct({_DTOKS})) AS n_distinct
      FROM {{src}}
    )
"""


@register(
    name="char_entropy_quality",
    survey="A7 F17 F28 UD4",
    doc="Character-level Shannon entropy per document (the "
    "compressibility proxy that catches mojibake, binary spill and "
    "key-mash spam that token-level filters miss): explode each "
    "text to single characters, per-(doc, char) counts, entropy "
    "-sum(p ln p) as an exact BIGINT sum of micro-quantized "
    "char terms (the ln() contract - each term floor((c*1e6*ln(c/n))"
    ") computed on identical integer operands) divided once by the "
    "doc length. Flags the lowest-entropy tail (bottom decile "
    "threshold computed from the bounded entropy-value domain is "
    "left to the consumer; the score itself is the operator). One "
    "explode plus (doc, char)-keyed aggregates - linear.",
    oracle="""
        WITH chars AS (
          SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
          FROM documents),
        cc AS (
          SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
          FROM chars WHERE ch <> '' GROUP BY doc_id, ch),
        n AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
          FROM cc GROUP BY doc_id)
        SELECT cc.doc_id,
               CAST(max(n.n) AS BIGINT) AS n_chars,
               CAST(count(*) AS BIGINT) AS n_distinct_chars,
               CAST(SUM(CAST(floor(-ln(CAST(cc.c AS DOUBLE)
                                       / CAST(n.n AS DOUBLE))
                                   * CAST(cc.c AS DOUBLE)
                                   * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE)
               / CAST(max(n.n) AS DOUBLE) / 1000000.0
                   AS char_entropy_nats
        FROM cc JOIN n USING (doc_id)
        GROUP BY cc.doc_id
        ORDER BY cc.doc_id
    """,
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = (
        load(spark, sf_dir, "documents")
        .selectExpr("doc_id", "explode(split(text, '')) AS ch")
        .where(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = cc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    term = F.expr(
        "CAST(floor(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
        " * CAST(c AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
    )
    return (
        cc.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            (
                F.sum(term).cast("double")
                / F.max("n").cast("double")
                / F.lit(1000000.0)
            ).alias("char_entropy_nats"),
        )
        .orderBy("doc_id")
    )


@register(
    name="quantile_normalize_lengths",
    survey="A7 W3 J6 F13 F28",
    doc="Quantile normalization of per-source document-length "
    "distributions onto the global distribution (the microarray-style "
    "normalizer, used to make per-domain features comparable before "
    "mixing corpora): for each source and decile d, report the "
    "source's own decile value and the GLOBAL value at the "
    "proportionally mapped rank floor((p-1)*(N-1)/(n_s-1))+1. The "
    "scale move: no per-row rank windows anywhere — both quantile "
    "functions are inverted CDFs over the bounded (source, n_chars) "
    "COUNT domain (first aggregation collapses rows onto it), so the "
    "cumulative windows and min-value lookups cost the same at any "
    "SF. All rank arithmetic is exact integers; output is 20 sources "
    "x 11 deciles.",
    oracle="""
        WITH cnt AS (
          SELECT source, n_chars AS len, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2
        ), cum AS (
          SELECT source, len, c,
                 SUM(c) OVER (PARTITION BY source ORDER BY len
                              ROWS UNBOUNDED PRECEDING) AS cum
          FROM cnt
        ), ns AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM cnt
          GROUP BY source
        ), gcnt AS (
          SELECT len, CAST(SUM(c) AS BIGINT) AS c FROM cnt GROUP BY len
        ), gcum AS (
          SELECT len, SUM(c) OVER (ORDER BY len ROWS UNBOUNDED
                                   PRECEDING) AS cum
          FROM gcnt
        ), n_tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n FROM gcnt
        ), pos AS (
          SELECT ns.source, ns.n_s, d.d,
                 ((ns.n_s - 1) * d.d) // 10 + 1 AS p_src
          FROM ns CROSS JOIN (SELECT unnest(range(0, 11)) AS d) d
        ), mapped AS (
          SELECT p.source, p.d, p.p_src, p.n_s, t.n,
                 CASE WHEN p.n_s > 1
                      THEN ((p.p_src - 1) * (t.n - 1)) // (p.n_s - 1) + 1
                      ELSE 1 END AS p_glob
          FROM pos p CROSS JOIN n_tot t
        ), src_val AS (
          SELECT m.source, m.d, m.p_src, m.p_glob,
                 MIN(c.len) AS src_value
          FROM mapped m JOIN cum c
            ON c.source = m.source AND c.cum >= m.p_src
          GROUP BY 1, 2, 3, 4
        )
        SELECT s.source, CAST(s.d AS BIGINT) AS decile,
               CAST(s.p_src AS BIGINT) AS src_rank,
               CAST(s.src_value AS BIGINT) AS src_value,
               CAST(MIN(g.len) AS BIGINT) AS mapped_value
        FROM src_val s JOIN gcum g ON g.cum >= s.p_glob
        GROUP BY s.source, s.d, s.p_src, s.src_value
        ORDER BY source, decile
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cnt = (
        load(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("len"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cum = cnt.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy("source")
            .orderBy("len")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ns = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    gcnt = cnt.groupBy("len").agg(F.sum("c").cast("bigint").alias("c"))
    gcum = gcnt.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    n_tot = gcnt.agg(F.sum("c").cast("bigint").alias("n"))
    deciles = spark.range(0, 11).select(F.col("id").cast("bigint").alias("d"))
    pos = ns.crossJoin(F.broadcast(deciles)).select(
        "source",
        "n_s",
        "d",
        F.expr("((n_s - 1) * d) div 10 + 1").alias("p_src"),
    )
    mapped = pos.crossJoin(F.broadcast(n_tot)).select(
        "source",
        "d",
        "p_src",
        F.when(
            F.col("n_s") > 1,
            F.expr("((p_src - 1) * (n - 1)) div (n_s - 1) + 1"),
        )
        .otherwise(F.lit(1))
        .alias("p_glob"),
    )
    src_val = (
        mapped.join(
            cum.select("source", "len", "cum"),
            (mapped.source == cum.source) & (cum.cum >= mapped.p_src),
        )
        .drop(cum.source)
        .groupBy("source", "d", "p_src", "p_glob")
        .agg(F.min("len").alias("src_value"))
    )
    return (
        src_val.join(gcum.select(F.col("len").alias("glen"), F.col("cum").alias("gc")),
                     F.col("gc") >= F.col("p_glob"))
        .groupBy("source", "d", "p_src", "src_value")
        .agg(F.min("glen").cast("bigint").alias("mapped_value"))
        .select(
            "source",
            F.col("d").cast("bigint").alias("decile"),
            F.col("p_src").cast("bigint").alias("src_rank"),
            F.col("src_value").cast("bigint").alias("src_value"),
            "mapped_value",
        )
        .orderBy("source", "decile")
    )


# Hashed-feature linear classifier (the fastText / DCLM-style "score every
# document with a cheap model" shape). The HASHING TRICK is the scale
# property being pinned: unigram+bigram features land in a FIXED 4096-wide
# bucket space whatever the corpus vocabulary, so model size, shuffle
# width, and per-doc cost are all corpus-size-invariant — the reason this
# family (fastText quality filters, DCLM classifiers) survives 100 TB.
# Weights are a fixed public function of the bucket (Knuth multiplicative
# hash), so both engines share the model without a side file, and all
# arithmetic is integer until one final division (order-free, exact).
_HC_BUCKETS = 4096
_HC_KNUTH = 2654435761
_HC_SPAN = 8192  # weights in [-4096, 4095]

# r12: arrays_zip(slice(...)) bigrams — element_at(split, i) inside the
# lambda re-split the text per element (O(len^2) per doc, see dedup.py
# _SHINGLES note); the zip form splits O(1) times per row.
_HC_FEATS = (
    f"CASE WHEN size({_TOKS}) >= 2 THEN "
    f"concat({_TOKS}, transform(arrays_zip("
    f" slice({_TOKS}, 1, size({_TOKS}) - 1),"
    f" slice({_TOKS}, 2, size({_TOKS}) - 1)),"
    f" s -> concat(s['0'], '_', s['1'])))"
    f" ELSE {_TOKS} END"
)
_D_HC_FEATS = (
    f"list_concat({_DTOKS},"
    f" list_transform(generate_series(1, len({_DTOKS}) - 1),"
    f" i -> {_DTOKS}[i] || '_' || {_DTOKS}[i + 1]))"
)


@register(
    name="hashed_ngram_classifier",
    survey="UD4 F17 A7 F5",
    doc="Hashing-trick linear quality classifier (fastText/DCLM filter "
    "shape): unigram + bigram features hashed into 4096 buckets "
    "(md5-based 32-bit hash, the engine's shared hash family), integer "
    "weight per bucket via Knuth multiplicative hash, per-document "
    "logit = mean bucket weight (exact integer sum, ONE final double "
    "division, micro-quantized), keep = logit >= 0. Aggregated per "
    "source with keep counts and logit extrema. Explode -> hash -> "
    "sum is O(features) map-side work with a (doc) keyed reduce; the "
    "fixed bucket space keeps every shuffle width corpus-invariant.",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, source, unnest({_D_HC_FEATS}) AS feat
            FROM documents),
        w AS (
            SELECT doc_id, source,
                   (CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT)
                    % {_HC_BUCKETS}) * {_HC_KNUTH} % {_HC_SPAN}
                   - {_HC_SPAN // 2} AS wgt
            FROM f),
        d AS (
            SELECT doc_id, source,
                   CAST(floor(CAST(sum(wgt) AS DOUBLE) * 1000000.0
                              / ({_HC_SPAN // 2}.0 * count(*))) AS BIGINT)
                       AS logit_micro
            FROM w GROUP BY 1, 2)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE logit_micro >= 0) AS BIGINT)
                   AS n_keep,
               CAST(sum(logit_micro) AS BIGINT) AS logit_micro_sum,
               min(logit_micro) AS logit_micro_min,
               max(logit_micro) AS logit_micro_max
        FROM d GROUP BY source
    """,
)
def hashed_ngram_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # r12 note: a map-side aggregate() fold over the feature array was
    # tried here (removes the explode + groupBy) and measured SLOWER
    # (4.35s vs 3.21s at sf0.1): higher-order-function lambdas are
    # interpreted, so the per-feature md5 lost whole-stage codegen. The
    # explode keeps md5 inside codegen; the (doc_id, source) groupBy is
    # cheap because partial aggregation collapses each task to <= n_docs
    # rows before the exchange. The real win was the bigram build:
    # _HC_FEATS now uses arrays_zip(slice(...)) instead of re-splitting
    # the text per element.
    feats = docs.select(
        "doc_id", "source", F.explode(F.expr(_HC_FEATS)).alias("feat")
    )
    wgt = (
        F.expr("CAST(conv(substr(md5(feat), 1, 8), 16, 10) AS BIGINT)")
        % _HC_BUCKETS
        * _HC_KNUTH
        % _HC_SPAN
        - _HC_SPAN // 2
    )
    per_doc = (
        feats.select("doc_id", "source", wgt.alias("wgt"))
        .groupBy("doc_id", "source")
        .agg(
            F.floor(
                F.sum("wgt").cast("double")
                * F.lit(1_000_000.0)
                / (F.lit(float(_HC_SPAN // 2)) * F.count(F.lit(1)))
            )
            .cast("bigint")
            .alias("logit_micro")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_if(F.col("logit_micro") >= 0).cast("bigint").alias("n_keep"),
        F.sum("logit_micro").cast("bigint").alias("logit_micro_sum"),
        F.min("logit_micro").alias("logit_micro_min"),
        F.max("logit_micro").alias("logit_micro_max"),
    )
