"""Unit tests per operator family on literal DataFrames — null/empty/
duplicate edges the fixture data never hits (SURVEY.md §5.2 item 2), plus
property-style comparisons of the engine's array folds against pure-Python
references (item 4)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.functions.exact import exact_sum
from uk_procurement_data_pipeline_spark.queries import registry


# --- array folds vs pure-Python references (ref 2a:147-150 pipe_join,
# --- 2b:13-15 _join_unique) ------------------------------------------------

def _pipe_join_py(values):
    return "|".join(v for v in values if v is not None and v != "")


def _join_unique_py(values):
    return ";".join(sorted({v for v in values if v is not None and v != ""}))


_PIPE_EXPR = "array_join(filter(vals, v -> v IS NOT NULL AND v != ''), '|')"
_UNIQ_EXPR = (
    "array_join(array_sort(array_distinct("
    "filter(vals, v -> v IS NOT NULL AND v != ''))), ';')"
)


def _random_cases(seed: int, n: int):
    rng = random.Random(seed)
    words = ["alpha", "beta", "", "gamma", None, "delta", "alpha", "é-ü"]
    return [
        [rng.choice(words) for _ in range(rng.randrange(0, 8))] for _ in range(n)
    ]


def test_pipe_join_matches_python(spark):
    cases = _random_cases(7, 200)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, vals array<string>")
    got = {r["i"]: r["out"] for r in df.selectExpr("i", f"{_PIPE_EXPR} AS out").collect()}
    for i, c in enumerate(cases):
        assert got[i] == _pipe_join_py(c), f"case {i}: {c!r}"


def test_join_unique_matches_python(spark):
    cases = _random_cases(13, 200)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, vals array<string>")
    got = {r["i"]: r["out"] for r in df.selectExpr("i", f"{_UNIQ_EXPR} AS out").collect()}
    for i, c in enumerate(cases):
        assert got[i] == _join_unique_py(c), f"case {i}: {c!r}"


def test_array_distinct_preserves_first_seen_order(spark):
    # A3 order-preserving distinct (ref 2a:351-367 append_unique)
    df = spark.createDataFrame([(["b", "a", "b", "c", "a"],)], "vals array<string>")
    assert df.selectExpr("array_distinct(vals) AS d").first()["d"] == ["b", "a", "c"]


# --- bigram guard edge (ADVICE r01: 1-token and empty docs) ----------------

@pytest.mark.parametrize("text,expected", [("solo", 0), ("", 0), ("a b a b", 1)])
def test_bigram_guard_small_docs(spark, text, expected):
    expr = """if(size(split(text,' ')) < 2, 0,
        size(array_distinct(transform(
            sequence(1, size(split(text,' ')) - 1),
            i -> concat(element_at(split(text,' '), i), ' ',
                        element_at(split(text,' '), i + 1))))))"""
    df = spark.createDataFrame([(text,)], "text string")
    # 'a b a b' -> bigrams [a b, b a, a b] -> 2 distinct; recompute properly
    got = df.selectExpr(f"{expr} AS n").first()["n"]
    if text == "a b a b":
        assert got == 2
    else:
        assert got == expected


# --- dedup edges ------------------------------------------------------------

def test_dedup_tombstone_keeps_flagged_duplicates(spark):
    # D1 semantics (ref 2a:226-243): duplicates kept, flagged, not dropped
    rows = [(1, "u1"), (2, "u1"), (3, "u2"), (4, "u1")]
    df = spark.createDataFrame(rows, "row_index int, uri string")
    w = Window.partitionBy("uri").orderBy("row_index")
    out = df.select(
        "*",
        F.when(F.row_number().over(w) == 1, "ok")
        .otherwise("duplicate_uri_skipped_fetch")
        .alias("status"),
    )
    assert out.count() == 4  # nothing dropped
    statuses = {r["row_index"]: r["status"] for r in out.collect()}
    assert statuses == {
        1: "ok", 2: "duplicate_uri_skipped_fetch",
        3: "ok", 4: "duplicate_uri_skipped_fetch",
    }


def test_exact_sum_is_order_independent(spark):
    vals = [(0.1,), (0.2,), (0.7,), (1e9,), (-1e9,), (0.3,)]
    a = spark.createDataFrame(vals, "v double").agg(exact_sum("v", "s")).first()["s"]
    b = (
        spark.createDataFrame(list(reversed(vals)), "v double")
        .repartition(3)
        .agg(exact_sum("v", "s"))
        .first()["s"]
    )
    assert a == b == pytest.approx(1.3)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    # A8: HLL sketch not oracle-comparable; pin 5% relative error here
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact, approx = orders.agg(
        F.countDistinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("a"),
    ).first()
    assert abs(approx - exact) <= 0.1 * exact


# --- as-of join edges -------------------------------------------------------

def test_asof_join_no_prior_purchase_is_null(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0),
        (2, "2024-01-01 10:05:00", 7, "purchase", 9.0),
        (3, "2024-01-01 10:06:00", 7, "click", 2.0),
        (4, "2024-01-01 09:00:00", 8, "click", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, ts string, user_id int, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    ev = df.withColumn(
        "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r["event_id"]: r["asof"]
        for r in ev.withColumn("asof", F.last("pv", ignorenulls=True).over(w))
        .where("event_type = 'click'")
        .collect()
    }
    assert out[1] is None  # click before any purchase
    assert out[3] == 9.0  # picks up the prior purchase
    assert out[4] is None  # user with no purchases at all


# --- skew-safe salted aggregation -------------------------------------------

def test_salted_aggregation_matches_direct(spark):
    from uk_procurement_data_pipeline_spark.functions.skew import salted_sum_count

    # 90% of rows share one hot key — the shape that funnels one reducer
    rows = [("hot" if i % 10 else f"k{i}", i * 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, v double")
    got = {
        r["key"]: (r["sum_value"], r["n"])
        for r in salted_sum_count(df, "key", "v", salt_n=8).collect()
    }
    want = {
        r["key"]: (r["s"], r["n"])
        for r in df.groupBy("key")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_try_decode_never_raises_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uk_procurement_data_pipeline_spark.sources.decode import try_decode_bytes

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64))
    def check(raw: bytes):
        text, enc = try_decode_bytes(raw)
        assert isinstance(text, str)
        assert enc in ("utf-8", "latin-1")
        # utf-8-decodable inputs must NOT take the lossy fallback
        try:
            raw.decode("utf-8")
            assert enc == "utf-8" and text == raw.decode("utf-8")
        except UnicodeDecodeError:
            assert enc == "latin-1"

    check()


# --- set-op semantics pinned (verify-skill gotcha) --------------------------

def test_subtract_is_set_except_not_multiset(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    b = spark.createDataFrame([(1,)], "v int")
    assert sorted(r["v"] for r in a.subtract(b).collect()) == [2]
    assert sorted(r["v"] for r in a.exceptAll(b).collect()) == [1, 2]


# --- every registered query runs at sf0.001 and returns a stable schema ----

def test_registry_has_no_duplicate_or_unnamed_specs():
    reg = registry()
    assert len(reg) >= 55
    for name, spec in reg.items():
        assert spec.fn is not None and name == spec.name and spec.survey


def test_flagship_query_runs_smoke(spark, sf_dir):
    df = registry()["revenue_by_region"].fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["r_name", "revenue", "n_items"]
    assert len(rows) > 0


# --- connected components (dedup clustering) --------------------------------

def test_connected_components_chain_longer_than_old_budget(spark):
    """A 20-hop chain needs ~20 propagation rounds — past the fixed 8-round
    budget round 2 shipped — plus a triangle and a 2-node component."""
    from uk_procurement_data_pipeline_spark.functions.graph import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(20)]
    tri = [(100, 101), (101, 102), (102, 100)]
    pair = [(200, 201)]
    edges = spark.createDataFrame(chain + tri + pair, "src long, dst long")
    got = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert {got[i] for i in range(21)} == {0}
    assert {got[i] for i in (100, 101, 102)} == {100}
    assert got[200] == got[201] == 200


def test_connected_components_errors_instead_of_wrong_labels(spark):
    from uk_procurement_data_pipeline_spark.functions.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=3)


def test_chunking_invariants_hypothesis(spark):
    """Sliding-window chunking (corpus_prep): every token is covered, the
    stride-aligned prefix of each chunk reconstructs the document, and
    chunk lengths never exceed the window."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uk_procurement_data_pipeline_spark.queries.corpus_prep import (
        _CHUNK,
        _STRIDE,
    )

    token = st.text(alphabet="abcdefgh", min_size=1, max_size=6)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(token, min_size=1, max_size=120))
    def check(tokens):
        text = " ".join(tokens)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            df.selectExpr(
                "doc_id",
                "split(text, ' ') AS toks",
                f"explode(sequence(0, size(split(text, ' ')) - 1, {_STRIDE}))"
                " AS start",
            )
            .selectExpr(
                "start",
                f"slice(toks, start + 1, {_CHUNK}) AS chunk",
            )
            .collect(),
            key=lambda r: r["start"],
        )
        # windows start at every stride multiple below the doc length
        assert [r["start"] for r in rows] == list(range(0, len(tokens), _STRIDE))
        for r in rows:
            assert 1 <= len(r["chunk"]) <= _CHUNK
            assert r["chunk"] == tokens[r["start"] : r["start"] + _CHUNK]
        # stride-aligned prefixes reconstruct the document exactly
        rebuilt = [t for r in rows for t in r["chunk"][:_STRIDE]]
        assert rebuilt == tokens

    check()


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """A8 sketch family: approx_percentile (KLL-style sketch) lands within
    2% of the exact percentile on the order-value distribution — the same
    tolerance contract as the HLL count-distinct test."""
    from uk_procurement_data_pipeline_spark.catalog import load

    row = (
        load(spark, sf_dir, "orders")
        .selectExpr(
            "percentile(o_totalprice, 0.5) AS exact_p50",
            "approx_percentile(o_totalprice, 0.5, 1000) AS approx_p50",
            "percentile(o_totalprice, 0.9) AS exact_p90",
            "approx_percentile(o_totalprice, 0.9, 1000) AS approx_p90",
        )
        .first()
    )
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.02 * row["exact_p50"]
    assert abs(row["approx_p90"] - row["exact_p90"]) <= 0.02 * row["exact_p90"]


def test_multiprobe_lsh_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe candidates,
    so at every rank the multi-probe cosine is >= the single-probe one —
    the recall improvement the extra probes pay for."""
    from uk_procurement_data_pipeline_spark.queries import registry

    single = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in registry()["ann_lsh_bucketed"].fn(spark, sf_dir).collect()
    }
    multi = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in registry()["ann_lsh_multiprobe"].fn(spark, sf_dir).collect()
    }
    assert single, "no single-probe results"
    for key, cos in single.items():
        assert key in multi
        assert multi[key] >= cos - 1e-12, key
