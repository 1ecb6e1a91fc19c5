"""Property tests for the round-7 additions: invariants that hold for
ANY input, complementing the value-level oracle checks."""

from __future__ import annotations

import hashlib

from uk_procurement_data_pipeline_spark.queries import registry


def test_span_corruption_mask_bounds_and_spot_check(spark, sf_dir):
    rows = registry()["span_corruption_masks"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == sum(1 for t in docs.values() if t)
    for r in rows:
        # spans are length <= 3, so the union covers at most 3x the starts
        assert r["n_starts"] <= r["n_masked"] <= 3 * r["n_starts"]
        assert r["n_masked"] <= r["n_tokens"]
        assert r["corrupt_permille"] == 1000 * r["n_masked"] // r["n_tokens"]
    # spot-check one doc against a pure-python rebuild of the mask
    r0 = min(rows, key=lambda r: r["doc_id"])
    n = len(docs[r0["doc_id"]].split(" "))
    assert n == r0["n_tokens"]

    def start(p: int) -> bool:
        h = hashlib.md5(f"{r0['doc_id']}:{p}".encode()).hexdigest()[:8]
        return int(h, 16) % 10 == 0

    starts = [p for p in range(n) if start(p)]
    masked = {q for p in starts for q in range(p, min(p + 3, n))}
    assert r0["n_starts"] == len(starts)
    assert r0["n_masked"] == len(masked)


def test_rejection_sample_rates_consistent(spark, sf_dir):
    rows = registry()["rejection_sample_by_quality"].fn(spark, sf_dir).collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("text IS NOT NULL AND text != ''")
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_accepted"] <= r["n_docs"]
        assert r["accept_permille"] == 1000 * r["n_accepted"] // r["n_docs"]


def test_dpo_pairs_are_strict_margin_and_disjoint_ranks(spark, sf_dir):
    rows = registry()["dpo_preference_pairs"].fn(spark, sf_dir).collect()
    assert rows, "fixture should produce at least one preference pair"
    seen = set()
    for r in rows:
        key = (r["source"], r["lang"], r["pair_rank"])
        assert key not in seen  # one pair per rank per stratum
        seen.add(key)
        assert r["chosen_doc_id"] != r["rejected_doc_id"]
        assert r["margin_milli"] > 0


def test_zone_map_layouts_and_amplification(spark, sf_dir):
    rows = registry()["zone_map_prune_report"].fn(spark, sf_dir).collect()
    assert len(rows) == 8  # 2 layouts x 4 bands
    by_band: dict[int, dict[str, dict]] = {}
    for r in rows:
        by_band.setdefault(r["band_id"], {})[r["layout"]] = r
        assert 0 <= r["n_skipped"] <= r["n_rowgroups"]
        assert r["rows_scanned"] >= r["rows_matching"]
        if r["rows_matching"] > 0:
            assert r["read_amp_milli"] >= 1000
    for band, layouts in by_band.items():
        ok, sm = layouts["orderkey"], layouts["shipmonth"]
        assert sm["rows_matching"] == ok["rows_matching"]
        # the time-partitioned layout never scans MORE than insert-order
        assert sm["rows_scanned"] <= ok["rows_scanned"]


def test_pq_adc_topk_ranks_and_monotone(spark, sf_dir):
    rows = registry()["pq_adc_topk"].fn(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
        assert r["adc"] >= 0.0
    assert set(per_q) == {4, 5, 6, 7}
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        adcs = [r["adc"] for r in rs]
        assert adcs == sorted(adcs)  # distance nondecreasing with rank


def test_prefix_cache_depths_and_rates(spark, sf_dir):
    rows = registry()["prefix_cache_hit_ratio"].fn(spark, sf_dir).collect()
    by_depth = {r["depth"]: r for r in rows}
    assert set(by_depth) == {1, 2, 4, 8, 16}
    for r in rows:
        assert 1 <= r["n_distinct_prefixes"] <= r["n_docs"]
        assert r["cache_hit_permille"] == 1000 * (
            r["n_docs"] - r["n_distinct_prefixes"]
        ) // r["n_docs"]
    # a one-token prefix is far more shareable than a 16-token prefix
    assert (
        by_depth[1]["cache_hit_permille"] >= by_depth[16]["cache_hit_permille"]
    )


def test_compaction_bins_partition_the_files(spark, sf_dir):
    rows = registry()["compaction_bin_packing"].fn(spark, sf_dir).collect()
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["bin_bytes"] for r in rows) == n_li * 100
    rows.sort(key=lambda r: r["bin_id"])
    for prev, cur in zip(rows, rows[1:]):
        # bins cover contiguous, disjoint, ordered key ranges
        assert prev["last_file"] < cur["first_file"]
    for r in rows:
        assert r["first_file"] <= r["last_file"]
        assert r["fill_permille"] == 1000 * r["bin_bytes"] // 200_000


def test_band_tuning_configs_and_precision(spark, sf_dir):
    rows = registry()["minhash_band_tuning_report"].fn(spark, sf_dir).collect()
    assert {(r["n_bands"], r["rows_per_band"]) for r in rows} == {
        (2, 6),
        (3, 4),
        (4, 3),
        (6, 2),
    }
    for r in rows:
        assert 0 <= r["n_good"] <= r["n_candidates"]
        if r["n_candidates"]:
            assert (
                r["precision_permille"]
                == 1000 * r["n_good"] // r["n_candidates"]
            )


def test_pq_recall_monotone_in_shortlist(spark, sf_dir):
    rows = registry()["pq_recall_report"].fn(spark, sf_dir).collect()
    assert len(rows) == 4 * 3  # 4 queries x 3 shortlist sizes
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["n_overlap"] <= 5
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r["shortlist"])
        assert [r["shortlist"] for r in rs] == [20, 100, 500]
        overlaps = [r["n_overlap"] for r in rs]
        assert overlaps == sorted(overlaps)  # bigger shortlist never loses


def test_phrase_search_hits_are_real_occurrences(spark, sf_dir):
    rows = registry()["phrase_search_positional"].fn(spark, sf_dir).collect()
    assert rows
    phrases = {r["phrase"] for r in rows}
    assert len(phrases) == 1  # one top phrase searched
    words = phrases.pop().split(" ")
    assert len(words) == 3
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        toks = docs[r["doc_id"]]
        assert toks[r["pos"] : r["pos"] + 3] == words


def test_seasonal_decomposition_identity(spark, sf_dir):
    rows = registry()["seasonal_decompose_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # n*1e6 = trend + seasonal + residual, exactly (integer identity)
        assert (
            r["n"] * 1_000_000
            == r["trend_micro"] + r["seasonal_micro"] + r["resid_micro"]
        )
        assert r["dow"] == r["d"] % 7
    # one row per day
    assert len({r["d"] for r in rows}) == len(rows)


def test_heavy_hitters_exact_and_partition_free(spark, sf_dir):
    rows = registry()["heavy_hitters_two_phase"].fn(spark, sf_dir).collect()
    assert rows
    # exact recount: every reported count matches a brute-force count,
    # and the threshold holds
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS term")
        .groupBy("term")
        .count()
        .collect()
    )
    exact = {r["term"]: r["count"] for r in toks}
    n = sum(exact.values())
    expected = {t for t, c in exact.items() if c * 65 > n}
    assert {r["term"] for r in rows} == expected
    for r in rows:
        assert r["n_occurrences"] == exact[r["term"]]


def test_rolling_wau_brute_force(spark, sf_dir):
    rows = registry()["rolling_7d_active_users"].fn(spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "datediff(date_trunc('day', ts), DATE '2024-01-01') AS d",
            "user_id",
        )
        .collect()
    )
    by_day: dict[int, set] = {}
    for r in ev:
        by_day.setdefault(r["d"], set()).add(r["user_id"])
    got = {r["d"]: r["wau"] for r in rows}
    assert set(got) == set(by_day)
    for d in by_day:
        want = set().union(
            *(by_day.get(x, set()) for x in range(d - 6, d + 1))
        )
        assert got[d] == len(want)


def test_maxsim_brute_force(spark, sf_dir):
    """Late-interaction MaxSim vs a pure-python rebuild on one query."""
    import math

    rows = registry()["late_interaction_maxsim"].fn(spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    embs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    docs: dict[int, list] = {}
    for vid, v in embs.items():
        docs.setdefault(vid // 4, []).append((vid % 4, v))

    def dot_micro(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return math.floor(s * 1_000_000 + 0.5)

    q0 = [v for _, v in sorted(docs[0])]
    scores = {}
    for d, toks in docs.items():
        if d == 0:
            continue
        scores[d] = sum(
            max(dot_micro(qv, dv) for _, dv in toks) for qv in q0
        )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted(
        ((r["doc_id"], r["maxsim_micro"]) for r in rows if r["query_id"] == 0),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want
