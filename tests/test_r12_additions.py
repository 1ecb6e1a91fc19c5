"""Round-12 pins: the index catalog (build-once / probe-many lifecycle).

The oracle proves value equality of index_catalog_reuse end-to-end; these
pin the structural claims the hash compare can't see — that the second
probe of a generation issues ZERO build jobs, that staleness is driven by
the (data, params) fingerprint, and that vacuum removes exactly the
superseded generations.
"""

from __future__ import annotations

import pytest

from uk_procurement_data_pipeline_spark import indexes
from uk_procurement_data_pipeline_spark.queries import registry


@pytest.fixture()
def fresh_catalog(tmp_path, monkeypatch):
    """Point the catalog at an empty per-test root (and reset the
    session-cached root + build counters) so each test sees a cold
    catalog regardless of what earlier tests or queries built."""
    monkeypatch.setattr(indexes, "_ROOT", str(tmp_path))
    monkeypatch.setattr(indexes, "BUILD_COUNTS", {})
    return tmp_path


def test_build_or_load_builds_once(spark, fresh_catalog):
    calls = []

    def builder():
        calls.append(1)
        return spark.range(5).selectExpr("id", "id * id AS sq")

    fp = indexes.fingerprint(tables={}, params={"v": 1})
    a = indexes.build_or_load(spark, "t_idx", fp, builder)
    b = indexes.build_or_load(spark, "t_idx", fp, builder)
    assert len(calls) == 1, "second call must be a pure load"
    assert indexes.BUILD_COUNTS[indexes.generation_key("t_idx", fp)] == 1
    assert sorted(r.sq for r in a.collect()) == sorted(
        r.sq for r in b.collect()
    )


def test_fingerprint_change_rebuilds_and_vacuum_reaps(spark, fresh_catalog):
    fp1 = indexes.fingerprint(tables={}, params={"v": 1})
    fp2 = indexes.fingerprint(tables={}, params={"v": 2})
    assert fp1 != fp2
    for fp in (fp1, fp2):
        indexes.build_or_load(spark, "t_gen", fp, lambda: spark.range(3))
    key1 = indexes.generation_key("t_gen", fp1)
    assert indexes.BUILD_COUNTS[key1] == 1
    assert indexes.BUILD_COUNTS[indexes.generation_key("t_gen", fp2)] == 1
    removed = indexes.vacuum_stale("t_gen", keep_fps={fp2})
    assert removed == [key1]
    # the kept generation still loads without rebuilding
    indexes.build_or_load(spark, "t_gen", fp2, lambda: spark.range(3))
    assert indexes.BUILD_COUNTS[indexes.generation_key("t_gen", fp2)] == 1


def test_table_fingerprint_tracks_data(sf_dir, tmp_path):
    fp_docs = indexes.table_fingerprint(sf_dir, "documents")
    assert fp_docs == indexes.table_fingerprint(sf_dir, "documents")
    assert fp_docs != indexes.table_fingerprint(sf_dir, "embeddings")
    with pytest.raises(FileNotFoundError):
        indexes.table_fingerprint(str(tmp_path), "documents")


def test_index_catalog_reuse_probes_share_one_build(
    spark, sf_dir, fresh_catalog
):
    """VERDICT r11 item 1's done-bar: the driver-green query builds the
    band index ONCE and probes twice — and an end-to-end re-invocation
    (bench's best-of-N shape) still issues zero further builds."""
    from uk_procurement_data_pipeline_spark.queries.dedup import (
        minhash_band_index_fingerprint,
    )

    spec = registry()["index_catalog_reuse"]
    first = spec.fn(spark, sf_dir).collect()
    key = indexes.generation_key(
        "minhash_band_index", minhash_band_index_fingerprint(sf_dir)
    )
    assert indexes.BUILD_COUNTS == {key: 1}, (
        "two probes must share one build"
    )
    second = spec.fn(spark, sf_dir).collect()
    assert indexes.BUILD_COUNTS == {key: 1}, (
        "repeat invocation must serve from the stored index"
    )
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_incremental_probe_shares_catalog_generation(
    spark, sf_dir, fresh_catalog
):
    """minhash_index_probe_incremental and index_catalog_reuse declare the
    SAME (name, fingerprint) generation — one session-wide artifact, not
    per-query copies."""
    reg = registry()
    reg["index_catalog_reuse"].fn(spark, sf_dir).collect()
    reg["minhash_index_probe_incremental"].fn(spark, sf_dir).collect()
    assert len(indexes.BUILD_COUNTS) == 1
    assert sum(indexes.BUILD_COUNTS.values()) == 1


def test_ivfpq_recall_monotone_in_nprobe(spark, sf_dir):
    """VERDICT r11 item 3's done-bar: recall@5 must be monotone
    non-decreasing in nprobe for every query — probing more inverted
    lists can only widen the candidate set, and with ADC scores fixed
    per (query, neighbor) a wider set's top-5 hit count never drops
    below a narrower set's."""
    rows = (
        registry()["ivfpq_nprobe_recall"].fn(spark, sf_dir).collect()
    )
    assert rows, "recall readout must be non-empty"
    by_q: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(
            (r.nprobe, r.recall_permille)
        )
    for q, series in by_q.items():
        series.sort()
        assert len(series) == 3, f"query {q}: expected 3 nprobe points"
        vals = [v for _, v in series]
        assert vals == sorted(vals), (
            f"query {q}: recall not monotone in nprobe: {series}"
        )


# --- WAV codec pins (r12, VERDICT r11 item 6) — mirror the PNG pins ------


def test_wav_roundtrip_exact():
    from uk_procurement_data_pipeline_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]  # odd count: pad path
    data = encode_wav(samples, sample_rate=8000)
    rate, channels, back = decode_wav(data)
    assert (rate, channels) == (8000, 1)
    assert back == samples
    # stereo interleaved
    st = encode_wav([1, 2, 3, 4], sample_rate=44100, channels=2)
    rate, channels, back = decode_wav(st)
    assert (rate, channels, back) == (44100, 2, [1, 2, 3, 4])


def test_wav_decode_skips_unknown_chunks():
    """RIFF chunk-walking: a LIST chunk from another writer (odd size,
    word-aligned) must be skipped, not break the parse."""
    import struct

    from uk_procurement_data_pipeline_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    base = encode_wav([5, -5, 9])
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = (
        base[:12]
        + extra
        + base[12:]
    )
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    assert decode_wav(patched)[2] == [5, -5, 9]


def test_wav_refusal_contract():
    import struct

    import pytest as _pytest

    from uk_procurement_data_pipeline_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    good = encode_wav([1, 2, 3, 4])
    cases = [
        (b"OGGS" + good[4:], "bad magic"),
        (good[:8] + b"AVI " + good[12:], "not WAVE"),
        (good[:40], "truncated"),
    ]
    for blob, why in cases:
        with _pytest.raises(ValueError):
            decode_wav(blob)
    # non-PCM format code must refuse, not mis-decode
    fmt_at = good.index(b"fmt ") + 8
    non_pcm = good[:fmt_at] + struct.pack("<H", 3) + good[fmt_at + 2 :]
    with _pytest.raises(ValueError, match="unsupported audio format"):
        decode_wav(non_pcm)
    with _pytest.raises(ValueError, match="int16 range"):
        encode_wav([99999])


def test_audio_perturbation_confined_to_one_window():
    """The banded near-dup's load-bearing property: a one-sample
    perturbation changes the (energy, zcross) features of exactly one
    window, so same-archetype clips share >= 3 of 4 bands."""
    from uk_procurement_data_pipeline_spark.functions.wav import (
        window_features,
    )
    from uk_procurement_data_pipeline_spark.queries.multimodal import (
        _AUD_WIN,
        _aud_samples,
    )

    # two docs, same archetype (doc_id % 17 equal), different perturbation
    a, b = 2, 2 + 17 * 9  # both pass doc_id % 9 == 2 when chosen carefully
    assert a % 17 == b % 17
    fa = window_features(_aud_samples(a), _AUD_WIN)
    fb = window_features(_aud_samples(b), _AUD_WIN)
    assert len(fa) == len(fb)
    ndiff = sum(1 for x, y in zip(fa, fb) if x != y)
    assert ndiff <= 2, f"perturbations must stay window-local: {ndiff}"


def test_video_perturbation_confined_to_one_frame_hash():
    """The clip-level agreement threshold's load-bearing property: a
    doc's single perturbed pixel lives in exactly one frame, so two
    same-archetype clips agree on all but at most 2 frame hashes."""
    from uk_procurement_data_pipeline_spark.functions.imagehash import (
        dhash_bands,
    )
    from uk_procurement_data_pipeline_spark.queries.multimodal import (
        _VID_ARCHS,
        _vid_frame_pixels,
    )

    a, b = 4, 4 + 13 * _VID_ARCHS  # same archetype, both % 13 == 4
    assert a % _VID_ARCHS == b % _VID_ARCHS
    nframes = 4 + (a % _VID_ARCHS) % 3
    diff = 0
    for f in range(nframes):
        wa, ha, pa = _vid_frame_pixels(a, f)
        wb, hb, pb = _vid_frame_pixels(b, f)
        assert (wa, ha) == (wb, hb)
        if dhash_bands(pa, wa, ha) != dhash_bands(pb, wb, hb):
            diff += 1
    assert diff <= 2, f"frame-hash diffs must be <= 2, got {diff}"


def test_ivfpq_incremental_uses_distinct_catalog_generation(
    spark, sf_dir, fresh_catalog
):
    """The history-trained index is its OWN catalog generation (train tag
    in the fingerprint): running the all-corpus serving query and the
    incremental-append query must produce two codebook + two codes
    generations, not clobber one another."""
    reg = registry()
    reg["ann_ivfpq_adc_topk"].fn(spark, sf_dir).collect()
    reg["ivfpq_incremental_append"].fn(spark, sf_dir).collect()
    names = sorted(indexes.BUILD_COUNTS)
    books = [n for n in names if n.startswith("ivfpq_codebook__")]
    codes = [n for n in names if n.startswith("ivfpq_codes__")]
    assert len(books) == 2 and len(codes) == 2, names
    assert all(v == 1 for v in indexes.BUILD_COUNTS.values())


def test_ivfpq_incremental_neighbors_are_history_only(spark, sf_dir):
    """Arrival vectors must never surface as neighbors: the stored lists
    were trained before they existed."""
    rows = registry()["ivfpq_incremental_append"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.query_id % 10 == 9
        assert r.neighbor_id % 10 != 9, r


def test_catalog_env_root_is_durable_across_sessions(
    spark, tmp_path, monkeypatch
):
    """The production contract: with SPARK_GRAFT_INDEX_ROOT set to shared
    storage, a generation built by one session is a pure load for every
    later session (simulated here by resetting the module's root cache
    and build counters — the on-disk state is what must carry over)."""
    root = tmp_path / "shared_catalog"
    monkeypatch.setenv("SPARK_GRAFT_INDEX_ROOT", str(root))
    monkeypatch.setattr(indexes, "_ROOT", None)
    monkeypatch.setattr(indexes, "BUILD_COUNTS", {})
    fp = indexes.fingerprint(tables={}, params={"v": "env"})
    indexes.build_or_load(spark, "t_env", fp, lambda: spark.range(4))
    assert indexes.BUILD_COUNTS == {indexes.generation_key("t_env", fp): 1}
    assert (root / indexes.generation_key("t_env", fp) / "_SUCCESS").exists()

    # "next session": fresh module-level state, same env root
    monkeypatch.setattr(indexes, "_ROOT", None)
    monkeypatch.setattr(indexes, "BUILD_COUNTS", {})
    df = indexes.build_or_load(
        spark, "t_env", fp, lambda: (_ for _ in ()).throw(
            AssertionError("builder must not run on a warm shared catalog")
        )
    )
    assert indexes.BUILD_COUNTS == {}
    assert df.count() == 4


def test_bm25_catalog_serves_from_stored_postings(
    spark, sf_dir, fresh_catalog
):
    """The retrieval index is build-once too: a repeat invocation of the
    catalog-served BM25 query must issue zero further builds of the
    postings or the corpus-stats generation."""
    spec = registry()["bm25_index_catalog_topk"]
    first = spec.fn(spark, sf_dir).collect()
    assert sorted(indexes.BUILD_COUNTS.values()) == [1, 1]
    second = spec.fn(spark, sf_dir).collect()
    assert sorted(indexes.BUILD_COUNTS.values()) == [1, 1]
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_bm25_incremental_builds_once_and_is_stable(
    spark, sf_dir, fresh_catalog
):
    """The incremental entry's three stored artifacts (normalized
    postings, per-term df, integer corpus totals) build exactly once;
    a repeat invocation is probe-only and value-identical."""
    spec = registry()["bm25_incremental_append"]
    first = spec.fn(spark, sf_dir).collect()
    assert sorted(indexes.BUILD_COUNTS.values()) == [1, 1, 1], (
        indexes.BUILD_COUNTS
    )
    second = spec.fn(spark, sf_dir).collect()
    assert sorted(indexes.BUILD_COUNTS.values()) == [1, 1, 1]
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_bm25_incremental_layout_is_its_own_generation(
    spark, sf_dir, fresh_catalog
):
    """The normalized incremental layout must not collide with the
    denormalized serving layout of bm25_index_catalog_topk: running both
    yields disjoint catalog generations (different artifact names), and
    no artifact builds twice."""
    reg = registry()
    reg["bm25_index_catalog_topk"].fn(spark, sf_dir).collect()
    reg["bm25_incremental_append"].fn(spark, sf_dir).collect()
    names = sorted(indexes.BUILD_COUNTS)
    inc = [n for n in names if n.startswith("bm25inc_")]
    cat = [n for n in names if n.startswith("bm25_")]
    assert len(inc) == 3 and len(cat) == 2, names
    assert all(v == 1 for v in indexes.BUILD_COUNTS.values())


def test_hll_merge_is_registerwise_max(spark, sf_dir):
    """HLL's defining property: the '__ALL__' sketch must equal the
    register-wise max of the per-day sketches — checked on the scaled
    sums' decomposition: every per-day scaled sum >= the merged one
    (merging can only raise ranks, shrinking 2^(27-m) terms), and the
    merged estimate >= every per-day estimate on this fixture."""
    rows = registry()["hll_register_sketch"].fn(spark, sf_dir).collect()
    by_scope = {r.scope: r for r in rows}
    merged = by_scope.pop("__ALL__")
    assert by_scope, "expected per-day rows"
    for r in by_scope.values():
        assert r.s_scaled >= merged.s_scaled, (r.scope, r.s_scaled)
        assert r.true_distinct <= merged.true_distinct
    # estimate quality: within 25% of truth at every scope (m=64 gives
    # ~13% standard error; 25% bounds the fixture without flakiness)
    for r in rows:
        assert abs(r.est_distinct - r.true_distinct) <= max(
            0.25 * r.true_distinct, 8
        ), (r.scope, r.est_distinct, r.true_distinct)


def test_modularity_is_bounded_and_consistent(spark, sf_dir):
    """Q is bounded in [-0.5, 1] by construction; per-community scaled
    contributions must be consistent with the emitted integers."""
    rows = registry()["modularity_communities"].fn(spark, sf_dir).collect()
    assert rows
    q = rows[0].q_micro / 1e6
    assert -0.5 <= q <= 1.0, q
    for r in rows:
        assert r.q_micro == rows[0].q_micro  # constant column
        assert r.in_edges >= 0 and r.degree_sum >= r.in_edges
        # contrib_scaled = two_m*in_edges - degree_sum^2 with two_m
        # unknown here, but its sign pattern is pinned: a community
        # whose in_edges is 0 must contribute negatively.
        if r.in_edges == 0:
            assert r.contrib_scaled < 0


def test_audio_islands_respect_window_counts(spark, sf_dir):
    """Per-clip island geometry must be internally consistent: islands
    cover exactly n_low windows, the longest run fits inside n_low, and
    trim boundaries sit inside [0, n_windows) or are the -1 sentinel."""
    rows = registry()["audio_silence_islands"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_low <= r.n_windows
        assert r.longest_low_run <= r.n_low
        if r.n_islands:
            assert r.longest_low_run >= 1
            # islands partition the low windows into >= n_islands runs
            assert r.n_islands <= r.n_low
            assert r.longest_low_run + (r.n_islands - 1) <= r.n_low + (
                r.n_islands - 1
            )
        else:
            assert r.n_low == 0 and r.longest_low_run == 0
        if r.n_low < r.n_windows:
            assert 0 <= r.first_active <= r.last_active < r.n_windows
        else:
            assert r.first_active == -1 and r.last_active == -1


def test_kneser_ney_discount_mass_conservation(spark, sf_dir):
    """For every emitted bigram, the smoothed probability must exceed
    the pure discounted MLE term (the continuation mass is strictly
    positive) and stay <= 1; and the KN backoff must use CONTINUATION
    counts: n1b <= c1-ish raw frequency is not required, but n1b >= 1
    and n1f >= 1 always."""
    rows = registry()["kneser_ney_bigram_probs"].fn(spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.c12 >= 1 and r.c1 >= r.c12
        assert r.n1f >= 1 and r.n1b >= 1
        mle_disc = (r.c12 - 0.75) / r.c1
        p = r.p_kn_nano / 1e9
        assert p > mle_disc
        assert p <= 1.0 + 1e-9


def test_snm_window_bounds_candidates(spark, sf_dir):
    """SNM candidate counts are bounded by w*n per pass (each record
    pairs with at most w successors), the union is sub-additive, and
    the intersection is contained in both passes."""
    rows = registry()["sorted_neighborhood_pairs"].fn(spark, sf_dir).collect()
    by = {r["pass"]: r for r in rows}
    assert set(by) == {
        "pass_seg_nation", "pass_bal_band", "union", "intersection"
    }
    from uk_procurement_data_pipeline_spark.queries.dedup import _SNM_W

    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    for p in ("pass_seg_nation", "pass_bal_band"):
        assert 0 < by[p].n_candidates <= _SNM_W * n_cust
        assert 0 <= by[p].n_weak_agree <= by[p].n_candidates
    assert by["union"].n_candidates <= (
        by["pass_seg_nation"].n_candidates + by["pass_bal_band"].n_candidates
    )
    assert by["intersection"].n_candidates <= min(
        by["pass_seg_nation"].n_candidates, by["pass_bal_band"].n_candidates
    )
    # reduction ratio ~1 (linear candidates vs quadratic total)
    assert by["union"].reduction_ratio_micro > 900_000


def test_mrr_eval_consistency(spark, sf_dir):
    """Per-query IR-eval fields must be mutually consistent: rr matches
    1/first_rel_rank, precision@5 numerator <= min(5, n_relevant), and
    a query with relevants has a positive first rank."""
    rows = registry()["mrr_retrieval_eval"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_relevant == 0:
            assert r.first_rel_rank == -1 and r.rr_nano == 0
            assert r.rel_in_top5 == 0
        else:
            assert r.first_rel_rank >= 1
            assert r.rr_nano == round(1e9 / r.first_rel_rank)
            assert 0 <= r.rel_in_top5 <= min(5, r.n_relevant)
            if r.first_rel_rank <= 5:
                assert r.rel_in_top5 >= 1


def test_t_closeness_bounds(spark, sf_dir):
    """EMD is a [0,1] metric under the normalized ordered-distance
    definition; t is the max over classes; the constant column is
    actually constant."""
    rows = registry()["t_closeness_report"].fn(spark, sf_dir).collect()
    assert rows
    t = rows[0].t_micro
    assert t == max(r.emd_micro for r in rows)
    for r in rows:
        assert r.t_micro == t
        assert 0 <= r.emd_micro <= 1_000_000
        assert r.emd_num >= 0 and r.n_g >= 1
