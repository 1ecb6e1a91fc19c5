"""Round-11 pins: the image dHash near-dup family and the incremental
MinHash index probe.

The oracle already proves end-to-end value equality at three SFs; these
pin the STRUCTURAL claims a hash compare can't articulate — a 1-bit
image perturbation still pairs while a different image doesn't, and the
incremental probe equals the full rebuild.
"""

from __future__ import annotations

from uk_procurement_data_pipeline_spark.functions.imagehash import (
    dhash_bands,
    hamming,
)
from uk_procurement_data_pipeline_spark.queries import registry


def _flat(w: int, h: int, fn) -> list[int]:
    return [fn(i) % 256 for i in range(w * h)]


def test_dhash_perturbed_image_pairs_different_does_not():
    """VERDICT r10 item 4's done-bar: a 1-pixel-perturbed image stays
    within the Hamming refine threshold AND still shares >= 1 LSH band
    (so the banded join would surface the pair); a structurally
    different image does neither."""
    w, h = 20, 16
    base = _flat(w, h, lambda i: 3 * i + 7)
    # perturb ONE pixel (worst case: a sampled grid cell) — flips at most
    # the two dHash bits that compare against that cell
    pert = list(base)
    pp = (5 * h // 8) * w + (4 * w // 9)  # a cell the 9x8 grid samples
    pert[pp] = (pert[pp] + 40) % 256
    other = _flat(w, h, lambda i: 251 * i * i + 13)

    hb, hp, ho = (
        dhash_bands(px, w, h) for px in (base, pert, other)
    )
    assert hamming(hb, hp) <= 4
    assert any(a == b for a, b in zip(hb, hp)), "must share an LSH band"
    assert hamming(hb, ho) > 4
    # bands: the different image may collide on a band by chance for a
    # specific pattern, but not for this one — pin it so the fixture
    # stays a valid negative control
    assert not any(a == b for a, b in zip(hb, ho))


def test_dhash_band_layout_is_pinned():
    """The DuckDB oracle rebuilds the band ints bit-by-bit; pin the exact
    layout (band = y//2, bit = (y%2)*8 + x) against a hand-computed
    case: a strictly increasing row makes every comparison 1."""
    w, h = 9, 8
    inc = [x for _y in range(h) for x in range(w)]  # each row 0..8
    bands = dhash_bands(inc, w, h)
    assert bands == (0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    dec = [w - x for _y in range(h) for x in range(w)]
    assert dhash_bands(dec, w, h) == (0, 0, 0, 0)


def test_image_dhash_near_dup_pairs_are_same_archetype(spark, sf_dir):
    """Engine-level negative control: every surfaced pair shares an
    archetype (same base pattern) — cross-archetype images must never
    pass the Hamming refine on this fixture."""
    rows = registry()["image_dhash_near_dup"].fn(spark, sf_dir).collect()
    assert rows, "fixture must produce near-dup pairs"
    for r in rows:
        assert r["doc_a"] % 25 == r["doc_b"] % 25, (r["doc_a"], r["doc_b"])
        assert 0 <= r["hamming"] <= 4


def test_minhash_incremental_probe_equals_full_rebuild(spark, sf_dir):
    """VERDICT r10 item 6's done-bar: the stored-index incremental probe
    returns EXACTLY the full-rebuild pairs that touch the new batch —
    banding a doc is independent of every other doc, so nothing may be
    gained or lost by probing instead of rebuilding."""
    from pyspark.sql import functions as F

    inc = (
        registry()["minhash_index_probe_incremental"]
        .fn(spark, sf_dir)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    )
    full = registry()["minhash_near_dup"].fn(spark, sf_dir)
    bucket = (
        "cast(conv(substr(md5(cast({c} AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) % 100 >= 80"
    )
    full_touching = full.where(
        F.expr(bucket.format(c="doc_a")) | F.expr(bucket.format(c="doc_b"))
    ).collect()
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))  # noqa: E731
    assert sorted(map(key, inc)) == sorted(map(key, full_touching))
    assert inc, "fixture must produce incremental pairs"


def test_image_dhash_components_cluster_invariants(spark, sf_dir):
    """Components are consistent with the pair graph: every doc in the
    output appears in >= 1 pair, the component label is the min doc_id
    of its members, exactly one canonical per component, and every
    surfaced pair's endpoints share a component."""
    comp_rows = registry()["image_dhash_components"].fn(spark, sf_dir).collect()
    pair_rows = registry()["image_dhash_near_dup"].fn(spark, sf_dir).collect()
    assert comp_rows and pair_rows
    label = {r["doc_id"]: r["component"] for r in comp_rows}
    by_comp: dict[int, list[int]] = {}
    for r in comp_rows:
        by_comp.setdefault(r["component"], []).append(r["doc_id"])
        assert r["is_canonical"] == (r["doc_id"] == r["component"])
    for c, members in by_comp.items():
        assert c == min(members)
        assert len(members) >= 2
    paired = set()
    for r in pair_rows:
        assert label[r["doc_a"]] == label[r["doc_b"]]
        paired.update((r["doc_a"], r["doc_b"]))
    assert paired == set(label)


def test_ivfpq_neighbors_come_only_from_probed_cells(spark, sf_dir):
    """The IVFADC contract: every returned neighbor must live in one of
    its query's probed coarse cells (shortlist boundedness — the whole
    point of the IVF layer), ranks are 1..5 without gaps per query, and
    ADC distances are nondecreasing in rank."""
    import numpy as np
    import pyarrow.parquet as pq

    from uk_procurement_data_pipeline_spark.queries.similarity import (
        _IVFPQ_CK,
        _IVFPQ_PROBE,
        _IVFPQ_QHI,
        _IVFPQ_QLO,
    )

    rows = registry()["ann_ivfpq_adc_topk"].fn(spark, sf_dir).collect()
    assert rows
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    cents = vecs[:_IVFPQ_CK]

    def cells_of(v, k):
        d2 = ((cents - v) ** 2).sum(axis=1)
        return [int(c) for c in np.lexsort((np.arange(_IVFPQ_CK), d2))[:k]]

    assign = {int(vid): cells_of(vecs[i], 1)[0] for i, vid in enumerate(ids)}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, beam in by_q.items():
        assert _IVFPQ_QLO <= qid < _IVFPQ_QHI
        probed = set(cells_of(vecs[ids == qid][0], _IVFPQ_PROBE))
        beam.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in beam] == list(range(1, len(beam) + 1))
        adcs = [r["adc"] for r in beam]
        assert adcs == sorted(adcs)
        for r in beam:
            assert assign[r["neighbor_id"]] in probed, (
                qid, r["neighbor_id"], assign[r["neighbor_id"]], probed)
