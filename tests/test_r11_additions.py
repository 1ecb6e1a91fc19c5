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
