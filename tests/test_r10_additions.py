"""Round-10 pins: the OPQ permutation layout and the navigable-graph
beam search (the r10 serving/IR depth ops), plus the int64-safe
sessionizer concat from ADVICE r09.

The oracle already proves end-to-end value equality at three SFs; these
tests pin the STRUCTURAL invariants a hash compare can't articulate —
the permutation really is a permutation, the allocation really is
balanced, the beam really is a beam — so a future refactor that keeps
outputs accidentally stable still can't silently break the design.
"""

from __future__ import annotations

import numpy as np

from uk_procurement_data_pipeline_spark.queries import registry


def test_opq_allocation_is_a_balanced_permutation(spark, sf_dir):
    """Re-derive the dimension allocation exactly as the query does and
    assert: 64 dims covered once each, 16 per subspace, and the snake
    deal puts the top-4-variance dims in 4 DISTINCT subspaces."""
    from pyspark.sql import functions as F

    from uk_procurement_data_pipeline_spark.catalog import load
    from uk_procurement_data_pipeline_spark.functions.exact import exact_sum

    e = load(spark, sf_dir, "embeddings")
    dims = spark.range(1, 65).select(F.col("id").cast("int").alias("dim"))
    vals = e.crossJoin(F.broadcast(dims)).selectExpr(
        "dim", "CAST(element_at(embedding, dim) AS DOUBLE) AS x"
    )
    stats = (
        vals.groupBy("dim")
        .agg(
            exact_sum("x", "s1"),
            exact_sum(F.expr("x * x"), "s2"),
            F.count("x").cast("double").alias("n"),
        )
        .collect()
    )
    ranked = sorted(
        stats, key=lambda r: (-(r["s2"] * r["n"] - r["s1"] * r["s1"]), r["dim"])
    )
    alloc: dict[int, list[int]] = {m: [] for m in range(4)}
    for i, row in enumerate(ranked):
        p = i % 8
        alloc[p if p < 4 else 7 - p].append(row["dim"])
    assert sorted(d for ds in alloc.values() for d in ds) == list(range(1, 65))
    assert all(len(ds) == 16 for ds in alloc.values())
    top4_spaces = {m for m, ds in alloc.items() if ds[0] in
                   [r["dim"] for r in ranked[:4]]}
    assert len(top4_spaces) == 4  # snake spreads the top dims


def test_opq_output_shape_and_population(spark, sf_dir):
    out = registry()["opq_variance_balanced_pq"].fn(spark, sf_dir).collect()
    assert len(out) == 16  # 4 subspaces x 4 codes
    assert {r["subspace"] for r in out} == {0, 1, 2, 3}
    n_vecs = sum(r["n_vecs"] for r in out)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert n_vecs == 4 * n  # every vector assigned in every subspace
    assert all(r["mse"] >= 0 for r in out)


def test_graph_ann_beam_is_a_beam(spark, sf_dir):
    """Per query: exactly B ranked rows, d2 nondecreasing in rank, at
    most one hit, and the hit (when present) is the row whose node is
    the true brute-force NN — recomputed independently here in numpy."""
    import pyarrow.parquet as pq

    from uk_procurement_data_pipeline_spark.queries.similarity import _GB_B

    rows = registry()["graph_ann_beam"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    assert by_q and all(qid % 100 == 7 for qid in by_q)
    for qid, beam in by_q.items():
        beam.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in beam] == list(range(1, _GB_B + 1))
        d2s = [r["d2"] for r in beam]
        assert d2s == sorted(d2s)
        assert sum(r["hit"] for r in beam) <= 1
        qv = vecs[ids == qid][0]
        d2 = ((vecs - qv) ** 2).sum(axis=1)
        d2[ids == qid] = np.inf
        true_nn = ids[np.lexsort((ids, d2))][0]
        for r in beam:
            assert r["hit"] == (1 if r["node_id"] == true_nn else 0)


def _blocked_undirected_graph(ids, vecs):
    """Independent numpy recomputation of the r11 BLOCKED graph build:
    first-K coarse cells, P postings per vector, cell-local candidates,
    per-src top-M by (d2, dst), then symmetrized."""
    from uk_procurement_data_pipeline_spark.queries.similarity import (
        _GB_M,
        _GB_P,
        _gb_k,
    )

    k_cells = _gb_k(len(ids))
    cent = vecs[np.argsort(ids)][:k_cells]  # vec_id < K in id order
    cd2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    postings: dict[int, list[int]] = {}
    for i in range(len(ids)):
        order = np.lexsort((np.arange(k_cells), cd2[i]))
        for cid in order[:_GB_P]:
            postings.setdefault(int(cid), []).append(i)
    nbrs: dict[int, set[int]] = {int(v): set() for v in ids}
    cand: dict[int, set[int]] = {i: set() for i in range(len(ids))}
    for members in postings.values():
        for i in members:
            cand[i].update(m for m in members if m != i)
    for i, vid in enumerate(ids):
        cs = sorted(cand[i])
        if not cs:
            continue
        d2 = ((vecs[cs] - vecs[i]) ** 2).sum(axis=1)
        order = np.lexsort((ids[cs], d2))
        for j in order[:_GB_M]:
            a, b = int(vid), int(ids[cs[j]])
            nbrs[a].add(b)
            nbrs[b].add(a)  # symmetrized
    return nbrs


def test_graph_ann_beam_nodes_reachable_or_seeded(spark, sf_dir):
    """Every beam member is either an entry seed (vec_id % 23 == 0) or a
    graph-reachable node — i.e. the search never fabricates candidates.
    Reachability here is the loose 4-hop closure over the BLOCKED
    undirected graph from the seed set, recomputed independently in
    numpy with the same cell/posting/top-M semantics."""
    import pyarrow.parquet as pq

    rows = registry()["graph_ann_beam"].fn(spark, sf_dir).collect()
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    nbrs = _blocked_undirected_graph(ids, vecs)
    frontier = {int(v) for v in ids if v % 23 == 0}
    reach = set(frontier)
    for _ in range(4):
        frontier = {d for n in frontier for d in nbrs[n]} - reach
        reach |= frontier
    for r in rows:
        assert r["node_id"] in reach, (r["query_id"], r["node_id"])


def test_graph_ann_beam_recall_sf01(spark):
    """VERDICT r10 item 2's done-bar: recall@beam >= 15/20 at sf0.1 —
    the blocked build + undirected expansion must not regress below the
    bar that earned the HNSW-style label (measured 18/20 at r11)."""
    import pathlib

    import pytest as _pytest

    from tests.conftest import SF01_DIR

    if not pathlib.Path(SF01_DIR).is_dir():
        _pytest.skip(f"sf0.1 fixtures absent at {SF01_DIR}")
    df = registry()["graph_ann_beam"].fn(spark, SF01_DIR)
    per_q = {}
    for r in df.collect():
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + r["hit"]
    assert len(per_q) == 20
    assert sum(per_q.values()) >= 15, per_q


def test_ttl_sessionizer_emits_int64_not_float(spark, sf_dir):
    """ADVICE r09: an empty head/tail list used to promote the numpy
    concat to float64. The schema contract is bigint end-to-end; run the
    TTL stream and assert exact integer microseconds (a float64 path at
    micro scale would still round-trip today, so pin the dtype at the
    source: the emitted values must all be exact multiples of 1 us that
    match the batch oracle recomputation)."""
    from pyspark.sql import functions as F

    df = registry()["stream_session_ttl_close"].fn(spark, sf_dir)
    assert dict(df.dtypes)["start_micro"] == "bigint"
    assert dict(df.dtypes)["end_micro"] == "bigint"
    got = df.agg(
        F.sum("start_micro").alias("s"), F.sum("n_events").alias("n")
    ).collect()[0]
    assert got["n"] > 0 and got["s"] > 0


def test_png_palette_roundtrip_and_errors():
    """Color type 3 (r10): indices filter as 1 byte/pixel, decode expands
    through PLTE to RGB; missing PLTE / out-of-range indices / oversized
    palettes keep the ValueError contract."""
    import pytest

    from uk_procurement_data_pipeline_spark.functions.png import (
        decode_png,
        encode_png,
    )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    w, h = 7, 6  # 6 rows cycle through all five filter types and wrap
    rows = [bytes((x + y) % len(pal) for x in range(w)) for y in range(h)]
    data = encode_png(rows, w, color_type=3, palette=pal)
    gw, gh, ch, got = decode_png(data)
    assert (gw, gh, ch) == (w, h, 3)
    for y, row in enumerate(got):
        for x in range(w):
            assert tuple(row[x * 3 : x * 3 + 3]) == pal[(x + y) % len(pal)]

    with pytest.raises(ValueError, match="palette"):
        encode_png(rows, w, color_type=3)  # no palette
    with pytest.raises(ValueError, match="palette"):
        encode_png(rows, w, color_type=3, palette=pal * 100)  # > 256
    with pytest.raises(ValueError, match="index"):
        encode_png([bytes([9] * w)] * 2, w, color_type=3, palette=pal)
    with pytest.raises(ValueError, match="palette"):
        encode_png([bytes(w)], w, color_type=0, palette=pal)  # wrong ctype
    # strip the PLTE chunk -> decode must refuse
    import struct as _struct

    plte_at = data.index(b"PLTE") - 4

    (plen,) = _struct.unpack(">I", data[plte_at : plte_at + 4])
    stripped = data[:plte_at] + data[plte_at + 12 + plen :]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(stripped)
