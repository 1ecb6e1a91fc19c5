"""Sinks + observability (S6/S7/S8, E5): write/read round-trips, partition
pruning on read-back, header handling, executor-side binary writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.sources.sinks import (
    observed_count,
    read_orc,
    write_binary_files,
    write_csv_merged,
    write_partitioned_orc,
    write_partitioned_parquet,
)


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned_parquet(orders, out, ["year"])

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.where("year = 1995")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning must reach the scan: only the 1995 directory is read
    assert "PartitionFilters" in plan and "1995" in plan
    assert pruned.count() == orders.where("year = 1995").count()


def test_partitioned_orc_roundtrip_pruning_and_pushdown(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year_orc")
    write_partitioned_orc(orders, out, ["year"])

    back = read_orc(spark, out)
    assert back.count() == orders.count()
    # values survive the format round-trip, not just counts
    a = sorted(r.o_orderkey for r in back.where("year = 1995").collect())
    b = sorted(r.o_orderkey for r in orders.where("year = 1995").collect())
    assert a == b

    pruned = back.where("year = 1995").where("o_totalprice > 1000.0")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1995" in plan
    # the value predicate must reach the ORC scan, like parquet
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_partitioned_write_is_one_dir_per_key(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    out = tmp_path / "py"
    write_partitioned_parquet(orders, str(out), ["year"])
    years = {d.name for d in out.iterdir() if d.name.startswith("year=")}
    expect = {
        f"year={r['year']}" for r in orders.select("year").distinct().collect()
    }
    assert years == expect


def test_csv_merged_single_file_single_header(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    out = tmp_path / "merged"
    write_csv_merged(df, str(out))
    parts = list(out.glob("part-*.csv"))
    assert len(parts) == 1  # S8: one merged file
    lines = parts[0].read_text().strip().splitlines()
    assert lines[0] == "id,name" and len(lines) == 3  # header once


def test_binary_file_sink_writes_payload_bytes(spark, tmp_path):
    rows = [("2024/03/a.bin", bytearray(b"\x00\x01")), ("2024/03/b.bin", bytearray(b"xyz"))]
    df = spark.createDataFrame(rows, "name string, payload binary")
    out = tmp_path / "landing"
    write_binary_files(df, str(out), "name", "payload")
    assert (out / "2024/03/a.bin").read_bytes() == b"\x00\x01"
    assert (out / "2024/03/b.bin").read_bytes() == b"xyz"


def test_delta_sink_is_an_explicit_gate(spark, tmp_path):
    import pytest

    from uk_procurement_data_pipeline_spark.sources.sinks import write_delta

    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        write_delta(df, str(tmp_path / "d"))


def test_observed_count_metric(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    observed, obs = observed_count(df, "ingest")
    n = observed.count()
    assert obs.get["n_rows"] == n > 0  # E5: metric matches the action


def test_binary_file_sink_rejects_path_escapes(spark, tmp_path):
    rows = [
        ("ok/safe.bin", bytearray(b"ok")),
        ("../escape.bin", bytearray(b"no")),
        ("/abs/escape.bin", bytearray(b"no")),
        ("a/../../deep.bin", bytearray(b"no")),
    ]
    df = spark.createDataFrame(rows, "name string, payload binary")
    out = tmp_path / "zone"
    bad = write_binary_files(df, str(out), "name", "payload")
    assert (out / "ok/safe.bin").read_bytes() == b"ok"
    rejected = {r["name"] for r in bad.collect()}
    assert rejected == {"../escape.bin", "/abs/escape.bin", "a/../../deep.bin"}
    # nothing escaped the zone
    assert not (tmp_path / "escape.bin").exists()
    assert not (tmp_path / "deep.bin").exists()
    written = {p.relative_to(out).as_posix() for p in out.rglob("*") if p.is_file()}
    assert written == {"ok/safe.bin"}


def test_compact_parquet_reduces_files_losslessly(spark, sf_dir, tmp_path):
    """Compaction: many small files -> ceil(bytes/target) files, identical
    rows, and the sizing math never runs a Spark job over the data."""
    from uk_procurement_data_pipeline_spark.catalog import load
    from uk_procurement_data_pipeline_spark.sources.sinks import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(16).write.parquet(src)  # simulate incremental litter
    n_small = len(list((tmp_path / "small").glob("*.parquet")))
    assert n_small >= 16

    n_files = compact_parquet(spark, src, dst, target_file_bytes=1 << 20)
    n_out = len(list((tmp_path / "compacted").glob("*.parquet")))
    assert n_out == n_files < n_small

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_clustered_parquet_layout_enables_stats_skipping(spark, sf_dir, tmp_path):
    """write_clustered_parquet: files cover disjoint key ranges with sorted
    row groups, so footer min/max stats alone answer a range predicate."""
    import pyarrow.parquet as pq

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        write_clustered_parquet,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = tmp_path / "li_clustered"
    write_clustered_parquet(li, str(out), "l_shipdate", n_files=4)

    files = sorted(out.glob("part-*.parquet"))
    assert len(files) == 4

    spans = []
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))

    # contiguous, pairwise non-overlapping ranges across files — the layout
    # property that lets a reader skip 3 of 4 files on stats alone
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo

    # a range predicate inside one file's span matches that single file
    lo, hi = spans[1]
    probe = li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi))
    hits = [s for s in spans if not (s[1] < lo or s[0] > hi)]
    assert len(hits) <= 2  # boundary row groups at worst
    back = spark.read.parquet(str(out)).where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi)
    )
    assert back.count() == probe.count()


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering: sorting by the Morton key keeps BOTH dimensions
    locally bounded per file, where single-key clustering leaves the second
    dimension spanning ~the full range in every file."""
    import pyarrow.parquet as pq

    from uk_procurement_data_pipeline_spark.functions.zorder import (
        int_rank,
        interleave_bits,
    )
    from uk_procurement_data_pipeline_spark.sources.sinks import (
        write_clustered_parquet,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo_k, hi_k, lo_p, hi_p = li.select(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    z = li.withColumn(
        "zkey",
        interleave_bits(
            int_rank(F.col("l_orderkey"), lo_k, hi_k),
            int_rank(F.col("l_partkey"), lo_p, hi_p),
        ),
    )

    def spans(path, col):
        """Per-file (min, max) of col, normalized to global-range fraction."""
        out = []
        for f in sorted(path.glob("part-*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index(col)
            st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in st), max(s.max for s in st)))
        return out

    n_files = 8
    zdir = tmp_path / "zorder"
    write_clustered_parquet(z, str(zdir), "zkey", n_files=n_files)
    onedir = tmp_path / "onekey"
    write_clustered_parquet(z, str(onedir), "l_orderkey", n_files=n_files)

    def avg_span_frac(path, col, lo, hi):
        ss = spans(path, col)
        return sum((b - a) / (hi - lo) for a, b in ss) / len(ss)

    # single-key layout: orderkey tight, partkey unbounded per file
    assert avg_span_frac(onedir, "l_orderkey", lo_k, hi_k) < 0.3
    assert avg_span_frac(onedir, "l_partkey", lo_p, hi_p) > 0.8
    # z-order: BOTH dimensions bounded below the unclustered 1.0
    zk = avg_span_frac(zdir, "l_orderkey", lo_k, hi_k)
    zp = avg_span_frac(zdir, "l_partkey", lo_p, hi_p)
    assert zk < 0.7 and zp < 0.7, (zk, zp)


def test_dynamic_partition_overwrite(spark, tmp_path):
    """S7 addendum: partitionOverwriteMode=dynamic must replace ONLY the
    partitions present in the incoming write, leaving siblings intact —
    static overwrite (the default) would truncate the whole table. This
    is the idempotent-backfill write pattern at 100 TB: re-running one
    day's job rewrites that day's partition alone."""
    out = str(tmp_path / "dynpart")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10)], ["p", "v"]
    ).write.partitionBy("p").mode("overwrite").parquet(out)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame([("a", 99)], ["p", "v"]).write.partitionBy(
            "p"
        ).mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    got = {
        (r["p"], r["v"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {("a", 99), ("b", 10)}


# --- ACID snapshot table (Delta-equivalent semantics over plain parquet) ---


def _acid_rows(spark, table, version=None):
    from uk_procurement_data_pipeline_spark.sources.sinks import acid_read

    return {
        (r["k"], r["val"]) for r in acid_read(spark, table, version).collect()
    }


def test_acid_upsert_time_travel_and_idempotency(spark, tmp_path):
    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_create,
        acid_latest_version,
        acid_merge_upsert,
    )

    table = str(tmp_path / "acid_table")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, val string"
    )
    assert acid_create(base, table, key_cols=["k"], n_buckets=8) == 1

    # MERGE: update 3 existing keys, insert 2 new ones
    upd = spark.createDataFrame(
        [(1, "UPD"), (2, "UPD"), (3, "UPD"), (100, "NEW"), (101, "NEW")],
        "k int, val string",
    )
    v2 = acid_merge_upsert(spark, table, upd, app_id="job-a", txn_version=1)
    assert v2 == 2

    now = _acid_rows(spark, table)
    assert len(now) == 102
    assert (1, "UPD") in now and (100, "NEW") in now and (1, "v1") not in now
    assert (50, "v50") in now  # untouched keys survive

    # time travel: v1 is still bit-identical after the merge
    v1_rows = _acid_rows(spark, table, version=1)
    assert len(v1_rows) == 100 and (1, "v1") in v1_rows and (100, "NEW") not in v1_rows

    # idempotency: replaying the same (app_id, txn_version) is a no-op
    assert acid_merge_upsert(spark, table, upd, app_id="job-a", txn_version=1) == 2
    assert acid_latest_version(table) == 2
    assert _acid_rows(spark, table) == now

    # a NEW txn_version from the same app does apply
    upd2 = spark.createDataFrame([(1, "UPD2")], "k int, val string")
    assert acid_merge_upsert(spark, table, upd2, app_id="job-a", txn_version=2) == 3
    assert (1, "UPD2") in _acid_rows(spark, table)


def test_acid_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """File-granularity copy-on-write: buckets without updated keys must
    carry over into the new manifest BY REFERENCE (same data dir), not be
    rewritten — that's the O(touched) merge cost story at 100 TB."""
    import json
    from pathlib import Path

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_create,
        acid_merge_upsert,
    )

    table = str(tmp_path / "acid_buckets")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k int, val string"
    )
    acid_create(base, table, key_cols=["k"], n_buckets=8)
    upd = spark.createDataFrame([(7, "UPD")], "k int, val string")
    acid_merge_upsert(spark, table, upd)

    m1 = json.loads((Path(table) / "_snapshots" / "v00001.json").read_text())
    m2 = json.loads((Path(table) / "_snapshots" / "v00002.json").read_text())
    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m2["buckets"][b]]
    assert len(changed) == 1  # exactly the bucket containing key 7
    carried = [b for b in m1["buckets"] if m1["buckets"][b] == m2["buckets"][b]]
    assert len(carried) == len(m1["buckets"]) - 1


def test_acid_vacuum_retention(spark, tmp_path):
    """Vacuum drops expired manifests and ONLY data dirs no retained
    snapshot references; retained versions stay fully readable."""
    import json
    from pathlib import Path

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_create,
        acid_merge_upsert,
        acid_read,
        acid_vacuum,
    )

    table = str(tmp_path / "acid_vac")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k int, val string"
    )
    acid_create(base, table, key_cols=["k"], n_buckets=4)
    acid_merge_upsert(
        spark, table, spark.createDataFrame([(1, "A")], "k int, val string")
    )
    acid_merge_upsert(
        spark, table, spark.createDataFrame([(1, "B")], "k int, val string")
    )

    m1 = json.loads((Path(table) / "_snapshots" / "v00001.json").read_text())
    b1 = m1["buckets"][
        str(
            spark.createDataFrame([(1,)], "k int")
            .selectExpr("pmod(hash(k), 4) AS b")
            .collect()[0]["b"]
        )
    ]
    removed = acid_vacuum(table, keep_last=2)
    assert "_snapshots/v00001.json" in removed
    assert b1 in removed  # v1's copy of the rewritten bucket is orphaned
    assert not (Path(table) / "_snapshots" / "v00001.json").exists()

    rows = {(r["k"], r["val"]) for r in acid_read(spark, table).collect()}
    assert (1, "B") in rows and len(rows) == 100
    v2 = {(r["k"], r["val"]) for r in acid_read(spark, table, 2).collect()}
    assert (1, "A") in v2 and len(v2) == 100


def test_acid_schema_evolution_and_compact(spark, tmp_path):
    """MERGE with a NEW column evolves the schema (NULL backfill on kept
    rows and untouched buckets via mergeSchema); compaction rewrites all
    buckets into a new byte-identical snapshot whose bucket dirs hold
    one file each."""
    from pathlib import Path

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_compact,
        acid_create,
        acid_merge_upsert,
        acid_read,
    )

    table = str(tmp_path / "acid_evo")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k int, val string"
    )
    acid_create(base, table, key_cols=["k"], n_buckets=4)
    upd = spark.createDataFrame(
        [(1, "UPD", "extra1")], "k int, val string, note string"
    )
    acid_merge_upsert(spark, table, upd)

    cur = acid_read(spark, table)
    assert "note" in cur.columns
    rows = {(r["k"], r["val"], r["note"]) for r in cur.collect()}
    assert (1, "UPD", "extra1") in rows
    assert (2, "v2", None) in rows  # old rows: NULL backfill
    assert cur.count() == 50

    v3 = acid_compact(spark, table)
    compacted = acid_read(spark, table, v3)
    assert {(r["k"], r["val"], r["note"]) for r in compacted.collect()} == rows
    # one data file per bucket after compaction
    for bdir in (Path(table) / "data" / f"txn-{v3:05d}").glob("__bucket=*"):
        assert len(list(bdir.glob("*.parquet"))) == 1
    # pre-compaction version still readable (time travel preserved)
    assert acid_read(spark, table, 2).count() == 50


def test_acid_advice_edges(spark, tmp_path):
    """Three r06-advice edge cases: (a) an empty snapshot created via
    acid_create(df.limit(0)) is time-travel-readable (schema recorded in
    the manifest), (b) a dup-keyed update batch is rejected up front
    (Delta MERGE's multiple-source-match contract), (c) vacuum with a
    LARGER keep_last after a smaller one skips already-deleted manifests
    instead of raising FileNotFoundError."""
    import pytest

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_create,
        acid_merge_upsert,
        acid_read,
        acid_vacuum,
    )

    table = str(tmp_path / "acid_edges")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, val string"
    )
    # (a) empty v1, then rows merged on top
    acid_create(base.limit(0), table, key_cols=["k"], n_buckets=4)
    v1 = acid_read(spark, table, 1)
    assert v1.count() == 0
    assert v1.schema == base.schema
    acid_merge_upsert(spark, table, base)
    assert acid_read(spark, table).count() == 20

    # (b) duplicate keys in one update batch must be rejected loudly
    dup = spark.createDataFrame(
        [(1, "A"), (1, "B")], "k int, val string"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        acid_merge_upsert(spark, table, dup)

    # (c) vacuum(1) deletes old manifests; vacuum(5) spanning them is ok
    for i in range(3):
        acid_merge_upsert(
            spark,
            table,
            spark.createDataFrame([(i, f"u{i}")], "k int, val string"),
        )
    acid_vacuum(table, keep_last=1)
    removed_again = acid_vacuum(table, keep_last=5)
    assert removed_again == []  # nothing left to drop, and no crash
    assert acid_read(spark, table).count() == 20


def test_daily_xlsx_sink_roundtrips_through_engine_reader(spark, tmp_path):
    """S7 fidelity (r12, VERDICT r11 item 5): the reference WRITES daily
    .xlsx workbooks; the engine's jar-free writer must produce files the
    engine's OWN jar-free reader parses back value-identically — one
    workbook per day, special XML chars and nulls intact."""
    from uk_procurement_data_pipeline_spark.sources.excel import (
        read_excel_stdlib,
        write_daily_xlsx,
    )

    rows = [
        ("2024-01-01", "alpha <&> \"q\"", "1"),
        ("2024-01-01", "beta", None),
        ("2024-01-02", "gamma & delta", "3.5"),
    ]
    df = spark.createDataFrame(rows, "day string, name string, value string")
    out = tmp_path / "daily"
    write_daily_xlsx(df, str(out), day_col="day")
    files = sorted(p.name for p in out.iterdir())
    assert files == ["2024-01-01.xlsx", "2024-01-02.xlsx"]

    back = read_excel_stdlib(
        spark, str(out / "*.xlsx"), ["name", "value"]
    ).collect()
    assert all(r.parse_error is None for r in back)
    got = sorted(
        (r.source_file.rsplit("/", 1)[-1].removesuffix(".xlsx"), r.name, r.value)
        for r in back
    )
    assert got == sorted(rows)


def test_daily_xlsx_sink_overwrite_is_byte_deterministic(spark, tmp_path):
    """Re-running the sink on the same data must rewrite byte-identical
    workbooks (fixed zip timestamps + within-day sort) — the idempotent
    daily-overwrite contract of the reference's to_excel loop."""
    from uk_procurement_data_pipeline_spark.sources.excel import (
        write_daily_xlsx,
    )

    df = spark.createDataFrame(
        [("d1", "b", "2"), ("d1", "a", "1")], "day string, k string, v string"
    )
    out = tmp_path / "daily"
    write_daily_xlsx(df, str(out), day_col="day")
    first = (out / "d1.xlsx").read_bytes()
    # reversed input order — the sink's within-day sort must normalize it
    df2 = spark.createDataFrame(
        [("d1", "a", "1"), ("d1", "b", "2")], "day string, k string, v string"
    )
    write_daily_xlsx(df2, str(out), day_col="day")
    assert (out / "d1.xlsx").read_bytes() == first


def test_daily_xlsx_sink_rejects_path_escaping_days(spark, tmp_path):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from uk_procurement_data_pipeline_spark.sources.excel import (
        write_daily_xlsx,
    )

    df = spark.createDataFrame(
        [("../evil", "x")], "day string, v string"
    )
    with _pytest.raises(Py4JJavaError, match="escapes the sink dir"):
        write_daily_xlsx(df, str(tmp_path / "zone"), day_col="day")


def test_xlsx_writer_rejects_non_string_cells():
    import pytest as _pytest

    from uk_procurement_data_pipeline_spark.sources.excel import (
        write_xlsx_bytes,
    )

    with _pytest.raises(TypeError, match="not str"):
        write_xlsx_bytes(["a"], [[1]])  # type: ignore[list-item]
