"""End-to-end pipeline integration (the reference's full 1b -> 2b -> 3
flow in one composed Spark job): daily ZIP archives of mixed-dialect XML
notices land via the binary sink, are exploded and parsed by the
zip-of-XML source, flattened through the merged two-dialect from_xml
schema, and merged across days into one partitioned table — with the
reference's error tolerance (corrupt zip -> error row, malformed member
-> parse-error row, neither kills the job) and lineage preserved
end-to-end."""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.sources.sinks import (
    write_binary_files,
    write_partitioned_parquet,
)
from uk_procurement_data_pipeline_spark.sources.zip_xml import (
    parse_notice_xml,
    read_zip_members,
)

_TED = (
    '<TED_EXPORT DOC_ID="{i}-2024"><NOTICE_DATA><NO_DOC_OJS>{i}</NO_DOC_OJS>'
    "</NOTICE_DATA><OBJECT_CONTRACT><TITLE><P>Notice {i}</P></TITLE>"
    "</OBJECT_CONTRACT></TED_EXPORT>"
)
_UKX = (
    "<PACKAGE><NOTICE_DATA><DOC_ID>FTS-{i}</DOC_ID></NOTICE_DATA>"
    "<UK7_2023><id>ocds-{i}</id><tender><title>Notice {i}</title></tender>"
    "</UK7_2023></PACKAGE>"
)


def _daily_zip(day: int, n: int, with_bad_member: bool = False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n):
            nid = day * 100 + i
            xml = (_TED if i % 2 else _UKX).format(i=nid)
            zf.writestr(f"notice_{nid}.xml", xml)
        if with_bad_member:
            zf.writestr(f"broken_{day}.xml", "<unclosed><tag>")
        zf.writestr("manifest.txt", "not xml, filtered by suffix")
    return buf.getvalue()


def test_pipeline_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    merged = tmp_path / "merged"

    # ---- stage 1b: daily downloads into the landing zone (binary sink)
    days = [
        ("day1/daily.zip", _daily_zip(1, 3)),
        ("day2/daily.zip", _daily_zip(2, 2, with_bad_member=True)),
        ("day3/daily.zip", b"this is not a zip archive"),
    ]
    df = spark.createDataFrame(days, "name string, payload binary")
    errors = write_binary_files(df, str(landing), "name", "payload")
    assert errors.count() == 0  # all names are landing-zone-safe

    # ---- stage 2b: explode zip members, parse, dispatch
    members = read_zip_members(spark, str(landing / "day*" / "*.zip"))
    rows = members.collect()
    # corrupt zip -> exactly one error row, job alive (E3)
    bad_zip = [r for r in rows if r["read_error"] is not None]
    assert len(bad_zip) == 1 and "bad zip" in bad_zip[0]["read_error"]
    # suffix filter removed manifest.txt; 3 + 2 good notices + 1 broken member
    assert sum(r["member_name"] is not None for r in rows) == 6

    parsed = parse_notice_xml(members.where("read_error IS NULL"))
    perrs = parsed.where("parse_error IS NOT NULL").collect()
    assert len(perrs) == 1 and perrs[0]["member_name"].startswith("broken_")

    # ---- flatten: the two-dialect contract on the surviving members
    flat = (
        members.where("read_error IS NULL")
        .where("NOT member_name LIKE 'broken%'")
        .selectExpr(
            "source_zip",
            "member_name",
            "regexp_extract(source_zip, 'day([0-9]+)', 1) AS day",
            "xml_text LIKE '%<UK7_2023>%' AS is_ukx",
            # xpath_string yields '' (not NULL) on no match -> nullif probes
            """coalesce(
                 nullif(xpath_string(xml_text, '/TED_EXPORT/@DOC_ID'), ''),
                 nullif(xpath_string(xml_text, '//NOTICE_DATA/DOC_ID'), ''))
               AS doc_id""",
            """coalesce(
                 nullif(xpath_string(xml_text, '//OBJECT_CONTRACT/TITLE/P'), ''),
                 nullif(xpath_string(xml_text, '//tender/title'), ''))
               AS title""",
        )
    )

    # ---- stage 3: merge across days, partitioned by day
    write_partitioned_parquet(flat, str(merged), ["day"])
    out = spark.read.parquet(str(merged))
    assert out.count() == 5
    # partition discovery infers the day directory value as int
    assert sorted(r["day"] for r in out.select("day").distinct().collect()) == [1, 2]
    by_id = {r["doc_id"]: r for r in out.collect()}
    # dialect dispatch held through the whole pipeline
    assert by_id["101-2024"]["is_ukx"] is False
    assert by_id["FTS-100"]["is_ukx"] is True
    assert by_id["FTS-100"]["title"] == "Notice 100"
    assert by_id["101-2024"]["title"] == "Notice 101"
    # lineage columns survived to the merged table
    assert all(r["source_zip"] and r["member_name"] for r in out.collect())

    # partition pruning works on the merged layout
    pruned = spark.read.parquet(str(merged)).where(F.col("day") == "2")
    assert pruned.count() == 2


def test_driver_window_is_exact_registry_prefix():
    """The driver certifies the FIRST ~50 registry entries; the rotation
    policy (README 'Driver correctness window rotation') only works if
    _DRIVER_WINDOW is exactly that prefix — guard against import-order
    drift or a partially-applied rotation."""
    from uk_procurement_data_pipeline_spark.queries import registry
    from uk_procurement_data_pipeline_spark.queries.base import _DRIVER_WINDOW

    names = list(registry())
    assert list(_DRIVER_WINDOW) == names[: len(_DRIVER_WINDOW)]
    # The driver checks the first ~50; the window may EXCEED 50 only when
    # the priority list (never-certified new ops + fingerprint-changed
    # queries, neither of which the rotation may drop) overflows the slot
    # budget — entries past the driver's cut stay fingerprint-flagged and
    # mechanically re-enter every round until certified (r12: 15 new ops
    # + 36 changed = 51).
    assert 50 <= len(_DRIVER_WINDOW) <= 55
    assert len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW)  # no duplicates


def test_driver_window_matches_generator():
    """The committed window must be exactly what
    `tools/regen_coverage.py --window` would emit from the CORRECTNESS
    files that existed AT GENERATION TIME (pinned in _WINDOW_INPUTS) —
    catches hand-edits between the markers without time-bombing the suite
    when the driver drops a new CORRECTNESS file after generation."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "tools"))
    from regen_coverage import compute_window

    from uk_procurement_data_pipeline_spark.queries.base import (
        _DRIVER_WINDOW,
        _WINDOW_CHANGED,
        _WINDOW_INPUTS,
    )

    files = [repo / f for f in _WINDOW_INPUTS]
    missing = [f.name for f in files if not f.exists()]
    assert missing == [], f"_WINDOW_INPUTS references absent files: {missing}"
    assert list(_DRIVER_WINDOW) == compute_window(
        files=files, changed=list(_WINDOW_CHANGED)
    )


def test_changed_green_queries_reenter_window():
    """LIVE enforcement of VERDICT r08 item 2: any driver-green query whose
    code fingerprint (static call closure + oracle, tools/fingerprints.py)
    differs from QUERY_FINGERPRINTS.json RIGHT NOW must already be inside
    the committed driver window. Touch a helper that a certified query
    reaches and this fails until `python tools/regen_coverage.py --window`
    is rerun — a behavior change can no longer ship on a stale green row."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo))
    from tools.fingerprints import changed_queries
    from tools.regen_coverage import _all_checked

    from uk_procurement_data_pipeline_spark.queries.base import _DRIVER_WINDOW

    changed = changed_queries(_all_checked())
    outside = sorted(set(changed) - set(_DRIVER_WINDOW))
    assert outside == [], (
        f"queries changed since driver certification but NOT re-queued in "
        f"the window: {outside} — rerun `python tools/regen_coverage.py "
        f"--window` (and keep QUERY_FINGERPRINTS.json at its certified "
        f"snapshot; do NOT re-snapshot to silence this)"
    )


def test_fingerprint_closure_reaches_helpers():
    """The fingerprint must cover module-level helpers a query reaches
    transitively — the round-8 `_progress_wm_ms` fix changed stream
    behavior without touching any query function, which bare
    function-source hashing would have missed."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo))
    from tools.fingerprints import closure_sources, query_fingerprint

    from uk_procurement_data_pipeline_spark.queries import registry

    reg = registry()
    spec = reg["stream_session_ttl_close"]
    keys = set(closure_sources(spec.fn))
    assert any(k.endswith("._progress_wm_ms") for k in keys), sorted(keys)
    # And the oracle participates: same code + different oracle -> new hash.
    import dataclasses

    mutated = dataclasses.replace(spec, oracle=(spec.oracle or "") + " -- x")
    assert query_fingerprint(mutated) != query_fingerprint(spec)


def test_compute_window_requeues_injected_changed_query():
    """A green query injected as 'changed' must lead the generated window
    even though it already has a driver CORRECTNESS row."""
    import json
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "tools"))
    from regen_coverage import compute_window, correctness_files

    # Pick a long-certified query (green in the earliest artifact).
    first = correctness_files()[0]
    green_name = next(iter(json.loads(first.read_text())))
    window = compute_window(changed=[green_name])
    assert green_name in window
    # It sits in the priority head, before the never-checked backfill.
    from uk_procurement_data_pipeline_spark.queries.base import _ROUND_PRIORITY

    assert window.index(green_name) <= len(_ROUND_PRIORITY)


def test_every_query_has_oracle_or_documented_reason():
    """Every registered query should carry a DuckDB oracle; a rows-only
    entry is a weaker driver check and must be a deliberate choice."""
    from uk_procurement_data_pipeline_spark.queries import registry

    rows_only = [n for n, s in registry().items() if s.oracle is None]
    assert rows_only == []  # currently ALL queries are oracle-backed
