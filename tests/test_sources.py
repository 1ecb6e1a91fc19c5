"""Sources + error/lineage operators (S1/S3, E1/E3/E4, UD1/UD2/UD3, F23):
tolerant CSV, ZIP-of-XML explosion, encoding-fallback decode, fetch retry
policy — the surface the DuckDB oracle cannot see."""

from __future__ import annotations

import zipfile

import pytest

from uk_procurement_data_pipeline_spark.sources.csv_source import (
    CORRUPT_COL,
    file_date_key,
    read_csv_tolerant,
    with_lineage,
)
from uk_procurement_data_pipeline_spark.sources.decode import try_decode_bytes
from uk_procurement_data_pipeline_spark.sources.http_fetch import (
    STATUS_FAILED,
    STATUS_OK,
    _fetch_one,
    fake_transport,
    fetch_json_stage,
)
from uk_procurement_data_pipeline_spark.sources.zip_xml import (
    parse_notice_xml,
    read_zip_members,
)

# --- S1 / E1 / E3: tolerant CSV --------------------------------------------


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    (d / "notices-2024-03-01.csv").write_text(
        "uri,amount\nhttp://a,10\nBADLINE-no-comma-count,x,y,z\nhttp://b,20\n"
    )
    (d / "notices-2024-03-02.csv").write_text("uri,amount\nhttp://c,30\n")
    return d


def test_csv_permissive_captures_malformed_rows(spark, csv_dir):
    df = read_csv_tolerant(spark, str(csv_dir / "*.csv"), "uri string, amount int")
    rows = df.collect()
    assert len(rows) == 4  # bad line kept as a row, not an exception (E1)
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("BADLINE")
    good = sorted(r["amount"] for r in rows if r[CORRUPT_COL] is None)
    assert good == [10, 20, 30]


def test_lineage_and_filename_date_key(spark, csv_dir):
    df = file_date_key(
        with_lineage(
            read_csv_tolerant(spark, str(csv_dir / "*.csv"), "uri string, amount int")
        )
    )
    rows = df.where("uri = 'http://c'").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source_file"].endswith("notices-2024-03-02.csv")  # E4
    assert (r["file_year"], r["file_month"], r["file_day"]) == (2024, 3, 2)  # J4
    # row_index is a true per-file ordinal: 0..n-1 within each file
    per_file: dict[str, list[int]] = {}
    for x in df.collect():
        per_file.setdefault(x["source_file"], []).append(x["row_index"])
    for idxs in per_file.values():
        assert sorted(idxs) == list(range(len(idxs)))


# --- F23 / UD3: encoding fallback ------------------------------------------


def test_try_decode_utf8_first():
    assert try_decode_bytes("héllo".encode()) == ("héllo", "utf-8")


def test_try_decode_latin1_fallback():
    raw = "héllo".encode("latin-1")  # 0xE9 alone is invalid utf-8
    text, enc = try_decode_bytes(raw)
    assert enc == "latin-1" and "h" in text and text == "héllo"


def test_try_decode_none_passthrough():
    assert try_decode_bytes(None) == (None, None)


# --- S3 / UD2 / E1: ZIP-of-XML ---------------------------------------------


@pytest.fixture(scope="module")
def zip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zips")
    with zipfile.ZipFile(d / "notices-1st-March-2024.zip", "w") as z:
        z.writestr(
            "good.xml",
            '<UK7_2023 xmlns="urn:fat:uk2023"><id>n-1</id></UK7_2023>',
        )
        z.writestr("bad.xml", "<unclosed>")
        z.writestr(
            "latin.XML", "<TED_EXPORT><id>caf\xe9</id></TED_EXPORT>".encode("latin-1")
        )
        z.writestr("readme.txt", "not xml")
    return d


def test_zip_members_filter_decode_and_order(spark, zip_dir):
    members = read_zip_members(spark, str(zip_dir / "*.zip")).collect()
    names = [m["member_name"] for m in members]
    assert names == sorted(names)  # O1 lexicographic
    assert "readme.txt" not in names  # P5 suffix filter
    assert {"good.xml", "bad.xml", "latin.XML"} == set(names)  # case-insensitive
    by_name = {m["member_name"]: m for m in members}
    assert by_name["latin.XML"]["encoding_used"] == "latin-1"
    assert by_name["good.xml"]["encoding_used"] == "utf-8"
    assert all(m["read_error"] is None for m in members)


def test_parse_notice_xml_error_rows_not_exceptions(spark, zip_dir):
    parsed = parse_notice_xml(
        read_zip_members(spark, str(zip_dir / "*.zip"))
    ).collect()
    by_name = {p["member_name"]: p for p in parsed}
    good = by_name["good.xml"]
    assert good["root_tag"] == "UK7_2023"  # F27 dispatch input
    assert good["ns_uri"] == "urn:fat:uk2023"  # F24 dynamic ns
    assert good["notice_id"] == "n-1" and good["parse_error"] is None
    bad = by_name["bad.xml"]
    assert bad["notice_id"] is None and bad["parse_error"]  # E1
    assert by_name["latin.XML"]["notice_id"] == "café"
    # lineage survives the whole chain (E4)
    assert all(p["source_zip"].endswith(".zip") for p in parsed)


# --- UD1 / E2: fetch retry policy ------------------------------------------


class _FlakyTransport:
    """Fails twice, then succeeds — picklable only in-process (driver test)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, uri: str) -> str:
        self.calls += 1
        if self.calls < 3:
            raise TimeoutError("flaky")
        return '{"ok": true}'


def test_fetch_retries_then_succeeds():
    t = _FlakyTransport()
    slept = []
    payload, status = _fetch_one("http://x", t, slept.append)
    assert status == STATUS_OK and payload == '{"ok": true}'
    assert t.calls == 3 and slept == [2.0, 2.0]  # ref 2a:32-48 policy


def test_fetch_gives_up_after_three_attempts():
    calls = []

    def always_down(uri: str) -> str:
        calls.append(uri)
        raise ConnectionError("down")

    payload, status = _fetch_one("http://x", always_down, lambda _: None)
    assert (payload, status) == (None, STATUS_FAILED) and len(calls) == 3


def test_invalid_json_counts_as_failure():
    payload, status = _fetch_one("http://x", lambda u: "<html>", lambda _: None)
    assert (payload, status) == (None, STATUS_FAILED)


def test_fetch_stage_statuses_match_fake_transport_contract(spark):
    uris = spark.createDataFrame(
        [(f"https://example.org/api/notice/{i}",) for i in range(200)], "uri string"
    )
    out = fetch_json_stage(uris, transport=fake_transport, sleep=lambda _: None)
    rows = out.collect()
    assert len(rows) == 200
    import hashlib

    for r in rows:
        digest = hashlib.md5(r["uri"].encode()).hexdigest()
        if digest.startswith("0"):
            assert r["status"] == STATUS_FAILED and r["payload"] is None
        else:
            assert r["status"] == STATUS_OK and digest[:12] in r["payload"]
