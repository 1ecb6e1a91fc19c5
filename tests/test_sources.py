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
from uk_procurement_data_pipeline_spark.sources.zipxml_datasource import (
    ZipXmlDataSource,
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


def test_zipxml_datasource_matches_mapinpandas_source(spark, zip_dir, tmp_path):
    """The Spark-4 Python DataSource packaging must produce the same rows
    as the binaryFile+mapInPandas form (source_zip differs only by URI
    scheme), one partition per zip, and the same bad-zip error-row
    semantics."""
    spark.dataSource.register(ZipXmlDataSource)
    ds = spark.read.format("zipxml").load(str(zip_dir / "*.zip"))
    via_mp = read_zip_members(spark, str(zip_dir / "*.zip"))

    def key(rows):
        return sorted(
            (r["member_name"], r["xml_text"], r["encoding_used"], r["read_error"])
            for r in rows
        )

    assert key(ds.collect()) == key(via_mp.collect())
    # partition planning: one input partition per zip file
    assert ds.rdd.getNumPartitions() == 1

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "corrupt.zip").write_bytes(b"PK\x03\x04 not a real zip")
    rows = spark.read.format("zipxml").load(str(bad / "*.zip")).collect()
    assert len(rows) == 1
    assert rows[0]["read_error"].startswith("bad zip:")
    assert rows[0]["member_name"] is None


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


# --- S2: jar-free .xlsx scan (sources/excel.py) -----------------------------

_XLSX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_XLSX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def write_minimal_xlsx(path, rows):
    """Test tooling: emit a minimal-but-valid .xlsx (ZIP of SpreadsheetML).
    str cells go through sharedStrings (t="s"), int/float cells inline as
    numbers — the same two cell forms the reference's daily files use."""
    shared, sidx = [], {}
    body = []
    for rn, row in enumerate(rows, start=1):
        cells = []
        for cn, v in enumerate(row):
            ref = f"{_col_letter(cn)}{rn}"
            if v is None:
                continue
            if isinstance(v, str):
                if v not in sidx:
                    sidx[v] = len(shared)
                    shared.append(v)
                cells.append(f'<c r="{ref}" t="s"><v>{sidx[v]}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        body.append(f'<row r="{rn}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CT)
        zf.writestr("_rels/.rels", _XLSX_RELS)
        zf.writestr("xl/workbook.xml", _XLSX_WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


@pytest.fixture(scope="module")
def xlsx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xlsx")
    write_minimal_xlsx(
        d / "daily-2024-03-01.xlsx",
        [
            ["notice_uri", "title", "amount"],
            ["http://n/1", "Road works", 100],
            ["http://n/2", "IT services", 250.5],
        ],
    )
    write_minimal_xlsx(
        d / "daily-2024-03-02.xlsx",
        [
            ["notice_uri", "title", "amount"],
            ["http://n/3", "Catering", 75],
        ],
    )
    (d / "corrupt.xlsx").write_bytes(b"PK\x03\x04 this is not a zip")
    return d


def test_xlsx_stdlib_scan_merges_daily_files_with_lineage(spark, xlsx_dir):
    from uk_procurement_data_pipeline_spark.sources.excel import (
        read_excel_stdlib,
    )

    df = read_excel_stdlib(
        spark,
        str(xlsx_dir / "daily-*.xlsx"),
        ["notice_uri", "amount", "not_a_header"],
    )
    rows = sorted(df.collect(), key=lambda r: r["notice_uri"])
    assert [r["notice_uri"] for r in rows] == [
        "http://n/1",
        "http://n/2",
        "http://n/3",
    ]
    assert [r["amount"] for r in rows] == ["100", "250.5", "75"]
    # requested-but-absent header -> null column (declared projection)
    assert all(r["not_a_header"] is None for r in rows)
    assert all(r["parse_error"] is None for r in rows)
    # per-file lineage, mergeable with file_date_key (J4)
    assert rows[0]["source_file"].endswith("daily-2024-03-01.xlsx")
    assert rows[2]["source_file"].endswith("daily-2024-03-02.xlsx")


def test_xlsx_corrupt_workbook_becomes_error_row(spark, xlsx_dir):
    from uk_procurement_data_pipeline_spark.sources.excel import (
        read_excel_stdlib,
    )

    df = read_excel_stdlib(spark, str(xlsx_dir / "corrupt.xlsx"), ["notice_uri"])
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["parse_error"] is not None  # E3: flagged, not thrown
    assert rows[0]["notice_uri"] is None


def test_read_excel_falls_back_to_stdlib_without_connector(spark, xlsx_dir):
    from uk_procurement_data_pipeline_spark.sources.csv_source import read_excel

    df = read_excel(
        spark, str(xlsx_dir / "daily-2024-03-01.xlsx"), columns=["title"]
    )
    titles = sorted(r["title"] for r in df.collect())
    assert titles == ["IT services", "Road works"]


def test_read_excel_without_columns_still_fails_fast(spark, xlsx_dir):
    from uk_procurement_data_pipeline_spark.sources.csv_source import read_excel

    with pytest.raises(NotImplementedError):
        read_excel(spark, str(xlsx_dir / "daily-2024-03-01.xlsx"))


def test_parse_xlsx_inline_bool_and_richtext_cells():
    import io as _io

    from uk_procurement_data_pipeline_spark.sources.excel import parse_xlsx_rows

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>inline</t></is></c>'
        '<c r="B1" t="b"><v>1</v></c>'
        '<c r="C1" t="s"><v>0</v></c>'
        "</row></sheetData></worksheet>"
    )
    sst = (
        f'<sst xmlns="{ns}"><si><r><t>rich </t></r><r><t>text</t></r></si></sst>'
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", sst)
    rows = parse_xlsx_rows(buf.getvalue())
    assert rows == [["inline", "TRUE", "rich text"]]


def test_xlsx_parser_roundtrip_property():
    """Property: any grid of text/int/float/empty cells written by the
    minimal writer parses back cell-for-cell (numbers as their literal
    text, gaps as None) — pinning the cell-reference arithmetic, shared-
    string indexing, and sparse-row handling against random shapes."""
    from hypothesis import given, settings, strategies as st

    from uk_procurement_data_pipeline_spark.sources.excel import parse_xlsx_rows

    cell = st.one_of(
        st.none(),
        st.integers(min_value=-(10**9), max_value=10**9),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
            ),
            min_size=0,
            max_size=12,
        ),
    )
    grid = st.lists(
        st.lists(cell, min_size=1, max_size=8), min_size=1, max_size=6
    )

    @settings(max_examples=60, deadline=None)
    @given(grid)
    def check(rows):
        import io as _io

        buf = _io.BytesIO()
        write_minimal_xlsx(buf, rows)
        parsed = parse_xlsx_rows(buf.getvalue())
        assert len(parsed) == len(rows)
        for want, got in zip(rows, parsed):
            # writer skips None cells entirely -> trailing gaps collapse;
            # compare against the written prefix shape
            padded = list(got) + [None] * (len(want) - len(got))
            for w, g in zip(want, padded):
                if w is None:
                    assert g is None
                elif isinstance(w, str):
                    assert g == w
                else:
                    assert g == str(w)

    check()


def test_parse_xlsx_out_of_order_cell_refs_land_in_right_columns():
    import io as _io

    from uk_procurement_data_pipeline_spark.sources.excel import parse_xlsx_rows

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    # B1 serialized before A1 — append-with-padding would shift A1 to col C
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1">'
        '<c r="B1" t="inlineStr"><is><t>bee</t></is></c>'
        '<c r="A1" t="inlineStr"><is><t>ay</t></is></c>'
        "</row></sheetData></worksheet>"
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert parse_xlsx_rows(buf.getvalue()) == [["ay", "bee"]]


def test_parse_xlsx_reads_first_sheet_by_tab_order_not_member_name():
    import io as _io

    from uk_procurement_data_pipeline_spark.sources.excel import parse_xlsx_rows

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def sheet_xml(text):
        return (
            f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
            f'<c r="A1" t="inlineStr"><is><t>{text}</t></is></c>'
            "</row></sheetData></worksheet>"
        )

    # tab order puts the DATA sheet (stored as sheet2.xml) first
    wb = (
        f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        '<sheet name="Data" sheetId="2" r:id="rId2"/>'
        '<sheet name="Notes" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml("notes"))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml("data"))
    assert parse_xlsx_rows(buf.getvalue()) == [["data"]]
