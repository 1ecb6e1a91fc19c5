"""Golden-file tests for the reference pipeline's heart (SURVEY.md §5.2
item 3): miniature OCDS JSON and TED/UK-2023 XML documents under
tests/fixtures/ flattened to pinned expected values. These pin the exact
semantics of the ~110-column flatten (ref 2a:257-643) and the dual-dialect
XML extraction (ref 2b:193-249 / 2b:374-429) where the DuckDB oracle
can't follow (file reads, xpath)."""

from __future__ import annotations

from pyspark.sql import functions as F

# OCDS release schema — the subset of fields the golden doc exercises
OCDS_DDL = """
    ocid string, date string, tag array<string>,
    buyer struct<id string, name string>,
    parties array<struct<id string, name string, roles array<string>,
        address struct<postalCode string, region string, countryName string>>>,
    tender struct<id string, title string, status string,
        value struct<amount double, currency string>,
        documents array<struct<id string, documentType string, url string>>>,
    awards array<struct<id string, status string,
        value struct<amount double, currency string>,
        suppliers array<struct<id string, name string>>,
        items array<struct<id string,
            classification struct<scheme string, id string>,
            deliveryAddresses array<struct<postalCode string, region string>>>>>>
"""


def _release(spark, fixtures_dir):
    raw = spark.read.text(str(fixtures_dir / "ocds_release.json"), wholetext=True)
    return raw.select(F.from_json("value", OCDS_DDL).alias("r"))


def test_ocds_flatten_golden(spark, fixtures_dir):
    flat = _release(spark, fixtures_dir).selectExpr(
        "r.ocid AS ocid",
        # J1 keyed first-match (ref 2a:82-91 find_buyer_party)
        "element_at(filter(r.parties, p -> p.id = r.buyer.id), 1).address.postalCode"
        " AS buyer_postcode",
        # J2 role-membership filter (ref 2a:94-101 find_supplier_parties)
        """array_join(transform(filter(r.parties,
            p -> array_contains(p.roles, 'supplier')), p -> p.name), '|')
            AS suppliers_pipe""",
        # J3 predicate first-match (ref 2a:104-117)
        """element_at(filter(r.tender.documents,
            d -> d.documentType = 'tenderNotice'), 1).url AS tender_notice_url""",
        # F20 two-level flatten + A2 distinct-sorted (ref 2a:360-367)
        """array_join(array_sort(array_distinct(transform(
            flatten(transform(r.awards, a -> flatten(transform(a.items,
                i -> i.deliveryAddresses)))), ad -> ad.postalCode))), ';')
            AS delivery_postcodes""",
        # F17+A1 pipe_join over award suppliers (ref 2a:423-449)
        """array_join(flatten(transform(r.awards,
            a -> transform(a.suppliers, s -> s.id))), '|') AS award_supplier_ids""",
        # A5 flatten+dedupe roles
        """array_join(array_sort(array_distinct(flatten(
            transform(r.parties, p -> p.roles)))), ';') AS all_roles""",
        "r.tender.value.amount AS tender_amount",
        "size(r.awards) AS n_awards",
    )
    row = flat.first()
    assert row["ocid"] == "ocds-b5fd17-001"
    assert row["buyer_postcode"] == "EC1A 1AA"
    assert row["suppliers_pipe"] == "Alpha Ltd|Beta Plc"
    assert row["tender_notice_url"] == "http://x/t"
    assert row["delivery_postcodes"] == "EC1A 1AA;N1 9GU;SE1 7PB"
    assert row["award_supplier_ids"] == "GB-COH-111|GB-COH-222"
    assert row["all_roles"] == "buyer;supplier;tenderer"
    assert row["tender_amount"] == 125000.0
    assert row["n_awards"] == 1


def test_ocds_null_guarded_access(spark, fixtures_dir):
    # P6: parties without an address dot-path to null, not an error
    flat = _release(spark, fixtures_dir).selectExpr(
        "transform(r.parties, p -> p.address.region) AS regions"
    )
    assert flat.first()["regions"] == ["London", None, None, None]


def _xml_df(spark, fixtures_dir, name):
    raw = spark.read.text(str(fixtures_dir / name), wholetext=True)
    return raw.select(F.col("value").alias("xml"))


def test_uk2023_xml_golden(spark, fixtures_dir):
    row = (
        _xml_df(spark, fixtures_dir, "uk2023_notice.xml")
        .selectExpr(
            "xpath_string(xml, '/UK4_2023/id') AS notice_id",
            "xpath_string(xml, '/UK4_2023/NOTICE_TYPE/@CODE') AS form_code",
            "xpath_string(xml, \"/UK4_2023/ORGANISATION[@ROLE='buyer']/NAME\")"
            " AS buyer_name",
            "xpath_string(xml, '//NUTS/@CODE') AS nuts",
            "CAST(xpath_string(xml,"
            " \"//VALUE[@TYPE='ESTIMATED_TOTAL']/text()\") AS BIGINT) AS est_value",
            "CAST(xpath_string(xml, \"//VALUE[@TYPE='AWARDED']/text()\") AS BIGINT)"
            " AS awarded_value",
            "xpath_string(xml, \"//URI_DOC[@LG='EN']/text()\") AS doc_url",
            'regexp_extract(xml, \'xmlns="([^"]+)"\', 1) AS ns_uri',
        )
        .first()
    )
    assert row["notice_id"] == "fat-2024-0042"
    assert row["form_code"] == "UK4"
    assert row["buyer_name"] == "City Council"
    assert row["nuts"] == "UKI3"
    assert row["est_value"] == 125000 and row["awarded_value"] == 120000
    assert row["doc_url"] == "http://example.org/notice/42"
    assert row["ns_uri"] == "urn:fat:uk2023"


def test_ted_xml_golden_and_dialect_union(spark, fixtures_dir):
    # U2: both dialects parse into ONE schema then unionByName
    uk = _xml_df(spark, fixtures_dir, "uk2023_notice.xml").selectExpr(
        "xpath_string(xml, '/UK4_2023/id') AS notice_id",
        "'UK2023' AS dialect",
        "CAST(xpath_string(xml, \"//VALUE[@TYPE='ESTIMATED_TOTAL']/text()\")"
        " AS BIGINT) AS est_value",
        "xpath_string(xml, '//TD_DOCUMENT_TYPE/@CODE') AS td_code",
    )
    ted = _xml_df(spark, fixtures_dir, "ted_notice.xml").selectExpr(
        "xpath_string(xml, '/TED_EXPORT/id') AS notice_id",
        "'TED' AS dialect",
        "CAST(xpath_string(xml, \"//VALUE[@TYPE='ESTIMATED_TOTAL']/text()\")"
        " AS BIGINT) AS est_value",
        "xpath_string(xml, '//TD_DOCUMENT_TYPE/@CODE') AS td_code",
    )
    both = {r["dialect"]: r for r in uk.unionByName(ted).collect()}
    assert both["UK2023"]["notice_id"] == "fat-2024-0042"
    assert both["TED"]["notice_id"] == "ted-123456-2024"
    assert both["TED"]["est_value"] == 90000
    assert both["TED"]["td_code"] == "7"  # F26 attribute extraction
    assert both["UK2023"]["td_code"] == ""  # absent path -> empty string
    # F27 dispatch: root tag decides the parser family
    probe = _xml_df(spark, fixtures_dir, "ted_notice.xml").selectExpr(
        "CASE WHEN xpath_boolean(xml, '/UK4_2023') OR xpath_boolean(xml, '/UK7_2023')"
        " THEN 'UK2023' ELSE 'TED' END AS family"
    )
    assert probe.first()["family"] == "TED"


def test_ocds_flatten_wide_column_contract(spark, sf_dir):
    """Pin the widened flatten's column contract (ref 2a:494-643): width,
    order, and cross-column invariants of the derived fields."""
    from uk_procurement_data_pipeline_spark.queries.ref_pipeline import (
        _FLAT,
        ocds_flatten_wide,
    )

    df = ocds_flatten_wide(spark, sf_dir)
    assert df.columns == [a for a, _ in _FLAT]
    assert len(df.columns) >= 110  # the reference record width

    r = df.orderBy("buyer_id", "ocid").limit(1).collect()[0]
    okey = r["ocid"].removeprefix("ocds-")
    assert r["csv_file"] == f"notices-{r['release_date']}.csv"
    assert r["publishedDate"] == f"{r['release_date']}T00:00:00Z"
    assert r["release_id"] == f"ocds-{okey}-01"
    assert r["tender_id"] == f"t-{okey}"
    assert r["award_id"] == f"award-{okey}" == r["first_award_id"]
    assert r["status"] == "ok"
    assert r["planning_milestone_types"] == "engagement|publication"
    assert r["tender_document_types"] == "tenderNotice|awardNotice"
    assert r["award_document_types"] == "awardNotice|contractSigned"
    assert r["value_amount"] == r["tender_amount"] == r["award_value_amount"]
    assert r["minValue_amount"] == r["value_amount"] * 0.5
    n_sup = r["n_supplier_parties"]
    assert len(r["supplier_party_ids"].split("|")) == n_sup
    assert len(r["award_suppliers_ids"].split("|")) == n_sup
    assert r["supplier_party_ids"] == r["award_suppliers_ids"]
    assert r["buyer_identifier_id"] == str(r["buyer_id"])
    assert r["buyer_roles"] == "buyer"
    assert r["delivery_postalCode"].startswith("PC")
    assert r["tender_notice_url"] == f"http://n/{okey}"
    assert r["award_notice_url"] == f"http://a/{okey}"


# ---------------------------------------------------------------------------
# fat_flatten_wide contract pins (ref 2b:193-249 / 2b:374-429 / 2b:434-446)
# ---------------------------------------------------------------------------

FAT_CONTRACT = [
    "o_orderkey", "schema_type", "form_type", "td_document_type_code",
    "notice_type_group", "doc_id", "edition", "no_doc_ojs", "notice_url",
    "date_pub", "ds_date_dispatch", "award_date", "iso_country", "ti_country",
    "ti_town", "ca_country_code", "ca_town", "ca_postcode", "ca_nuts_code",
    "perf_nuts_code", "ca_ce_nuts_code", "ca_name", "ca_email", "ca_url",
    "original_cpv_code", "cpv_main_code", "additional_cpv_codes", "ti_text",
    "obj_title", "short_descr", "type_contract_ctype", "val_total",
    "val_total_currency", "est_total_val", "est_total_val_currency",
    "proc_total_val", "proc_total_val_currency", "aw_val_total",
    "aw_val_currency", "nb_tenders", "nc_contract_nature_code",
    "pr_proc_code", "ac_award_crit_code", "ma_main_activities_code",
    "rp_regulation_code", "contractor_names",
]


def test_fat_flatten_contract(spark, sf_dir):
    """The unified find_a_tender record: exact column contract (order and
    names, ref 2b:193-249), dialect dispatch, and per-dialect null shape."""
    from uk_procurement_data_pipeline_spark.queries.xml_notices import (
        fat_flatten_wide,
    )

    df = fat_flatten_wide(spark, sf_dir)
    assert df.columns == FAT_CONTRACT
    rows = {r["o_orderkey"]: r for r in df.collect()}
    assert rows, "fixture filter yielded no rows"

    for k, r in rows.items():
        if k % 3 == 2:  # TED dialect
            assert r["schema_type"] == "TED_R2.0.9"
            assert r["form_type"] in ("F02", "F03")
            assert r["edition"] is not None
            assert r["val_total_currency"] == "GBP"
            # award block only for finished orders
            assert (r["nb_tenders"] is not None) == (r["award_date"] is not None)
            assert r["notice_type_group"] in (
                "PIN", "CONTRACT_NOTICE", "CONTRACT_AWARD", "MODIFICATION", "OTHER",
            )
        else:  # UK-2023 dialect
            assert r["schema_type"].startswith("UK")
            assert r["form_type"] == r["td_document_type_code"]
            # TED-only families are null on UKX rows (ref 2b:404-427)
            for c in ("edition", "ds_date_dispatch", "award_date", "ca_email",
                      "val_total", "nb_tenders", "pr_proc_code"):
                assert r[c] is None, (k, c)
            # buyer fallback: no buyer-role party on k%5==0 rows
            if k % 5 == 0:
                assert r["ca_name"].startswith("Authority F")
                assert r["ca_town"] is None
            else:
                assert r["ca_name"].startswith("Authority ")
