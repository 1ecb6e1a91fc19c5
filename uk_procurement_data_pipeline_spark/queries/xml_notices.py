"""XML function surface (SURVEY.md §2.9 F23-F27, §2.11 UD2-declarative).

The reference parses TED / UK-2023 procurement XML with ElementTree
(2b_extract_find_a_tender_XMLs.py:434-446 dispatch, 2b:45-54 dynamic
namespace, 2b:134/138 attribute-predicate XPath, 2b:57-74 attribute
extraction). DuckDB has no XPath, so these queries are made differential:
each row's XML document is CONSTRUCTED from fixture columns inside the
query, Spark parses it back with the ``xpath_*`` family, and the oracle
computes the identical outputs straight from the source columns. A value
survives the encode→parse round-trip iff the XPath extraction is correct,
so the oracle check pins the parsing logic itself.

Everything stays JVM-side (xpath is a built-in Hive UDF — no Python);
the encoding-fallback decode (F23, ref 2b:479-482) needs a real UDF and
lives in sources/decode.py with pytest coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from uk_procurement_data_pipeline_spark.catalog import load, spread
from uk_procurement_data_pipeline_spark.queries.base import register

# XML document built per order row — integers and enum strings only (no
# doubles: C printf and Java format round differently).
_XML = (
    "concat('<notice id=\"', o_orderkey, '\" status=\"', o_orderstatus, '\">',"
    " '<party role=\"', if(o_orderkey % 2 = 0, 'supplier', 'buyer'), '\"/>',"
    " '<value currency=\"GBP\">', o_custkey, '</value>',"
    " '<value currency=\"EUR\">', o_orderkey % 1000, '</value>',"
    " '<docs><doc type=\"tenderNotice\">t</doc>"
    "<doc type=\"awardNotice\">a</doc></docs>',"
    " '</notice>')"
)


@register(
    name="xml_attr_extract",
    survey="F25 F26 F22 J3 UD2",
    doc="XPath attribute predicates and attribute extraction (ref 2b:134 "
    "VALUE[@TYPE=...], 2b:57-74 attrib.get): encode order rows as notice "
    "XML, extract back via xpath_string/xpath/xpath_boolean; the oracle "
    "recomputes the same values from the raw columns, pinning the parse.",
    oracle="""
        SELECT o_orderkey,
               o_orderkey AS notice_id,
               o_orderstatus AS status_attr,
               o_custkey AS gbp_value,
               o_orderkey % 1000 AS eur_value,
               (o_orderkey % 2 = 0) AS has_supplier,
               'tenderNotice' AS first_doc_type
        FROM orders
        WHERE o_orderkey % 10 = 0
    """,
)
def xml_attr_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        # spread: xpath parses a fresh DOM per row — distribute the
        # single-row-group scan before the parse-heavy projection
        spread(load(spark, sf_dir, "orders").where("o_orderkey % 10 = 0"))
        .selectExpr("o_orderkey", f"{_XML} AS xml")
        .selectExpr(
            "o_orderkey",
            "CAST(xpath_string(xml, '/notice/@id') AS BIGINT) AS notice_id",
            "xpath_string(xml, '/notice/@status') AS status_attr",
            "CAST(xpath_string(xml, \"/notice/value[@currency='GBP']/text()\")"
            " AS BIGINT) AS gbp_value",
            "CAST(xpath_string(xml, \"/notice/value[@currency='EUR']/text()\")"
            " AS BIGINT) AS eur_value",
            "xpath_boolean(xml, \"/notice/party[@role='supplier']\") AS has_supplier",
            "element_at(xpath(xml, '/notice/docs/doc/@type'), 1) AS first_doc_type",
        )
    )


_FROM_XML_DDL = (
    "_id BIGINT, _status STRING, party STRUCT<_role: STRING>, "
    "value ARRAY<STRUCT<_VALUE: BIGINT, _currency: STRING>>, "
    "docs STRUCT<doc: ARRAY<STRUCT<_VALUE: STRING, _type: STRING>>>"
)


@register(
    name="xml_from_xml_struct",
    survey="F22 F23 F26 UD2 J3",
    doc="Schema-declared XML decode via native from_xml (the declarative "
    "form of the reference's ElementTree parser, ref 2b:434-446): one call "
    "parses the whole notice into a typed struct — attributes as _-prefixed "
    "fields, repeated elements as arrays — then pure struct navigation. An "
    "independent parser from the xpath family, checked against the same "
    "column-derived oracle.",
    oracle="""
        SELECT o_orderkey,
               o_orderkey AS notice_id,
               o_orderstatus AS status,
               CASE WHEN o_orderkey % 2 = 0 THEN 'supplier'
                    ELSE 'buyer' END AS party_role,
               o_custkey AS gbp_value,
               2 AS n_values,
               'tenderNotice' AS first_doc_type
        FROM orders
        WHERE o_orderkey % 13 = 0
    """,
)
def xml_from_xml_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spread(load(spark, sf_dir, "orders").where("o_orderkey % 13 = 0"))
        .selectExpr("o_orderkey", f"{_XML} AS xml")
        .selectExpr("o_orderkey", f"from_xml(xml, '{_FROM_XML_DDL}') AS n")
        .selectExpr(
            "o_orderkey",
            "n._id AS notice_id",
            "n._status AS status",
            "n.party._role AS party_role",
            "element_at(filter(n.value, v -> v._currency = 'GBP'), 1)._VALUE"
            " AS gbp_value",
            "size(n.value) AS n_values",
            "element_at(n.docs.doc, 1)._type AS first_doc_type",
        )
    )


# Dialect-varying XML: root tag probed like the reference's 17-form-tag
# cascade (2b:434-446); NUTS code appears under one of two namespace
# generations (2b:85-94) probed with fallback.
_DIALECT_XML = (
    "concat('<', if(o_orderkey % 3 = 0, 'UK7_2023',"
    "              if(o_orderkey % 3 = 1, 'UK4_2023', 'TED_EXPORT')),"
    " ' xmlns=\"urn:fat:', if(o_orderkey % 3 = 2, 'ted', 'uk2023'), '\">',"
    " '<id>', o_orderkey, '</id>',"
    " if(o_orderkey % 2 = 0,"
    "    concat('<n2021 code=\"UKI', o_orderkey % 9, '\"/>'),"
    "    concat('<n2016 code=\"UKJ', o_orderkey % 9, '\"/>')),"
    " '</', if(o_orderkey % 3 = 0, 'UK7_2023',"
    "          if(o_orderkey % 3 = 1, 'UK4_2023', 'TED_EXPORT')), '>')"
)


# ---------------------------------------------------------------------------
# fat_flatten_wide — the find_a_tender record contract, both dialects.
#
# The reference turns one procurement XML file into a ~45-column flat row
# through two imperative parsers sharing one output schema: TED R2.0.9
# (2b_extract_find_a_tender_XMLs.py:102-249) and UK-2023 OCDS-style
# (2b:254-429), dispatched by a 17-form-tag probe cascade (2b:434-446).
# Spark-first translation: CONSTRUCT each row's XML from fixture columns
# (TED or UK2023 shape by key), parse BOTH dialects with a single merged
# `from_xml` schema (one JVM parse per row — the declarative analogue of
# the reference's two ElementTree walks), then emit the unified contract
# in one wide Project: first-match buyer party (2b:300-307), supplier
# role filter (2b:309-313), _join_unique folds (2b:13-15), CPV
# scheme-filtered flatten (2b:321-333), LG='EN' attribute predicates
# (2b:66/97), dual-generation NUTS fallback (2b:85-94), buyer-element
# fallback (2b:316-318), TD-code → notice group mapping (2b:85-97 map
# fn at 2b:35-48), and mainProcurementCategory → CTYPE (2b:346-356).
# The oracle recomputes all 45 columns straight from the source columns,
# so every value pins the full encode → parse → navigate round-trip.
# ---------------------------------------------------------------------------

_UKX_STRUCT = (
    "STRUCT<id: STRING, date: STRING, "
    "parties: ARRAY<STRUCT<roles: ARRAY<STRING>, name: STRING, "
    "address: STRUCT<region: STRING, country: STRING, locality: STRING, "
    "postalCode: STRING>, details: STRUCT<url: STRING>>>, "
    "buyer: STRUCT<name: STRING>, "
    "awards: ARRAY<STRUCT<mainProcurementCategory: STRING, "
    "items: ARRAY<STRUCT<additionalClassifications: ARRAY<STRUCT<scheme: STRING, "
    "id: STRING>>, deliveryAddresses: ARRAY<STRUCT<region: STRING>>>>>>, "
    "tender: STRUCT<title: STRING, description: STRING>, "
    "tag: ARRAY<STRING>>"
)

# One schema covers both dialects: element names are disjoint, so a TED
# document fills the TED branches and leaves the UK branches null (and
# vice versa) — exactly one parse pass regardless of dialect.
_FAT_DDL = (
    "_DOC_ID STRING, _EDITION STRING, "
    "REF_OJS STRUCT<DATE_PUB: STRING>, "
    "CODIF_DATA STRUCT<DS_DATE_DISPATCH: STRING, "
    "TD_DOCUMENT_TYPE: STRUCT<_CODE: STRING>, "
    "NC_CONTRACT_NATURE: STRUCT<_CODE: STRING>, PR_PROC: STRUCT<_CODE: STRING>, "
    "AC_AWARD_CRIT: STRUCT<_CODE: STRING>, MA_MAIN_ACTIVITIES: STRUCT<_CODE: STRING>, "
    "RP_REGULATION: STRUCT<_CODE: STRING>>, "
    "NOTICE_DATA STRUCT<ISO_COUNTRY: STRUCT<_VALUE: STRING>, NO_DOC_OJS: STRING, "
    "URI_LIST: STRUCT<URI_DOC: ARRAY<STRUCT<_VALUE: STRING, _LG: STRING>>>, "
    "ORIGINAL_CPV: STRUCT<_CODE: STRING>, "
    "VALUES: STRUCT<VALUE: ARRAY<STRUCT<_VALUE: STRING, _TYPE: STRING, _CURRENCY: STRING>>>, "
    "`n2021:PERFORMANCE_NUTS`: ARRAY<STRUCT<_CODE: STRING>>, "
    "`n2016:PERFORMANCE_NUTS`: ARRAY<STRUCT<_CODE: STRING>>, "
    "`n2021:CA_CE_NUTS`: STRUCT<_CODE: STRING>, "
    "`n2016:CA_CE_NUTS`: STRUCT<_CODE: STRING>, "
    "DOC_ID: STRING, NO_DOC_EXT: STRING, URI_DOC: STRING, PUBLISHED: STRING>, "
    "TRANSLATION_SECTION STRUCT<ML_TITLES: STRUCT<ML_TI_DOC: ARRAY<STRUCT<_LG: STRING, "
    "TI_CY: STRING, TI_TOWN: STRING, TI_TEXT: STRUCT<P: STRING>>>>>, "
    "CONTRACTING_BODY STRUCT<ADDRESS_CONTRACTING_BODY: STRUCT<OFFICIALNAME: STRING, "
    "TOWN: STRING, POSTAL_CODE: STRING, E_MAIL: STRING, URL_GENERAL: STRING, "
    "COUNTRY: STRUCT<_VALUE: STRING>, "
    "`n2021:NUTS`: STRUCT<_CODE: STRING>, `n2016:NUTS`: STRUCT<_CODE: STRING>>>, "
    "OBJECT_CONTRACT STRUCT<TITLE: STRUCT<P: STRING>, SHORT_DESCR: STRUCT<P: STRING>, "
    "TYPE_CONTRACT: STRUCT<_CTYPE: STRING>, VAL_TOTAL: STRUCT<_VALUE: STRING, _CURRENCY: STRING>, "
    "CPV_MAIN: STRUCT<CPV_CODE: STRUCT<_CODE: STRING>>>, "
    "OBJECT_DESCR STRUCT<SHORT_DESCR: STRUCT<P: STRING>, "
    "CPV_ADDITIONAL: ARRAY<STRUCT<CPV_CODE: STRUCT<_CODE: STRING>>>>, "
    "AWARD_CONTRACT STRUCT<AWARDED_CONTRACT: STRUCT<DATE_CONCLUSION_CONTRACT: STRING, "
    "VALUES: STRUCT<VAL_TOTAL: STRUCT<_VALUE: STRING, _CURRENCY: STRING>>, "
    "TENDERS: STRUCT<NB_TENDERS_RECEIVED: STRING>, "
    "CONTRACTORS: STRUCT<CONTRACTOR: ARRAY<STRUCT<ADDRESS_CONTRACTOR: "
    "STRUCT<OFFICIALNAME: STRING>>>>>>, "
    "FORM_SECTION STRUCT<F02_2014 STRUCT<_FORM: STRING>, F03_2014 STRUCT<_FORM: STRING>>, "
    f"UK7_2023 {_UKX_STRUCT}, UK6_2023 {_UKX_STRUCT}, UK4_2023 {_UKX_STRUCT}"
)

# The reference's 17-tag dispatch cascade, in its probe order (2b:437-440).
_FORM_TAGS = (
    "'UK16_2023','UK15_2023','UK14_2023','UK13_2023','UK12_2023','UK11_2023',"
    "'UK10_2023','UK9_2023','UK8_2023','UK7_2023','UK6_2023','UK5_2023',"
    "'UK4_2023','UK3_2023','UK2_2023','UK1_2023','UK1_2022'"
)

# TED R2.0.9 document built from order columns (all ints/enum strings —
# doubles round-trip differently across engines, so none are used).
_TED_XML = """concat(
 '<TED_EXPORT DOC_ID="', o_orderkey, '-2024" EDITION="', o_orderkey % 250 + 1, '">',
 '<REF_OJS><DATE_PUB>', date_format(o_orderdate, 'yyyyMMdd'), '</DATE_PUB></REF_OJS>',
 '<CODIF_DATA><DS_DATE_DISPATCH>', date_format(o_orderdate - interval 7 days, 'yyyyMMdd'),
 '</DS_DATE_DISPATCH>',
 '<TD_DOCUMENT_TYPE CODE="', element_at(array('0','3','7','K','Z'), cast(o_orderkey % 5 as int) + 1), '"/>',
 '<NC_CONTRACT_NATURE CODE="', element_at(array('1','2','4'), cast(o_custkey % 3 as int) + 1), '"/>',
 '<PR_PROC CODE="', element_at(array('1','2','C'), cast((o_orderkey div 3) % 3 as int) + 1), '"/>',
 '<AC_AWARD_CRIT CODE="', element_at(array('1','2'), cast(o_custkey % 2 as int) + 1), '"/>',
 '<MA_MAIN_ACTIVITIES CODE="', element_at(array('S','H','E'), cast((o_orderkey + o_custkey) % 3 as int) + 1), '"/>',
 '<RP_REGULATION CODE="', element_at(array('5','Z'), cast(o_orderkey % 2 as int) + 1), '"/></CODIF_DATA>',
 '<NOTICE_DATA><ISO_COUNTRY VALUE="', element_at(array('GB','IE','FR'), cast(o_custkey % 3 as int) + 1), '"/>',
 '<NO_DOC_OJS>', o_orderkey % 100, '-', o_orderkey, '</NO_DOC_OJS>',
 '<URI_LIST><URI_DOC LG="FR">https://ted.example/', o_orderkey, '/fr</URI_DOC>',
 '<URI_DOC LG="EN">https://ted.example/', o_orderkey, '/en</URI_DOC></URI_LIST>',
 '<ORIGINAL_CPV CODE="', 45000000 + (o_custkey % 90) * 1000, '"/>',
 '<VALUES><VALUE TYPE="ESTIMATED_TOTAL" CURRENCY="GBP">', (o_orderkey * 31) % 500000, '</VALUE>',
 '<VALUE TYPE="PROCUREMENT_TOTAL" CURRENCY="EUR">', (o_orderkey * 17) % 800000, '</VALUE></VALUES>',
 if(o_orderkey % 2 = 0, concat('<n2021:PERFORMANCE_NUTS CODE="UKI', o_orderkey % 9, '"/>'), ''),
 '<n2016:PERFORMANCE_NUTS CODE="UKJ', o_custkey % 9, '"/>',
 if(o_custkey % 2 = 0,
    concat('<n2021:CA_CE_NUTS CODE="UKK', (o_orderkey + o_custkey) % 9, '"/>'),
    concat('<n2016:CA_CE_NUTS CODE="UKK', (o_orderkey + o_custkey) % 9, '"/>')),
 '</NOTICE_DATA>',
 '<TRANSLATION_SECTION><ML_TITLES>',
 '<ML_TI_DOC LG="FR"><TI_CY>France</TI_CY><TI_TOWN>Ville', o_custkey % 50,
 '</TI_TOWN><TI_TEXT><P>Avis</P></TI_TEXT></ML_TI_DOC>',
 '<ML_TI_DOC LG="EN"><TI_CY>', element_at(array('United Kingdom','Ireland','France'), cast(o_custkey % 3 as int) + 1),
 '</TI_CY><TI_TOWN>Town', o_custkey % 50, '</TI_TOWN><TI_TEXT><P>Notice ', o_orderpriority,
 '</P></TI_TEXT></ML_TI_DOC>',
 '</ML_TITLES></TRANSLATION_SECTION>',
 '<CONTRACTING_BODY><ADDRESS_CONTRACTING_BODY><OFFICIALNAME>Authority ', o_custkey % 100, '</OFFICIALNAME>',
 '<TOWN>Town', o_custkey % 50, '</TOWN><POSTAL_CODE>SW', o_custkey % 20, '</POSTAL_CODE>',
 '<E_MAIL>buyer', o_custkey % 100, '@example.gov.uk</E_MAIL>',
 '<URL_GENERAL>https://gov.example/', o_custkey % 100, '</URL_GENERAL><COUNTRY VALUE="GB"/>',
 if(o_orderkey % 2 = 0, concat('<n2021:NUTS CODE="UKL', o_custkey % 9, '"/>'),
                        concat('<n2016:NUTS CODE="UKL', o_custkey % 9, '"/>')),
 '</ADDRESS_CONTRACTING_BODY></CONTRACTING_BODY>',
 '<OBJECT_CONTRACT><TITLE><P>Procurement of part ', o_orderkey % 200, '</P></TITLE>',
 if(o_custkey % 2 = 0, concat('<SHORT_DESCR><P>Scope ', o_orderkey % 997, '</P></SHORT_DESCR>'), ''),
 '<TYPE_CONTRACT CTYPE="', element_at(array('WORKS','SERVICES','SUPPLIES'), cast(o_custkey % 3 as int) + 1), '"/>',
 '<VAL_TOTAL CURRENCY="GBP">', (o_custkey * 137) % 1000000, '</VAL_TOTAL>',
 '<CPV_MAIN><CPV_CODE CODE="', 45000000 + (o_custkey % 90) * 1000, '"/></CPV_MAIN></OBJECT_CONTRACT>',
 '<OBJECT_DESCR>',
 if(o_custkey % 2 = 1, concat('<SHORT_DESCR><P>Scope ', o_orderkey % 997, '</P></SHORT_DESCR>'), ''),
 '<CPV_ADDITIONAL><CPV_CODE CODE="', 45100000 + (o_orderkey % 9) * 100, '"/></CPV_ADDITIONAL>',
 '<CPV_ADDITIONAL><CPV_CODE CODE="', 45100000 + (o_custkey % 9) * 100, '"/></CPV_ADDITIONAL>',
 '</OBJECT_DESCR>',
 if(o_orderstatus = 'F', concat('<AWARD_CONTRACT><AWARDED_CONTRACT>',
   '<DATE_CONCLUSION_CONTRACT>', date_format(o_orderdate + interval 30 days, 'yyyyMMdd'),
   '</DATE_CONCLUSION_CONTRACT>',
   '<VALUES><VAL_TOTAL CURRENCY="GBP">', (o_custkey * 211) % 900000, '</VAL_TOTAL></VALUES>',
   '<TENDERS><NB_TENDERS_RECEIVED>', o_orderkey % 12 + 1, '</NB_TENDERS_RECEIVED></TENDERS>',
   '<CONTRACTORS><CONTRACTOR><ADDRESS_CONTRACTOR><OFFICIALNAME>Contractor ', o_orderkey % 7,
   '</OFFICIALNAME></ADDRESS_CONTRACTOR></CONTRACTOR>',
   '<CONTRACTOR><ADDRESS_CONTRACTOR><OFFICIALNAME>Contractor ', o_custkey % 7,
   '</OFFICIALNAME></ADDRESS_CONTRACTOR></CONTRACTOR></CONTRACTORS>',
   '</AWARDED_CONTRACT></AWARD_CONTRACT>'), ''),
 '<FORM_SECTION>', if(o_orderkey % 2 = 0, '<F02_2014 FORM="F02"/>', '<F03_2014 FORM="F03"/>'),
 '</FORM_SECTION>',
 '</TED_EXPORT>')"""

# UK-2023 OCDS-style document (form tag varies; optional branches exercise
# every fallback in the reference parser: missing DOC_ID -> ocds id,
# missing PUBLISHED -> release date, no buyer-role party -> buyer element).
_UKX_XML = """concat(
 '<PACKAGE><NOTICE_DATA><NO_DOC_EXT>', o_orderkey, '-EXT</NO_DOC_EXT>',
 if(o_custkey % 3 != 0, concat('<DOC_ID>FTS-', o_orderkey, '</DOC_ID>'), ''),
 '<URI_DOC>https://fts.example/', o_orderkey, '</URI_DOC>',
 if(o_orderkey % 2 = 0, concat('<PUBLISHED>', date_format(o_orderdate, 'yyyy-MM-dd'), '</PUBLISHED>'), ''),
 '</NOTICE_DATA>',
 '<', _ftag, '>',
 '<id>ocds-', o_orderkey, '</id><date>', date_format(o_orderdate + interval 1 day, 'yyyy-MM-dd'), '</date>',
 '<parties>',
 if(o_orderkey % 5 != 0, '<roles>buyer</roles>', '<roles>procuringEntity</roles>'),
 '<name>Authority ', o_custkey % 100, '</name>',
 '<address><region>UKD', o_custkey % 9, '</region><country>GB</country><locality>Town', o_custkey % 50,
 '</locality><postalCode>SW', o_custkey % 20, '</postalCode></address>',
 '<details><url>https://gov.example/', o_custkey % 100, '</url></details></parties>',
 '<parties><roles>supplier</roles><roles>payee</roles><name>Contractor ', o_orderkey % 7,
 '</name><address><region>UKE', o_orderkey % 9, '</region></address></parties>',
 if(o_orderstatus = 'F', concat('<parties><roles>supplier</roles><name>Contractor ', o_custkey % 7,
    '</name><address><region>UKE', o_custkey % 9, '</region></address></parties>'), ''),
 if(o_orderkey % 5 = 0, concat('<buyer><name>Authority F', o_custkey % 100, '</name></buyer>'), ''),
 '<awards><mainProcurementCategory>',
 element_at(array('works','services','goods'), cast(o_custkey % 3 as int) + 1),
 '</mainProcurementCategory>',
 '<items><additionalClassifications><scheme>CPV</scheme><id>', 48000000 + (o_custkey % 90) * 1000,
 '</id></additionalClassifications>',
 '<additionalClassifications><scheme>ocid</scheme><id>X1</id></additionalClassifications>',
 '<deliveryAddresses><region>UKF', o_orderkey % 9, '</region></deliveryAddresses></items>',
 if(o_orderkey % 2 = 0, concat('<items><additionalClassifications><scheme>CPV</scheme><id>',
    48100000 + (o_orderkey % 9) * 100, '</id></additionalClassifications>',
    '<deliveryAddresses><region>UKF', o_custkey % 9, '</region></deliveryAddresses></items>'), ''),
 '</awards>',
 '<tender><title>Procurement of part ', o_orderkey % 200, '</title><description>Scope ', o_orderkey % 997,
 '</description></tender>',
 '<tag>', element_at(array('award','planning','tender'), cast(o_custkey % 3 as int) + 1), '</tag>',
 '</', _ftag, '>',
 '</PACKAGE>')"""


def _jus(arr: str) -> str:
    """_join_unique (ref 2b:13-15): sorted-set ';'-join, blank-safe, NULL
    when the collection is missing or empty."""
    return (
        f"nullif(array_join(array_sort(array_distinct(filter({arr}, "
        f"x -> x IS NOT NULL AND trim(x) <> ''))), ';'), '')"
    )


@register(
    name="fat_flatten_wide",
    survey="P2 U2 F22 F25 F26 F27 J1 J2 J3 A2 A5 F10 F15 P6",
    doc="The find_a_tender wide record contract (ref 2b:193-249 TED dict, "
    "2b:374-429 UK2023 dict, dispatch 2b:434-446): two XML dialects "
    "constructed per order row, parsed by ONE merged from_xml schema, and "
    "flattened to the unified 45-column contract in a single Project — "
    "first-match buyer, supplier role filter, _join_unique folds, CPV "
    "scheme filter, LG/TYPE attribute predicates, NUTS generation "
    "fallback, and the TD-code notice-group mapping. Oracle recomputes "
    "every column from the raw fixture columns.",
    oracle="""
        WITH b AS (
          SELECT o_orderkey AS k, o_custkey AS c, o_orderstatus AS st,
                 o_orderdate AS od, o_orderpriority AS pr,
                 (o_orderkey % 3 = 2) AS ted,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'UK7_2023'
                      WHEN o_custkey % 2 = 0 THEN 'UK6_2023'
                      ELSE 'UK4_2023' END AS ftag,
                 CASE o_custkey % 3 WHEN 0 THEN 'award' WHEN 1 THEN 'planning'
                      ELSE 'tender' END AS tag
          FROM orders WHERE o_orderkey % 11 = 0
        )
        SELECT k AS o_orderkey,
          CASE WHEN ted THEN 'TED_R2.0.9' ELSE ftag END AS schema_type,
          CASE WHEN ted THEN (CASE WHEN k % 2 = 0 THEN 'F02' ELSE 'F03' END)
               ELSE replace(ftag, '_2023', '') END AS form_type,
          CASE WHEN ted THEN (CASE k % 5 WHEN 0 THEN '0' WHEN 1 THEN '3'
                              WHEN 2 THEN '7' WHEN 3 THEN 'K' ELSE 'Z' END)
               ELSE replace(ftag, '_2023', '') END AS td_document_type_code,
          CASE WHEN ted THEN (CASE k % 5 WHEN 0 THEN 'PIN' WHEN 1 THEN 'CONTRACT_NOTICE'
                              WHEN 2 THEN 'CONTRACT_AWARD' WHEN 3 THEN 'MODIFICATION'
                              ELSE 'OTHER' END)
               WHEN ftag IN ('UK6_2023', 'UK7_2023') AND tag = 'award' THEN 'UK7_AWARD'
               WHEN tag = 'planning' THEN 'PLANNING'
               ELSE 'OTHER' END AS notice_type_group,
          CASE WHEN ted THEN CAST(k AS VARCHAR) || '-2024'
               WHEN c % 3 <> 0 THEN 'FTS-' || CAST(k AS VARCHAR)
               ELSE 'ocds-' || CAST(k AS VARCHAR) END AS doc_id,
          CASE WHEN ted THEN CAST(k % 250 + 1 AS VARCHAR) END AS edition,
          CASE WHEN ted THEN CAST(k % 100 AS VARCHAR) || '-' || CAST(k AS VARCHAR)
               ELSE CAST(k AS VARCHAR) || '-EXT' END AS no_doc_ojs,
          CASE WHEN ted THEN 'https://ted.example/' || CAST(k AS VARCHAR) || '/en'
               ELSE 'https://fts.example/' || CAST(k AS VARCHAR) END AS notice_url,
          CASE WHEN ted THEN strftime(od, '%Y%m%d')
               WHEN k % 2 = 0 THEN strftime(od, '%Y-%m-%d')
               ELSE strftime(od + INTERVAL 1 DAY, '%Y-%m-%d') END AS date_pub,
          CASE WHEN ted THEN strftime(od - INTERVAL 7 DAY, '%Y%m%d') END AS ds_date_dispatch,
          CASE WHEN ted AND st = 'F' THEN strftime(od + INTERVAL 30 DAY, '%Y%m%d') END AS award_date,
          CASE WHEN ted THEN (CASE c % 3 WHEN 0 THEN 'GB' WHEN 1 THEN 'IE' ELSE 'FR' END)
               WHEN k % 5 <> 0 THEN 'GB' END AS iso_country,
          CASE WHEN ted THEN (CASE c % 3 WHEN 0 THEN 'United Kingdom' WHEN 1 THEN 'Ireland'
                              ELSE 'France' END) END AS ti_country,
          CASE WHEN ted OR k % 5 <> 0 THEN 'Town' || CAST(c % 50 AS VARCHAR) END AS ti_town,
          CASE WHEN ted OR k % 5 <> 0 THEN 'GB' END AS ca_country_code,
          CASE WHEN ted OR k % 5 <> 0 THEN 'Town' || CAST(c % 50 AS VARCHAR) END AS ca_town,
          CASE WHEN ted OR k % 5 <> 0 THEN 'SW' || CAST(c % 20 AS VARCHAR) END AS ca_postcode,
          CASE WHEN ted THEN 'UKL' || CAST(c % 9 AS VARCHAR)
               WHEN k % 5 <> 0 THEN 'UKD' || CAST(c % 9 AS VARCHAR) END AS ca_nuts_code,
          CASE WHEN ted THEN
                 (CASE WHEN k % 2 = 0
                       THEN 'UKI' || CAST(k % 9 AS VARCHAR) || ';UKJ' || CAST(c % 9 AS VARCHAR)
                       ELSE 'UKJ' || CAST(c % 9 AS VARCHAR) END)
               WHEN k % 2 <> 0 THEN 'UKF' || CAST(k % 9 AS VARCHAR)
               WHEN k % 9 = c % 9 THEN 'UKF' || CAST(k % 9 AS VARCHAR)
               ELSE 'UKF' || CAST(least(k % 9, c % 9) AS VARCHAR)
                    || ';UKF' || CAST(greatest(k % 9, c % 9) AS VARCHAR)
               END AS perf_nuts_code,
          CASE WHEN ted THEN 'UKK' || CAST((k + c) % 9 AS VARCHAR) END AS ca_ce_nuts_code,
          CASE WHEN ted OR k % 5 <> 0 THEN 'Authority ' || CAST(c % 100 AS VARCHAR)
               ELSE 'Authority F' || CAST(c % 100 AS VARCHAR) END AS ca_name,
          CASE WHEN ted THEN 'buyer' || CAST(c % 100 AS VARCHAR) || '@example.gov.uk' END AS ca_email,
          CASE WHEN ted OR k % 5 <> 0 THEN 'https://gov.example/' || CAST(c % 100 AS VARCHAR) END AS ca_url,
          CASE WHEN ted THEN CAST(45000000 + (c % 90) * 1000 AS VARCHAR)
               ELSE CAST(48000000 + (c % 90) * 1000 AS VARCHAR) END AS original_cpv_code,
          CASE WHEN ted THEN CAST(45000000 + (c % 90) * 1000 AS VARCHAR)
               ELSE CAST(48000000 + (c % 90) * 1000 AS VARCHAR) END AS cpv_main_code,
          CASE WHEN ted THEN
                 (CASE WHEN k % 9 = c % 9 THEN CAST(45100000 + (k % 9) * 100 AS VARCHAR)
                       ELSE CAST(45100000 + least(k % 9, c % 9) * 100 AS VARCHAR) || ';'
                            || CAST(45100000 + greatest(k % 9, c % 9) * 100 AS VARCHAR) END)
               WHEN k % 2 = 0 THEN CAST(48100000 + (k % 9) * 100 AS VARCHAR)
               END AS additional_cpv_codes,
          CASE WHEN ted THEN 'Notice ' || pr
               ELSE 'Procurement of part ' || CAST(k % 200 AS VARCHAR) END AS ti_text,
          'Procurement of part ' || CAST(k % 200 AS VARCHAR) AS obj_title,
          'Scope ' || CAST(k % 997 AS VARCHAR) AS short_descr,
          CASE c % 3 WHEN 0 THEN 'WORKS' WHEN 1 THEN 'SERVICES'
               ELSE 'SUPPLIES' END AS type_contract_ctype,
          CASE WHEN ted THEN CAST((c * 137) % 1000000 AS VARCHAR) END AS val_total,
          CASE WHEN ted THEN 'GBP' END AS val_total_currency,
          CASE WHEN ted THEN CAST((k * 31) % 500000 AS VARCHAR) END AS est_total_val,
          CASE WHEN ted THEN 'GBP' END AS est_total_val_currency,
          CASE WHEN ted THEN CAST((k * 17) % 800000 AS VARCHAR) END AS proc_total_val,
          CASE WHEN ted THEN 'EUR' END AS proc_total_val_currency,
          CASE WHEN ted AND st = 'F' THEN CAST((c * 211) % 900000 AS VARCHAR) END AS aw_val_total,
          CASE WHEN ted AND st = 'F' THEN 'GBP' END AS aw_val_currency,
          CASE WHEN ted AND st = 'F' THEN CAST(k % 12 + 1 AS VARCHAR) END AS nb_tenders,
          CASE WHEN ted THEN (CASE c % 3 WHEN 0 THEN '1' WHEN 1 THEN '2' ELSE '4' END)
               END AS nc_contract_nature_code,
          CASE WHEN ted THEN (CASE (k // 3) % 3 WHEN 0 THEN '1' WHEN 1 THEN '2' ELSE 'C' END)
               END AS pr_proc_code,
          CASE WHEN ted THEN (CASE WHEN c % 2 = 0 THEN '1' ELSE '2' END)
               END AS ac_award_crit_code,
          CASE WHEN ted THEN (CASE (k + c) % 3 WHEN 0 THEN 'S' WHEN 1 THEN 'H' ELSE 'E' END)
               END AS ma_main_activities_code,
          CASE WHEN ted THEN (CASE WHEN k % 2 = 0 THEN '5' ELSE 'Z' END)
               END AS rp_regulation_code,
          CASE WHEN ted AND st <> 'F' THEN NULL
               WHEN NOT ted AND st <> 'F' THEN 'Contractor ' || CAST(k % 7 AS VARCHAR)
               WHEN k % 7 = c % 7 THEN 'Contractor ' || CAST(k % 7 AS VARCHAR)
               ELSE 'Contractor ' || CAST(least(k % 7, c % 7) AS VARCHAR)
                    || ';Contractor ' || CAST(greatest(k % 7, c % 7) AS VARCHAR)
               END AS contractor_names
        FROM b
    """,
)
def fat_flatten_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ucpv = (
        "flatten(transform(u.awards, a -> flatten(transform(a.items, i -> "
        "transform(filter(i.additionalClassifications, ac -> ac.scheme = 'CPV'), "
        "ac -> ac.id)))))"
    )
    uregion = (
        "flatten(transform(u.awards, a -> flatten(transform(a.items, i -> "
        "transform(i.deliveryAddresses, d -> d.region)))))"
    )
    cb = "n.CONTRACTING_BODY.ADDRESS_CONTRACTING_BODY"
    aw = "n.AWARD_CONTRACT.AWARDED_CONTRACT"
    ted_perf = (
        "concat(coalesce(n.NOTICE_DATA.`n2021:PERFORMANCE_NUTS`._CODE, array()), "
        "coalesce(n.NOTICE_DATA.`n2016:PERFORMANCE_NUTS`._CODE, array()))"
    )
    mpc_case = (
        "CASE WHEN contains(lower(mpc), 'work') THEN 'WORKS'"
        " WHEN contains(lower(mpc), 'service') THEN 'SERVICES'"
        " WHEN contains(lower(mpc), 'supply') OR contains(lower(mpc), 'good')"
        " THEN 'SUPPLIES' END"
    )
    return (
        spread(load(spark, sf_dir, "orders").where("o_orderkey % 11 = 0"))
        .selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority",
            "if(o_orderkey % 3 = 0, 'UK7_2023',"
            " if(o_custkey % 2 = 0, 'UK6_2023', 'UK4_2023')) AS _ftag",
        )
        .selectExpr(
            "o_orderkey",
            f"CASE WHEN o_orderkey % 3 = 2 THEN {_TED_XML} ELSE {_UKX_XML} END AS xml",
        )
        .selectExpr("o_orderkey", "xml", f"from_xml(xml, '{_FAT_DDL}') AS n")
        # dispatch: first matching form tag in the reference's probe order;
        # no match -> TED (2b:434-446)
        .selectExpr(
            "o_orderkey", "n",
            f"try_element_at(filter(array({_FORM_TAGS}), "
            "t -> contains(xml, concat('<', t, '>'))), 1) AS ft",
            "coalesce(n.UK7_2023, n.UK6_2023, n.UK4_2023) AS u",
        )
        .selectExpr(
            "o_orderkey", "n", "ft", "u",
            "ft IS NULL AS is_ted",
            "try_element_at(filter(u.parties, p -> array_contains(p.roles, 'buyer')), 1) AS bp",
            "try_element_at(filter(n.TRANSLATION_SECTION.ML_TITLES.ML_TI_DOC, "
            "d -> d._LG = 'EN'), 1) AS ml_en",
            f"{ucpv} AS ucpvs",
            f"{uregion} AS uregions",
            "try_element_at(filter(transform(u.awards, a -> a.mainProcurementCategory), "
            "m -> m IS NOT NULL), 1) AS mpc",
        )
        .selectExpr(
            "o_orderkey",
            "CASE WHEN is_ted THEN 'TED_R2.0.9' ELSE ft END AS schema_type",
            "CASE WHEN is_ted THEN coalesce(n.FORM_SECTION.F02_2014._FORM, "
            "n.FORM_SECTION.F03_2014._FORM) ELSE replace(ft, '_2023', '') END AS form_type",
            "CASE WHEN is_ted THEN n.CODIF_DATA.TD_DOCUMENT_TYPE._CODE "
            "ELSE replace(ft, '_2023', '') END AS td_document_type_code",
            # _map_notice_type_group (2b:35-48) / UKX tag rules (2b:358-365)
            "CASE WHEN is_ted THEN "
            " CASE upper(trim(coalesce(n.CODIF_DATA.TD_DOCUMENT_TYPE._CODE, '')))"
            "  WHEN '0' THEN 'PIN' WHEN '3' THEN 'CONTRACT_NOTICE'"
            "  WHEN 'O' THEN 'CONTRACT_NOTICE' WHEN 'V' THEN 'CONTRACT_NOTICE'"
            "  WHEN '7' THEN 'CONTRACT_AWARD' WHEN 'K' THEN 'MODIFICATION'"
            "  ELSE 'OTHER' END "
            "WHEN ft IN ('UK6_2023', 'UK7_2023') AND array_contains(u.tag, 'award')"
            " THEN 'UK7_AWARD' "
            "WHEN array_contains(u.tag, 'planning') THEN 'PLANNING' "
            "ELSE 'OTHER' END AS notice_type_group",
            "CASE WHEN is_ted THEN n._DOC_ID "
            "ELSE coalesce(n.NOTICE_DATA.DOC_ID, u.id) END AS doc_id",
            "CASE WHEN is_ted THEN n._EDITION END AS edition",
            "CASE WHEN is_ted THEN n.NOTICE_DATA.NO_DOC_OJS "
            "ELSE n.NOTICE_DATA.NO_DOC_EXT END AS no_doc_ojs",
            "CASE WHEN is_ted THEN try_element_at(filter(n.NOTICE_DATA.URI_LIST.URI_DOC, "
            "uu -> uu._LG = 'EN'), 1)._VALUE ELSE n.NOTICE_DATA.URI_DOC END AS notice_url",
            "CASE WHEN is_ted THEN n.REF_OJS.DATE_PUB "
            "ELSE coalesce(n.NOTICE_DATA.PUBLISHED, u.date) END AS date_pub",
            "CASE WHEN is_ted THEN n.CODIF_DATA.DS_DATE_DISPATCH END AS ds_date_dispatch",
            f"CASE WHEN is_ted THEN {aw}.DATE_CONCLUSION_CONTRACT END AS award_date",
            "CASE WHEN is_ted THEN n.NOTICE_DATA.ISO_COUNTRY._VALUE "
            "ELSE bp.address.country END AS iso_country",
            "CASE WHEN is_ted THEN ml_en.TI_CY END AS ti_country",
            "CASE WHEN is_ted THEN ml_en.TI_TOWN ELSE bp.address.locality END AS ti_town",
            f"CASE WHEN is_ted THEN {cb}.COUNTRY._VALUE "
            "ELSE bp.address.country END AS ca_country_code",
            f"CASE WHEN is_ted THEN {cb}.TOWN ELSE bp.address.locality END AS ca_town",
            f"CASE WHEN is_ted THEN {cb}.POSTAL_CODE "
            "ELSE bp.address.postalCode END AS ca_postcode",
            f"CASE WHEN is_ted THEN coalesce({cb}.`n2021:NUTS`._CODE, "
            f"{cb}.`n2016:NUTS`._CODE) ELSE bp.address.region END AS ca_nuts_code",
            f"CASE WHEN is_ted THEN {_jus(ted_perf)} "
            f"ELSE {_jus('uregions')} END AS perf_nuts_code",
            "CASE WHEN is_ted THEN coalesce(n.NOTICE_DATA.`n2021:CA_CE_NUTS`._CODE, "
            "n.NOTICE_DATA.`n2016:CA_CE_NUTS`._CODE) END AS ca_ce_nuts_code",
            f"CASE WHEN is_ted THEN {cb}.OFFICIALNAME "
            "ELSE coalesce(bp.name, u.buyer.name) END AS ca_name",
            f"CASE WHEN is_ted THEN {cb}.E_MAIL END AS ca_email",
            f"CASE WHEN is_ted THEN {cb}.URL_GENERAL ELSE bp.details.url END AS ca_url",
            "CASE WHEN is_ted THEN n.NOTICE_DATA.ORIGINAL_CPV._CODE "
            "ELSE try_element_at(ucpvs, 1) END AS original_cpv_code",
            "CASE WHEN is_ted THEN n.OBJECT_CONTRACT.CPV_MAIN.CPV_CODE._CODE "
            "ELSE try_element_at(ucpvs, 1) END AS cpv_main_code",
            f"CASE WHEN is_ted THEN {_jus('n.OBJECT_DESCR.CPV_ADDITIONAL.CPV_CODE._CODE')} "
            f"WHEN size(ucpvs) > 1 THEN {_jus('slice(ucpvs, 2, size(ucpvs) - 1)')} "
            "END AS additional_cpv_codes",
            "CASE WHEN is_ted THEN ml_en.TI_TEXT.P ELSE u.tender.title END AS ti_text",
            "CASE WHEN is_ted THEN n.OBJECT_CONTRACT.TITLE.P "
            "ELSE u.tender.title END AS obj_title",
            "CASE WHEN is_ted THEN coalesce(n.OBJECT_CONTRACT.SHORT_DESCR.P, "
            "n.OBJECT_DESCR.SHORT_DESCR.P) ELSE u.tender.description END AS short_descr",
            "CASE WHEN is_ted THEN n.OBJECT_CONTRACT.TYPE_CONTRACT._CTYPE "
            f"ELSE {mpc_case} END AS type_contract_ctype",
            "CASE WHEN is_ted THEN n.OBJECT_CONTRACT.VAL_TOTAL._VALUE END AS val_total",
            "CASE WHEN is_ted THEN n.OBJECT_CONTRACT.VAL_TOTAL._CURRENCY "
            "END AS val_total_currency",
            "CASE WHEN is_ted THEN try_element_at(filter(n.NOTICE_DATA.VALUES.VALUE, "
            "v -> v._TYPE = 'ESTIMATED_TOTAL'), 1)._VALUE END AS est_total_val",
            "CASE WHEN is_ted THEN try_element_at(filter(n.NOTICE_DATA.VALUES.VALUE, "
            "v -> v._TYPE = 'ESTIMATED_TOTAL'), 1)._CURRENCY END AS est_total_val_currency",
            "CASE WHEN is_ted THEN try_element_at(filter(n.NOTICE_DATA.VALUES.VALUE, "
            "v -> v._TYPE = 'PROCUREMENT_TOTAL'), 1)._VALUE END AS proc_total_val",
            "CASE WHEN is_ted THEN try_element_at(filter(n.NOTICE_DATA.VALUES.VALUE, "
            "v -> v._TYPE = 'PROCUREMENT_TOTAL'), 1)._CURRENCY END AS proc_total_val_currency",
            f"CASE WHEN is_ted THEN {aw}.VALUES.VAL_TOTAL._VALUE END AS aw_val_total",
            f"CASE WHEN is_ted THEN {aw}.VALUES.VAL_TOTAL._CURRENCY END AS aw_val_currency",
            f"CASE WHEN is_ted THEN {aw}.TENDERS.NB_TENDERS_RECEIVED END AS nb_tenders",
            "CASE WHEN is_ted THEN n.CODIF_DATA.NC_CONTRACT_NATURE._CODE "
            "END AS nc_contract_nature_code",
            "CASE WHEN is_ted THEN n.CODIF_DATA.PR_PROC._CODE END AS pr_proc_code",
            "CASE WHEN is_ted THEN n.CODIF_DATA.AC_AWARD_CRIT._CODE END AS ac_award_crit_code",
            "CASE WHEN is_ted THEN n.CODIF_DATA.MA_MAIN_ACTIVITIES._CODE "
            "END AS ma_main_activities_code",
            "CASE WHEN is_ted THEN n.CODIF_DATA.RP_REGULATION._CODE END AS rp_regulation_code",
            "CASE WHEN is_ted THEN "
            + _jus(aw + ".CONTRACTORS.CONTRACTOR.ADDRESS_CONTRACTOR.OFFICIALNAME")
            + " ELSE "
            + _jus(
                "transform(filter(u.parties, "
                "p -> array_contains(p.roles, 'supplier')), p -> p.name)"
            )
            + " END AS contractor_names",
        )
    )


@register(
    name="xml_namespace_dispatch",
    survey="F24 F27 F23 U2 F4",
    doc="Dynamic namespace extraction (ref 2b:45-54), format dispatch by "
    "root-tag probe (ref 2b:434-446), and dual-generation NUTS fallback "
    "(ref 2b:85-94) as coalesce over two xpath probes.",
    oracle="""
        SELECT o_orderkey,
               'urn:fat:' || CASE WHEN o_orderkey % 3 = 2
                                  THEN 'ted' ELSE 'uk2023' END AS ns_uri,
               CASE WHEN o_orderkey % 3 IN (0, 1) THEN 'UK2023'
                    ELSE 'TED' END AS form_family,
               CASE WHEN o_orderkey % 2 = 0
                    THEN 'UKI' || CAST(o_orderkey % 9 AS VARCHAR)
                    ELSE 'UKJ' || CAST(o_orderkey % 9 AS VARCHAR) END AS nuts_code,
               (o_orderkey % 2 = 0) AS is_nuts_2021
        FROM orders
        WHERE o_orderkey % 7 = 0
    """,
)
def xml_namespace_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spread(load(spark, sf_dir, "orders").where("o_orderkey % 7 = 0"))
        .selectExpr("o_orderkey", f"{_DIALECT_XML} AS xml")
        .selectExpr(
            "o_orderkey",
            'regexp_extract(xml, \'xmlns="([^"]+)"\', 1) AS ns_uri',
            "CASE WHEN xpath_boolean(xml, '/UK7_2023')"
            "       OR xpath_boolean(xml, '/UK4_2023') THEN 'UK2023'"
            " ELSE 'TED' END AS form_family",
            "coalesce(nullif(xpath_string(xml, '//n2021/@code'), ''),"
            "         nullif(xpath_string(xml, '//n2016/@code'), '')) AS nuts_code",
            "xpath_boolean(xml, '//n2021') AS is_nuts_2021",
        )
    )


@register(
    name="xml_roundtrip_notices",
    survey="F23 F22 A7 E1",
    doc="XML WRITER round-trip (Spark 4 to_xml, closing the serializer "
    "side of the from_xml reader this module is built on): each order "
    "becomes a notice struct whose title embeds XML-hostile characters "
    "(& < >), is serialized to an XML string with to_xml, re-parsed "
    "with from_xml against the declared schema, and aggregated from "
    "the PARSED values. The oracle computes the same aggregates "
    "straight from the raw columns — matching proves serialize-parse "
    "is lossless including entity escaping (the exact bug class the "
    "reference's hand-built scrapers hit with raw string XML). "
    "Map-side only until the 5-cell aggregate.",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_notices,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN 'T & <' || o_orderstatus || '>'
                             = 'T & <' || o_orderstatus || '>'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_title_ok
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY priority
    """,
)
def xml_roundtrip_notices(spark: SparkSession, sf_dir: str) -> DataFrame:
    notices = load(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority",
        "o_orderstatus",
        "to_xml(named_struct("
        " 'priority', o_orderpriority,"
        " 'title', concat('T & <', o_orderstatus, '>'),"
        " 'cents', CAST(ROUND(o_totalprice * 100) AS BIGINT))) AS xml",
    )
    parsed = notices.selectExpr(
        "o_orderstatus",
        "from_xml(xml,"
        " 'priority STRING, title STRING, cents BIGINT') AS n",
    )
    return (
        parsed.selectExpr(
            "n.priority AS priority",
            "n.cents AS cents",
            # escaping certified: the PARSED title must equal the raw
            # reconstruction, ampersands and angle brackets included
            "CASE WHEN n.title = concat('T & <', o_orderstatus, '>')"
            " THEN 1 ELSE 0 END AS title_ok",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_notices"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.sum("title_ok").cast("bigint").alias("n_title_ok"),
        )
        .orderBy("priority")
    )
