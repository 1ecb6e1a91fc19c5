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
