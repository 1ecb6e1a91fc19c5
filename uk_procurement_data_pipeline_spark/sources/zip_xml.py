"""ZIP-of-XML source and XML-parse stage (SURVEY.md §2.1 S3, §2.11 UD2,
§2.12 E1/E4).

The reference iterates a daily ZIP's members, filters ``*.xml``, reads
bytes, decodes with fallback, and parses each document — a parse failure
yields an error ROW (doc_id=None, parse_error=str(e)), never an abort
(2b_extract_find_a_tender_XMLs.py:472-488).

Spark-first shape: ``spark.read.format("binaryFile")`` over the zip files
(each zip = one row, content = bytes), then an Arrow-batched
``mapInPandas`` that explodes members — one input zip row to N member
rows — carrying lineage columns (source_zip, member_name) and per-record
error capture. Member explosion is a UDTF shape, so Python is genuinely
required; everything after the text column is declarative (xpath family,
see queries/xml_notices.py).

Scale note: one zip maps to one task's row; a directory of daily zips
parallelizes per-file. Zips are not splittable — for 100 TB the landing
zone should repartition after explosion (catalog.spread) before heavy
parsing.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from uk_procurement_data_pipeline_spark.sources.decode import try_decode_bytes

MEMBER_SCHEMA = (
    "source_zip string, member_name string, xml_text string, "
    "encoding_used string, read_error string"
)

PARSE_SCHEMA = (
    "source_zip string, member_name string, root_tag string, ns_uri string, "
    "notice_id string, parse_error string"
)


def read_zip_members(
    spark: SparkSession, zip_glob: str, member_suffix: str = ".xml"
) -> DataFrame:
    """S3: zip files -> one row per matching member with decoded text.

    Suffix filter is case-insensitive (ref 2b:474); unreadable zips
    produce a single error row instead of failing the job (E3,
    ref 2b:467-469).
    """
    bins = spark.read.format("binaryFile").load(zip_glob)
    suffix = member_suffix.lower()

    def explode_members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
                    names = [n for n in zf.namelist() if n.lower().endswith(suffix)]
                except Exception as e:  # noqa: BLE001  — skip-and-log (E3)
                    rows.append((path, None, None, None, f"bad zip: {e}"))
                    continue
                for name in sorted(names):  # lexicographic order (O1, ref 2a:60)
                    try:
                        text, enc = try_decode_bytes(zf.read(name))
                        rows.append((path, name, text, enc, None))
                    except Exception as e:  # noqa: BLE001
                        rows.append((path, name, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_zip", "member_name", "xml_text",
                    "encoding_used", "read_error",
                ],
            )

    return bins.select("path", "content").mapInPandas(
        explode_members, schema=MEMBER_SCHEMA
    )


def parse_notice_xml(members: DataFrame) -> DataFrame:
    """UD2: one XML text -> one parsed struct row OR an error row (E1).

    Mirrors ref 2b:484-488: failure emits (notice_id=None, parse_error=msg)
    and keeps lineage columns; success rows get parse_error=None.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for src, name, text in zip(
                pdf["source_zip"], pdf["member_name"], pdf["xml_text"]
            ):
                if text is None:
                    rows.append((src, name, None, None, None, "no text"))
                    continue
                try:
                    root = ElementTree.fromstring(text)
                    tag, ns = root.tag, ""
                    if tag.startswith("{"):  # dynamic namespace (F24, ref 2b:45-54)
                        ns, tag = tag[1:].split("}", 1)
                    nid = root.findtext(f"{{{ns}}}id" if ns else "id")
                    rows.append((src, name, tag, ns or None, nid, None))
                except ElementTree.ParseError as e:
                    rows.append((src, name, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "source_zip", "member_name", "root_tag",
                    "ns_uri", "notice_id", "parse_error",
                ],
            )

    return members.select("source_zip", "member_name", "xml_text").mapInPandas(
        parse, schema=PARSE_SCHEMA
    )
