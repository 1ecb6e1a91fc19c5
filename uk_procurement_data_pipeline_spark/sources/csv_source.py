"""CSV source with declared schema and error tolerance (SURVEY.md §2.1 S1,
§2.12 E1/E3/E4).

The reference reads daily CSVs with pandas, skipping unreadable files with
a log line (2a_extract_contracts_finder.py:212-216) and deriving the day
key from the filename (2a:63-72). Spark-first shape: schema-declared
PERMISSIVE read where malformed lines land in a corrupt-record column
(rows, not exceptions), lineage from ``_metadata.file_path``, and the
filename→date key as a derived column — so "skip and log" becomes "keep
and flag", queryable like any other data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_tolerant(
    spark: SparkSession, path_glob: str, schema_ddl: str, header: bool = True
) -> DataFrame:
    """S1/E1/E3: PERMISSIVE csv scan; malformed rows become flagged rows."""
    schema = f"{schema_ddl}, {CORRUPT_COL} string"
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path_glob)
    )


def with_lineage(df: DataFrame) -> DataFrame:
    """E4: source file + true within-file row ordinal (ref 2a:496-497).

    ``monotonically_increasing_id`` alone is partition-layout-dependent
    (unique within one read, but not a per-file ordinal). The ordinal here
    is a ``row_number`` per file ordered by
    (``_metadata.file_block_start``, monotonic id): the block start is the
    split's byte offset in the file, and the monotonic id is increasing
    within a split — so the ordering reconstructs file order regardless of
    how Spark packed splits into partitions. Costs one window shuffle
    keyed by file; at scale, skip this helper when any unique id (not the
    reference's ``row_index`` contract) is all the caller needs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("source_file").orderBy("__blk", "__mid")
    return (
        df.select(
            "*",
            F.col("_metadata.file_path").alias("source_file"),
            F.col("_metadata.file_block_start").alias("__blk"),
            F.monotonically_increasing_id().alias("__mid"),
        )
        .withColumn("row_index", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("__blk", "__mid")
    )


def read_excel(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """S2: Excel scan. The reference reads daily .xlsx (3_merge_to_two.py:47).

    Preferred path: the com.crealytics:spark-excel connector (full xlsx
    fidelity — styles, dates, multiple sheets). When the jar is absent —
    as in this environment — and ``columns`` declares the wanted headers,
    fall back to the jar-free stdlib scan in ``sources/excel.py``
    (binaryFile + mapInPandas over a zipfile/ElementTree parser; all
    cells as strings, caller casts). Without ``columns`` there is no
    declared schema to fall back onto, so fail fast with guidance rather
    than silently mis-reading."""
    try:
        return (
            spark.read.format("com.crealytics.spark.excel")
            .option("header", True)
            .load(path)
        )
    except Exception as e:  # noqa: BLE001 — filtered by message below
        # Fall back ONLY when the connector itself is absent; a corrupt
        # workbook / bad option / IO error raised by an INSTALLED connector
        # must surface as itself, not silently switch reader semantics
        # (same masked-secondary-failure class as catalog.load_events).
        msg = str(e)
        jar_missing = (
            "Failed to find data source" in msg
            or "Failed to find the data source" in msg
            or "ClassNotFoundException" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        )
        if not jar_missing:
            raise
        if columns is not None:
            from uk_procurement_data_pipeline_spark.sources.excel import (
                read_excel_stdlib,
            )

            return read_excel_stdlib(spark, path, columns)
        raise NotImplementedError(
            "Excel scan needs either the com.crealytics:spark-excel "
            "connector (--packages com.crealytics:spark-excel_2.13:<ver>) "
            "or a declared `columns` list for the jar-free stdlib reader "
            "(sources/excel.py read_excel_stdlib)"
        ) from e


def file_date_key(df: DataFrame, col: str = "source_file") -> DataFrame:
    """J4: derive the (year, month, day) partition key from the filename."""
    pat = r"(\d{4})-(\d{2})-(\d{2})"
    return df.select(
        "*",
        F.regexp_extract(col, pat, 1).cast("int").alias("file_year"),
        F.regexp_extract(col, pat, 2).cast("int").alias("file_month"),
        F.regexp_extract(col, pat, 3).cast("int").alias("file_day"),
    )
