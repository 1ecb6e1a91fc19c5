"""ZIP-of-XML as a registered Spark Python DataSource (SURVEY.md §2.1 S3
in the idiomatic Spark-4 packaging).

sources/zip_xml.py expresses the reference's daily-ZIP scan
(2b_extract_find_a_tender_XMLs.py:467-488) as binaryFile + mapInPandas.
This module packages the SAME row contract as a first-class source via
the Python DataSource API (pyspark.sql.datasource, new in Spark 4), so a
user writes:

    spark.dataSource.register(ZipXmlDataSource)
    df = spark.read.format("zipxml").option("suffix", ".xml").load(glob)

Why both forms exist: the DataSource form gives Spark real PARTITION
PLANNING — one InputPartition per zip file, so a directory of daily zips
fans out across executors without first materializing whole-zip byte
rows through an Arrow channel (binaryFile ships each zip's full bytes to
Python; the DataSource reader opens the file directly on the executor,
streaming members out of the stdlib zipfile reader). Same E3 semantics:
an unreadable zip yields one error row, never a job failure; members
emit in lexicographic order (O1, ref 2a:60).

Scale: planning lists files driver-side (cheap metadata), reads are
executor-local, and the partition count equals the file count — the
natural parallel grain for a non-splittable container format. Rows
stream out in batches bounded by a single member's text, not a whole
zip's bytes.
"""

from __future__ import annotations

import glob as _glob
import zipfile
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from uk_procurement_data_pipeline_spark.sources.decode import try_decode_bytes

ZIPXML_SCHEMA = (
    "source_zip string, member_name string, xml_text string, "
    "encoding_used string, read_error string"
)


class _ZipPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class ZipXmlReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        self.suffix = options.get("suffix", ".xml").lower()
        if not self.path:
            raise ValueError("zipxml source requires a path (load(<glob>))")

    def partitions(self) -> list[InputPartition]:
        # Driver-side metadata listing only; one partition per zip file —
        # the parallel grain of a non-splittable container.
        return [_ZipPartition(p) for p in sorted(_glob.glob(self.path))]

    def read(self, partition: _ZipPartition) -> Iterator[tuple]:
        path = partition.path
        try:
            zf = zipfile.ZipFile(path)
            names = [
                n for n in zf.namelist() if n.lower().endswith(self.suffix)
            ]
        except Exception as e:  # noqa: BLE001 — E3: flag, don't fail
            yield (path, None, None, None, f"bad zip: {e}")
            return
        for name in sorted(names):  # O1: lexicographic member order
            try:
                text, enc = try_decode_bytes(zf.read(name))
                yield (path, name, text, enc, None)
            except Exception as e:  # noqa: BLE001
                yield (path, name, None, None, str(e))


class ZipXmlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zipxml"

    def schema(self) -> str:
        return ZIPXML_SCHEMA

    def reader(self, schema) -> ZipXmlReader:  # noqa: ANN001 (Spark API)
        return ZipXmlReader(self.options)
