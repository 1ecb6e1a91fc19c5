"""Sinks (SURVEY.md §2.1 S6/S7/S8, §2.12 E5).

The reference writes one Excel file per day (2a:654, 2b:498), appends
daily frames to a single CSV with header-once bookkeeping
(3_merge_to_two.py:41-57), and downloads raw bytes to dated paths
(1a:152-157). Spark-first equivalents: partitioned parquet (per-day file
== one partition), a single overwrite CSV write after union (header-once
bookkeeping disappears), and a foreachPartition binary writer for the
landing zone. ``observe`` attaches row-count metrics to any write (E5 —
the reference's tqdm/progress counts as queryable metrics).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """S7: the engine's canonical sink — partition pruning on read-back."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv_merged(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: merged CSV output (ref 3:41-57). One header, no append
    bookkeeping — the union happened upstream. coalesce(1) mirrors the
    reference's single-file contract; drop it for sharded output at scale."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def write_partitioned_orc(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """S7 in ORC: same partitioned-sink contract as parquet but the other
    in-core columnar format (zlib by default, predicate pushdown and
    column pruning on read-back via the native OrcScan). Kept beside the
    parquet sink because warehouse migrations routinely need both; no
    external jar — ORC support ships in Spark core."""
    df.write.mode(mode).partitionBy(*partition_cols).orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan — partition pruning + filter pushdown, same as parquet."""
    return spark.read.orc(path)


def compact_parquet(
    spark, in_dir: str, out_dir: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files and return that file count.

    Incremental sinks (availableNow ingest, the foreachBatch merge, daily
    partition appends) accumulate many small files; at scale every one
    costs a task launch, a footer read, and NameNode/liststore pressure.
    Compaction is the standard maintenance pass. Sizing uses the INPUT
    bytes listed from the filesystem — never a count() job — and
    ``coalesce`` (no shuffle) since output order is free.
    """
    total = sum(f.stat().st_size for f in Path(in_dir).rglob("*.parquet"))
    n_files = max(1, -(-total // target_file_bytes))
    spark.read.parquet(in_dir).coalesce(n_files).write.mode("overwrite").parquet(
        out_dir
    )
    return n_files


def write_binary_files(
    df: DataFrame, out_dir: str, name_col: str = "name", payload_col: str = "payload"
) -> DataFrame:
    """S6: landing-zone byte sink via foreachPartition (ref 1a:152-157).

    Executor-side writes, one file per row; out_dir must be a shared
    filesystem (object store in production, local dir under local[*]).

    Names come from DATA (zip member names, scraped URLs) and are
    untrusted: absolute paths and ``..`` components would escape the
    landing zone (zip-slip). Escaping rows are never written; they come
    back as the returned error DataFrame (``name``, ``error``) — the
    repo's skip-and-log contract (E3). A defensive executor-side re-check
    backs the driver-side filter.
    """
    out = str(out_dir)

    def _unsafe(name: str) -> bool:
        p = Path(name)
        return p.is_absolute() or ".." in p.parts or name.startswith("~")

    def write_partition(rows) -> None:
        base = Path(out).resolve()
        base.mkdir(parents=True, exist_ok=True)
        for row in rows:
            name = row[name_col]
            target = (base / name).resolve()
            if _unsafe(name) or not target.is_relative_to(base):
                raise ValueError(f"path escape slipped past the filter: {name!r}")
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(row[payload_col])

    name = F.col(name_col)
    part = f"split(regexp_replace({name_col}, '^/+', '/'), '/')"
    escapes = (
        name.startswith("/")
        | name.startswith("~")
        | F.expr(f"exists({part}, x -> x = '..')")
        | name.rlike("^[A-Za-z]:")  # windows drive-absolute
    )
    good = df.where(~escapes)
    bad = df.where(escapes).select(
        name.alias("name"), F.lit("path_escapes_landing_zone").alias("error")
    )
    good.select(name_col, payload_col).foreachPartition(write_partition)
    return bad


def write_clustered_parquet(
    df: DataFrame, path: str, cluster_col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Range-clustered sorted parquet layout (liquid-clustering-lite).

    ``repartitionByRange`` splits the keyspace into ``n_files`` contiguous,
    non-overlapping ranges (one range shuffle, sampled boundaries) and
    ``sortWithinPartitions`` orders rows inside each file, so every parquet
    row group carries a TIGHT min/max for ``cluster_col``. A later scan
    with a range predicate on that column then skips whole files and row
    groups on footer statistics alone — at 100 TB this is the difference
    between scanning everything and scanning the one-percent slice a
    time-range query actually touches. Partitioned directories (S7) give
    coarse pruning on low-cardinality keys; this is the complement for
    high-cardinality sort keys (timestamps, ids) where one-directory-per-
    value would explode the namespace.
    """
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Delta-format sink (ACID upserts/time travel at the 100 TB design
    point). The delta-spark jars are not in this environment — fail fast
    with guidance; parquet is the canonical local format."""
    try:
        df.write.format("delta").mode(mode).save(path)
    except Exception as e:  # noqa: BLE001  — jar not on classpath
        raise NotImplementedError(
            "Delta writes need the delta-spark package "
            "(--packages io.delta:delta-spark_2.13:<ver> plus the "
            "DeltaCatalog session extensions); use write_partitioned_parquet "
            "in this environment"
        ) from e


def observed_count(df: DataFrame, name: str = "sink") -> tuple[DataFrame, Observation]:
    """E5: attach row/null-free metrics; read obs.get after an action."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
