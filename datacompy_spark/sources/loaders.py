"""Source loading: format inference + scale-aware parquet/csv/json readers.

Parity: reference CLI backends (``cli/backends.py:56-105`` format inference,
``:290-303`` Spark loaders). Extension: transparent handling of
nanosecond-precision parquet timestamps, which vanilla Spark rejects with
PARQUET_TYPE_ILLEGAL — we read them as longs and truncate to microseconds
(exactly what DuckDB/Arrow do when downcasting ns → us).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _cast_ntz_to_timestamp(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP (session tz, UTC here).

    Spark 4.x infers parquet timestamp-without-timezone (``timestamp[us]``,
    no tz) as TIMESTAMP_NTZ. NTZ is rejected by ``withWatermark``,
    ``unix_millis`` and long casts, and DuckDB (our oracle) treats the same
    column as plain TIMESTAMP — so the engine presents a single TIMESTAMP
    type at the source boundary. With the session timezone fixed to UTC the
    cast is value-preserving."""
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df

_EXT_FORMAT = {
    ".csv": "csv",
    ".parquet": "parquet",
    ".pq": "parquet",
    ".json": "json",
    ".jsonl": "jsonl",
    ".ndjson": "jsonl",
    ".orc": "orc",
    # .tsv deliberately unmapped (ref cli/backends.py:84-88): require explicit
    # format + delimiter rather than guessing.
}


def infer_format(path: str) -> Optional[str]:
    """Extension → format (ref ``cli/backends.py:56-100``)."""
    _, ext = os.path.splitext(path.rstrip("/"))
    return _EXT_FORMAT.get(ext.lower())


def _nanos_timestamp_fields(path: str) -> list[str]:
    """Driver-side metadata probe: which columns are timestamp[ns]?"""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan; ns-timestamps are truncated to us so downstream
    comparisons agree with Arrow/DuckDB semantics."""
    ns_cols = _nanos_timestamp_fields(path)
    if not ns_cols:
        return _cast_ntz_to_timestamp(spark.read.parquet(path))
    try:
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        prev = None
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        # .schema forces analysis (and schema capture) while the flag is set,
        # so restoring the conf afterwards cannot affect this (lazy) scan
        df = spark.read.parquet(path)
        df.schema
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    for c in ns_cols:
        # integer `div`, NOT `/`: ns values exceed 2^53, double division would
        # lose the low microsecond bit
        df = df.withColumn(c, F.expr(f"timestamp_micros(CAST(`{c}` div 1000 AS BIGINT))"))
    return _cast_ntz_to_timestamp(df)


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with schema inference (ref ``cli/backends.py:290-300``).

    Extra ``options`` pass through to Spark's CSV reader (``quote``,
    ``escape``, ``encoding``, ``nullValue``, ``dateFormat``,
    ``multiLine``, ...) so real-world CSV dialects don't need a custom
    loader."""
    return spark.read.csv(
        path, header=header, inferSchema=True, sep=delimiter, **options
    )


def read_json(spark: SparkSession, path: str, lines: Optional[bool] = None) -> DataFrame:
    """JSON scan; ``.json`` is multiLine, ``.jsonl``/``.ndjson`` line-mode
    (ref ``cli/backends.py:103-105,303``)."""
    if lines is None:
        lines = infer_format(path) == "jsonl"
    return spark.read.json(path, multiLine=not lines)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw text ingestion. Line mode (default): one row per line, column
    ``value`` — the shape for line-delimited corpora. ``whole=True``: one
    row per FILE (wholetext), for document-per-file corpora; at scale
    prefer many small files over one giant file — wholetext rows are
    unsplittable."""
    return spark.read.text(path, wholetext=whole)


def read_binary(spark: SparkSession, path: str, glob: Optional[str] = None) -> DataFrame:
    """Opaque-binary ingestion via Spark's built-in ``binaryFile`` source:
    (path, modificationTime, length, content) with content as a binary
    column — the entry point for the multimodal pipeline
    (``operators/multimodal.py`` consumes exactly this shape). ``glob``
    filters by filename pattern (e.g. ``*.jpg``) INSIDE the reader, so
    non-matching files are never opened."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (Spark-native columnar reader, vectorized + predicate
    pushdown like parquet). Extension beyond the reference's CSV/parquet/
    JSON surface; NTZ timestamps are normalized the same way as parquet so
    every source presents one timestamp type."""
    return _cast_ntz_to_timestamp(spark.read.orc(path))


def load(spark: SparkSession, ref: str, fmt: Optional[str] = None, **options) -> DataFrame:
    """Load a table reference: a file path (format inferred from extension)
    or a catalog table name (ref ``cli/backends.py:341-366`` table refs)."""
    fmt = fmt or infer_format(ref)
    if fmt == "table":
        return spark.table(ref)
    if fmt == "parquet":
        return read_parquet(spark, ref)
    if fmt == "csv":
        return read_csv(spark, ref, **options)
    if fmt in ("json", "jsonl"):
        return read_json(spark, ref, lines=(fmt == "jsonl"))
    if fmt == "orc":
        return read_orc(spark, ref)
    if fmt == "text":
        return read_text(spark, ref, **options)
    if fmt == "binary":
        return read_binary(spark, ref, **options)
    if fmt is None and os.path.sep not in ref and not os.path.exists(ref):
        # not a path and no known file extension: a catalog table name,
        # possibly qualified ``db.schema.table`` (ref cli/backends.py:341-366)
        return spark.table(ref)
    raise ValueError(f"cannot infer format for {ref!r}; pass fmt= explicitly")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's testdata tables."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_columns,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a frame as a bucketed (and bucket-sorted) catalog table.

    The 100 TB compare fast path: when BOTH inputs of a comparison are
    bucketed AND sorted on the join key with the same bucket count, the
    sort-merge join needs neither an Exchange nor a Sort per side — the
    scan's output partitioning/ordering already satisfies the join. For a
    recurring comparison (e.g. nightly snapshot diff of the same table),
    bucketing both sides once amortizes every later compare to a
    scan + zip-merge. Bucketing requires the table catalog
    (``saveAsTable``), matching Spark's on-disk bucketing contract."""
    if isinstance(bucket_columns, str):
        bucket_columns = [bucket_columns]
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_columns)
    if sort:
        w = w.sortBy(*bucket_columns)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_columns,
    sort_columns=None,
    max_records_per_file: int = 0,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a hive-partitioned directory layout — the standard sink shape
    for a curated corpus or a date-partitioned event log.

    Scale contract:
    * ``partition_columns`` become directory keys, so downstream readers get
      partition PRUNING (a filter on the key never opens non-matching
      directories) — at 100 TB this is the difference between scanning one
      day and scanning three years;
    * the frame is repartitioned on the partition key first, so each task
      writes to few directories (without it, every task appends a file to
      every partition → small-file explosion: tasks × partitions files);
    * ``sort_columns`` applies ``sortWithinPartitions`` AFTER that shuffle —
      rows land clustered, giving parquet min/max row-group statistics real
      pruning power on those columns;
    * ``max_records_per_file`` caps file size without another shuffle (0 =
      Spark default). The shuffle is a REBALANCE hint, not a strict hash
      ``repartition``: AQE's ``optimizeSkewsInRebalancePartitions`` only
      splits oversized output partitions for rebalance shuffles, so a hot
      partition value (one giant day) fans out across several write tasks
      instead of funnelling through one.
    """
    if isinstance(partition_columns, str):
        partition_columns = [partition_columns]
    if isinstance(sort_columns, str):
        sort_columns = [sort_columns]
    out = df.hint("rebalance", *[F.col(c) for c in partition_columns])
    if sort_columns:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_columns])
    if mode == "overwrite_dynamic":
        # overwrite ONLY the partitions present in this frame (scoped to
        # this writer, session conf untouched) — the replay-idempotent
        # append shape: a re-run batch rewrites its own directories
        # instead of duplicating rows
        w = (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_columns)
        )
    else:
        w = out.write.mode(mode).partitionBy(*partition_columns)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.format(fmt).save(path)
