"""File-corpus ingestion: JSONL (and raw text) document readers/writers.

The ingestion front door of a training-data pipeline: crawl shards and
annotation dumps arrive as JSON Lines, and at 100 TB the reader's
behavior on MALFORMED lines is a correctness feature, not a detail —
dropping them silently biases the corpus, failing the job on one bad
line wastes the cluster.  These wrappers pin down the production
settings:

- **PERMISSIVE + quarantine column**: every unparseable line survives
  as its raw text in ``_corrupt_record`` (never silently dropped,
  never fatal); :func:`split_quarantine` separates clean rows from the
  quarantine for reprocessing/auditing.
- **Explicit schema**: at scale, schema inference is a full extra pass
  over the data (Spark samples EVERY file before the real read) and a
  correctness hazard (a shard where a field happens to be all-null
  infers differently).  ``read_jsonl`` therefore takes the schema as a
  required argument.
- **Splittability**: uncompressed or bzip2/zstd-seekable ``.jsonl``
  splits per-line across tasks; ``.gz`` does NOT (one task per file) —
  shard gzip corpora into many files upstream.

Reference scope note: the reference ingests via DataFrames handed to
``load`` (its connectors own only DB I/O, connector.py:376-452); file
ingestion is part of this repo's large-scale-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: the quarantine column PERMISSIVE mode fills for unparseable lines
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read JSON Lines with production error semantics.

    Returns the declared columns plus *corrupt_col* (string): NULL for
    clean rows; the raw line for malformed ones (bad JSON, or JSON
    whose types contradict *schema*) with every declared column NULL.
    One streamed pass, fully parallel, no driver involvement.
    """
    return (
        spark.read.schema(_with_quarantine(spark, schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def _with_quarantine(
    spark: SparkSession, schema: StructType | str, corrupt_col: str
) -> StructType:
    """Declared schema + the quarantine column (shared by every
    quarantining reader; rejects a colliding user column)."""
    if isinstance(schema, str):
        schema = _parse_ddl(spark, schema)
    if any(f.name == corrupt_col for f in schema.fields):
        msg = f"schema must not already contain {corrupt_col!r}"
        raise ValueError(msg)
    return StructType(
        [*schema.fields, StructField(corrupt_col, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read CSV with the same production error semantics as
    :func:`read_jsonl`: PERMISSIVE parsing, explicit schema, malformed
    lines preserved verbatim in *corrupt_col* — annotation dumps and
    metadata sidecars arrive as CSV as often as JSONL, and the
    silently-dropped-row failure mode is identical.

    Fidelity notes (oracle-checked by ``docs_csv_roundtrip``): this
    READER does not trim field whitespace (Spark's reader defaults),
    but Spark's CSV *writer* trims surrounding whitespace unless
    ``ignoreLeading/TrailingWhiteSpace`` are set ``false`` — a silent
    lossiness trap for text ending in a space.  Embedded newlines need
    ``multiLine=true``, which reads one task per file; keep
    newline-bearing text in JSONL and CSV for metadata sidecars."""
    return (
        spark.read.schema(_with_quarantine(spark, schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def _parse_ddl(spark: SparkSession, ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    try:
        return _parse_datatype_string(ddl)
    except Exception:  # pragma: no cover - older API fallback
        return spark.createDataFrame([], ddl).schema


def split_quarantine(
    df: DataFrame, *, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the quarantine column, quarantined raw lines).

    The clean side is a plain filter+project (no shuffle, pushes to the
    scan).  The quarantine side is pinned through a LAZY
    ``localCheckpoint``: Spark refuses any file-source query whose
    pruned column set is the corrupt column alone
    (``QUERY_ONLY_CORRUPT_RECORD_COLUMN`` — the raw line only exists
    while the parser is looking at it), so the quarantine's first
    action materializes the filtered rows once (quarantine-sized, tiny
    by construction) and every count/collect/write runs against that
    pin instead of the raw scan.
    """
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = (
        df.where(F.col(corrupt_col).isNotNull())
        .localCheckpoint(eager=False)
        .select(corrupt_col)
    )
    return clean, bad


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read an ORC corpus (the columnar interchange sibling of parquet).

    ORC is self-describing, so *schema* is optional — but passing it
    pins the read to the declared columns/types (merge-schema drift in
    a 100 TB directory written by many jobs surfaces as an analysis
    error here instead of a silent type widening downstream).  No
    quarantine column: ORC is a binary columnar format, not
    line-oriented — a corrupt stripe fails the task loudly (there is
    no per-row "malformed line" to preserve), which is the correct
    production behavior for a format with built-in checksums.

    Scale behavior (why ORC earns a front door next to JSONL/CSV):
    splits by stripe (fully parallel), predicate pushdown reaches the
    stripe/row-group indexes AND optional per-column bloom filters
    written by :func:`write_orc` — a selective ``doc_id`` probe skips
    whole stripes without decompressing them.
    """
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = _parse_ddl(spark, schema)
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    compression: str = "zstd",
    bloom_filter_cols: list[str] | None = None,
    partitions: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write a corpus as ORC (zstd by default — the ratio/speed
    sweet spot for text at scale).

    *bloom_filter_cols* writes per-column bloom filters into the file
    footers (``orc.bloom.filter.columns``): point lookups and selective
    joins on those columns later skip non-matching stripes entirely.
    Spend them on high-cardinality probe keys (``doc_id``, content
    hashes) — a bloom filter on a 5-value ``lang`` column is pure
    footer bloat.  *partitions* controls shard count = downstream read
    parallelism, same contract as :func:`write_jsonl`.
    *partition_by* lands a Hive directory layout (``lang=en/...``):
    reads filtered on those columns prune whole directories before any
    IO (``PartitionFilters`` in the plan) — the right layout for
    low-cardinality slice keys (language, source, date), never for
    high-cardinality ones (a directory per doc_id is a metastore DoS).
    """
    if partitions is not None:
        df = df.repartition(int(partitions))
    writer = df.write.mode(mode).option("compression", compression)
    if bloom_filter_cols:
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    compression: str | None = None,
    partitions: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write a corpus as JSON Lines (one object per line, one file per
    partition — shard count = downstream read parallelism for
    unsplittable compression).  *partition_by* lands a Hive directory
    layout whose columns prune at read time (see :func:`write_orc`);
    the partition columns move into the directory names and out of the
    JSON objects — readers get them back from the paths.  Caveat for
    quarantining reads of such a layout: a bare ``count()`` whose
    filter touches only partition columns references just the corrupt
    record file-side, which Spark refuses
    (``QUERY_ONLY_CORRUPT_RECORD_COLUMN``) — select a data column (or
    cache) first, the same caveat as the quarantine side of
    :func:`split_quarantine`."""
    if partitions is not None:
        df = df.repartition(int(partitions))
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
