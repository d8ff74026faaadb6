"""Source layer: reading the engine's input tables.

The reference has no storage layer (in-memory pandas frames only —
SURVEY.md §2.3); on Spark the sources are ordinary ``spark.read`` scans so
that Catalyst gets predicate pushdown / column pruning / partition pruning
for free.  The one wrinkle this module owns: parquet files written with
TIMESTAMP(NANOS) (pyarrow default) are rejected by Spark's vectorized reader
unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case Spark
4.x surfaces them as ``timestamp_ntz`` — ``read_table`` applies the setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .layout import zorder_layout, zorder_scale, zorder_value  # noqa: F401

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def configure(spark: SparkSession) -> SparkSession:
    """Session settings the engine relies on (safe to call repeatedly).

    ``inferTimestampNTZ`` is disabled because parquet timestamps written
    without ``isAdjustedToUTC`` (pyarrow's tz-naive default) would otherwise
    surface as ``TIMESTAMP_NTZ``, which Spark rejects in ``unix_micros`` /
    time-window expressions.  With the session timezone pinned to UTC the
    instant-semantics read is value-identical to the NTZ read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # pragma: no cover - older Spark without the conf
        pass
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver's synthetic tables (TESTDATA.md).

    TIMESTAMP(NANOS) parquet columns arrive as nanosecond longs under
    ``nanosAsLong`` — convert them back to timestamps (microsecond
    truncation; the synthetic data is second-granular).
    """
    configure(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        from pyspark.sql import functions as F

        for field in schema:
            if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
                df = df.withColumn(field.name,
                                   F.timestamp_micros(F.expr(f"`{field.name}` div 1000")))
    except ImportError:  # pragma: no cover
        pass
    return _normalize_timestamps(df)


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any ``TIMESTAMP_NTZ`` column to ``TIMESTAMP``.

    Belt-and-braces on top of ``configure``'s ``inferTimestampNTZ`` switch:
    the conf only affects schema inference at scan planning, so a relation
    cached before ``configure`` ran (or an NTZ column from another source)
    would still leak NTZ into consumers.  Session tz is pinned UTC, so the
    cast is value-preserving.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz})
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_table(
    df: DataFrame,
    path: str,
    partition_by=None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Sink: write a result table with scale-sane defaults.

    * ``partition_by`` — hive-style directory partitioning for downstream
      partition pruning (pick low-cardinality columns; a high-cardinality
      partition key means millions of tiny files).
    * ``max_records_per_file`` caps file size so a skewed task cannot emit
      one giant file (Spark splits output files at the cap without an
      extra shuffle).

    The write is an ordinary ``DataFrameWriter`` pipeline — no collect, no
    coalesce(1); output parallelism follows the plan's partitioning, which
    AQE has already coalesced to sensible sizes.
    """
    w = (df.write.format(fmt).mode(mode)
         .option("maxRecordsPerFile", max_records_per_file))
    if fmt == "csv":
        w = w.option("header", True)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by,
    n_buckets: int,
    sort_by=None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Sink a managed BUCKETED table (``bucketBy`` + optional ``sortBy``).

    Bucketing is the standing answer to repeated large-table joins and
    aggregations on a stable key: two tables bucketed on the same key with
    the same bucket count join WITHOUT a shuffle (Catalyst sees the
    hash-partitioned output layout), and a groupBy on the bucket key skips
    its exchange.  At 100 TB, pre-bucketing the fact tables on the join key
    turns every downstream equi-join from a full shuffle into a local
    zip of buckets — the biggest single plan saving available to a
    repeatedly-queried dataset.

    Bucketed output requires the table catalog (``saveAsTable``; plain
    ``save`` cannot record bucket metadata).  ``path`` pins the table to an
    external location.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
):
    """Read a table in any supported format (parquet / csv / json / orc),
    with scale-sane defaults per format.

    * ``fmt=None`` infers from the file extension.
    * CSV: ``header`` defaults on; pass ``schema`` in production — the
      default ``inferSchema`` pass reads the whole input TWICE at 100 TB.
    * JSON: expects JSON Lines (the only splittable JSON layout; a single
      giant array is one unsplittable task); ``multiLine`` only on request.
    * ``text``: one row per line (``value`` string) — the raw-corpus
      ingestion path; pass ``wholetext=True`` for one row per FILE
      (unsplittable by definition: each file is one task).  Plain text is
      splittable, ``.gz`` is not — prefer many modest files or a
      splittable codec for large corpora.
    * ``binary``: Spark's ``binaryFile`` source — (path, modificationTime,
      length, content) per file, the ingestion path for image/audio/video
      payloads feeding ``pipeline.multimodal`` (each file is one task;
      keep files at object granularity, not giant archives).
    * Timestamps are normalized exactly like ``read_table``
      (TIMESTAMP_NTZ -> TIMESTAMP, session tz UTC).
    """
    configure(spark)
    if fmt is None:
        ext = path.rsplit(".", 1)[-1].lower()
        fmt = {"parquet": "parquet", "csv": "csv", "json": "json",
               "jsonl": "json", "orc": "orc", "txt": "text",
               "text": "text"}.get(ext)
        if fmt is None:
            raise ValueError(
                f"cannot infer format from {path!r}; pass fmt=...")
    if fmt == "binary":
        fmt = "binaryFile"
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.options(**options).format(fmt).load(path)
    return _normalize_timestamps(df)
