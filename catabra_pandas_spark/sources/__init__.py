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
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = w.partitionBy(*cols)
    w.save(path)
