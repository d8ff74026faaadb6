from __future__ import annotations

import os

import pandas as pd

from catabra_pandas_spark.sources import (read_table, write_bucketed_table,
                                          write_table)
from .conftest import to_sdf


def test_write_table_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({"g": [1, 1, 2, 2, 3], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    path = str(tmp_path / "out")
    write_table(to_sdf(spark, pdf), path, partition_by="g",
                max_records_per_file=2)
    back = spark.read.parquet(path).toPandas()
    assert sorted(back.v) == [1.0, 2.0, 3.0, 4.0, 5.0]
    # hive-style partition dirs exist for pruning
    assert any(d.startswith("g=") for d in os.listdir(path))


def test_read_table_nanos(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    dt = dict(ev.dtypes)["ts"]
    assert "timestamp" in dt
    assert ev.limit(5).count() == 5


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key with equal bucket counts must
    sort-merge join with NO exchange on either side — the co-located join
    layout that bucketing exists to provide."""
    from pyspark.sql import functions as F

    a = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    b = spark.range(0, 1000).withColumn("w", F.col("id") % 5)
    write_bucketed_table(a, "t_bucket_a", "id", 4, sort_by="id",
                         path=str(tmp_path / "a"))
    write_bucketed_table(b, "t_bucket_b", "id", 4, sort_by="id",
                         path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_read_table_normalizes_ntz(spark, tmp_path):
    """A tz-naive (TIMESTAMP_NTZ-inferred) parquet timestamp must come out of
    read_table as plain TIMESTAMP so unix_micros/time-window consumers work
    (round-3 driver regression: events.ts surfaced as TIMESTAMP_NTZ)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = str(tmp_path)
    tbl = pa.table({
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 00:00:00", "2024-01-02 12:34:56"]),
            type=pa.timestamp("us")),  # no tz -> isAdjustedToUTC=false
        "v": pa.array([1.0, 2.0]),
    })
    pq.write_table(tbl, f"{path}/t.parquet")
    df = read_table(spark, path, "t")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = (df.select(F.unix_micros(F.col("ts")).alias("us"))
             .toPandas().us.sort_values().tolist())
    assert got == [1704067200000000, 1704198896000000]


def test_read_any_csv_json_roundtrip(spark, tmp_path):
    """write_table in csv/json + read_any reproduce the parquet source
    (documents, minus the free-text column that needs csv quoting care)."""
    src = read_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "lang", "source", "n_chars")
    want = sorted(map(tuple, src.collect()))
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        write_table(src, path, fmt=fmt)
        from catabra_pandas_spark.sources import read_any
        back = read_any(spark, path, fmt=fmt, schema=src.schema)
        assert sorted(map(tuple, back.collect())) == want
    # extension inference
    from catabra_pandas_spark.sources import read_any
    single = str(tmp_path / "one.csv")
    src.limit(5).coalesce(1).write.mode("overwrite").option("header", True).csv(single)
    assert read_any(spark, single, schema=src.schema).count() == 5


def test_read_any_text_and_binary(spark, tmp_path):
    from catabra_pandas_spark.sources import read_any

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("line one\nline two\n")
    (corpus / "b.txt").write_text("dritte zeile\n")
    txt = read_any(spark, str(corpus), fmt="text")
    assert sorted(r.value for r in txt.collect()) == [
        "dritte zeile", "line one", "line two"]
    # wholetext: one row per file
    whole = read_any(spark, str(corpus), fmt="text", wholetext=True)
    assert whole.count() == 2
    # extension inference on a single file
    assert read_any(spark, str(corpus / "a.txt")).count() == 2

    blobs = tmp_path / "blobs"
    blobs.mkdir()
    (blobs / "x.bin").write_bytes(b"\x00\x01\x02")
    (blobs / "y.bin").write_bytes(b"payload")
    bin_df = read_any(spark, str(blobs), fmt="binary")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in bin_df.collect()}
    assert rows == {"x.bin": b"\x00\x01\x02", "y.bin": b"payload"}
    assert {"path", "length", "content"} <= set(bin_df.columns)
