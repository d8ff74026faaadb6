from __future__ import annotations

import os

import pandas as pd

from catabra_pandas_spark.sources import read_table, write_table
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
