"""Z-order layout: Morton-code correctness and the min-max pruning payoff
it exists for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from catabra_pandas_spark.sources.layout import (
    zorder_layout, zorder_scale, zorder_value)
from tests.conftest import to_sdf


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_value_matches_python(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"a": rng.randint(0, 1 << 12, 300),
                        "b": rng.randint(0, 1 << 12, 300)})
    sdf = to_sdf(spark, pdf)
    out = sdf.withColumn(
        "z", zorder_value([F.col("a"), F.col("b")], bits=12)).toPandas()
    for r in out.itertuples():
        assert r.z == _morton2(r.a, r.b, 12)


def test_zorder_scale_bounds(spark):
    pdf = pd.DataFrame({"x": [10, 50, 99]})
    out = to_sdf(spark, pdf).withColumn(
        "s", zorder_scale(F.col("x"), 10, 99, bits=8)).toPandas()
    assert out.s.min() == 0
    assert out.s.max() < (1 << 8)
    assert list(out.s) == sorted(out.s)


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """The point of the operator: after z-ordering on (a, b), a box filter
    on EITHER column overlaps far fewer files' min-max ranges than under
    the natural (a-sorted) layout."""
    import pyarrow.parquet as pq
    import glob
    rng = np.random.RandomState(9)
    n = 40_000
    pdf = pd.DataFrame({
        "a": np.sort(rng.randint(0, 1 << 14, n)),  # natural layout: a-sorted
        "b": rng.randint(0, 1 << 14, n),
        "v": rng.rand(n),
    })
    sdf = to_sdf(spark, pdf)

    def overlap_fraction(path, col, lo, hi):
        files = glob.glob(f"{path}/*.parquet")
        total = hit = 0
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        assert total >= 12, "need enough row groups for the test to mean anything"
        return hit / total

    plain = f"{tmp_path}/plain"
    zed = f"{tmp_path}/zed"
    (sdf.repartitionByRange(16, "a").sortWithinPartitions("a")
        .write.mode("overwrite").parquet(plain))
    zorder_layout(sdf, ["a", "b"], bits=14, num_partitions=16) \
        .write.mode("overwrite").parquet(zed)

    lo, hi = 1000, 1800  # ~5% box on each dimension
    # natural layout prunes a (sorted) but scans everything for b
    assert overlap_fraction(plain, "b", lo, hi) == 1.0
    # z-order prunes BOTH dimensions substantially (range-partition
    # boundaries come from sampling, so assert a robust margin, not the
    # ideal ~2/16)
    assert overlap_fraction(zed, "a", lo, hi) <= 0.6
    assert overlap_fraction(zed, "b", lo, hi) <= 0.6


def test_zorder_validation(spark):
    pdf = to_sdf(spark, pd.DataFrame({"a": [1], "b": [2]}))
    with pytest.raises(ValueError):
        zorder_layout(pdf, ["a"])
    with pytest.raises(ValueError):
        zorder_value([F.col("a")] * 5, bits=16)
