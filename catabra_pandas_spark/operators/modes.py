"""Grouped mode with deterministic tie-break.

Reference: ``catabra_pandas/misc.py:848-936`` — per-group most frequent value
plus its count; ties broken deterministically (most frequent, then smallest
value — the stable sort at ``misc.py:930-933``); ``dropna`` option; groups
whose values are all null get mode=null, count=0.

Spark mapping (SURVEY.md §2.1 #8): ``groupBy(keys, value).count()`` then a
``min_by`` reduction per group whose ordering struct encodes the tie-break
(null-last / most-frequent / smallest-value).  Two shuffles, BOTH with
map-side partial aggregation (a window + row_number pass would sort and
could not combine map-side), and no join: null values stay in the count
set, so all-null groups fall out of the same reduction instead of being
reinstated via distinct + left join.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

from ..util import as_list, ensure_columns


def grouped_mode(
    df: DataFrame,
    group_by: Union[str, Sequence[str]],
    column: str,
    dropna: bool = True,
    mode_name: str = "mode",
    count_name: str = "count",
) -> DataFrame:
    """Per-group mode of ``column`` and its frequency.

    Returns one row per distinct group (rows with null group keys are
    ignored, matching the reference), with columns ``group_by`` +
    [``mode_name``, ``count_name``].  If ``dropna`` and a group is all-null,
    mode is null and count is 0 (reference ``misc.py:903-906``).
    """
    group_by = as_list(group_by)
    ensure_columns(df, group_by + [column])

    grouped = df
    for g in group_by:
        grouped = grouped.filter(F.col(g).isNotNull())

    # count null values too: they lose every dropna tie-break, so groups
    # with any non-null value are unaffected, while all-null groups survive
    # to the reduction and come out as (null, 0) without a reinstatement join
    counts = grouped.groupBy(*group_by, column).agg(
        F.count(F.lit(1)).alias("__cnt__"))
    isnull = F.col(column).isNull().cast("int")
    negc = -F.col("__cnt__")
    # min_by order: dropna puts ANY non-null value above null; otherwise
    # null competes on frequency and loses ties (reference nulls-last sort)
    order = (F.struct(isnull, negc, F.col(column)) if dropna
             else F.struct(negc, isnull, F.col(column)))
    payload = F.struct(F.col(column).alias("m"), F.col("__cnt__").alias("c"))
    best = counts.groupBy(*group_by).agg(F.min_by(payload, order).alias("__b__"))
    cnt = (F.when(F.col("__b__.m").isNull(), F.lit(0)).otherwise(F.col("__b__.c"))
           if dropna else F.col("__b__.c"))
    return best.select(*group_by,
                       F.col("__b__.m").alias(mode_name),
                       cnt.alias(count_name))
