"""Grouped mode with deterministic tie-break.

Reference: ``catabra_pandas/misc.py:848-936`` — per-group most frequent value
plus its count; ties broken deterministically (most frequent, then smallest
value — the stable sort at ``misc.py:930-933``); ``dropna`` option; groups
whose values are all null get mode=null, count=0.

Spark mapping (SURVEY.md §2.1 #8): ``groupBy(keys, value).count()`` then
``row_number()`` over ``Window.partitionBy(keys).orderBy(count desc, value)``
filtered to 1.  Two shuffles on the same keys (count + window); map-side
partial aggregation makes the first cheap even on skewed 100 TB inputs, and
the second operates on the already-reduced (group, value) distinct set.
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

    values = grouped
    if dropna:
        values = values.filter(F.col(column).isNotNull())

    counts = values.groupBy(*group_by, column).agg(F.count(F.lit(1)).alias(count_name))
    w = Window.partitionBy(*group_by).orderBy(F.col(count_name).desc(), F.col(column).asc_nulls_last())
    best = (
        counts.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
        .withColumnRenamed(column, mode_name)
    )

    if dropna:
        # reinstate all-null groups with mode=null, count=0
        all_groups = grouped.select(*group_by).distinct()
        best = (
            all_groups.join(best, on=group_by, how="left")
            .withColumn(count_name, F.coalesce(F.col(count_name), F.lit(0)))
        )
    return best
