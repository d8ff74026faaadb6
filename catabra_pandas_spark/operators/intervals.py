"""Interval set algebra: single-linkage clustering and coverage combination.

Reference: ``catabra_pandas/misc.py:125-257`` (``group_intervals``) and
``catabra_pandas/misc.py:260-436`` (``combine_intervals``).

Spark mapping (SURVEY.md §2.1 #6, #7): both are classic window-function
queries — gap-and-island via running max + cumulative sum, and an
endpoint-event sweep with a cumulative coverage counter.  One shuffle each on
the group keys; everything else is in-partition sorted streaming, which
scales linearly with partition size and parallelizes across entities.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

from ..util import as_list, ensure_columns

GROUP_ID = "interval_group"


def _orderable(c: Column, dt) -> Column:
    """Timestamps compare fine, but arithmetic with a numeric ``distance``
    needs a numeric domain — cast time-like columns to epoch seconds."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return c.cast("timestamp").cast("double")
    return c


def group_intervals(
    df: DataFrame,
    group_by: Union[str, Sequence[str], None] = None,
    point_col: Optional[str] = None,
    start_col: Optional[str] = None,
    stop_col: Optional[str] = None,
    distance=None,
    inclusive: bool = True,
    group_id_name: str = GROUP_ID,
) -> DataFrame:
    """Cluster intervals whose single-linkage distance is <= ``distance``
    (reflexive-transitive closure => equivalence classes), refining the
    ``group_by`` partition.  Reference: ``misc.py:125-257``.

    Returns ``df`` with an added long column ``group_id_name`` that numbers
    equivalence classes 0,1,... within each ``group_by`` partition in order
    of interval start (the reference returns a Series of global ids aligned
    to input order — identity-by-position has no Spark analogue, so the id is
    per-group; (group_by, group_id) is globally unique).

    Algorithm: sort by start within group; a new class starts whenever
    ``start - running_max(stop) > distance`` (strict, for ``inclusive=True``;
    ``>=`` otherwise — reference ``misc.py:230-249``); class id = cumulative
    sum of the new-class flag.  Timestamp endpoints are compared in epoch
    seconds so ``distance`` is a number of seconds.

    Scale note: with ``group_by`` this is one shuffle on the group keys and
    sorted in-partition streaming (parallel across groups).  WITHOUT
    ``group_by`` the running max is a single global sorted pass — Spark
    executes the empty-partition window on one task, so keyless clustering
    of a cluster-scale table will bottleneck; supply a coarse partition key
    whenever one exists (the reference has the identical sequential
    dependency, it is inherent to single-linkage clustering).
    """
    group_by = as_list(group_by)
    if point_col is not None:
        if start_col is not None or stop_col is not None:
            raise ValueError("point_col is mutually exclusive with start_col/stop_col")
        start_col = stop_col = point_col
    if start_col is None or stop_col is None:
        raise ValueError("either point_col or both start_col and stop_col are required")
    ensure_columns(df, group_by + [start_col, stop_col])
    if distance is None:
        distance = 0

    schema = {f.name: f.dataType for f in df.schema.fields}
    start = _orderable(F.col(start_col), schema[start_col])
    stop = _orderable(F.col(stop_col), schema[stop_col])

    w = Window.partitionBy(*group_by).orderBy(start.asc(), stop.asc()) if group_by \
        else Window.partitionBy().orderBy(start.asc(), stop.asc())
    run_max_prev = F.max(stop).over(w.rowsBetween(Window.unboundedPreceding, -1))
    gap = start - run_max_prev
    if inclusive:
        new_flag = run_max_prev.isNull() | (gap > F.lit(distance))
    else:
        new_flag = run_max_prev.isNull() | (gap >= F.lit(distance))
    gid = F.sum(new_flag.cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
    return df.withColumn(group_id_name, gid)


def combine_intervals(
    df: DataFrame,
    start_col: str = "start",
    stop_col: Optional[str] = "stop",
    length_col: Optional[str] = None,
    attr_cols: Sequence[str] = (),
    group_by: Union[str, Sequence[str], None] = None,
    n_min: int = 1,
    n_max: Optional[int] = None,
) -> DataFrame:
    """Emit maximal intervals where at least ``n_min`` (and at most
    ``n_max``) of the input intervals overlap.  ``n_min=1`` => union,
    ``n_min=k`` => k-fold intersection, ``n_min=n_max=0`` => gaps.
    Intervals sharing the same ``attr_cols`` values count as ONE interval
    (their overlaps are pre-merged).  Reference: ``misc.py:260-436``.

    Endpoints are treated as closed (touching intervals [1,2],[2,3] combine),
    matching the reference's event ordering (starts before stops at equal t,
    ``misc.py:377-401``).

    Algorithm (endpoint-event sweep, fully distributed): explode each
    interval to (+1 at start, -1 at stop) events; running coverage =
    cumulative sum ordered by (t, starts-first); adjacent event pairs define
    constant-coverage segments; in-band segments ([n_min, n_max]) are
    coalesced into maximal runs with a second cumulative-sum island pass.
    Two window passes over one shuffle on the group keys.  As with
    ``group_intervals``, the keyless (no ``group_by``) sweep is a single
    global cumulative sum and runs on one task — supply a partition key for
    cluster-scale inputs.
    """
    group_by = as_list(group_by)
    attr_cols = as_list(attr_cols)
    if (stop_col is None) == (length_col is None):
        raise ValueError("precisely one of stop_col and length_col must be given")
    out_stop = stop_col if stop_col is not None else "__stop__"
    if length_col is not None:
        df = df.withColumn(out_stop, F.col(start_col) + F.col(length_col))
    ensure_columns(df, group_by + attr_cols + [start_col, out_stop])

    ivl = df.select(*group_by, *attr_cols, start_col, out_stop).filter(
        F.col(start_col).isNotNull() & F.col(out_stop).isNotNull()
        & (F.col(start_col) <= F.col(out_stop))
    )

    if attr_cols:
        # overlaps of equal-attribute intervals count once: union per
        # (group, attrs) first, then drop the attrs for the coverage count.
        ivl = _coverage_bands(ivl, start_col, out_stop, group_by + attr_cols, 1, None)
        ivl = ivl.select(*group_by, start_col, out_stop)

    out = _coverage_bands(ivl, start_col, out_stop, group_by, n_min, n_max)
    if length_col is not None:
        out = out.withColumn(length_col, F.col(out_stop) - F.col(start_col)).drop(out_stop)
    return out


def _coverage_bands(
    ivl: DataFrame,
    start_col: str,
    stop_col: str,
    group_by: Sequence[str],
    n_min: int,
    n_max: Optional[int],
) -> DataFrame:
    group_by = list(group_by)
    starts = ivl.select(*group_by, F.col(start_col).alias("__t__"),
                        F.lit(1).alias("__delta__"), F.lit(0).alias("__tag__"))
    stops = ivl.select(*group_by, F.col(stop_col).alias("__t__"),
                       F.lit(-1).alias("__delta__"), F.lit(1).alias("__tag__"))
    events = starts.unionByName(stops)

    w = Window.partitionBy(*group_by).orderBy(F.col("__t__").asc(), F.col("__tag__").asc()) \
        if group_by else Window.partitionBy().orderBy(F.col("__t__").asc(), F.col("__tag__").asc())
    cov = F.sum("__delta__").over(w.rowsBetween(Window.unboundedPreceding, 0))
    seg_stop = F.lead("__t__", 1).over(w)
    # zero-length segments are ignored entirely: never emitted and never
    # splitting an in-band run (reference behavior, e.g. an isolated point
    # inside a gap does not split the gap — misc.py:377-427)
    seg = events.withColumns({"__cov__": cov, "__seg_stop__": seg_stop}) \
        .filter(F.col("__seg_stop__").isNotNull() & (F.col("__seg_stop__") > F.col("__t__")))

    in_band = (F.col("__cov__") >= F.lit(n_min))
    if n_max is not None:
        in_band = in_band & (F.col("__cov__") <= F.lit(n_max))
    seg = seg.withColumn("__in__", in_band)

    # coalesce adjacent in-band segments into maximal intervals
    prev_in = F.lag("__in__", 1, False).over(w)
    island = F.sum((F.col("__in__") & ~prev_in).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    seg = seg.withColumn("__island__", island).filter(F.col("__in__"))
    out = seg.groupBy(*group_by, "__island__").agg(
        F.min("__t__").alias(start_col), F.max("__seg_stop__").alias(stop_col)
    ).drop("__island__")
    return out
