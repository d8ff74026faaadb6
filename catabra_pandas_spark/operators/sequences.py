"""Sequence operators: prev/next neighbor values and grouped imputation.

Reference semantics: ``catabra_pandas/misc.py:439-641`` (``prev_next_values``)
and ``catabra_pandas/misc.py:699-845`` (``impute``).

Spark mapping (SURVEY.md §2.1 #9, #10): pure window functions —
``lag``/``lead`` with fill values, and ``last``/``first`` with
``ignorenulls=True`` over bounded row frames.  No joins, no extra shuffles
beyond the single hash-partition on the group keys; at 100 TB the only cost is
one exchange + in-partition sort per distinct (group_by, order) pair, which
Catalyst reuses across all columns computed here.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F

from ..util import as_list, ensure_columns


def prev_next_values(
    df: DataFrame,
    sort_by: Union[str, Sequence[str]],
    columns: Mapping[str, Mapping[str, object]],
    group_by: Union[str, Sequence[str], None] = None,
    first_indicator_name: Optional[str] = None,
    last_indicator_name: Optional[str] = None,
    keep_sorted: bool = False,
) -> DataFrame:
    """For each row, previous/next values of selected columns within groups.

    Mirrors reference ``prev_next_values`` (``misc.py:439-641``): ``columns``
    maps a source column to a spec dict with optional keys ``prev_name``,
    ``prev_fill``, ``next_name``, ``next_fill``.  ``first_indicator_name`` /
    ``last_indicator_name`` add boolean is-first/is-last-in-group columns.

    Differences on Spark: no ``inplace`` (DataFrames are immutable) and no
    implicit row order — ``sort_by`` is required.  ``keep_sorted=True`` sorts
    the result by (group_by, sort_by); otherwise row order is undefined (the
    reference restores input order, ``misc.py:619-633``; on Spark attach your
    own id before calling if you need that).
    """
    sort_by = as_list(sort_by)
    group_by = as_list(group_by)
    ensure_columns(df, sort_by + group_by + list(columns))

    w = Window.partitionBy(*group_by).orderBy(*[F.col(c) for c in sort_by]) if group_by \
        else Window.partitionBy().orderBy(*[F.col(c) for c in sort_by])

    out = df
    new_cols: list[tuple[str, Column]] = []
    for col, spec in columns.items():
        prev_name = spec.get("prev_name")
        next_name = spec.get("next_name")
        # Fill values apply ONLY at group boundaries (first row for prev, last
        # row for next) — a genuinely-null neighbor *value* stays null, per
        # reference ``misc.py:595-604`` (``s[prev_mask] = prev_fill``).  lag/
        # lead's third argument has exactly this semantics: the default is
        # used when the offset row lies outside the partition, never when the
        # offset row exists but holds null.
        if prev_name is not None:
            fill = spec.get("prev_fill")
            c = F.lag(F.col(col), 1, fill).over(w)
            new_cols.append((prev_name, c))
        if next_name is not None:
            fill = spec.get("next_fill")
            c = F.lead(F.col(col), 1, fill).over(w)
            new_cols.append((next_name, c))

    if first_indicator_name is not None:
        new_cols.append((first_indicator_name, F.row_number().over(w) == F.lit(1)))
    if last_indicator_name is not None:
        # row_number over the reversed order; computed via count-lookahead to
        # share the same ascending sort instead of forcing a second sort.
        w_full = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        new_cols.append((last_indicator_name, F.count(F.lit(1)).over(w_full) == F.lit(1)))

    out = out.withColumns(dict(new_cols))
    if keep_sorted:
        out = out.orderBy(*(group_by + sort_by))
    return out


_IMPUTE_METHODS = ("ffill", "bfill", "afill", "lfill", "linear")


def impute(
    df: DataFrame,
    method: str = "ffill",
    columns: Union[str, Sequence[str], None] = None,
    group_by: Union[str, Sequence[str], None] = None,
    order_by: Union[str, Sequence[str], None] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """Grouped imputation by forward/backward filling and/or linear
    interpolation.  Reference: ``misc.py:699-845``.

    * ``ffill`` / ``bfill``: last/first non-null within ``limit`` rows.
    * ``afill``: average of ffill and bfill, coalesced to whichever exists
      (reference ``misc.py:744-758``).
    * ``linear``: interior-only position-based interpolation ("row index
      values are completely ignored", reference ``misc.py:720-721``); here
      position = row rank under ``order_by`` within the group.
    * ``lfill``: linear, then ffill, then bfill.

    ``order_by`` is required (Spark rows have no intrinsic order; the
    reference assumes the frame "must be correctly ordered already").
    ``columns`` defaults to all columns except group/order keys.
    """
    if method not in _IMPUTE_METHODS:
        raise ValueError(f"method must be one of {_IMPUTE_METHODS}, got {method!r}")
    group_by = as_list(group_by)
    order_by = as_list(order_by)
    if not order_by:
        raise ValueError("order_by is required for impute() on Spark")
    if columns is None:
        columns = [c for c in df.columns if c not in group_by + order_by]
    columns = as_list(columns)
    ensure_columns(df, group_by + order_by + columns)

    base = Window.partitionBy(*group_by).orderBy(*[F.col(c) for c in order_by]) if group_by \
        else Window.partitionBy().orderBy(*[F.col(c) for c in order_by])

    # limit=None must map to the UNBOUNDED frame bound, not a huge numeric
    # offset: Spark executes unboundedPreceding..currentRow as a streaming
    # running aggregate, while any finite bound is a sliding frame that
    # buffers `lim` preceding rows per row — a per-partition memory blowup
    # at scale for no semantic difference.
    lo = Window.unboundedPreceding if limit is None else -limit
    hi = Window.unboundedFollowing if limit is None else limit

    def _ffill(col: str, w: WindowSpec) -> Column:
        return F.last(F.col(col), ignorenulls=True).over(w.rowsBetween(lo, 0))

    def _bfill(col: str, w: WindowSpec) -> Column:
        return F.first(F.col(col), ignorenulls=True).over(w.rowsBetween(0, hi))

    if method in ("ffill", "bfill", "afill"):
        upd = {}
        for c in columns:
            if method == "ffill":
                upd[c] = _ffill(c, base)
            elif method == "bfill":
                upd[c] = _bfill(c, base)
            else:
                fwd, bwd = _ffill(c, base), _bfill(c, base)
                both = (fwd + (bwd - fwd) / F.lit(2.0))
                upd[c] = F.coalesce(both, fwd, bwd)
        return df.withColumns(upd)

    # linear / lfill: need prev/next non-null values AND their row positions.
    pos = F.row_number().over(base)
    POS = "__impute_pos__"
    out = df.withColumn(POS, pos)
    w = Window.partitionBy(*group_by).orderBy(F.col(POS)) if group_by \
        else Window.partitionBy().orderBy(F.col(POS))
    upd = {}
    for c in columns:
        prev_v = F.last(F.col(c), ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, -1))
        prev_p = F.last(F.when(F.col(c).isNotNull(), F.col(POS)), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1))
        next_v = F.first(F.col(c), ignorenulls=True).over(w.rowsBetween(1, Window.unboundedFollowing))
        next_p = F.first(F.when(F.col(c).isNotNull(), F.col(POS)), ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing))
        frac = (F.col(POS) - prev_p) / (next_p - prev_p)
        interp = prev_v + (next_v - prev_v) * frac
        # pandas interpolate(limit=k) fills at most k consecutive NaNs,
        # counted forward from the previous valid value.
        if limit is not None:
            interp = F.when((F.col(POS) - prev_p) <= F.lit(limit), interp)
        upd[c] = F.coalesce(F.col(c), interp)
    out = out.withColumns(upd)
    if method == "lfill":
        upd2 = {c: F.coalesce(F.col(c), _ffill(c, w), _bfill(c, w)) for c in columns}
        out = out.withColumns(upd2)
    return out.drop(POS)
