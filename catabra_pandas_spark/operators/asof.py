"""As-of join: for each left row, the single closest right row in time.

The reference expresses as-of behavior through ``merge_intervals`` with
half-open intervals plus ``keep="first"/"last"`` (reference
``catabra_pandas/merging.py:92-98`` documents the pattern); pandas users
know the dedicated ``pd.merge_asof`` API.  This module provides that API
Spark-first.

Scale design — a SWEEP, not a join: both inputs are unioned into one frame
tagged by side, shuffled once on the ``by`` keys, sorted by the ``on`` key
within each partition, and each left row picks up the nearest right row via
``last(..., ignorenulls=True)`` / ``first(..., ignorenulls=True)`` window
fills.  Compared to the join formulation (range-join then per-left-row
reduction) this needs ONE shuffle, no candidate-pair explosion, and no
keep-reduction aggregation — the same reason the reference's sweep kernel
(``merging.py:829-1113``) beats product joins on large inputs.  At 100 TB
the cost is exactly one exchange of (left + right) rows plus a
per-partition sort; there is no intermediate larger than the input.

Without ``by`` keys the window is global (single-task sort) — same caveat
as keyless ``group_intervals``; supply ``by`` whenever the data has any
natural key.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..util import as_list, ensure_columns, exact_numeric_double as _num

_IS_L = "__asof_is_left__"
_R = "__asof_right__"
_T = "__t__"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    allow_exact_matches: bool = True,
    suffixes: tuple = ("", "_r"),
) -> DataFrame:
    """As-of join ``left`` with ``right`` on the ordered key ``on``,
    optionally within ``by`` equi-groups (the ``pd.merge_asof`` contract).

    * ``direction="backward"``: match the right row with the largest
      ``on`` <= left's (``<`` when ``allow_exact_matches=False``).
    * ``direction="forward"``: smallest ``on`` >= left's.
    * ``direction="nearest"``: whichever of the two is closer in absolute
      distance; ties go backward (pandas semantics).
    * ``tolerance``: maximum allowed |left.on - right.on| as a NUMBER in the
      key's units — for timestamp/date and DAY-TIME INTERVAL keys, SECONDS.
      A ``datetime.timedelta`` / ``pd.Timedelta`` is accepted and converted
      via ``total_seconds()``.  ``None`` = unbounded.
    * ``suffixes[1]`` renames right payload columns that collide with left
      column names (``suffixes[0]`` is accepted for pandas signature parity
      but left columns are never renamed).

    ``on`` and ``by`` must exist under the same names in both frames.  Right
    rows with a null ``on`` never match; left rows with a null ``on`` get no
    match.  Among right rows tied on (``by``, ``on``) the match is the one
    with the greatest payload (deterministic struct ordering) — pandas picks
    by row position, which Spark does not have.

    Every left row appears exactly once in the output (left outer
    semantics), with the right payload columns null when unmatched.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if tolerance is not None and hasattr(tolerance, "total_seconds"):
        tolerance = tolerance.total_seconds()
    by = as_list(by)
    ensure_columns(left, [on] + by, "left column")
    ensure_columns(right, [on] + by, "right column")

    for reserved in (_IS_L, _R, _T):
        if reserved in left.columns or reserved in right.columns:
            raise ValueError(f"column name {reserved!r} is reserved by merge_asof")

    rsuf = suffixes[1]
    payload = [c for c in right.columns if c != on and c not in by]
    out_names = {}
    for c in payload:
        name = c + rsuf if c in left.columns else c
        if name in left.columns or name in out_names.values():
            raise ValueError(f"right column {c!r} still collides as {name!r}; "
                             f"pick different suffixes")
        out_names[c] = name

    # one unioned sweep frame: left rows carry their own columns, right rows
    # carry (by, on) plus their payload packed into one struct whose FIRST
    # field is the on-key (so struct ordering is primarily by time, making
    # the tie-break among duplicate right keys deterministic = max payload)
    rstruct = F.struct(
        F.col(on).alias(_T),
        *[F.col(c).alias(out_names[c]) for c in payload]).alias(_R)
    r2 = (right.filter(F.col(on).isNotNull())
          .select(*by, F.col(on), rstruct)
          .withColumn(_IS_L, F.lit(False)))
    l2 = left.withColumn(_IS_L, F.lit(True))
    u = l2.unionByName(r2, allowMissingColumns=True)

    on_dt = dict(zip(u.columns, [f.dataType for f in u.schema.fields]))[on]
    lnum = _num(F.col(on), on_dt)

    def _match_backward() -> Column:
        # rights sort before lefts at equal key when exact matches count,
        # after them otherwise (then the preceding frame excludes them)
        tie = F.col(_IS_L).asc() if allow_exact_matches else F.col(_IS_L).desc()
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).asc_nulls_first(), tie, F.col(_R).asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        return F.last(_R, ignorenulls=True).over(w)

    def _match_forward() -> Column:
        tie = F.col(_IS_L).desc() if allow_exact_matches else F.col(_IS_L).asc()
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).asc_nulls_first(), tie, F.col(_R).asc())
             .rowsBetween(0, Window.unboundedFollowing))
        return F.first(_R, ignorenulls=True).over(w)

    def _within_tol(m: Column, signed_dist: Column) -> Column:
        if tolerance is None:
            return m
        return F.when(signed_dist <= F.lit(float(tolerance)), m)

    if direction == "backward":
        m = _match_backward()
        m = _within_tol(m, lnum - _num(m.getField(_T), on_dt))
    elif direction == "forward":
        m = _match_forward()
        m = _within_tol(m, _num(m.getField(_T), on_dt) - lnum)
    else:  # nearest
        b = _match_backward()
        f = _match_forward()
        db = lnum - _num(b.getField(_T), on_dt)
        df_ = _num(f.getField(_T), on_dt) - lnum
        b = _within_tol(b, db)
        f = _within_tol(f, df_)
        m = (F.when(b.isNull(), f)
             .when(f.isNull(), b)
             .when(db <= df_, b)  # tie -> backward, like pandas
             .otherwise(f))

    # left rows with a null on-key must not match (the null-first sort would
    # otherwise hand them the whole frame under direction="forward")
    m = F.when(F.col(on).isNotNull(), m)

    out = u.withColumn(_R, m).filter(F.col(_IS_L))
    return out.select(
        *left.columns,
        *[F.col(_R).getField(out_names[c]).alias(out_names[c]) for c in payload])
