"""Structured Streaming analogues of the batch operators.

The reference library has no streaming layer (SURVEY.md §2.3) — but several
of its operators are exactly the workloads Structured Streaming models
natively, and at 100 TB/day the streaming formulation is how they would
run in production:

* ``group_intervals(distance=gap)`` over an append-only event stream IS
  sessionization → ``F.session_window(time, gap)`` (reference
  ``catabra_pandas/misc.py:125-257``: single-linkage clustering of points
  with gap ``distance`` ≡ session windows over event times);
* ``resample_eav`` with *regular* windows (the reference detects these at
  ``resampling.py:1732-1746``) IS a tumbling/sliding windowed aggregation
  → ``F.window(time, duration, slide)``.

Both run incrementally with a watermark bounding state: late events beyond
the watermark are dropped instead of buffered forever — the knob the batch
reference never needed because it saw all data at once.

These functions take ANY DataFrame — batch or streaming — because the
window expressions are identical in both modes; tests exercise the batch
path for value-correctness and the streaming path (``readStream`` +
``trigger(availableNow)``) for plumbing.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..util import as_list

_STREAM_AGGS = {
    "mean": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
    "count": F.count, "std": F.stddev_samp, "var": F.var_samp,
}


def stream_sessionize(
    df: DataFrame,
    gap: Union[str, Column],
    entity_col: str = "entity",
    time_col: str = "timestamp",
    watermark: Optional[str] = None,
    agg: Optional[Mapping[str, Sequence[str]]] = None,
) -> DataFrame:
    """Streaming ``group_intervals``: cluster events of one entity whose
    time gap is within ``gap`` into sessions (INCLUSIVE — an event landing
    exactly at the session end merges; probed in
    tests/test_property.py::test_sessionize_matches_gap_scan).  Reference
    ``misc.py:125-257`` with ``point_col`` + ``distance`` — the same
    single-linkage semantics as ``group_intervals(inclusive=True)``.

    Returns one row per (entity, session): ``session_start``,
    ``session_stop``, ``n_events`` plus any extra ``agg`` columns
    ({column: [fn, ...]}, fns from mean/min/max/sum/count/std/var, named
    ``{col}_{fn}``).

    ``gap`` is a SQL interval string (e.g. ``"30 minutes"``) for time
    columns.  On a streaming DataFrame pass ``watermark`` (e.g.
    ``"1 hour"``) to bound session state; batch DataFrames may leave it
    None.  State then scales with *open* sessions per entity — the
    streaming-native replacement for the reference's all-in-memory
    clustering.
    """
    src = df
    if watermark is not None:
        src = src.withWatermark(time_col, watermark)
    exprs = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_stop"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for c, fns in (agg or {}).items():
        for fn in as_list(fns):
            if fn not in _STREAM_AGGS:
                raise ValueError(f"unsupported streaming agg {fn!r}")
            exprs.append(_STREAM_AGGS[fn](c).alias(f"{c}_{fn}"))
    sess = F.session_window(F.col(time_col), gap)
    return (
        src.groupBy(F.col(entity_col), sess)
        .agg(*exprs)
        .select(
            entity_col,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_stop"),
            *[e_name for e_name in
              ["session_start", "session_stop", "n_events"]],
            *[f"{c}_{fn}" for c, fns in (agg or {}).items()
              for fn in as_list(fns)],
        )
    )


def stream_ffill(
    df: DataFrame,
    value_col: str = "value",
    entity_col: str = "entity",
    time_col: str = "timestamp",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming forward-fill — a CUSTOM STATEFUL operator via
    ``applyInPandasWithState`` (the escape hatch for semantics the built-in
    streaming windows cannot express; batch analogue:
    ``operators.impute(method="ffill")``, reference ``misc.py:699-845``).

    State per entity = the last non-null value seen.  Each micro-batch
    sorts its group rows by event time, forward-fills within the batch
    (vectorized pandas), seeds leading nulls from state, and persists the
    new tail value — O(1) state per entity, unbounded stream.  Equals the
    batch ffill exactly when each entity's events arrive in event-time
    order across micro-batches (the file/kafka-partition-per-entity
    layout); disorder within one micro-batch is handled by the sort.

    ``value_col`` must be numeric (state is stored as double).  Batch
    DataFrames dispatch to the equivalent window formulation so one call
    site serves both modes.
    """
    if not df.isStreaming:
        from ..operators.sequences import impute
        out = impute(df, method="ffill", columns=value_col,
                     group_by=entity_col, order_by=time_col)
        # parity with the streaming path, whose state/output is double
        return out.withColumn(value_col, F.col(value_col).cast("double"))

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = df.withWatermark(time_col, watermark) if watermark else df
    cols = df.columns
    # filled values are float64; declare the value column double so Arrow
    # conversion cannot fail/truncate integer inputs (matches the batch
    # impute, which promotes fill columns to double)
    out_schema = T.StructType([
        T.StructField(f.name, T.DoubleType() if f.name == value_col else f.dataType,
                      True if f.name == value_col else f.nullable)
        for f in df.schema.fields])
    state_schema = T.StructType([T.StructField("last", T.DoubleType())])

    def fn(key, pdfs, state):
        last = state.get[0] if state.exists else None
        # one group's micro-batch arrives as multiple Arrow chunks in no
        # guaranteed order — concat before sorting or cross-chunk disorder
        # fills incorrectly
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(time_col)
            s = pdf[value_col].astype("float64")
            filled = s.ffill()
            if last is not None:
                filled = filled.fillna(last)
            nn = s.dropna()
            if len(nn):
                last = float(nn.iloc[-1])
            out = pdf.copy()
            out[value_col] = filled
            yield out[cols]
        if last is not None:
            state.update((last,))

    return (src.groupBy(entity_col)
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.NoTimeout))


def stream_funnel(
    df: DataFrame,
    steps: Sequence[str],
    entity_col: str = "entity",
    time_col: str = "timestamp",
    type_col: str = "event_type",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming funnel — a CUSTOM STATEFUL operator via
    ``applyInPandasWithState`` (batch analogue ``operators.events.funnel``,
    same greedy earliest-completion semantics: stage i matches at the
    earliest ``steps[i]`` event strictly after stage i-1's matched time).

    State per entity = the k matched stage times (epoch micros) — O(k)
    scalars regardless of event volume, the streaming mirror of the batch
    operator's chained-min design.  Each micro-batch sorts its group rows
    by event time, advances the greedy match, and emits the entity's
    REFRESHED funnel row (update output mode: downstream sinks see the
    latest n_stages/converted per entity).  Exact vs batch when each
    entity's events arrive in event-time order across micro-batches
    (disorder within one batch is handled by the sort).

    With ``watermark``, entity state expires one watermark interval after
    the entity's latest event (event-time timeout) — bounding state for
    unbounded entity populations; without it state lives forever (batch
    replays, bounded key sets).  Batch DataFrames dispatch to the batch
    operator, so one call site serves both modes and the batch path is
    oracle-checkable."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if not df.isStreaming:
        from ..operators.events import funnel
        return funnel(df, steps, entity_col=entity_col, time_col=time_col,
                      type_col=type_col)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    steps = list(steps)
    src = df.withWatermark(time_col, watermark) if watermark else df
    ent_type = df.schema[entity_col].dataType
    out_schema = T.StructType([
        T.StructField(entity_col, ent_type),
        T.StructField("n_stages", T.IntegerType()),
        T.StructField("converted", T.BooleanType()),
        T.StructField("t_first", T.TimestampType()),
        T.StructField("t_convert", T.TimestampType()),
    ])
    state_schema = T.StructType(
        [T.StructField(f"m{i}", T.LongType()) for i in range(k)])
    timeout_ms = (int(pd.Timedelta(watermark).total_seconds() * 1000)
                  if watermark else None)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        m = list(state.get) if state.exists else [None] * k
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf[type_col].isin(steps)].sort_values(time_col)
        s = sum(1 for v in m if v is not None)
        last_t = None
        for t, ty in zip(pdf[time_col].astype("int64") // 1000,
                         pdf[type_col]):
            t = int(t)
            last_t = t
            if s < k and ty == steps[s] and (s == 0 or t > m[s - 1]):
                m[s] = t
                s += 1
        if s == 0:
            return  # no step-0 event yet: no funnel row, no state
        state.update(tuple(m))
        if timeout_ms is not None and last_t is not None:
            state.setTimeoutTimestamp(last_t // 1000 + timeout_ms)
        ts = lambda us: (pd.Timestamp(us * 1000) if us is not None  # noqa: E731
                         else pd.NaT)
        yield pd.DataFrame({
            entity_col: [key[0]],
            "n_stages": [s],
            "converted": [s == k],
            "t_first": [ts(m[0])],
            "t_convert": [ts(m[k - 1]) if s == k else pd.NaT],
        })

    return (src.groupBy(entity_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema, "update",
                GroupStateTimeout.EventTimeTimeout if watermark
                else GroupStateTimeout.NoTimeout))


def stream_dedup(
    df: DataFrame,
    subset: Union[str, Sequence[str]],
    time_col: str = "timestamp",
    watermark: Optional[str] = None,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Streaming exact deduplication by key columns ``subset``.

    Streaming DataFrames use native ``dropDuplicatesWithinWatermark``:
    duplicates whose event time falls within ``watermark`` of the first
    arrival are dropped, and state per key expires at the watermark horizon
    — the bounded-state form of ``pipeline.exact_dedup``, which the batch
    reference-side operator cannot provide (it must see all data at once).
    ``watermark`` is required in streaming mode; the surviving row is the
    first PROCESSED (arrival order), the only choice incremental execution
    can make.

    Batch DataFrames dispatch to one ``groupBy(subset)`` with a ``min_by``
    whole-row pick — a single map-side-combinable shuffle (cheaper than a
    window pass: no sort, partial aggregation upstream).  The canonical row
    is the one with the smallest ``id_col`` (or smallest remaining-column
    struct if ``id_col`` is None; null ids sort last with the payload as
    final tiebreak) — deterministic, unlike streaming arrival order, so
    batch results are reproducible and oracle-checkable.
    """
    subset = as_list(subset)
    if df.isStreaming:
        if watermark is None:
            raise ValueError("streaming dedup requires a watermark "
                             "(state would otherwise grow unboundedly)")
        return (df.withWatermark(time_col, watermark)
                .dropDuplicatesWithinWatermark(subset))
    others = [c for c in df.columns if c not in subset]
    if not others:
        return df.select(*subset).distinct()
    payload = F.struct(*[F.col(c).alias(c) for c in others])
    # the ordering must never be null — min_by SKIPS rows whose ordering
    # value is null, which would fabricate an all-null payload for groups
    # whose every id is null; wrap id in a struct (non-null container) with
    # a null-last flag and the payload as the deterministic final tiebreak
    order = (F.struct(F.col(id_col).isNull(), F.col(id_col), payload)
             if id_col else payload)
    packed = F.min_by(payload, order)
    red = df.groupBy(*subset).agg(packed.alias("__row__"))
    red = red.select(*subset,
                     *[F.col("__row__").getField(c).alias(c) for c in others])
    return red.select(*df.columns)


def stream_resample_eav(
    df: DataFrame,
    agg: Mapping[str, Sequence[str]],
    duration: str,
    slide: Optional[str] = None,
    entity_col: str = "entity",
    time_col: str = "timestamp",
    attribute_col: str = "attribute",
    value_col: str = "value",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming ``resample_eav`` for REGULAR windows: per-attribute
    aggregations over tumbling (``slide=None``) or sliding windows —
    the incremental form of the reference's regular-window fast path
    (``resampling.py:1738-1763``).

    ``agg`` maps attribute -> [fn, ...] with fns from
    mean/min/max/sum/count/std/var; output columns ``{attribute}_{fn}``
    (same naming as the batch ``resample_eav``).  One row per
    (entity, window) that has at least one observation.

    The aggregation is conditional (``CASE WHEN attribute = a``) inside a
    single groupBy — one shuffle, partial aggregation map-side, identical
    to the batch plan; the window expression replaces the interval join
    because regular windows assign each observation to its window(s)
    by arithmetic.
    """
    src = df
    if watermark is not None:
        src = src.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), duration, slide) if slide else \
        F.window(F.col(time_col), duration)
    attr = F.col(attribute_col)
    exprs = []
    for a, fns in agg.items():
        v = F.when(attr == F.lit(a), F.col(value_col))
        for fn in as_list(fns):
            if fn not in _STREAM_AGGS:
                raise ValueError(f"unsupported streaming agg {fn!r}")
            exprs.append(_STREAM_AGGS[fn](v).alias(f"{a}_{fn}"))
    return (
        src.filter(attr.isin(list(agg)))
        .groupBy(F.col(entity_col), win)
        .agg(*exprs)
        .select(
            entity_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_stop"),
            *[f"{a}_{fn}" for a, fns in agg.items() for fn in as_list(fns)],
        )
    )


def stream_resample_interval(
    df: DataFrame,
    attributes: Sequence[str],
    duration: str,
    entity_col: str = "entity",
    start_col: str = "start",
    stop_col: str = "stop",
    attribute_col: str = "attribute",
    value_col: str = "value",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming ``resample_interval``: duration-weighted sums
    ``v * |W ∩ I| / |I|`` of interval-valued observations over a TUMBLING
    grid of width ``duration`` — the incremental form of the batch
    operator for regular windows (reference ``resampling.py:453-788``).

    Plan: each interval explodes into the grid windows it overlaps (a
    map-side ``sequence`` bounded by span/duration — no join), takes a
    representative event time INSIDE each target window
    (``greatest(start, window_start)``) so the native ``F.window``
    aggregation applies, and one conditional-sum groupBy per attribute
    produces the output.  State is a running sum per (entity, window,
    attribute) — O(1) per open window, evicted at the watermark.

    Contract differences vs batch ``resample_interval``, inherent to the
    tumbling-stream formulation: windows are half-open ``[k·d, (k+1)·d)``
    (the tumbling convention; batch windows are closed), intervals must be
    FINITE (an unbounded interval can never be emitted under a watermark —
    rows with null endpoints are dropped), a zero-length interval
    contributes ``v`` to the single window containing its point, and only
    (entity, window) pairs with at least one overlapping interval emit a
    row (the batch operator 0-fills its supplied window table).

    ``start_col``/``stop_col`` must be timestamps; ``duration`` is a
    Spark interval string ("1 day").  Works on batch DataFrames with the
    identical plan (the oracle-checkable path); streaming requires
    ``watermark``, applied to the representative time, so it must cover
    the maximum interval SPAN plus the allowed lateness (an interval's
    earliest window can predate its stop by its span).
    """
    attributes = as_list(attributes)
    if not attributes:
        raise ValueError("attributes must be non-empty")
    src = df.filter(
        F.col(start_col).isNotNull() & F.col(stop_col).isNotNull()
        & (F.col(start_col) <= F.col(stop_col))
        & F.col(entity_col).isNotNull()
        & F.col(attribute_col).isin(attributes))
    a_us = F.unix_micros(F.col(start_col))
    b_us = F.unix_micros(F.col(stop_col))
    # duration in microseconds via an interval literal (no driver parsing;
    # epoch 0 + INTERVAL, session tz pinned UTC)
    d_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01 00:00:00"))
                         + F.expr(f"INTERVAL {duration}"))
    lo_idx = F.floor(a_us / d_us)
    hi_idx = F.floor(b_us / d_us)
    ex = src.withColumn("__w_idx__", F.explode(F.sequence(lo_idx, hi_idx)))
    wlo = F.col("__w_idx__") * d_us
    whi = wlo + d_us
    span = b_us - a_us
    ovl = F.least(b_us, whi) - F.greatest(a_us, wlo)
    # zero-length interval: factor 1 in the (single) window holding its
    # point; half-open windows make that window unique
    factor = F.when(span == 0, F.lit(1.0)).otherwise(
        F.greatest(ovl, F.lit(0)).cast("double") / span.cast("double"))
    contrib = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0)) * factor
    rep = F.timestamp_micros(F.greatest(a_us, wlo))
    ex = (ex.withColumn("__contrib__", contrib)
          .withColumn("__rep__", rep)
          .filter(factor > 0))
    if watermark is not None:
        ex = ex.withWatermark("__rep__", watermark)
    elif df.isStreaming:
        raise ValueError("streaming resample_interval requires a watermark")
    attr = F.col(attribute_col)
    aggs = [F.sum(F.when(attr == F.lit(a), F.col("__contrib__"))
                  .otherwise(F.lit(0.0))).alias(a)
            for a in attributes]
    return (ex.groupBy(F.col(entity_col), F.window("__rep__", duration))
            .agg(*aggs)
            .select(entity_col,
                    F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_stop"),
                    *attributes))


def stream_asof(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: str = "entity",
    right_value: str = "value",
    out_col: Optional[str] = None,
    tolerance: Optional[float] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Streaming backward as-of join — a CUSTOM STATEFUL operator via
    ``applyInPandasWithState`` (batch analogue ``operators.asof.merge_asof``
    with ``direction="backward"``): every left row picks up the latest
    ``right_value`` whose ``on`` key is <= its own, within the same ``by``
    group, optionally no older than ``tolerance`` (in the key's units for
    numeric keys, SECONDS for timestamps and day-time intervals).  ``on``
    must be a timestamp, day-time-interval or numeric column; fractional
    keys keep a float64 key space (and a double state field) rather than
    truncating to int64, so batch and stream agree on float keys too;
    interval keys ride the same int64-microsecond key space as
    timestamps (they are microsecond-quantized internally), matching the
    batch path's exact ``interval_total_seconds`` arithmetic.

    Structured Streaming's native stream-stream joins cannot express
    "latest right row per left row" (they emit ALL matches in a range),
    so the two streams are unioned with a side tag — one shuffle on
    ``by`` — and a per-group state of TWO scalars (last right key, last
    right value) advances through each micro-batch in event-time order:
    right rows update the state, left rows emit joined.  O(1) state per
    group, unbounded streams.  Exact vs the batch operator when each
    group's rows arrive in event-time order across micro-batches
    (disorder within one micro-batch is handled by the sort; right rows
    sort before left rows on key ties = ``allow_exact_matches``).  One
    tie nuance: among right rows sharing the SAME key, the batch
    operator picks the greatest payload while the stream keeps the last
    processed — pre-aggregate key ties away (as the driver query does)
    when exact parity matters.

    With ``watermark``, group state expires one watermark interval after
    the group's latest row (event-time timeout).  Batch inputs dispatch
    to ``merge_asof``, so one call site serves both modes and the batch
    path is oracle-checkable.  Output = the left schema plus ``out_col``
    (default ``{right_value}_asof``, double).
    """
    out_col = out_col or f"{right_value}_asof"
    if out_col in left.columns:
        raise ValueError(f"out_col {out_col!r} collides with a left column")
    if not left.isStreaming and not right.isStreaming:
        from ..operators.asof import merge_asof
        r = right.select(by, on, F.col(right_value).cast("double")
                         .alias(out_col))
        out = merge_asof(left, r, on=on, by=by, direction="backward",
                         tolerance=tolerance)
        return out.select(*left.columns, out_col)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    on_type = left.schema[on].dataType
    is_ts = isinstance(on_type, T.TimestampType)
    # day-time intervals arrive in pandas as timedelta64[ns]: same
    # ns -> us key extraction as timestamps, tolerance given in seconds
    is_itv = isinstance(on_type, T.DayTimeIntervalType)
    # key space: int64 micros for timestamps, raw int64 for integral
    # keys, float64 for fractional keys (NOT truncated to int — a left
    # row at t=1.2 and a right row at t=1.9 are distinct keys, and
    # right-before-left tie ordering must not make the left row join a
    # quote from its future); anything else is rejected up front so the
    # streaming path can never silently diverge from the exact batch
    # merge_asof dispatch above.
    is_frac = isinstance(on_type, (T.FloatType, T.DoubleType,
                                   T.DecimalType))
    # decimal keys ride the float64 state key space; a precision beyond
    # float64's 53-bit mantissa (~15.95 decimal digits) could collide or
    # reorder in the stream while the exact batch dispatch compares full
    # precision — reject up front rather than silently diverge
    if isinstance(on_type, T.DecimalType) and on_type.precision > 15:
        raise ValueError(
            f"stream_asof `on` decimal key {on_type.simpleString()} "
            "exceeds float64's exactly-representable precision (15 "
            "digits); cast to double explicitly if the loss is "
            "acceptable, or rescale to an integral key")
    if not is_ts and not is_itv and not is_frac and not isinstance(
            on_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise ValueError(
            f"stream_asof `on` key must be timestamp, day-time interval "
            f"or numeric, got {on_type.simpleString()}")
    if watermark is not None and not is_ts:
        raise ValueError("watermark requires a timestamp `on` key")
    payload = [c for c in left.columns if c not in (by, on)]
    side = F.lit(0)
    l2 = left.select(by, on, *payload).withColumn("__side__", side) \
        .withColumn("__rv__", F.lit(None).cast("double"))
    r2 = (right.select(by, on, F.col(right_value).cast("double")
                       .alias("__rv__"))
          .withColumn("__side__", F.lit(1)))
    for c in payload:
        r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r2 = r2.select(*l2.columns)
    if watermark is not None:
        l2 = l2.withWatermark(on, watermark)
        r2 = r2.withWatermark(on, watermark)
    src = l2.unionByName(r2)

    out_schema = T.StructType(
        [f for f in left.schema.fields]
        + [T.StructField(out_col, T.DoubleType())])
    state_schema = T.StructType([
        T.StructField("t_last",
                      T.DoubleType() if is_frac else T.LongType()),
        T.StructField("v_last", T.DoubleType())])
    # tolerance compares in the state's key space: micros for timestamp
    # keys (tolerance given in seconds), raw units otherwise
    tol = None if tolerance is None else (
        int(tolerance * 1e6) if is_ts or is_itv else tolerance)
    conv = float if is_frac else int
    timeout_ms = (int(pd.Timedelta(watermark).total_seconds() * 1000)
                  if watermark else None)
    lcols = list(left.columns)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        t_last, v_last = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # null keys: right rows can never match (drop); left rows emit
        # unmatched (batch merge_asof parity)
        nul = pdf[pdf[on].isna() & (pdf["__side__"] == 0)]
        pdf = pdf[pdf[on].notna()]
        if is_ts or is_itv:
            keys = pdf[on].astype("int64") // 1000  # ns -> us
        elif is_frac:
            keys = pdf[on].astype("float64")
        else:
            keys = pdf[on].astype("int64")
        pdf = pdf.assign(__k__=keys).sort_values(
            ["__k__", "__side__"], ascending=[True, False],
            kind="stable")  # right (1) before left (0) on ties
        outs, vals = [], []
        for idx, row_side, k, rv in zip(pdf.index, pdf["__side__"],
                                        pdf["__k__"], pdf["__rv__"]):
            if row_side == 1:
                t_last, v_last = conv(k), (None if pd.isna(rv)
                                           else float(rv))
            else:
                # t_last <= k guards cross-batch disorder: a late left
                # row must not join a quote from its own future
                ok = (t_last is not None and t_last <= conv(k)
                      and (tol is None or conv(k) - t_last <= tol))
                outs.append(idx)
                vals.append(v_last if ok else None)
        if t_last is not None:
            state.update((t_last, v_last))
            if timeout_ms is not None and len(pdf):
                last_k = int(pdf["__k__"].iloc[-1])
                state.setTimeoutTimestamp(last_k // 1000 + timeout_ms)
        if outs:
            res = pdf.loc[outs, lcols].copy()
            res[out_col] = pd.array(vals, dtype="float64")
            yield res
        if len(nul):
            res = nul[lcols].copy()
            res[out_col] = pd.array([None] * len(nul), dtype="float64")
            yield res

    return (src.groupBy(by)
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.EventTimeTimeout
                                    if watermark
                                    else GroupStateTimeout.NoTimeout))
