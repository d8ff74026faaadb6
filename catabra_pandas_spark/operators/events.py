"""Event-sequence analytics: funnel completion over an event log.

The classic product-analytics query (MATCH_RECOGNIZE's most common use):
per entity, how far through an ordered sequence of step types did its
events progress, with each step matched GREEDILY — the first occurrence of
step k strictly after the matched time of step k-1 (earliest-completion
semantics, so the result is deterministic and SQL-replayable as a chain of
min-after-min aggregations).

Plan shape: ONE hash shuffle on the entity (the groupBy); per entity the
events are collected into a sorted struct array and the funnel is a single
fold over it.  The fold is a higher-order ``aggregate`` (interpreted, like
the repetition-stats folds) — per-entity event counts are the small
dimension here, and the alternative (k self-joins for k steps) costs k
shuffles of the event log.  State per entity is O(k), never O(events).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..util import ensure_columns


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    entity_col: str = "entity",
    time_col: str = "timestamp",
    type_col: str = "event_type",
    within: Optional[float] = None,
) -> DataFrame:
    """Greedy funnel matching: for each entity, stage k is matched at the
    earliest event of type ``steps[k]`` STRICTLY after stage k-1's matched
    time (stage 0 at the entity's earliest ``steps[0]`` event).

    Returns one row per entity that emitted at least one ``steps[0]``
    event: (entity_col, n_stages, converted, t_first, t_convert) where
    ``n_stages`` counts matched stages (1..k), ``converted`` means all
    stages matched — and, when ``within`` is given, the whole funnel fits
    inside ``within`` time units of ``t_first``; ``t_convert`` is the last
    stage's matched time (null if not converted).

    The time column may be numeric or timestamp (compared natively; for
    ``within`` a timestamp column counts in seconds)."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    ensure_columns(df, [entity_col, time_col, type_col])

    from pyspark.sql import types as T
    dt = {f.name: f.dataType for f in df.schema.fields}[time_col]
    is_ts = isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType))
    t = (F.col(time_col).cast("timestamp").cast("double") if is_ts
         else F.col(time_col).cast("double"))

    # events of relevant types only — the filter prunes the shuffle
    relevant = df.filter(F.col(type_col).isin(list(steps)))
    agg = (relevant.select(F.col(entity_col),
                           F.struct(t.alias("t"),
                                    F.col(type_col).alias("e")).alias("ev"))
           .groupBy(entity_col)
           .agg(F.sort_array(F.collect_list("ev")).alias("evs")))

    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    # fold state: (stage matched so far, time of last matched stage, t0)
    init = F.struct(F.lit(0).alias("stage"),
                    F.lit(float("-inf")).alias("last_t"),
                    F.lit(None).cast("double").alias("t0"))

    def _merge(acc, ev):
        advance = (acc["stage"] < k) & \
            (ev["e"] == F.element_at(step_arr, acc["stage"] + 1)) & \
            ((acc["stage"] == 0) | (ev["t"] > acc["last_t"]))
        return F.struct(
            F.when(advance, acc["stage"] + 1).otherwise(acc["stage"]).alias("stage"),
            F.when(advance, ev["t"]).otherwise(acc["last_t"]).alias("last_t"),
            F.when(advance & (acc["stage"] == 0), ev["t"])
             .otherwise(acc["t0"]).alias("t0"),
        )

    res = F.aggregate("evs", init, _merge)
    out = (agg.withColumn("__r__", res)
           .filter(F.col("__r__")["stage"] >= 1)
           .select(
               entity_col,
               F.col("__r__")["stage"].alias("n_stages"),
               F.col("__r__")["t0"].alias("__t0__"),
               F.when(F.col("__r__")["stage"] == k,
                      F.col("__r__")["last_t"]).alias("__tc__")))
    converted = F.col("__tc__").isNotNull()
    if within is not None:
        converted = converted & \
            ((F.col("__tc__") - F.col("__t0__")) <= float(within))
    back = (lambda c: F.timestamp_seconds(c)) if is_ts else (lambda c: c)
    return out.select(
        entity_col, "n_stages",
        converted.alias("converted"),
        back(F.col("__t0__")).alias("t_first"),
        back(F.when(converted, F.col("__tc__"))).alias("t_convert"))


def retention(
    df: DataFrame,
    entity_col: str = "entity",
    time_col: str = "timestamp",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: entities are cohorted by the period of
    their FIRST event; for every (cohort, offset) cell, how many of the
    cohort's entities were active ``offset`` periods later.

    Returns (cohort, period_offset, n_active) with cohort as the period's
    start date and offset 0 = the cohort period itself (so each cohort's
    offset-0 count is its size).  ``period`` is any ``date_trunc`` unit
    (week/month/day/...); offsets count whole periods via the same
    truncation, so calendar-length months are handled exactly.

    Plan: one aggregate for the per-entity cohort (map-side combinable
    min), one broadcast-or-shuffle join back on the entity, one final
    aggregate on the (cohort, offset) pair — the minimal shuffle set for
    a distinct-entity retention count."""
    ensure_columns(df, [entity_col, time_col])
    per = F.date_trunc(period, F.col(time_col).cast("timestamp"))
    ev = df.select(F.col(entity_col).alias("__e__"), per.alias("__p__")).distinct()
    cohort = ev.groupBy("__e__").agg(F.min("__p__").alias("__c__"))
    # offset in whole periods: count period STARTS in (cohort, p] — exact
    # for calendar units where fixed arithmetic is wrong (months)
    unit = {"day": 86400, "week": 7 * 86400}.get(period)
    if unit is not None:
        off = ((F.unix_timestamp("__p__") - F.unix_timestamp("__c__"))
               / unit).cast("long")
    else:
        months = (F.year("__p__") - F.year("__c__")) * 12 + \
                 (F.month("__p__") - F.month("__c__"))
        off = {"month": months, "quarter": (months / 3).cast("long"),
               "year": (months / 12).cast("long")}.get(period)
        if off is None:
            raise ValueError(f"unsupported period {period!r}")
    return (ev.join(cohort, "__e__")
            .groupBy(F.to_date("__c__").alias("cohort"),
                     off.alias("period_offset"))
            .agg(F.count(F.lit(1)).alias("n_active")))
