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
