"""Compatibility shims: factorize and inner_or_cross_join.

Reference: ``catabra_pandas/misc.py:1119-1318`` (``factorize``) and
``misc.py:939-978`` (``inner_or_cross_join``).

On Spark, composite join keys need no factorization (Catalyst handles them
natively — SURVEY.md §2.1 #11), so ``factorize`` exists for API parity and
for the rare case where dense int64 ids are genuinely wanted (e.g. feeding a
matrix library).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

from ..util import as_list, ensure_columns


def factorize(
    left: DataFrame,
    columns: Union[str, Sequence[str]],
    right: Optional[DataFrame] = None,
    right_columns: Union[str, Sequence[str], None] = None,
    sort: bool = False,
    key_name: str = "__key__",
) -> tuple[DataFrame, Optional[DataFrame]]:
    """Map rows of one or two DataFrames to shared dense int64 keys over the
    given composite key columns (reference ``misc.py:1119-1318``).

    Returns the input frame(s) with an added ``key_name`` long column; equal
    composite keys (across both frames) get equal ids, 0-based consecutive.
    ``sort=True`` makes ids order-preserving wrt the key tuple; the default
    assigns ids in an arbitrary-but-deterministic order (Spark has no
    insertion order to preserve).

    Scale: both paths are fully distributed.  The default hashes distinct
    keys into ``n_buckets`` buckets, ids are (bucket offset + in-bucket
    rank), and only the bucket counts ever reach the driver (the counts
    are materialized once, so every consumer of the ids sees the same
    assignment).  ``sort=True`` uses the same offset design over RANGE
    buckets (``util.ordered_dense_ids``) — exact order preservation with
    no single-partition sort.
    """
    columns = as_list(columns)
    ensure_columns(left, columns)
    right_columns = as_list(right_columns) if right_columns is not None else columns
    keys = left.select(*[F.col(c).alias(f"_k{i}") for i, c in enumerate(columns)])
    if right is not None:
        ensure_columns(right, right_columns)
        keys = keys.unionByName(
            right.select(*[F.col(c).alias(f"_k{i}") for i, c in enumerate(right_columns)])
        )
    kcols = [f"_k{i}" for i in range(len(columns))]
    distinct = keys.distinct()

    if sort:
        from ..util import ordered_dense_ids
        ids = ordered_dense_ids(distinct, kcols, key_name)
    else:
        n_buckets = 1024
        # pmod, not abs(...)%: abs(Long.MIN_VALUE) is still negative and
        # would index element_at with a non-positive position
        bucket = F.pmod(F.xxhash64(*[F.col(c) for c in kcols]),
                        F.lit(n_buckets)).cast("int")
        counts = {r["__b__"]: r["cnt"]
                  for r in distinct.groupBy(bucket.alias("__b__"))
                  .agg(F.count(F.lit(1)).alias("cnt")).collect()}
        offsets, acc = [], 0
        for b in range(n_buckets):
            offsets.append(acc)
            acc += counts.get(b, 0)
        off_arr = F.array(*[F.lit(o).cast("long") for o in offsets])
        wb = Window.partitionBy(bucket).orderBy(
            *[F.col(c).asc_nulls_last() for c in kcols])
        ids = distinct.withColumn(
            key_name,
            F.element_at(off_arr, bucket + 1) + F.row_number().over(wb) - F.lit(1))

    def attach(df: DataFrame, cols: Sequence[str]) -> DataFrame:
        cond = [df[c].eqNullSafe(ids[k]) for c, k in zip(cols, kcols)]
        # no forced broadcast: the id map's size is known post-checkpoint/
        # post-shuffle, so Catalyst+AQE pick broadcast vs shuffle join
        joined = df.join(ids, on=cond and _and_all(cond), how="left")
        return joined.drop(*kcols)

    left_out = attach(left, columns)
    right_out = attach(right, right_columns) if right is not None else None
    return left_out, right_out


def encode_ordered_categories(
    df: DataFrame,
    column: str,
    categories: Sequence,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Dictionary-encode an ordered-categorical column to its 1-based
    ordinal code under the EXPLICIT category order.

    Pandas ordered categoricals map to ``StringType`` in this engine
    (SURVEY §1.2); what the dtype actually contributes is an ordering
    that differs from the lexicographic string order (reference dtype
    grid ``tests/util.py:377-416``).  This helper restores that ordering
    as an integer code column — a literal ``array_position`` lookup,
    JVM-side, map-only, no shuffle — so range operators
    (``merge_intervals``, ``find_containing_interval``, ...) can run
    interval logic over custom-ordered categories on their dense-code
    axis exactly like any numeric endpoint.  Values outside
    ``categories`` code as null (null input stays null).

    The literal lookup is O(|categories|) per row — right for the tens-
    to-thousands of levels real categoricals have; for degenerate
    million-level "categories" dictionary-encode via ``factorize``
    (sort=True) instead."""
    cats = list(categories)
    if len(set(cats)) != len(cats):
        raise ValueError("categories must be distinct")
    ensure_columns(df, [column])
    code = F.array_position(F.array(*[F.lit(c) for c in cats]), F.col(column))
    return df.withColumn(out_col or f"{column}_code",
                         F.nullif(code, F.lit(0)).cast("int"))


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def inner_or_cross_join(left: DataFrame, right: DataFrame, on: Optional[str] = None) -> DataFrame:
    """Inner join on ``on`` if both sides have that column, else cross join
    (reference ``misc.py:939-978``)."""
    if on is not None and on in left.columns and on in right.columns:
        return left.join(right, on=on, how="inner")
    return left.crossJoin(right)


def grouped_topk(
    df: DataFrame,
    group_by: Union[str, Sequence[str]],
    order_by: Union[str, Sequence[str]],
    k: int = 1,
    descending: bool = False,
    rank_col: Optional[str] = None,
    prefilter: bool = False,
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by`` — the generic limit/top-k
    the reference lacks (SURVEY §2.3 sorts/limits; its only analogue is
    ``keep="first"/"last"`` inside merge_intervals, reference
    ``merging.py:728-748``).

    Base plan: ``row_number`` over a per-group sort — one exchange + one
    per-group sort, ties broken arbitrarily beyond ``order_by`` (pass a
    tie-breaking column for reproducible output).

    ``prefilter=True`` prepends a MAP-SIDE Arrow-batched pre-reduction
    (``mapInPandas``): each executor batch keeps only its local top-k per
    group before the exchange.  Sound because a row beaten by >= k rows of
    its own group within one batch cannot be in the global top-k.  At
    100 TB with small ``k`` this shrinks the shuffle from ALL rows to at
    most ``k x batches`` per group — the bounded-buffer top-k accumulator
    Spark's built-in aggregates cannot express (``collect_list`` buffers
    whole groups).  Leave it off when k is large relative to group sizes
    (the prefilter then filters nothing and costs one Arrow round-trip).
    """
    gcols = as_list(group_by)
    ocols = as_list(order_by)
    ensure_columns(df, gcols + ocols)
    if k < 1:
        raise ValueError("k must be >= 1")

    out = df
    if prefilter:
        import pandas as pd  # noqa: F401 (Arrow batch path)

        asc = not descending
        kk, gb, ob = k, list(gcols), list(ocols)

        def _batch_topk(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                yield (pdf.sort_values(ob, ascending=asc, kind="stable")
                          .groupby(gb, sort=False, dropna=False)
                          .head(kk))

        out = out.mapInPandas(_batch_topk, schema=out.schema)

    oexprs = [F.col(c).desc() if descending else F.col(c).asc() for c in ocols]
    w = Window.partitionBy(*gcols).orderBy(*oexprs)
    res = out.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") <= k)
    return res.withColumnRenamed("__rk__", rank_col) if rank_col \
        else res.drop("__rk__")
