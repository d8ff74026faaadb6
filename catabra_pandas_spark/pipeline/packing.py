"""Work/sequence packing: the distributed analogues of the reference's
``partition_series`` (greedy bin packing of a weight series,
``catabra_pandas/misc.py:644-696``) plus the LLM-training shapes built on
the same idea — sequence packing and token-budget document chunking.

The reference uses ``partition_series`` internally to chunk work below a
memory threshold; on Spark that job belongs to partitioning + AQE
(SURVEY.md §2.1 #13).  What survives as USER-facing functionality is
packing of *data* rather than work:

* ``pack_sequences`` — concat-and-split packing (every LLM trainer's
  default): order documents deterministically, lay them out on one long
  tape, cut the tape every ``budget`` tokens.  Pure window cumulative sum
  — one shuffle on (group, order), SQL-replayable, documents may straddle
  a boundary (they get split at training time anyway).
* ``pack_bins`` — whole-item bin packing (no straddling): per group, the
  sequential greedy sweep (``mode="first_fit"`` = the reference
  algorithm with ``shuffle=False``; ``mode="next_fit"`` = single open
  bin, SQL-replayable via a recursive CTE).  Sequential-per-group by
  nature — the reference runs the same loop single-threaded; here each
  group packs independently in parallel via ``applyInPandas``, and the
  weights-only frame keeps the shuffled bytes minimal.
* ``chunk_documents`` — split each document into overlapping
  ``max_tokens`` windows (map-only: one codegen slice-explode, no
  shuffle; the standard pre-tokenization chunker for embedding/rag
  pipelines).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

from ..util import as_list, ensure_min_partitions


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_by: Union[str, Sequence[str]],
    group_by: Union[str, Sequence[str], None] = None,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid end-to-end in
    ``order_by`` order (within each ``group_by`` partition) and the tape is
    cut every ``budget`` units.  Adds ``bin_col`` (the bin the item STARTS
    in) and ``offset_col`` (its offset within that bin).  Items longer than
    ``budget`` simply span several bins — this is the trainer-side
    convention (sequences are cut at the token level anyway), and it is
    what makes the operator a pure cumulative sum: one shuffle on the
    group/order keys, then in-partition streaming.  For whole-item packing
    use ``pack_bins``.  Without ``group_by`` the window is a single global
    sort task (packing IS a global sequential layout then); pass a shard
    key to pack shards independently in parallel."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    gb = as_list(group_by)
    ob = as_list(order_by)
    w = Window.partitionBy(*gb).orderBy(*[F.col(c) for c in ob]) if gb else \
        Window.partitionBy().orderBy(*[F.col(c) for c in ob])
    start = (F.sum(F.col(weight_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    start = F.coalesce(start, F.lit(0)).cast("long")
    return df.withColumns({
        bin_col: F.floor(start / budget).cast("long"),
        offset_col: F.pmod(start, F.lit(budget)).cast("long"),
    })


def pack_bins(
    df: DataFrame,
    weight_col: str,
    budget: float,
    order_by: Union[str, Sequence[str]],
    group_by: Union[str, Sequence[str], None] = None,
    mode: str = "first_fit",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Whole-item greedy bin packing: assign each row a ``bin_col`` so no
    bin's total weight exceeds ``budget``; rows heavier than ``budget`` get
    singleton bins.  Reference parity: ``mode="first_fit"`` is exactly
    ``partition_series(s, n, shuffle=False)``
    (``catabra_pandas/misc.py:644-696``) — scan in ``order_by`` order,
    place each item in the lowest-numbered bin with room, else open a new
    bin.  ``mode="next_fit"`` keeps only the current bin open (opens a new
    one when the item does not fit) — weaker packing, but replayable as a
    linear recursion (the driver oracle uses a recursive CTE).

    Distribution model: greedy packing is inherently sequential in scan
    order, so each ``group_by`` group is packed by one task
    (``applyInPandas`` over a weights-only projection — the exchange
    carries (keys, order, weight), never payload columns; results join
    back by the order key).  Without ``group_by`` the single sequential
    task matches the reference's own single-threaded loop; at scale,
    pack per shard/group.  Bin ids are dense 0..g-1 per group, in order of
    first opening.

    REQUIRES (group_by, order_by) to uniquely identify rows — the greedy
    scan order is otherwise ambiguous AND the assignment join-back would
    fan out.  Enforced per group inside the packing task (no extra job);
    duplicates raise ValueError."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if mode not in ("first_fit", "next_fit"):
        raise ValueError(f"mode must be first_fit/next_fit, got {mode!r}")
    gb = as_list(group_by)
    ob = as_list(order_by)
    import pandas as pd

    slim = df.select(*gb, *ob, weight_col)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in slim.schema.fields) + f", `{bin_col}` long"

    first_fit = mode == "first_fit"

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ob, kind="stable").reset_index(drop=True)
        if gb and pdf[gb].isna().any().any():
            raise ValueError(
                "pack_bins requires non-NULL group keys: a NULL-keyed "
                "group would be packed but then silently dropped by the "
                "assignment join-back (NULL never equals NULL in a join)")
        if pdf[ob].isna().any().any():
            raise ValueError(
                "pack_bins requires non-NULL order keys: a NULL order key "
                "would be packed but then silently dropped by the "
                "assignment join-back (NULL never equals NULL in a join)")
        if pdf.duplicated(subset=ob).any():
            raise ValueError(
                "pack_bins requires (group_by, order_by) to uniquely "
                f"identify rows; duplicate order keys {ob} found within a "
                "group — the scan order would be ambiguous and the "
                "assignment join-back would duplicate rows")
        bins: list = []          # load per open bin
        out = []
        cur = -1                 # next_fit: index of the single open bin
        for x in pdf[weight_col]:
            j = -1
            if x < budget:
                if first_fit:
                    for k, load in enumerate(bins):
                        if load + x <= budget:
                            bins[k] += x
                            j = k
                            break
                elif cur >= 0 and bins[cur] + x <= budget:
                    bins[cur] += x
                    j = cur
            if j < 0:
                bins.append(x)
                j = len(bins) - 1
                cur = j
            out.append(j)
        pdf[bin_col] = pd.Series(out, dtype="int64")
        return pdf

    if gb:
        # explicit keyed repartition so AQE cannot coalesce the groupBy's
        # exchange to ~1 partition on small inputs — that would serialize
        # every per-group Python packing call (same hazard measured 10x
        # on the resample_eav custom-agg path)
        n_part = int(slim.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
        packed = (slim.repartition(n_part, *gb)
                  .groupBy(*gb).applyInPandas(pack, out_schema))
    else:
        packed = (slim.withColumn("__g__", F.lit(0)).groupBy("__g__")
                  .applyInPandas(pack, "`__g__` int, " + out_schema)
                  .drop("__g__"))
    return df.join(packed.select(*gb, *ob, bin_col), gb + ob, "inner")


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_col: str = "chunk_idx",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split each document into whitespace-token windows of ``max_tokens``
    with ``overlap`` tokens of context between consecutive chunks — the
    standard chunker in embedding / retrieval pipelines.

    Returns (id_col, chunk_col, out_col, n_chunk_tokens).  Chunk i covers
    tokens [i*stride, i*stride + max_tokens) with stride = max_tokens -
    overlap; the last chunk may be short; empty documents produce no rows.

    MAP-ONLY: the token array is one codegen expression, chunk indices are
    a ``sequence()`` explode, chunk text a per-row ``slice`` +
    ``concat_ws`` — no shuffle at any size (front-loaded
    ``ensure_min_partitions`` parallelizes unsplittable small sources,
    no-op at scale)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    base = ensure_min_partitions(df.select(F.col(id_col), F.col(text_col)))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(0, n - max_tokens) / stride)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil(F.greatest(n - max_tokens, F.lit(0)) /
                          F.lit(float(stride))).cast("int"))
    # guard the empty case: sequence(0, -1) would DESCEND, not be empty
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)) \
            .otherwise(F.array().cast("array<int>"))
    staged = base.select(
        F.col(id_col), toks.alias("__toks__"),
        F.explode(idxs).alias(chunk_col))
    chunk = F.slice("__toks__", F.col(chunk_col) * stride + 1, max_tokens)
    return staged.select(
        id_col, chunk_col,
        F.concat_ws(" ", chunk).alias(out_col),
        F.size(chunk).cast("long").alias("n_chunk_tokens"))
