"""Deterministic sampling & split assignment for training-data curation.

The common scale trap in corpus sampling is ``df.sample(fraction)``: its
output depends on partitioning and re-executes differently per action, so a
pipeline that samples, then joins the sample back, silently disagrees with
itself.  Everything here keys randomness off a CONTENT hash (md5 of the row
key + seed) instead:

* the same row always lands on the same side of every threshold, across
  retries, re-partitions and reruns;
* fraction sampling and split assignment are pure map-side filters/projections
  (zero shuffle — they run inside the scan stage at 100 TB);
* exact-N stratified sampling costs exactly one hash-shuffle on the strata
  key (the unavoidable minimum: per-stratum top-N is a grouped selection);
* md5 (not xxhash64) so an external engine can reproduce the selection
  bit-for-bit — the hex digest of identical strings is identical everywhere.

The hash-threshold trick: a 32-hex-digit md5 digest is uniform on
[0, 16^32), so ``digest < hex(fraction * 16^32)`` keeps a ``fraction`` share
in expectation, deterministically per key.  String comparison on lowercase
hex IS numeric comparison (fixed width), no bigint conversion needed.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..util import as_list


def _key_digest(df: DataFrame, on: Union[str, Sequence[str], None],
                seed: int) -> Column:
    """md5 of seed + key columns (default: all columns), as lowercase hex."""
    cols = as_list(on) if on else df.columns
    parts = [F.lit(str(seed))] + [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def _hex_threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # clamp: fraction 1.0 must produce the all-f sentinel (every digest
    # below it), not wrap to 0 when truncated to 32 digits
    return format(min(int(fraction * (1 << 128)), (1 << 128) - 1), "032x")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    on: Union[str, Sequence[str], None] = None,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed by ``on`` (default:
    whole row).  Pure map-side filter — no shuffle, no state; rows with
    equal keys are kept or dropped together (useful: key by document id to
    sample documents, by cluster id to sample whole dedup clusters).
    """
    if fraction >= 1.0:
        return df
    return df.filter(_key_digest(df, on, seed) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata: Union[str, Sequence[str]],
    n_per_stratum: int,
    on: Union[str, Sequence[str], None] = None,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by md5 order
    of the key — a deterministic uniform draw without replacement.

    One hash-shuffle on ``strata`` (the ``row_number`` window); at scale
    prefer low-cardinality strata (language, source, quality bucket) so AQE
    can balance the partitions.  Ties in the digest (identical keys) are
    broken by the digest's own ordering, so the result is a function of the
    data alone.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    strata = as_list(strata)
    d = _key_digest(df, on, seed)
    w = Window.partitionBy(*strata).orderBy(d.asc())
    return (df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n_per_stratum).drop("__rn__"))


def assign_splits(
    df: DataFrame,
    weights: Mapping[str, float],
    on: Union[str, Sequence[str], None] = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column ("train"/"val"/"test"/...) by hash-threshold
    ranges — the standard leak-proof corpus split: keyed by document (or
    cluster) id, a row's split never changes when the corpus grows, is
    recomputed identically on every engine, and costs zero shuffles.

    ``weights`` must sum to 1 (±1e-9); ranges are assigned in the mapping's
    iteration order.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if not weights:
        raise ValueError("weights must be non-empty")
    d = _key_digest(df, on, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = d < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    on: Union[str, Sequence[str], None] = None,
    seed: int = 42,
    strata: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Exact-``n`` WEIGHTED sampling without replacement (Efraimidis &
    Spirakis 2006, algorithm A-Res): each row draws the key
    ``ln(u) / w`` from its weight ``w`` and a deterministic md5-uniform
    ``u``; the ``n`` largest keys are exactly a weight-proportional draw
    without replacement — the primitive behind importance RESAMPLING of
    a scored corpus (e.g. DSIR weights from :func:`text.dsir_logratio`,
    quality-score-proportional subsets).  Rows with null or
    non-positive weight carry zero mass and are excluded.

    Deterministic like everything in this module: ``u`` comes from the
    top 60 bits of ``md5(seed | key-cols)`` (``on``, default the whole
    row), so the same row draws the same key on every engine, retry and
    partitioning; key ties between DIFFERENT rows are broken by the
    digest itself.  Caveat: the guarantee requires ``on`` to uniquely
    key rows (or duplicates to be full-row identical) — rows sharing
    the same ``on`` values have identical digest AND key, so which copy
    the cut keeps among them is arbitrary when their other columns
    differ.  The default (``on=None`` = the whole row) is always safe.

    Plan shape at 100 TB: the key is a map-side expression inside the
    scan stage; the global selection is ``orderBy(key).limit(n)`` —
    Spark's TakeOrdered, a per-partition top-``n`` + driver merge of
    ``n`` rows per partition, NO full sort shuffle.  With ``strata``,
    selection is exact-``n`` per stratum via one hash-shuffle window
    (same cost note as :func:`stratified_sample`).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if weight_col not in df.columns:
        raise ValueError(f"weight column {weight_col!r} not in DataFrame")
    w = F.col(weight_col).cast("double")
    d = _key_digest(df, on, seed)
    # u in (0, 1): top 15 hex digits = 60 uniform bits; +0.5 dodges the
    # measure-zero u=0 (ln would be -inf) without biasing the draw
    u = ((F.conv(F.substring(d, 1, 15), 16, 10).cast("double") + 0.5)
         / F.lit(float(16 ** 15)))
    base = (df.filter(w.isNotNull() & (w > 0) & ~F.isnan(w))
            .withColumn("__wkey__", F.log(u) / w)
            .withColumn("__wdig__", d))
    order = [F.col("__wkey__").desc(), F.col("__wdig__").asc()]
    if strata is not None:
        win = Window.partitionBy(*as_list(strata)).orderBy(*order)
        out = (base.withColumn("__rn__", F.row_number().over(win))
               .filter(F.col("__rn__") <= n).drop("__rn__"))
    else:
        out = base.orderBy(*order).limit(n)
    return out.drop("__wkey__", "__wdig__")


def temperature_weights(
    sizes: Mapping[str, int],
    temperature: float = 1.0,
) -> dict:
    """Temperature-scaled mixture weights from corpus sizes:
    ``p_c ∝ n_c^(1/temperature)``, normalized to sum to 1 — the standard
    multilingual/multi-source sampling rule (T5/mT5 state it as a
    sampling temperature; Gopher/PaLM as ``p ∝ n^α`` with
    ``α = 1/temperature``, e.g. α=0.7 ≡ T≈1.43, mT5's α=0.3 ≡ T≈3.33).
    ``temperature=1`` reproduces natural proportions; larger temperatures
    flatten toward uniform, boosting low-resource corpora.  Pure driver
    arithmetic over O(#corpora) scalars; feed the result to
    :func:`mix_corpora`."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n < 0 for n in sizes.values()):
        raise ValueError("corpus sizes must be >= 0")
    raw = {c: float(n) ** (1.0 / temperature) for c, n in sizes.items()}
    total = sum(raw.values())
    if total <= 0:
        raise ValueError("at least one corpus must be non-empty")
    return {c: r / total for c, r in raw.items()}


def mix_corpora(
    corpora: Mapping[str, DataFrame],
    weights: Union[Mapping[str, float], None],
    n_total: int,
    on: Union[str, Sequence[str], None] = None,
    seed: int = 42,
    source_col: str = "source",
    temperature: Union[float, None] = None,
) -> DataFrame:
    """Compose a training mixture: draw ``round(weight_c * n_total)`` rows
    from each corpus (less if the corpus is smaller), tagged with
    ``source_col`` — the data-mixture step of every LLM pre-training run,
    made deterministic and engine-replayable.

    The draw per corpus is the ``stratified_sample`` rule: md5(seed | key)
    order, keep the first n_c — a uniform sample without replacement that
    is a pure function of (data, seed), so the identical mixture can be
    recomputed by any engine and is stable under corpus re-partitioning.

    Pass ``temperature=`` INSTEAD of ``weights`` to derive the weights
    from the corpus sizes via :func:`temperature_weights`
    (``p_c ∝ n_c^(1/T)`` — the multilingual low-resource-boosting rule);
    the sizes come from one map-side-combinable count over the tagged
    union (a single extra job, one row per corpus of driver state).

    Plan shape: the corpora are unioned with their source tag FIRST, so the
    per-corpus top-n runs as ONE window over the union, partitioned by the
    tag — a single hash-shuffle on ``source_col`` regardless of corpus
    count (n separate limit jobs would scan n times and give n exchanges).
    Schemas must be union-compatible (missing columns are forbidden —
    align them upstream).
    """
    if n_total < 1:
        raise ValueError("n_total must be >= 1")
    if (weights is None) == (temperature is None):
        raise ValueError("pass exactly one of weights / temperature")
    tagged = None
    for name, df in corpora.items():
        t = df.withColumn(source_col, F.lit(name))
        tagged = t if tagged is None else tagged.unionByName(t)
    if temperature is not None:
        sizes = {name: 0 for name in corpora}
        sizes.update({r[source_col]: int(r["__n__"]) for r in
                      tagged.groupBy(source_col)
                      .agg(F.count(F.lit(1)).alias("__n__")).collect()})
        weights = temperature_weights(sizes, temperature)
    if set(corpora) != set(weights):
        raise ValueError("corpora and weights must have identical keys")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    quotas = {}
    for name in corpora:
        quotas[name] = int(round(weights[name] / total * n_total))
    d = _key_digest(tagged, as_list(on) + [source_col] if on else None, seed)
    w = Window.partitionBy(source_col).orderBy(d.asc())
    quota = None
    for name, q in quotas.items():
        lit = F.lit(q)
        quota = F.when(F.col(source_col) == name, lit) if quota is None \
            else quota.when(F.col(source_col) == name, lit)
    return (tagged.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= quota).drop("__rn__"))


def assign_shards(
    df: DataFrame,
    on: Union[str, Sequence[str]],
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
    order_col: str = "shard_order",
) -> DataFrame:
    """Deterministic balanced shard assignment + within-shard order key —
    the write-path primitive for materializing a curated corpus as N
    training shards whose membership AND document order never depend on
    partitioning, retries, or cluster size (a non-deterministic shard
    layout silently changes every data-parallel training run that maps
    shards to workers).

    ``shard`` = the first 8 md5 hex digits of (seed | key) as uint32 mod
    ``n_shards`` — uniform, so shards balance to within sampling noise
    of ``|df| / n_shards`` each; ``order_col`` = the NEXT 16 hex digits
    (an independent uniform: non-overlapping digest substrings), giving
    a reproducible pseudo-random document order inside each shard — the
    standard "shuffle your corpus once, globally, deterministically"
    recipe for LLM training data.  Both are pure map-side projections
    (zero shuffle, zero state); the actual write is
    ``out.repartition(n_shards, "shard")
    .sortWithinPartitions(shard_col, order_col)
    .write.partitionBy(shard_col)...`` — the single hash exchange is
    the unavoidable minimum for co-locating shards, and because
    ``hash(shard) % n_shards`` is NOT a bijection (several shard ids
    can share a task, some tasks get none), the within-partition sort
    MUST lead with the shard column and the write should partition by
    it so co-located shards never interleave.  md5 keying follows this
    module's contract: any engine replays the assignment bit-for-bit.

    ``on`` must uniquely key rows (the :func:`weighted_sample` contract)
    — duplicate keys land in the same shard at the same order position,
    with their relative order engine-dependent.
    """
    for c in (shard_col, order_col):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    d = _key_digest(df, on, seed)
    shard = F.conv(F.substring(d, 1, 8), 16, 10).cast("long") % n_shards
    return (df.withColumn(shard_col, shard)
            .withColumn(order_col, F.substring(d, 9, 16)))
