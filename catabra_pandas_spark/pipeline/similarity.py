"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as a broadcast join + window top-k —
exact, and the right plan whenever the query set is small (broadcast) even
if the corpus is 100 TB.  Scale path: random-hyperplane LSH bucketing so the
join is bucket-equi instead of all-pairs, with exact re-scoring of
candidates.  Dot products are JVM-side ``zip_with``/``aggregate`` — no
Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector the k nearest
    corpus vectors (self-matches on equal ids excluded).

    Returns (query_id, neighbor_id, cosine_sim, rank) with deterministic
    tie-break (sim desc, neighbor id asc).  The query side is broadcast, so
    the corpus is scanned once with no shuffle; the top-k window partitions
    by query — cardinality |queries| × |corpus| only inside the executors,
    reduced before any exchange."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("__qv__"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(corpus_vec).alias("__cv__"))
    scored = (
        c.join(q, on=F.col("query_id") != F.col("neighbor_id"), how="inner")
        .withColumn("cosine_sim",
                    cosine(F.col("__qv__").cast("array<double>"),
                           F.col("__cv__").cast("array<double>")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine_sim", "rank"))


def _rh_signature(vec: Column, dim: int, planes: int, seed: int) -> Column:
    """Random-hyperplane signature: plane p has ±1 components derived from
    xxhash64(seed, p, d); bit_p = [Σ_d v_d · s_{p,d} > 0].  Deterministic,
    JVM-side, no stored plane matrix."""
    def plane_bit(p: int) -> Column:
        comp = F.zip_with(
            vec, F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda v, d: v * F.when(
                F.xxhash64(F.lit(p), d.cast("string"), F.lit(seed))
                 .bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0)),
        )
        s = F.aggregate(comp, F.lit(0.0), lambda acc, v: acc + v)
        return F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    sig = F.lit(0).cast("long")
    for p in range(planes):
        sig = sig.bitwiseOR(F.shiftleft(plane_bit(p), p))
    return sig


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ``tables`` independent random-hyperplane
    signatures bucket both sides; candidates = bucket collisions in any
    table; exact cosine re-scoring + top-k.  The all-pairs product becomes
    an equi-join on (table, signature) — the 100 TB plan.  Recall rises
    with ``tables``, bucket size falls with ``planes``."""
    def with_sigs(df, id_alias, vec_alias, idc, vecc):
        out = df.select(F.col(idc).alias(id_alias),
                        F.col(vecc).cast("array<double>").alias(vec_alias))
        sigs = F.array(*[
            _rh_signature(F.col(vec_alias), dim, planes, seed + 1000 * t)
            for t in range(tables)])
        return out.select(id_alias, vec_alias,
                          F.posexplode(sigs).alias("table_idx", "sig"))

    q = with_sigs(queries, "query_id", "__qv__", query_id, query_vec)
    c = with_sigs(corpus, "neighbor_id", "__cv__", corpus_id, corpus_vec)
    cand = (
        q.join(c, on=[q["table_idx"] == c["table_idx"], q["sig"] == c["sig"],
                      F.col("query_id") != F.col("neighbor_id")])
        .select("query_id", "__qv__", "neighbor_id", "__cv__")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine_sim", cosine(F.col("__qv__"), F.col("__cv__")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine_sim", "rank"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    planes: int = 6,
    tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) via the same hyperplane-LSH candidate join + exact
    re-scoring.  At threshold ~0.95 the angle is ~18°, so a 6-plane bucket
    catches a pair per table with p≈(1-18/180)^6≈0.53; 6 tables → ~99%
    recall."""
    base = df.select(F.col(id_col).alias("__id__"),
                     F.col(vec_col).cast("array<double>").alias("__v__"))
    sigs = F.array(*[_rh_signature(F.col("__v__"), dim, planes, seed + 1000 * t)
                     for t in range(tables)])
    b = base.select("__id__", "__v__", F.posexplode(sigs).alias("t", "sig"))
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, on=[F.col("l.t") == F.col("r.t"), F.col("l.sig") == F.col("r.sig"),
                      F.col("l.__id__") < F.col("r.__id__")])
        .select(F.col("l.__id__").alias("id_a"), F.col("r.__id__").alias("id_b"),
                F.col("l.__v__").alias("va"), F.col("r.__v__").alias("vb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (cand.withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cosine_sim") >= threshold)
            .select("id_a", "id_b", "cosine_sim"))
