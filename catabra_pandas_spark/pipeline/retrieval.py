"""Ranked full-text retrieval and text-to-vector featurization for
training-data curation: corpus document-frequency statistics, TF-IDF
keyword extraction, BM25 search, and feature-hashed bag-of-words
embeddings (Weinberger et al. 2009, "Feature Hashing for Large Scale
Multitask Learning").

Design (the same recipe as :mod:`.text`'s LM operators): the only
distributed aggregation is ONE capped, map-side-combinable token count
shuffle that produces the corpus statistics table (document frequencies
+ corpus size + token total) — KBs-to-MBs however large the corpus.
Scoring is then MAP-ONLY: the table is broadcast and one Arrow pass
scores each document (zero corpus shuffle at any scale).  Tokenization
is the shared rule from ``train_ngram_lm`` (lowercase, split on single
spaces, drop empties — ``text._tokenize_batch``), so every definition
here is SQL-replayable by the DuckDB oracles bit-for-bit.

Why these belong in a 100 TB curation engine: TF-IDF terms drive topic
tagging and near-dup triage; BM25 is the standard "find the documents
about X" primitive for corpus auditing and contamination hunts; the
hashed-TF embedding bridges RAW TEXT into the existing vector stack
(``semantic_dedup`` / ``cosine_topk`` / ``ivf_cosine_topk``) without any
external model — its integer accumulation makes every component exactly
reproducible across engines and partitionings.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, functions as F

from ..util import ensure_min_partitions
from .text import _tokenize_batch


def doc_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 100_000,
) -> dict:
    """Corpus document-frequency statistics — the shared sufficient
    statistics for :func:`tfidf_top_terms` and :func:`bm25_search`.

    ONE corpus scan, ONE map-side-combinable count shuffle: per document
    the DISTINCT token set (``array_distinct``, computed inside the
    scan) explodes to (token, 1) and aggregates to document
    frequencies, capped at the ``max_vocab`` most frequent tokens with
    deterministic ordering (df desc, token asc) — the tail beyond the
    cap scores as unseen/zero, the standard vocabulary-pruning
    semantics.  The corpus size and token total (for IDF and length
    normalization) ride the SAME job as an ``Observation`` — accumulated
    on the scan's rows as they stream past, no second pass over the
    corpus (the ``orderBy`` before the cap's ``limit`` guarantees every
    row is processed, so the observed totals are exact).

    Returns ``{"df": {token: n_docs}, "n_docs": N, "total_tokens": T}``;
    driver state is O(max_vocab), never O(corpus).
    """
    from pyspark.sql import Observation

    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "")
    obs = Observation()
    base = df.select(toks.alias("__t__")).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size("__t__")), F.lit(0)).alias("total"))
    rows = (base.select(F.explode(F.array_distinct("__t__")).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("w").asc())
            .limit(max_vocab).collect())
    totals = obs.get
    return {"df": {r["w"]: int(r["n"]) for r in rows},
            "n_docs": int(totals["n_docs"]),
            "total_tokens": int(totals["total"])}


def tfidf_top_terms(
    df: DataFrame,
    stats: dict,
    text_col: str = "text",
    id_cols: Union[str, Sequence[str]] = ("doc_id",),
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the standard keyword /
    topic-signal extraction over a curated corpus.

    Definitions (sklearn's smooth-IDF convention, chosen because every
    term is a single closed-form expression an external engine replays
    exactly): ``idf(t) = ln((1 + N) / (1 + df(t))) + 1`` with ``N =
    stats["n_docs"]``, ``tf(t, d)`` = raw count of ``t`` in ``d``, score
    = ``tf * idf``.  Per-document ranking is score desc, then term asc —
    fully deterministic.  Tokens outside the capped ``stats["df"]``
    vocabulary are skipped (df-cap semantics); documents with no
    in-vocabulary token are omitted.

    MAP-ONLY: the stats table is broadcast and one Arrow pass computes
    per-document term counts (pandas groupby over the batch's exploded
    tokens), scores them against the broadcast IDF vector and emits each
    document's top ``k`` rows — zero corpus shuffle at any scale.
    Output: ``id_cols`` + ``term`` (string), ``tfidf`` (double),
    ``rank`` (1-based long).
    """
    id_cols = list([id_cols] if isinstance(id_cols, str) else id_cols)
    n_docs = int(stats["n_docs"])
    bc = df.sparkSession.sparkContext.broadcast(stats["df"])
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["term string", "tfidf double", "rank long"])
    src = ensure_min_partitions(df.select(*id_cols, text_col))

    def mapper(batches):
        import numpy as np
        import pandas as pd

        vocab = pd.Index(sorted(bc.value), dtype=object)
        dfreq = np.fromiter((bc.value[w] for w in vocab), "float64",
                            len(vocab))
        idf = np.log((1.0 + n_docs) / (1.0 + dfreq)) + 1.0
        for pdf in batches:
            toks = _tokenize_batch(pdf[text_col])
            lens = [len(t) if t else 0 for t in toks]
            if sum(lens) == 0:
                continue
            flat = pd.DataFrame({
                "__pos__": np.repeat(np.arange(len(pdf)), lens),
                "__tid__": vocab.get_indexer(
                    np.asarray([w for t in toks if t for w in t],
                               dtype=object)),
            })
            flat = flat[flat["__tid__"] >= 0]
            if not len(flat):
                continue
            tf = (flat.groupby(["__pos__", "__tid__"], sort=False)
                  .size().reset_index(name="__tf__"))
            tf["tfidf"] = tf["__tf__"].to_numpy("float64") \
                * idf[tf["__tid__"].to_numpy()]
            tf["term"] = vocab.take(tf["__tid__"].to_numpy())
            # deterministic per-doc top-k: score desc, term asc
            tf = tf.sort_values(["__pos__", "tfidf", "term"],
                                ascending=[True, False, True],
                                kind="mergesort")
            tf["rank"] = tf.groupby("__pos__", sort=False).cumcount() + 1
            tf = tf[tf["rank"] <= k]
            out = pdf[id_cols].iloc[tf["__pos__"].to_numpy()] \
                .reset_index(drop=True)
            out["term"] = tf["term"].to_numpy()
            out["tfidf"] = tf["tfidf"].to_numpy()
            out["rank"] = tf["rank"].to_numpy("int64")
            yield out

    return src.mapInPandas(mapper, schema=schema)


def _bm25_batch_scores(counters, denom_dl, terms, n_docs, k1):
    """(score, n_hits) arrays for one Arrow batch against one query's
    prepped ``[(term, df), ...]`` list — the SINGLE copy of the BM25
    arithmetic both :func:`bm25_search` and :func:`bm25_search_many`
    call (two hand-maintained copies of the idf/score math would drift).
    ``counters``: one ``collections.Counter`` per document, built ONCE
    per batch and shared across every query — O(1) tf lookups instead
    of an O(doc_len) rescan per term.  Terms accumulate in the given
    (ascending) order: fixed float summation."""
    import math

    import numpy as np

    n = len(counters)
    score = np.zeros(n, dtype=np.float64)
    hits = np.zeros(n, dtype=np.int64)
    for w, dfreq in terms:
        idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
        tf = np.fromiter((c[w] for c in counters), "float64", n)
        score += np.where(tf > 0.0,
                          idf * tf * (k1 + 1.0) / (tf + denom_dl), 0.0)
        hits += (tf > 0).astype(np.int64)
    return score, hits


def bm25_search(
    df: DataFrame,
    stats: dict,
    query: str,
    text_col: str = "text",
    id_cols: Union[str, Sequence[str]] = ("doc_id",),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a free-text query under BM25 (Robertson &
    Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
    Beyond") — the corpus-audit primitive ("which documents are about
    X?", "did the benchmark leak in?") that LSH/semantic search does not
    cover because it needs exact term-level evidence.

    Lucene's non-negative IDF variant: ``idf(t) = ln(1 + (N - df + 0.5)
    / (df + 0.5))``; per-document score = ``Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl))`` over the DISTINCT query terms, with
    ``dl`` = document token count and ``avgdl = total_tokens / n_docs``
    from ``stats``.  Query terms outside the capped vocabulary score
    zero (consistent with :func:`tfidf_top_terms`); the sum runs in
    ascending term order so the float accumulation is reproducible.

    Plan shape: scoring is a broadcast map-only Arrow pass (zero corpus
    shuffle); the global top-``k`` is ``orderBy(...).limit(k)``, which
    Spark executes as TakeOrdered — per-partition top-``k`` then a
    driver merge of ``k`` rows per partition, NO full sort shuffle (the
    same selection pattern as ``weighted_sample``).  Ties break by the
    id columns ascending.  Output: ``id_cols`` + ``bm25`` (double) +
    ``n_hits`` (long, how many distinct query terms matched), rows with
    ``n_hits == 0`` dropped before the selection.
    """
    id_cols = list([id_cols] if isinstance(id_cols, str) else id_cols)
    n_docs = int(stats["n_docs"])
    if n_docs <= 0:
        raise ValueError("stats describe an empty corpus")
    avgdl = stats["total_tokens"] / n_docs
    qterms = sorted({w for w in query.lower().split(" ") if w}
                    & set(stats["df"]))
    bc = df.sparkSession.sparkContext.broadcast(
        [(w, float(stats["df"][w])) for w in qterms])
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["bm25 double", "n_hits long"])
    src = ensure_min_partitions(df.select(*id_cols, text_col))

    def mapper(batches):
        from collections import Counter

        import numpy as np

        terms = bc.value
        for pdf in batches:
            toks = _tokenize_batch(pdf[text_col])
            counters = [Counter(t) if t else Counter() for t in toks]
            dl = np.asarray([len(t) if t else 0 for t in toks], "float64")
            denom_dl = k1 * (1.0 - b + b * dl / avgdl)
            score, hits = _bm25_batch_scores(counters, denom_dl, terms,
                                             n_docs, k1)
            keep = hits > 0
            out = pdf[id_cols].copy()[keep]
            out["bm25"] = score[keep]
            out["n_hits"] = hits[keep]
            yield out

    scored = src.mapInPandas(mapper, schema=schema)
    order = [F.col("bm25").desc()] + [F.col(c).asc() for c in id_cols]
    return scored.orderBy(*order).limit(k)


def hashed_tf_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Union[str, Sequence[str]] = ("doc_id",),
    dim: int = 64,
    normalize: bool = True,
    out_col: str = "embedding",
) -> DataFrame:
    """Feature-hashed bag-of-words embedding (the "hashing trick",
    Weinberger et al. 2009): each token lands in bucket ``md5(token)[:8]
    as uint32 mod dim`` with sign ``+1`` iff the 9th hex nibble is even,
    and buckets accumulate signed token COUNTS — the signed hash makes
    collisions cancel in expectation instead of biasing upward (ibid.
    §3).  Optionally L2-normalized, so cosine against other hashed
    embeddings is meaningful.

    The bridge from raw text into this engine's vector stack: feed the
    output straight to ``semantic_dedup`` / ``cosine_topk`` /
    ``ivf_cosine_topk`` / ``kmeans_codebook`` when no external embedding
    model is available.  md5 (not xxhash64) for the same reason as
    :mod:`.sampling`: any engine reproduces the bucket assignment
    bit-for-bit.  Accumulation is INTEGER (signed counts), so every
    component is exact regardless of accumulation order or partitioning;
    normalization divides by ``sqrt`` of an exact integer — one rounding
    per component, identical everywhere.

    MAP-ONLY (zero shuffle): one Arrow pass hashes each batch's tokens
    (md5 over unique tokens only, then an inverse map) and bincounts
    into the ``dim``-wide vector.  Documents with no token emit the zero
    vector (normalized: still zero, by convention).  Output: ``id_cols``
    + ``out_col`` (``array<float>`` of length ``dim``).
    """
    id_cols = list([id_cols] if isinstance(id_cols, str) else id_cols)
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + [f"`{out_col}` array<float>"])
    src = ensure_min_partitions(df.select(*id_cols, text_col))

    def mapper(batches):
        import hashlib

        import numpy as np

        def bucket_sign(w: str):
            h = hashlib.md5(w.encode("utf-8")).hexdigest()
            return int(h[:8], 16) % dim, 1.0 if int(h[8], 16) % 2 == 0 \
                else -1.0

        for pdf in batches:
            toks = _tokenize_batch(pdf[text_col])
            lens = [len(t) if t else 0 for t in toks]
            uniq = {w for t in toks if t for w in t}
            lut = {w: bucket_sign(w) for w in uniq}
            vecs = np.zeros((len(pdf), dim), dtype=np.float64)
            pos = np.repeat(np.arange(len(pdf)), lens)
            if len(pos):
                bs = np.asarray([lut[w] for t in toks if t for w in t],
                                "float64")
                # exact: signed integer counts, |value| < 2^53
                np.add.at(vecs, (pos, bs[:, 0].astype(np.int64)), bs[:, 1])
            if normalize:
                norm = np.sqrt((vecs * vecs).sum(axis=1, dtype=np.float64))
                vecs = np.divide(vecs, norm[:, None],
                                 out=np.zeros_like(vecs),
                                 where=norm[:, None] > 0.0)
            out = pdf[id_cols].copy()
            out[out_col] = [row.astype(np.float32) for row in vecs]
            yield out

    return src.mapInPandas(mapper, schema=schema)


def bm25_search_many(
    df: DataFrame,
    stats: dict,
    queries: dict,
    text_col: str = "text",
    id_cols: Union[str, Sequence[str]] = ("doc_id",),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for EACH of many queries in ONE corpus scan —
    the batch form of :func:`bm25_search` for contamination hunts
    (every benchmark question as a query, one pass over the corpus)
    and bulk corpus audits.

    Same scoring as :func:`bm25_search` (Lucene BM25, fixed
    ascending-term summation, capped-vocabulary semantics).  The scale
    design is per-partition top-``k`` ACCUMULATION: the Arrow mapper
    keeps a running top-``k`` candidate list per query across its
    partition's batches (pruned after every batch with the
    deterministic (score desc, ids asc) order, so partition memory is
    O(|queries| · k)) and emits candidates only at partition end; the
    single exchange that follows carries at most ``partitions × |Q| ×
    k`` rows — independent of corpus size — and a window rank per query
    selects the global top-``k``.  Local pruning is lossless: any row
    in the global top-``k`` is in its partition's top-``k`` under the
    same total order.

    ``queries``: ``{name: query_text}``.  Output: ``query`` (string) +
    ``id_cols`` + ``bm25`` (double), ``n_hits`` (long), ``rank``
    (1-based long); documents matching no term of a query never appear
    under that query.
    """
    from pyspark.sql import Window

    id_cols = list([id_cols] if isinstance(id_cols, str) else id_cols)
    n_docs = int(stats["n_docs"])
    if n_docs <= 0:
        raise ValueError("stats describe an empty corpus")
    avgdl = stats["total_tokens"] / n_docs
    prepped = {}
    for name, qtext in queries.items():
        qterms = sorted({w for w in qtext.lower().split(" ") if w}
                        & set(stats["df"]))
        prepped[name] = [(w, float(stats["df"][w])) for w in qterms]
    bc = df.sparkSession.sparkContext.broadcast(prepped)
    schema = ", ".join(
        ["query string"]
        + [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["bm25 double", "n_hits long"])
    src = ensure_min_partitions(df.select(*id_cols, text_col))

    def mapper(batches):
        from collections import Counter

        import numpy as np
        import pandas as pd

        best = {name: None for name in bc.value}  # per-query running top-k
        for pdf in batches:
            toks = _tokenize_batch(pdf[text_col])
            counters = [Counter(t) if t else Counter() for t in toks]
            dl = np.asarray([len(t) if t else 0 for t in toks], "float64")
            denom_dl = k1 * (1.0 - b + b * dl / avgdl)
            for name, terms in bc.value.items():
                score, hits = _bm25_batch_scores(counters, denom_dl,
                                                 terms, n_docs, k1)
                keep = hits > 0
                if not keep.any():
                    continue
                cand = pdf[id_cols].copy()[keep]
                cand.insert(0, "query", name)
                cand["bm25"] = score[keep]
                cand["n_hits"] = hits[keep]
                pool = cand if best[name] is None \
                    else pd.concat([best[name], cand], ignore_index=True)
                # deterministic prune: score desc, id cols asc
                pool = pool.sort_values(
                    ["bm25"] + id_cols,
                    ascending=[False] + [True] * len(id_cols),
                    kind="mergesort").head(k)
                best[name] = pool.reset_index(drop=True)
        out = [p for p in best.values() if p is not None]
        if out:
            yield pd.concat(out, ignore_index=True)

    cands = src.mapInPandas(mapper, schema=schema)
    w = Window.partitionBy("query").orderBy(
        F.col("bm25").desc(), *[F.col(c).asc() for c in id_cols])
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
