"""BPE tokenizer training + tokenization (pipeline/bpe.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from catabra_pandas_spark.pipeline import (bpe_decode_tokens, bpe_tokenize,
                                           train_bpe)

from .conftest import to_sdf


def _ref_train(word_counts, n_merges):
    """Straight-from-the-paper reference implementation (Sennrich 2016)."""
    words = [(tuple(w) + ("</w>",), n) for w, n in word_counts]
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, n in words:
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        out = []
        for sym, n in words:
            i, new = 0, []
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    new.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out.append((tuple(new), n))
        words = out
    return merges


def test_train_bpe_matches_reference(spark):
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]})
    merges = train_bpe(to_sdf(spark, docs), n_merges=10)
    # reference on the hand-counted word frequencies
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    assert merges == _ref_train(wc, 10)
    # the classic result: 'es', 'est', 'est</w>' arise from newest/widest
    joined = ["".join(m) for m in merges]
    assert "es" in joined and "est" in joined


def test_bpe_tokenize_roundtrip_and_counts(spark):
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "the quick brown fox jumps over the lazy dog",
        "the the the the the",
        "",
        None,
    ]})
    sdf = to_sdf(spark, docs)
    merges = train_bpe(sdf, n_merges=30)
    out = bpe_tokenize(sdf, merges, tokens_col="toks").toPandas() \
        .set_index("doc_id")
    # roundtrip: tokens reassemble the lowercased whitespace-normalized text
    for did, text in [(1, docs.text[0]), (2, docs.text[1])]:
        assert bpe_decode_tokens(out.loc[did, "toks"]) == text
    # 'the' is frequent -> merged to one token per occurrence
    assert out.loc[2, "n_bpe_tokens"] == 5
    # counts bounded by characters+1 per word; empty/null -> 0 tokens
    assert out.loc[3, "n_bpe_tokens"] == 0
    assert out.loc[4, "n_bpe_tokens"] == 0
    lens = docs.set_index("doc_id").text.fillna("")
    for did in (1, 2):
        assert out.loc[did, "n_bpe_tokens"] <= len(lens[did]) + 1


def test_train_bpe_deterministic_and_validated(spark):
    docs = to_sdf(spark, pd.DataFrame({"doc_id": [1], "text": ["a b a b ab"]}))
    assert train_bpe(docs, n_merges=5) == train_bpe(docs, n_merges=5)
    with pytest.raises(ValueError):
        train_bpe(docs, n_merges=-1)
