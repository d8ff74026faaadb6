"""Text analysis over document tables: tokenization stats, quality scoring,
language identification, fingerprinting.

Everything here is a pure JVM-side column expression (regexp / split /
array functions) — no UDFs — so it whole-stage-codegens and scales linearly
over a 100 TB documents table with zero shuffles (narrow transformations
only).  All definitions are deliberately SQL-expressible so DuckDB oracles
can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# languages x marker words for the n-gram/stopword language heuristic;
# chosen to be frequent, short, and mutually exclusive
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that"],
    "de": ["der", "die", "und", "ist", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "es": ["el", "los", "las", "es", "una", "que"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                 "that", "for", "on", "with", "as", "at", "by", "be", "this"]


def _tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased, punctuation-stripped text."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", " "))
    return F.filter(F.split(cleaned, r" +"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace + punctuation-boundary token count (the BPE-ish regex
    tokenizer baseline for data-pipeline budgeting)."""
    return df.withColumn(out_col, F.size(_tokens(F.col(text_col))).cast("long"))


def token_count_bpe(df: DataFrame, text_col: str = "text",
                    out_col: str = "n_tokens_bpe",
                    chars_per_subword: int = 4) -> DataFrame:
    """BPE-ish subword token estimate (for LLM training-data budgeting,
    where whitespace counts undershoot): alphabetic runs contribute
    ``ceil(len / chars_per_subword)`` subwords (BPE merges average ~4
    chars/token on English), every digit is its own token (GPT-style
    digit splitting), and every other non-space symbol is one token.

    Pure JVM column expressions (regexp_extract_all + array aggregate) —
    narrow, zero-shuffle, SQL-replayable."""
    low = F.lower(F.col(text_col))
    words = F.regexp_extract_all(low, F.lit(r"[a-z]+"), 0)
    sub = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(float(chars_per_subword))).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    digits = F.regexp_count(low, F.lit(r"[0-9]"))
    punct = F.regexp_count(low, F.lit(r"[^a-z0-9\s]"))
    return df.withColumn(out_col, (sub + digits + punct).cast("long"))


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: lengths, ratios, and a composite score.

    Adds: n_chars_q, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
    digit_ratio, quality_score (all double; deterministic, SQL-replayable).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_EN_STOPWORDS))).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    avg_tok = F.when(n_tokens > 0, (F.length(F.concat_ws("", toks)).cast("double")) / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok >= 3) & (avg_tok <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.1)).otherwise(F.lit(0.0))
        + F.when(digit_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.withColumns({
        "n_chars_q": n_chars,
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": avg_tok,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "quality_score": score,
    })


def detect_language(df: DataFrame, text_col: str = "text",
                    out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language heuristic: count hits of per-language stopword
    markers (word-boundary regex), pick the argmax, 'und' (undetermined) if
    no hits.  Deterministic tie-break by language code order en<de<fr<es."""
    text = F.lower(F.col(text_col))
    scores = []
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        scores.append((lang, F.regexp_count(text, F.lit(pat))))
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # build reversed so earlier languages win ties
    for lang, s in reversed(scores):
        pred = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Key-collision fingerprint: md5 of the sorted distinct token set of the
    normalized text (the classic OpenRefine "fingerprint" method) — equal
    fingerprints <=> same bag of words, robust to reordering/punctuation."""
    toks = _tokens(F.col(text_col))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.withColumn(out_col, F.md5(canon))
