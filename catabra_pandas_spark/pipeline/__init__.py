"""Large-scale training-data pipeline operators (beyond reference parity —
the BASELINE.json north star: dedup, similarity search, multimodal columns,
text analysis, designed for 100 TB inputs).

All operators are declarative DataFrame transformations: shingling/hashing/
signatures stay JVM-side (split/transform/xxhash64/aggregate), candidate
generation is always a bucketed equi-join (never an all-pairs product), and
Python appears only in Arrow-batched ``mapInPandas`` for multimodal decode
stubs.
"""

from .dedup import (
    connected_components,
    decontaminate,
    exact_dedup,
    exact_substring_dedup,
    exact_substring_stats,
    line_frequency_filter,
    minhash_cross_dup_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    near_dup_dedup,
    ngram_jaccard_pairs,
    shingle_rows,
    shingles,
    simhash,
    simhash_near_dup_pairs,
)
from .similarity import (cosine_topk, embedding_near_dup_pairs,
                         ivf_cosine_topk, kmeans_codebook, lsh_cosine_topk,
                         q8_cosine_topk, quantize_embeddings,
                         semantic_decontaminate, semantic_dedup)
from .text import (apply_filters, detect_language, dsir_logratio,
                   fingerprint, ngram_perplexity, quantile_buckets,
                   repetition_stats, scrub_pii, text_quality, token_count,
                   token_count_bpe, train_ngram_lm, train_ngram_lm_pair)
from .multimodal import (attach_binary_metadata, decode_binary,
                         mp3_metadata, mp4_metadata, resize_image,
                         sample_frames)
from .sampling import (assign_splits, deterministic_sample, mix_corpora,
                       stratified_sample, temperature_weights,
                       weighted_sample)
from .packing import chunk_documents, pack_bins, pack_sequences
from .bpe import bpe_decode_tokens, bpe_tokenize, train_bpe
from .classifier import score_quality_classifier, train_quality_classifier
from .sketches import (approx_distinct, bloom_filter_words, bloom_prejoin,
                       distinct_certificate, heavy_hitters,
                       quantile_certificate, quantile_sketch)
from .retrieval import (bm25_search, bm25_search_many, doc_frequencies,
                        hashed_tf_embedding, tfidf_top_terms)
from .sampling import assign_shards
from .text import normalize_text, strip_html
from .artifacts import load_artifact, save_artifact

__all__ = [
    "exact_dedup", "exact_substring_dedup", "exact_substring_stats",
    "line_frequency_filter",
    "shingles", "shingle_rows", "minhash_signatures", "minhash_near_dup_pairs",
    "simhash", "simhash_near_dup_pairs", "ngram_jaccard_pairs",
    "minhash_cross_dup_pairs",
    "connected_components", "near_dup_dedup", "decontaminate",
    "cosine_topk", "lsh_cosine_topk",
    "ivf_cosine_topk", "embedding_near_dup_pairs", "kmeans_codebook",
    "quantize_embeddings", "q8_cosine_topk", "semantic_dedup",
    "semantic_decontaminate",
    "detect_language", "fingerprint", "text_quality", "token_count",
    "train_ngram_lm", "train_ngram_lm_pair", "ngram_perplexity", "dsir_logratio",
    "quantile_buckets",
    "token_count_bpe", "repetition_stats", "scrub_pii",
    "attach_binary_metadata", "decode_binary", "mp3_metadata", "mp4_metadata",
    "resize_image", "sample_frames",
    "assign_splits", "deterministic_sample", "stratified_sample",
    "temperature_weights", "weighted_sample",
    "train_bpe", "bpe_tokenize", "bpe_decode_tokens",
    "train_quality_classifier", "score_quality_classifier",
    "doc_frequencies", "tfidf_top_terms", "bm25_search",
    "bm25_search_many", "hashed_tf_embedding", "assign_shards",
    "strip_html", "normalize_text",
    "save_artifact", "load_artifact",
]
