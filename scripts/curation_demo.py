"""End-to-end training-data curation pipeline over the driver's synthetic
corpus — every stage is an operator from this repo, chained the way a real
100 TB curation run chains them, with a printed yield funnel:

  read -> quality gate (apply_filters)         reject low-quality docs
       -> CCNet perplexity buckets             per-language head/middle/
          (ngram_perplexity +                  tail split at exact rank
           quantile_buckets)                   quantiles; drop the tail
       -> learned quality gate                 LR on the rule features
          (train/score_quality_classifier)     against a target source;
                                               drop the lowest 5%
       -> PII scrub (scrub_pii)                redact, keep counts
       -> exact dedup (exact_dedup)            drop byte-identical dups
       -> near-dup clustering                  MinHash-LSH pairs ->
          (minhash_near_dup_pairs +            connected components ->
           near_dup_dedup)                     keep one doc per cluster
       -> benchmark decontamination            drop docs overlapping the
          (decontaminate)                      held-out eval slice
       -> DSIR importance resampling           bigram log-likelihood-ratio
          (dsir_logratio + weighted_sample)    weights toward the target
                                               slice, A-Res exact-N draw
       -> mixture composition                  temperature-derived weights
          (mix_corpora(temperature=2))         p ∝ n^(1/T) low-resource
                                               boost
       -> sequence packing (pack_sequences)    256-token training bins
       -> z-ordered parquet (zorder_layout +   multi-column min-max
          write_table)                         pruning for consumers

Every stage is lazy until the funnel counts force it; the final write is
one job.  Deterministic end to end (md5/xxhash keyed), so reruns produce
byte-identical output.

Usage: python scripts/curation_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession, functions as F
    import catabra_pandas_spark.pipeline as P
    from catabra_pandas_spark.sources import read_table, write_table, zorder_layout

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("curation-demo")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    docs = read_table(spark, sf, "documents")
    funnel = [("input", docs.count())]

    # 1. quality gate — reject with per-rule attribution
    feats = P.detect_language(P.text_quality(docs))
    gated = P.apply_filters(feats, {
        "too_short": F.col("n_tokens") < 5,
        "low_quality": F.col("quality_score") < 0.5,
        "lang_undetermined": F.col("lang_pred") == "und",
    })
    loss = (gated.select(F.explode("filter_reasons").alias("rule"))
            .groupBy("rule").count().collect())
    kept = gated.filter("kept").drop("filter_flags", "filter_reasons", "kept")
    funnel.append(("quality_gate", kept.count()))

    # 1b. LM-perplexity filter, the published CCNet shape (Wenzek 2020
    #     §4.3): train the capped bigram model on the gate survivors,
    #     split per LANGUAGE at the exact 1/3-2/3 perplexity rank
    #     quantiles, drop the 'tail' bucket.  Anti-join against the
    #     dropped bucket (NOT semi-join against survivors):
    #     ngram_perplexity omits <2-token docs, and unscored docs must
    #     pass through, not be silently dropped.
    lm = P.train_ngram_lm(kept)
    ppl = P.ngram_perplexity(kept, lm, id_cols=("doc_id", "lang"))
    buckets = P.quantile_buckets(ppl, "perplexity", group_by="lang")
    kept = (kept.join(buckets.filter(F.col("bucket") == "tail")
                      .select("doc_id"), "doc_id", "left_anti"))
    funnel.append(("ccnet_ppl_buckets", kept.count()))

    # 1c. LEARNED quality gate: logistic regression on the rule-based
    #     quality features against the dominant source as the
    #     looks-like-target label (CCNet trains fasttext against
    #     Wikipedia — same shape, engine-native and deterministic),
    #     then drop the lowest 5% of classifier probability
    target_src = (docs.groupBy("source").count()
                  .orderBy(F.desc("count"), "source").first()["source"])
    labeled = kept.withColumn(
        "__y__", (F.col("source") == target_src).cast("int"))
    qc = P.train_quality_classifier(
        labeled, "__y__",
        ["n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio",
         "digit_ratio"], n_iter=5)
    scored = P.score_quality_classifier(labeled, qc).drop("__y__")
    kept = (P.quantile_buckets(scored, "quality_prob", cuts=(0.05,),
                               labels=("reject", "keep"))
            .filter(F.col("bucket") != "reject")
            .drop("quality_prob", "bucket"))
    funnel.append(("learned_quality", kept.count()))

    # 2. PII scrub (in place; counts kept for audit)
    scrubbed = (P.scrub_pii(kept)
                .withColumn("text", F.col("text_scrubbed"))
                .drop("text_scrubbed"))

    # 3. exact dedup on the scrubbed text
    exact = P.exact_dedup(scrubbed, columns=["text"], id_col="doc_id",
                          mode="drop").drop("dup_key", "dup_count")
    funnel.append(("exact_dedup", exact.count()))

    # 4. near-dup clustering: LSH pairs -> connected components -> 1/cluster
    pairs = P.minhash_near_dup_pairs(exact, k=2, num_hashes=64, bands=16,
                                     threshold=0.5)
    neardup = P.near_dup_dedup(exact, pairs, id_col="doc_id", mode="drop") \
        .drop("cluster_id")
    funnel.append(("near_dup_dedup", neardup.count()))

    # 4b. substring-level dedup (ExactSubstr): drop duplicated spans
    #     inside the survivors, keep docs with enough novel tokens left
    spans = P.exact_substring_dedup(neardup, width=8)
    neardup = (neardup.join(spans.filter(F.col("n_kept") >= 5)
                            .select("doc_id", "text_deduped"), "doc_id")
               .withColumn("text", F.col("text_deduped"))
               .drop("text_deduped"))
    funnel.append(("substring_dedup", neardup.count()))

    # 4c. SemDeDup: semantic near-dups the lexical stages cannot see
    #     (paraphrases land far in shingle space but close in embedding
    #     space).  The embeddings table is keyed by the same ids; one
    #     keeper per semantic group, the paper's lowest-centroid-cosine
    #     pick.
    emb = read_table(spark, sf, "embeddings")
    sem = P.semantic_dedup(
        emb.join(neardup.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        threshold=0.97, n_centroids=16, n_iter=3)
    neardup = neardup.join(
        sem.filter("keep").select(F.col("vec_id").alias("doc_id")), "doc_id")
    funnel.append(("semantic_dedup", neardup.count()))

    # 5. decontamination against the held-out slice (doc_id % 20 == 0):
    #    lexical n-gram overlap AND embedding-space similarity — the
    #    second catches paraphrased eval leakage the first cannot
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = neardup.filter(F.col("doc_id") % 20 != 0)

    # 5-pre. BM25 contamination TRIAGE (an audit, not a filter): EVERY
    #    benchmark document as a query, scored against the whole corpus
    #    in ONE scan (bm25_search_many's per-partition top-k
    #    accumulation — query count does not add corpus passes) — the
    #    cheap term-level hunt a reviewer runs before committing to the
    #    exact n-gram filter; its candidate recall over the filter's
    #    actual drops is printed below
    bench_q = {f"bench{r['doc_id']}": r["text"]
               for r in bench.orderBy("doc_id").collect()}
    bm_cand = (P.bm25_search_many(
        corpus, P.doc_frequencies(corpus, max_vocab=5000), bench_q, k=5)
        .select("doc_id").distinct())
    n_cand = bm_cand.count()

    clean = P.decontaminate(corpus, bench, n=8, min_hits=1, mode="drop")
    dropped_ngram = corpus.select("doc_id").exceptAll(
        clean.select("doc_id"))
    n_dropped = dropped_ngram.count()
    n_cand_hit = bm_cand.join(dropped_ngram, "doc_id", "left_semi").count()
    bench_emb = emb.filter(F.col("vec_id") % 20 == 0)
    clean = (P.semantic_decontaminate(
        clean.join(emb, clean.doc_id == emb.vec_id).drop("vec_id", "label"),
        bench_emb, threshold=0.95, mode="drop").drop("embedding"))
    funnel.append(("decontaminated", clean.count()))

    # 5b. DSIR importance resampling toward the English slice (Xie et
    #     al. 2023): score every survivor's bigram log-likelihood ratio
    #     target-vs-raw in one broadcast Arrow pass, then draw a
    #     weight-proportional exact-N subset WITHOUT replacement
    #     (Efraimidis-Spirakis A-Res, md5-deterministic)
    tgt_lm, raw_lm = P.train_ngram_lm_pair(clean, F.col("lang") == "en")
    lr = P.dsir_logratio(clean, tgt_lm, raw_lm)
    weighted = (clean.join(lr.select("doc_id", "dsir_logratio"), "doc_id")
                .withColumn("dsir_w", F.exp(F.col("dsir_logratio"))))
    n_keep = int(weighted.count() * 0.9)
    clean = P.weighted_sample(weighted, n_keep, "dsir_w", on="doc_id",
                              seed=13).drop("dsir_logratio", "dsir_w")
    # the funnel counts re-execute the lineage per stage; ten operator
    # stages deep the recompute tree outgrows a demo-sized driver heap,
    # so cut it once here (the resample is also the natural checkpoint:
    # everything after consumes the fixed curated subset)
    clean = clean.localCheckpoint(eager=True)
    funnel.append(("dsir_resample", clean.count()))

    # 6. mixture at temperature-derived weights: p ∝ n^(1/T) with T=2
    #    (the T5/mT5 sampling-temperature rule — boosts low-resource
    #    languages toward uniform; sizes come from one count over the
    #    tagged union)
    langs = [r[0] for r in clean.select("lang").distinct().collect()]
    total = min(clean.count(), 300)
    mixed = P.mix_corpora({l: clean.filter(F.col("lang") == l) for l in langs},
                          None, n_total=total, on="doc_id", seed=7,
                          temperature=2.0)
    funnel.append(("mixture", mixed.count()))

    # 7. tokenizer training on the CURATED mixture (word-count shuffle +
    #    driver merge loop), then real learned-BPE token counts
    merges = P.train_bpe(mixed, n_merges=150)
    tokenized = P.bpe_tokenize(mixed, merges)

    # 8. sequence packing into 256-token bins per source
    packed = P.pack_sequences(P.token_count(tokenized), "n_tokens", 256,
                              "doc_id", group_by="source")
    n_bins = packed.agg(F.countDistinct("source", "bin_id")).collect()[0][0]

    # 9. z-ordered write for downstream min-max pruning
    tmp = None
    if out_dir is None:
        tmp = tempfile.TemporaryDirectory()
        out_dir = tmp.name + "/curated"
    final = packed.select("doc_id", "source", "lang", "text", "n_tokens",
                          "bin_id", "bin_offset",
                          F.col("doc_id").alias("zk1"),
                          F.col("n_tokens").alias("zk2"))
    write_table(zorder_layout(final, ["zk1", "zk2"], bits=12,
                              num_partitions=4).drop("zk1", "zk2"), out_dir)
    written = spark.read.parquet(out_dir).count()

    print("\n=== yield funnel ===")
    prev = None
    for stage, cnt in funnel:
        drop = f"  (-{prev - cnt})" if prev is not None else ""
        print(f"  {stage:>16}: {cnt}{drop}")
        prev = cnt
    print("  rejection reasons:", {r["rule"]: r["count"] for r in loss})
    print(f"  bm25 contamination triage: {n_cand} candidates "
          f"({len(bench_q)} queries, one scan); recall over n-gram "
          f"drops: {n_cand_hit}/{n_dropped}")
    print(f"  learned BPE merges: {len(merges)}")
    print(f"  packed bins: {n_bins}; rows written: {written}")
    print(f"  wall: {time.perf_counter() - t0:.1f}s")
    assert written == funnel[-1][1], "written rows must equal mixture rows"
    print("CURATION_DEMO PASS")
    if tmp:
        tmp.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
