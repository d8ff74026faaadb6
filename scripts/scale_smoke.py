"""Scale self-consistency smoke: the reference certifies itself at 10M
observations / 20k entities / 49 attributes by running two execution
strategies against each other (``/root/reference/tests/test_resample_eav.py:249-308``
— no ground truth at that size, only strategy agreement).  This script is
the Spark analogue, sized to the same order of magnitude:

* ``resample_eav`` at 10M EAV rows x 20k entities x 49 attributes with
  random overlapping windows — ``join_strategy="direct"`` vs ``"sweep"``
  must agree cell-for-cell;
* ``resample_interval`` at 5M interval observations — ``"direct"`` vs
  ``"sweep"`` likewise;
* keyless ``group_intervals`` at 5M intervals — the distributed two-pass
  chunked merge vs the single-task constant-group window (the naive
  formulation) must produce identical clusterings.

Data is synthesized EXECUTOR-SIDE from ``spark.range`` + hash arithmetic
(deterministic, no driver materialization, no testdata dependency), so
the script also demonstrates the generation pattern for arbitrary-SF
stress runs.  Exit code 0 iff every comparison matches.

Usage: python scripts/scale_smoke.py [n_obs] (default 10_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_eav(spark, n, n_entities=20_000, n_attrs=49, span=1_000_000.0):
    from pyspark.sql import functions as F
    r = spark.range(n, numPartitions=64)
    h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(10**9))
    return r.select(
        F.pmod(h(1), F.lit(n_entities)).alias("entity"),
        (h(2).cast("double") / 1e9 * span).alias("timestamp"),
        F.concat(F.lit("attr_"), (F.pmod(h(3), F.lit(n_attrs)) + 1).cast("string")).alias("attribute"),
        (h(4).cast("double") / 1e6).alias("value"),
    )


def compare(name, a, b, keys):
    """Cell-exact comparison via two anti-joins on rounded frames (no
    driver-side collect of the bulk data)."""
    from pyspark.sql import functions as F
    ra = a.select([F.round(c[0], 6).alias(c[0]) if c[1] == "double" else F.col(c[0])
                   for c in a.dtypes])
    rb = b.select([F.round(c[0], 6).alias(c[0]) if c[1] == "double" else F.col(c[0])
                   for c in b.dtypes])
    d1 = ra.exceptAll(rb).count()
    d2 = rb.exceptAll(ra).count()
    n = a.count()
    ok = d1 == 0 and d2 == 0 and n > 0
    print(f"[{'ok' if ok else 'FAIL'}] {name}: rows={n} onlyA={d1} onlyB={d2}")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import SparkSession, functions as F
    import catabra_pandas_spark as cps

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("scale-smoke")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ok = True

    # --- resample_eav: direct vs sweep at n obs ------------------------
    df = synth_eav(spark, n).localCheckpoint(eager=True)
    span = 1_000_000.0
    duration = span * 0.1
    anchors = (df.filter(F.col("attribute") == "attr_3")
               .select("entity", F.col("timestamp").alias("stop"))
               .limit(25_000))
    windows = (anchors.union(anchors.select("entity", (F.col("stop") - 0.5 * duration).alias("stop")))
               .select("entity", (F.col("stop") - duration).alias("start"), "stop")
               .localCheckpoint(eager=True))
    agg = {"attr_1": ["sum", "max"], "attr_2": "min",
           "attr_3": ["r-1", "t-1"], "attr_47": "size", "attr_48": "median"}
    kw = dict(entity_col="entity", time_col="timestamp",
              attribute_col="attribute", value_col="value",
              window_start_col="start", window_stop_col="stop",
              include_start=False, include_stop=False, regular=False)
    t0 = time.perf_counter()
    out_direct = cps.resample_eav(df, windows, agg, join_strategy="direct", **kw)
    out_direct = out_direct.localCheckpoint(eager=True)
    t_direct = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_sweep = cps.resample_eav(df, windows, agg, join_strategy="sweep", **kw)
    out_sweep = out_sweep.localCheckpoint(eager=True)
    t_sweep = time.perf_counter() - t0
    print(f"resample_eav {n:,} obs: direct={t_direct:.1f}s sweep={t_sweep:.1f}s")
    ok &= compare("resample_eav direct==sweep", out_direct, out_sweep,
                  ["entity", "start", "stop"])

    # --- resample_interval: direct vs sweep at n/2 intervals -----------
    m = n // 2
    iv = (synth_eav(spark, m, n_attrs=9)
          .select("entity", F.col("timestamp").alias("start"),
                  (F.col("timestamp") + 500.0).alias("stop"),
                  "attribute", "value")
          .localCheckpoint(eager=True))
    wins = windows.limit(20_000).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    ri_direct = cps.resample_interval(
        iv, wins, attributes=[f"attr_{i}" for i in range(1, 10)],
        entity_col="entity", start_col="start", stop_col="stop",
        attribute_col="attribute", value_col="value",
        window_start_col="start", window_stop_col="stop",
        join_strategy="direct").localCheckpoint(eager=True)
    t_direct = time.perf_counter() - t0
    t0 = time.perf_counter()
    ri_sweep = cps.resample_interval(
        iv, wins, attributes=[f"attr_{i}" for i in range(1, 10)],
        entity_col="entity", start_col="start", stop_col="stop",
        attribute_col="attribute", value_col="value",
        window_start_col="start", window_stop_col="stop",
        join_strategy="sweep").localCheckpoint(eager=True)
    t_sweep = time.perf_counter() - t0
    print(f"resample_interval {m:,} ivs: direct={t_direct:.1f}s sweep={t_sweep:.1f}s")
    ok &= compare("resample_interval direct==sweep", ri_direct, ri_sweep,
                  ["entity", "start", "stop"])

    # --- keyless group_intervals: chunked merge vs single-task ---------
    gi = (synth_eav(spark, m, n_attrs=1)
          .select(F.col("timestamp").alias("start"),
                  (F.col("timestamp") + 3.0).alias("stop"))
          .localCheckpoint(eager=True))
    t0 = time.perf_counter()
    chunked = cps.group_intervals(gi, start_col="start", stop_col="stop",
                                  distance=1.0).localCheckpoint(eager=True)
    t_chunked = time.perf_counter() - t0
    t0 = time.perf_counter()
    single = (cps.group_intervals(gi.withColumn("g", F.lit(0)), group_by="g",
                                  start_col="start", stop_col="stop",
                                  distance=1.0)
              .drop("g").localCheckpoint(eager=True))
    t_single = time.perf_counter() - t0
    print(f"group_intervals keyless {m:,} ivs: chunked={t_chunked:.1f}s "
          f"single-task={t_single:.1f}s")
    ok &= compare("group_intervals chunked==single", chunked, single,
                  ["start", "stop"])

    # --- ANN kernels at n/10 vectors -----------------------------------
    # Cross-implementation consistency: (a) the broadcast-probe LSH (numpy
    # scoring, single corpus scan) against the shuffled bucket-equi-join
    # LSH (JVM expression scoring) — same candidate definition, so outputs
    # must be identical; (b) IVF probing EVERY cell degenerates to
    # exhaustive search and must equal brute-force cosine_topk exactly.
    from catabra_pandas_spark.pipeline.similarity import (
        cosine_topk, ivf_cosine_topk, lsh_cosine_topk)

    nv, dim = max(n // 10, 100_000), 32
    emb = spark.range(nv, numPartitions=64).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2001))
                   .cast("double") / 1000.0 - 1.0) for d in range(dim)]
                ).alias("embedding")).localCheckpoint(eager=True)
    qv = emb.filter(F.col("vec_id") < 64)
    t0 = time.perf_counter()
    brute = cosine_topk(qv, emb, k=10, dim=dim).localCheckpoint(eager=True)
    t_brute = time.perf_counter() - t0
    # blocked grid (broadcast_queries=False): corpus is replicated
    # n_query_blocks times, so size nq_b to the real query volume — 2
    # here exercises the full cogroup grid while keeping the smoke honest
    t0 = time.perf_counter()
    blocked = cosine_topk(qv, emb, k=10, dim=dim, broadcast_queries=False,
                          n_query_blocks=2, n_corpus_blocks=8
                          ).localCheckpoint(eager=True)
    t_blocked = time.perf_counter() - t0
    t0 = time.perf_counter()
    lsh_b = lsh_cosine_topk(qv, emb, k=10, dim=dim,
                            broadcast_queries=True).localCheckpoint(eager=True)
    t_lb = time.perf_counter() - t0
    t0 = time.perf_counter()
    lsh_s = lsh_cosine_topk(qv, emb, k=10, dim=dim,
                            broadcast_queries=False).localCheckpoint(eager=True)
    t_ls = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivf_all = ivf_cosine_topk(qv, emb, k=10, dim=dim, n_centroids=32,
                              n_probe=32).localCheckpoint(eager=True)
    t_ivf = time.perf_counter() - t0
    # trained codebook: 2 Lloyd iterations over the full corpus, then
    # probing EVERY trained cell must also degenerate to exhaustive search
    from catabra_pandas_spark.pipeline.similarity import kmeans_codebook
    t0 = time.perf_counter()
    book = kmeans_codebook(emb, n_centroids=32, n_iter=2, dim=dim,
                           normalize=False, round_decimals=6)
    ivf_km = ivf_cosine_topk(qv, emb, k=10, dim=dim, n_probe=32,
                             centroids=book).localCheckpoint(eager=True)
    t_km = time.perf_counter() - t0
    print(f"ann {nv:,} vecs x {dim}d: brute={t_brute:.1f}s "
          f"blocked={t_blocked:.1f}s ({t_blocked / t_brute:.1f}x) "
          f"lsh_bcast={t_lb:.1f}s lsh_shuffle={t_ls:.1f}s ivf_all={t_ivf:.1f}s")
    ok &= compare("blocked grid == broadcast brute", blocked, brute,
                  ["query_id", "rank"])
    if t_blocked > 3.5 * t_brute:
        print(f"WEAK: blocked exact path {t_blocked / t_brute:.1f}x broadcast")
        ok = False
    ok &= compare("lsh broadcast-probe == bucket-join", lsh_b, lsh_s,
                  ["query_id", "rank"])
    ok &= compare("ivf(all cells) == brute force", ivf_all, brute,
                  ["query_id", "rank"])
    print(f"kmeans codebook train+search {nv:,} vecs: {t_km:.1f}s")
    ok &= compare("ivf(kmeans book, all cells) == brute force", ivf_km,
                  brute, ["query_id", "rank"])

    # --- text tier at n/10 documents -----------------------------------
    # 1M synthetic docs (10-50 words from a 5k-word vocabulary, hash-
    # derived executor-side).  The bigram space (~25M types) makes the
    # LM's 200k cap BINDING, so retraining must reproduce the model
    # EXACTLY — the deterministic (count desc, token asc) cap ordering
    # under distributed execution is what this checks; a nondeterministic
    # LIMIT would silently change scores between runs.
    from catabra_pandas_spark.pipeline import (bpe_tokenize, ngram_perplexity,
                                               train_bpe, train_ngram_lm)

    nd = max(n // 10, 100_000)
    words = F.transform(
        F.sequence(F.lit(1), F.pmod(F.xxhash64("id"), F.lit(40)) + 10),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i),
                                              F.lit(5000))))
    docs = spark.range(nd, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text")).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    lm = train_ngram_lm(docs)
    t_lm = time.perf_counter() - t0
    capped = len(lm["bigrams"]) == 200_000
    lm2 = train_ngram_lm(docs)
    same = (lm["unigrams"] == lm2["unigrams"]
            and lm["bigrams"] == lm2["bigrams"] and lm["v"] == lm2["v"])
    t0 = time.perf_counter()
    nrow = ngram_perplexity(docs, lm).count()
    t_ppl = time.perf_counter() - t0
    t0 = time.perf_counter()
    merges = train_bpe(docs, n_merges=500, max_words=50_000)
    tok_rows = bpe_tokenize(docs, merges).count()
    t_bpe = time.perf_counter() - t0
    print(f"text {nd:,} docs: lm_train={t_lm:.1f}s (cap binding={capped}, "
          f"retrain identical={same}) ppl_scan={t_ppl:.1f}s "
          f"bpe_train+tokenize={t_bpe:.1f}s merges={len(merges)}")
    ok &= same and capped and nrow == nd and tok_rows == nd
    if not (same and capped and nrow == nd and tok_rows == nd):
        print(f"FAIL text tier: same={same} capped={capped} "
              f"ppl_rows={nrow} tok_rows={tok_rows} expected={nd}")

    print("SCALE_SMOKE", "PASS" if ok else "FAIL")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
