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

r8 adds three opt-in tiers (heavier; named explicitly to run):

* ``exactsubstr`` — ExactSubstr stats+removal at n documents with a SKEW
  case: one 8-token boilerplate span in ~50% of documents, so a single
  window hash carries ~n/2 occurrences.  Proves the count shuffle's
  map-side partial aggregation absorbs the hot hash (max task duration
  and shuffle volume recorded from the event log) and the per-doc
  ``collect_list`` of duplicated starts stays bounded by doc length.
* ``bpe16k`` — BPE training at a REALISTIC 16k-merge vocabulary over
  n/50 documents: times the incremental merge loop and, for comparison,
  the straight-from-the-paper rescan loop over the first 250 merges
  (extrapolated), recording the measured advantage.
* ``cosinebig`` — the block-grid exact cosine path with a query set too
  large to broadcast (n/50 queries x 32d vs n/10 corpus): records wall
  time, max task duration and total shuffle volume vs the |Q|·|C|
  pair-row bytes a naive crossJoin would shuffle.

Data is synthesized EXECUTOR-SIDE from ``spark.range`` + hash arithmetic
(deterministic, no driver materialization, no testdata dependency), so
the script also demonstrates the generation pattern for arbitrary-SF
stress runs.  Exit code 0 iff every comparison matches.

Usage: python scripts/scale_smoke.py [n_obs] [tiers]
  n_obs  default 10_000_000
  tiers  comma list of {eav,interval,group,ann,text,exactsubstr,bpe16k,
         cosinebig,skew,streamstate,bucketdt,autostrat,resampauto,
         semdedup,semdecon,semhot,semhot3,wsample,qualclf,qbuckets,
         retrieval};
         default = the five original tiers
"""

from __future__ import annotations

import os

# one BLAS thread per Python worker: every core already runs a worker, so
# per-call BLAS fan-out only adds contention (set BEFORE the JVM spawns —
# local-mode workers inherit this process's environment)
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

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


def job_group_metrics(spark, group, with_input=False):
    """(max_task_ms, shuffle_write_bytes, shuffle_read_bytes[,
    input_bytes_read]) for every stage of the jobs run under ``group``,
    parsed from the session's event log — the hard evidence for 'the
    combiner absorbed the hot key' / 'the q8 scan reads a quarter of the
    bytes' claims.  Returns Nones if the log is unavailable."""
    import glob
    import json as _json

    # the listener bus is async and the log writer only flushes on
    # job-end events — drain it or a parse right after an action reads
    # a truncated log (measured: a 12 MB parquet scan showed 0 bytes)
    try:
        bus = spark.sparkContext._jsc.sc().listenerBus()
        try:
            bus.waitUntilEmpty()
        except Exception:
            bus.waitUntilEmpty(10_000)
    except Exception:
        pass
    app = spark.sparkContext.applicationId
    paths = glob.glob(f"/tmp/spark-events/{app}*")
    if not paths:
        return (None,) * (4 if with_input else 3)
    stages, max_ms, sw, sr, inb = set(), 0, 0, 0, 0
    for line in open(paths[0]):
        try:
            ev = _json.loads(line)
        except ValueError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart" and \
                (ev.get("Properties") or {}).get("spark.jobGroup.id") == group:
            stages.update(s["Stage ID"] for s in ev.get("Stage Infos", []))
        elif kind == "SparkListenerTaskEnd" and ev.get("Stage ID") in stages:
            tm = ev.get("Task Metrics") or {}
            max_ms = max(max_ms, tm.get("Executor Run Time", 0))
            sw += (tm.get("Shuffle Write Metrics") or {}
                   ).get("Shuffle Bytes Written", 0)
            rd = tm.get("Shuffle Read Metrics") or {}
            sr += rd.get("Local Bytes Read", 0) + rd.get("Remote Bytes Read", 0)
            inb += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
    return (max_ms, sw, sr, inb) if with_input else (max_ms, sw, sr)


def tasks_between(spark, ms0, ms1):
    """(n_tasks, max_run_ms, median_run_ms) of every task that launched
    and finished inside [ms0, ms1] wall-clock — time-window attribution,
    because AQE materializes query stages on its own thread pool and
    their jobs never inherit a job group (measured).  The caller must
    keep the window exclusive to the leg being measured."""
    import glob
    import json as _json
    import statistics

    try:
        bus = spark.sparkContext._jsc.sc().listenerBus()
        try:
            bus.waitUntilEmpty()
        except Exception:
            bus.waitUntilEmpty(10_000)
    except Exception:
        pass
    app = spark.sparkContext.applicationId
    paths = glob.glob(f"/tmp/spark-events/{app}*")
    if not paths:
        return None, None, None
    runs = []
    for line in open(paths[0]):
        try:
            ev = _json.loads(line)
        except ValueError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        ti = ev.get("Task Info") or {}
        if ti.get("Launch Time", 0) >= ms0 and ti.get("Finish Time", 0) <= ms1:
            runs.append((ev.get("Task Metrics") or {})
                        .get("Executor Run Time", 0))
    if not runs:
        return 0, None, None
    return len(runs), max(runs), statistics.median(runs)


def compare(name, a, b, keys):
    """Cell-exact comparison via two anti-joins on rounded frames (no
    driver-side collect of the bulk data)."""
    from pyspark.sql import functions as F
    ra = a.select([F.round(c[0], 6).alias(c[0]) if c[1] == "double" else F.col(c[0])
                   for c in a.dtypes])
    rb = b.select([F.round(c[0], 6).alias(c[0]) if c[1] == "double" else F.col(c[0])
                   for c in b.dtypes])
    rb = rb.select(ra.columns)  # exceptAll aligns by POSITION, not name
    d1 = ra.exceptAll(rb).count()
    d2 = rb.exceptAll(ra).count()
    n = a.count()
    ok = d1 == 0 and d2 == 0 and n > 0
    print(f"[{'ok' if ok else 'FAIL'}] {name}: rows={n} onlyA={d1} onlyB={d2}")
    return ok


def compare_tol(name, a, b, keys, atol=1e-6):
    """Key-joined comparison with an absolute tolerance on doubles, for
    legs whose aggregates legitimately differ in the last ulp between
    execution strategies (a mean of two 6-decimal values lands EXACTLY
    on the x.xxxxxx5 round boundary, so round-to-6 + exceptAll flags
    rows whose values agree to 1e-10 — measured 541/40002 at n=10M).
    ``keys`` must be unique per side; the full join must align 1:1."""
    import functools
    import operator

    from pyspark.sql import functions as F
    na, nb = a.count(), b.count()
    j = a.alias("A").join(b.alias("B"), on=keys, how="full")
    conds = []
    for c, t in a.dtypes:
        if c in keys:
            continue
        ca, cb = F.col(f"A.{c}"), F.col(f"B.{c}")
        both_null = ca.isNull() & cb.isNull()
        if t == "double":
            conds.append(~both_null &
                         (ca.isNull() | cb.isNull() | (F.abs(ca - cb) > atol)))
        else:
            # null-safe: plain == yields SQL NULL when exactly one side is
            # NULL, and the filter silently drops the row — a genuine
            # null-vs-value divergence would read as "ok"
            conds.append(~ca.eqNullSafe(cb))
    bad = j.filter(functools.reduce(operator.or_, conds)).count()
    nj = j.count()
    ok = bad == 0 and na == nb == nj and na > 0
    print(f"[{'ok' if ok else 'FAIL'}] {name}: rows={na}/{nb} joined={nj} "
          f"bad={bad} (atol={atol})")
    return ok


DEFAULT_TIERS = ("eav", "interval", "group", "ann", "text")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    tiers = set(sys.argv[2].split(",")) if len(sys.argv) > 2 \
        else set(DEFAULT_TIERS)
    from pyspark.sql import SparkSession, functions as F
    import catabra_pandas_spark as cps

    os.makedirs("/tmp/spark-events", exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("scale-smoke")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             # task-level evidence (max task ms, shuffle bytes) for the
             # skew tiers comes from the event log
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", "file:/tmp/spark-events")
             # plain single-file JSON (Spark 4 defaults to rolling zstd,
             # which the in-session parser can't read)
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.compress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python workers once (each worker's first Arrow task pays
    # ~5 CPU-s of pandas/numpy imports; 32 cold workers read as ~450
    # CPU-s of phantom skew in the first Python stage measured) — the
    # same steady-state protocol as bench.py
    spark.range(int(cpus) * 8, numPartitions=int(cpus) * 2) \
        .mapInPandas(lambda it: it, schema="id long").count()

    ok = True
    span = 1_000_000.0
    duration = span * 0.1

    def build_windows():
        df_ = synth_eav(spark, n)
        anchors = (df_.filter(F.col("attribute") == "attr_3")
                   .select("entity", F.col("timestamp").alias("stop"))
                   .limit(25_000))
        return (anchors.union(anchors.select(
                    "entity", (F.col("stop") - 0.5 * duration).alias("stop")))
                .select("entity", (F.col("stop") - duration).alias("start"),
                        "stop")
                .localCheckpoint(eager=True))

    windows = None
    if "eav" in tiers or "interval" in tiers:
        windows = build_windows()

    # --- resample_eav: direct vs sweep at n obs ------------------------
    if "eav" in tiers:
        df = synth_eav(spark, n).localCheckpoint(eager=True)
        agg = {"attr_1": ["sum", "max"], "attr_2": "min",
               "attr_3": ["r-1", "t-1"], "attr_47": "size",
               "attr_48": "median"}
        kw = dict(entity_col="entity", time_col="timestamp",
                  attribute_col="attribute", value_col="value",
                  window_start_col="start", window_stop_col="stop",
                  include_start=False, include_stop=False, regular=False)
        t0 = time.perf_counter()
        out_direct = cps.resample_eav(df, windows, agg,
                                      join_strategy="direct", **kw)
        out_direct = out_direct.localCheckpoint(eager=True)
        t_direct = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_sweep = cps.resample_eav(df, windows, agg,
                                     join_strategy="sweep", **kw)
        out_sweep = out_sweep.localCheckpoint(eager=True)
        t_sweep = time.perf_counter() - t0
        print(f"resample_eav {n:,} obs: direct={t_direct:.1f}s "
              f"sweep={t_sweep:.1f}s")
        ok &= compare("resample_eav direct==sweep", out_direct, out_sweep,
                      ["entity", "start", "stop"])

    # --- resample_interval: direct vs sweep at n/2 intervals -----------
    m = n // 2
    if "interval" in tiers:
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
        print(f"resample_interval {m:,} ivs: direct={t_direct:.1f}s "
              f"sweep={t_sweep:.1f}s")
        ok &= compare("resample_interval direct==sweep", ri_direct, ri_sweep,
                      ["entity", "start", "stop"])

    # --- bucket strategy on DATE endpoints at n intervals (opt-in) -----
    if "bucketdt" in tiers:
        # The r10 dtype closure at SCALE: the bucket (large-large)
        # escape on DateType endpoints — epoch-second coercion through
        # the shared numeric_double — against the direct keyed join.
        # Both are exact algorithms, so the match multisets must be
        # identical.  20k entities keep the direct SMJ's per-entity
        # products bounded (~500 x 48) so it stays runnable as the
        # ground truth; at 100 TB without a usable equi-key the direct
        # plan degenerates to BNLJ and bucket is the only survivor.
        base = F.to_date(F.lit("2020-01-01"))
        h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)),  # noqa: E731
                             F.lit(10**9))
        li_dt = (spark.range(n, numPartitions=64)
                 .select(F.pmod(h(0), F.lit(20_000)).alias("entity"),
                         F.date_add(base, F.pmod(h(1), F.lit(1460))
                                    .cast("int")).alias("d_start"),
                         F.pmod(h(2), F.lit(11)).cast("int").alias("__sp__"))
                 .select("entity", "d_start",
                         F.date_add(F.col("d_start"),
                                    F.col("__sp__")).alias("d_stop"))
                 .localCheckpoint(eager=True))
        months = spark.range(48).select(
            F.add_months(base, F.col("id").cast("int")).alias("m_start"))
        # synthetic window generator only: 48 calendar months per entity
        # (a 48-row broadcast cross product, not a data-path cross join)
        wins_dt = (li_dt.select("entity").distinct().crossJoin(months)
                   .withColumn("m_stop",
                               F.date_add(F.add_months("m_start", 1), -1))
                   .localCheckpoint(eager=True))
        kwd = dict(on="entity", how="inner",
                   left_start="d_start", left_stop="d_stop",
                   right_start="m_start", right_stop="m_stop")
        t0 = time.perf_counter()
        dt_direct = cps.merge_intervals(li_dt, wins_dt, strategy="direct",
                                        **kwd).localCheckpoint(eager=True)
        t_direct = time.perf_counter() - t0
        t0 = time.perf_counter()
        dt_bucket = cps.merge_intervals(li_dt, wins_dt, strategy="bucket",
                                        bucket_width=10 * 86400.0,
                                        **kwd).localCheckpoint(eager=True)
        t_bucket = time.perf_counter() - t0
        print(f"date-bucket {n:,} ivs x {wins_dt.count():,} windows: "
              f"direct={t_direct:.1f}s bucket={t_bucket:.1f}s")
        # expectation note: with an equi-key and ~48 windows/entity the
        # direct SMJ WINS on wall clock (measured 2.6-2.7 s vs
        # 8.3-11.1 s at 10M) — the explode tax only pays off in the keyless/BNLJ
        # regime (bucket_range_join / BASELINE T3).  This tier is the
        # DATE-dtype CORRECTNESS certificate for the escape hatch, not a
        # speed claim.
        ok &= compare("merge_intervals date direct==bucket", dt_direct,
                      dt_bucket, ["entity"])

    # --- strategy="auto" few-large-groups certificate (opt-in) ---------
    if "autostrat" in tiers:
        # The t4 crossover workload (scripts/bench_baseline.py:162-183:
        # n/5 x n/50 rows in 10 groups, narrow intervals) where the
        # direct SMJ's per-group n*m residual is a measured 15x slower
        # than the sweep (100.3 s vs 6.61 s at 10M).  Certifies that
        # (a) strategy="auto" detects the regime and compiles to the
        # sweep plan (sameSemantics), and (b) the auto pick returns the
        # direct join's exact match multiset (per-group count + content-
        # hash-sum fingerprint; sum of 64-bit hashes over a decimal
        # accumulator is an order-free multiset digest).
        nl4, nr4, g4 = n // 5, n // 50, 10
        h4 = lambda k: F.xxhash64(F.col("id"), F.lit(k))  # noqa: E731
        l4 = (spark.range(nl4, numPartitions=64)
              .select(F.pmod(h4(0), F.lit(g4)).alias("group"),
                      (F.pmod(h4(1), F.lit(2_000_000)) / 100_000.0 - 10.0
                       ).alias("start"),
                      (F.pmod(h4(2), F.lit(1000)) / 100_000.0).alias("__w__"))
              .select("group", "start",
                      (F.col("start") + F.col("__w__")).alias("stop"))
              .localCheckpoint(eager=True))
        r4 = (spark.range(nr4, numPartitions=64)
              .select(F.pmod(h4(0), F.lit(g4)).alias("group"),
                      (F.pmod(h4(3), F.lit(2_000_000)) / 100_000.0 - 10.0
                       ).alias("p"))
              .localCheckpoint(eager=True))
        kw4 = dict(on="group", how="inner",
                   left_start="start", left_stop="stop",
                   right_start="p", right_stop="p")
        auto4 = cps.merge_intervals(l4, r4, **kw4)
        sweep_plan = auto4.sameSemantics(
            cps.merge_intervals(l4, r4, strategy="sweep", **kw4))
        print(f"autostrat: auto compiled to sweep plan: {sweep_plan}")

        def fp4(df):
            # hash columns in sorted-name order: the sweep and direct
            # plans emit the same columns in different positions
            cols = [F.col(c) for c in sorted(df.columns)]
            return (df.groupBy("group")
                    .agg(F.count(F.lit(1)).alias("n_rows"),
                         F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
                         .alias("content_sum"))
                    .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        fp_auto = fp4(auto4)
        t_auto = time.perf_counter() - t0
        t0 = time.perf_counter()
        fp_direct = fp4(cps.merge_intervals(l4, r4, strategy="direct", **kw4))
        t_direct = time.perf_counter() - t0
        print(f"autostrat {nl4:,} x {nr4:,} in {g4} groups: "
              f"auto(sweep)={t_auto:.1f}s direct={t_direct:.1f}s")
        ok &= sweep_plan
        ok &= compare("merge auto(sweep)==direct fingerprints",
                      fp_auto, fp_direct, ["group"])

        # keyless leg (r11): the same shape WITHOUT the equi-key is the
        # broadcast-nested-loop hazard; auto must rescue it through the
        # keyless bound (n*m > 16384*(n+m)) — at n/10 x n/100 the BNLJ
        # is minutes, so the ground truth here is the explicitly pinned
        # sweep (itself certified against direct at smaller scale in
        # tests/test_merge_intervals.py::test_auto_strategy_keyless_rescue)
        # plus a direct leg at n/50 x n/500 where both run comfortably.
        lk = l4.drop("group")
        rk = r4.drop("group")
        kwk = dict(how="inner", left_start="start", left_stop="stop",
                   right_start="p", right_stop="p")
        auto_k = cps.merge_intervals(lk, rk, **kwk)
        k_plan = auto_k.sameSemantics(
            cps.merge_intervals(lk, rk, strategy="sweep", **kwk))
        print(f"autostrat keyless {nl4:,} x {nr4:,}: "
              f"auto compiled to sweep plan: {k_plan}")
        lk2 = lk.limit(nl4 // 10).localCheckpoint(eager=True)
        rk2 = rk.limit(nr4 // 10).localCheckpoint(eager=True)

        def fpk(df):
            cols = [F.col(c) for c in sorted(df.columns)]
            return (df.agg(F.count(F.lit(1)).alias("n_rows"),
                           F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
                           .alias("content_sum"))
                    .withColumn("k", F.lit(1)).localCheckpoint(eager=True))
        t0 = time.perf_counter()
        fp_ka = fpk(cps.merge_intervals(lk2, rk2, **kwk))
        t_ka = time.perf_counter() - t0
        t0 = time.perf_counter()
        fp_kd = fpk(cps.merge_intervals(lk2, rk2, strategy="direct", **kwk))
        t_kd = time.perf_counter() - t0
        print(f"autostrat keyless value-leg {nl4 // 10:,} x {nr4 // 10:,}: "
              f"auto={t_ka:.1f}s direct(BNLJ)={t_kd:.1f}s")
        ok &= k_plan
        ok &= compare("keyless auto==direct fingerprints", fp_ka, fp_kd,
                      ["k"])

    # --- resample_eav join_strategy="auto" certificate (opt-in, r11) ---
    if "resampauto" in tiers:
        # The reference's per-entity selector regime transplanted to its
        # home operator: few entities (10) own both many observations
        # (n/5) and many irregular windows (n/50), so the direct entity
        # equi-join's per-entity obs x window residual goes quadratic.
        # Certifies (a) auto compiles to the sweep plan (sameSemantics)
        # and (b) auto's per-entity aggregate table equals direct's
        # cell-for-cell (the aggregates ARE the output — no fingerprint
        # needed), plus wall-clock evidence of the gap.
        n5, m5, g5 = n // 5, n // 50, 10
        obs5 = synth_eav(spark, n5, n_entities=g5, n_attrs=2,
                         span=1_000_000.0).localCheckpoint(eager=True)
        h5 = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)),  # noqa: E731
                              F.lit(10**9))
        win5 = (spark.range(m5, numPartitions=64)
                .select(F.pmod(h5(1), F.lit(g5)).alias("entity"),
                        (h5(2).cast("double") / 1e9 * 1_000_000.0
                         ).alias("timestamp_start"),
                        (h5(3).cast("double") / 1e9 * 10.0).alias("__w__"))
                .select("entity", "timestamp_start",
                        (F.col("timestamp_start") + F.col("__w__")
                         ).alias("timestamp_stop"))
                .localCheckpoint(eager=True))
        spec5 = {"attr_1": ["count", "sum"], "attr_2": ["count"]}
        kw5 = dict(assume_unique_windows=True)  # float axis: no grid probe
        auto5 = cps.resample_eav(obs5, win5, spec5, **kw5)
        plan5 = auto5.sameSemantics(
            cps.resample_eav(obs5, win5, spec5, join_strategy="sweep", **kw5))
        print(f"resampauto: auto compiled to sweep plan: {plan5}")
        t0 = time.perf_counter()
        ra = auto5.localCheckpoint(eager=True)
        t_a5 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rd = cps.resample_eav(obs5, win5, spec5, join_strategy="direct",
                              **kw5).localCheckpoint(eager=True)
        t_d5 = time.perf_counter() - t0
        print(f"resampauto {n5:,} obs x {m5:,} windows in {g5} entities: "
              f"auto(sweep)={t_a5:.1f}s direct={t_d5:.1f}s")
        ok &= plan5
        ok &= compare_tol("resample_eav auto(sweep)==direct", ra, rd,
                          ["entity", "timestamp_start", "timestamp_stop"])

    # --- semantic_dedup scale certificate (opt-in, r11) ----------------
    if "semdedup" in tiers:
        # n/10 synthetic 32-dim vectors with n/200 PLANTED exact duplicate
        # pairs (vector j and j + n/20 share bits) — ground truth the
        # pipeline must find: an exact duplicate is cosine 1 > any
        # threshold, lands in the same k-means cell by identical argmax,
        # and must collapse to one keeper.  k = 256 bounds each cell to
        # ~n/2560 vectors so the per-cell pairwise matrix stays tens of MB
        # (the SemDeDup paper's own k-vs-cell-size trade).
        from catabra_pandas_spark.pipeline import semantic_dedup
        n6 = n // 10
        half = n6 // 2
        dim6 = 32
        # duplicate plant: ids in [half, half + n/200) reuse the vector of
        # (id - half); everything else is hash-unique
        src = F.when(
            (F.col("id") >= half) & (F.col("id") < half + n // 200),
            F.col("id") - half).otherwise(F.col("id"))
        emb6 = (spark.range(n6, numPartitions=64)
                .select(F.col("id").alias("vec_id"),
                        F.array(*[
                            ((F.pmod(F.xxhash64(src, F.lit(d)), F.lit(2001))
                              - 1000) / 1000.0).alias(f"e{d}")
                            for d in range(dim6)]).alias("embedding"))
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        sd = semantic_dedup(emb6, threshold=0.99, n_centroids=256,
                            n_iter=2, dim=dim6).localCheckpoint(eager=True)
        t_sd = time.perf_counter() - t0
        n_all = sd.count()
        n_kept = sd.filter("keep").count()
        planted = n // 200
        print(f"semdedup {n6:,} x {dim6}d, k=256: {t_sd:.1f}s, "
              f"kept {n_kept:,}/{n_all:,} (planted dups {planted:,})")
        ok &= n_all == n6
        # every planted pair must collapse: the duplicate id's group_rep
        # equals its source's group_rep, and only one of the two is kept
        pairs = (sd.filter((F.col("vec_id") >= half)
                           & (F.col("vec_id") < half + planted))
                 .select(F.col("vec_id").alias("dup_id"),
                         F.col("group_rep").alias("dup_rep"))
                 .join(sd.select(F.col("vec_id").alias("src_id"),
                                 F.col("group_rep").alias("src_rep")),
                       on=F.col("dup_id") - half == F.col("src_id")))
        miss = pairs.filter(~F.col("dup_rep").eqNullSafe(F.col("src_rep"))).count()
        print(f"[{'ok' if miss == 0 else 'FAIL'}] semdedup planted pairs "
              f"collapsed: {planted - miss}/{planted}")
        ok &= miss == 0
        one = (sd.groupBy("group_rep")
               .agg(F.sum(F.col("keep").cast("int")).alias("k"))
               .filter("k != 1").count())
        print(f"[{'ok' if one == 0 else 'FAIL'}] semdedup one keeper per "
              f"group: violations={one}")
        ok &= one == 0
        ok &= n_kept <= n6 - planted  # at least every planted dup dropped

    # --- semantic_decontaminate scale certificate (opt-in, r11) --------
    if "semdecon" in tiers:
        # n/10 corpus vectors vs a 10k-vector benchmark with n/500
        # planted leaks (corpus id j < n/500 reuses benchmark vector
        # j % 10k) — every leak is cosine 1 and must be marked; random
        # vectors never reach the threshold, so marked == planted
        # exactly.  The plan is ONE map-only corpus scan (broadcast
        # benchmark matrix inside the Arrow batcher) — certified by
        # asserting zero exchanges in the physical plan.
        from catabra_pandas_spark.pipeline import semantic_decontaminate
        n7 = n // 10
        nb7 = 10_000
        dim7 = 32
        mkvec = lambda src: F.array(*[  # noqa: E731
            ((F.pmod(F.xxhash64(src, F.lit(d)), F.lit(2001)) - 1000)
             / 1000.0).alias(f"e{d}") for d in range(dim7)])
        bench7 = (spark.range(nb7, numPartitions=8)
                  .select(F.col("id").alias("vec_id"),
                          mkvec(F.col("id")).alias("embedding"))
                  .localCheckpoint(eager=True))
        planted7 = n // 500
        src7 = F.when(F.col("id") < planted7, F.pmod(F.col("id"), F.lit(nb7))) \
            .otherwise(F.col("id") + 1_000_000_000)
        corp7 = (spark.range(n7, numPartitions=64)
                 .select(F.col("id").alias("vec_id"),
                         mkvec(src7).alias("embedding"))
                 .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        marked = semantic_decontaminate(corp7, bench7, threshold=0.999999) \
            .localCheckpoint(eager=True)
        t_sd7 = time.perf_counter() - t0
        hits = marked.filter("contaminated")
        n_hits = hits.count()
        right = hits.filter(
            F.col("nearest_bench_id") == F.pmod(F.col("vec_id"), F.lit(nb7))
        ).count()
        print(f"semdecon {n7:,} x 32d vs {nb7:,} bench: {t_sd7:.1f}s, "
              f"marked {n_hits:,} (planted {planted7:,}, argmax-right {right:,})")
        ok &= n_hits == planted7 == right
        expl = semantic_decontaminate(corp7, bench7, threshold=0.999999) \
            ._jdf.queryExecution().executedPlan().toString()
        n_exch = expl.count("Exchange")
        print(f"[{'ok' if n_exch == 0 else 'FAIL'}] semdecon zero-shuffle "
              f"plan: exchanges={n_exch}")
        ok &= n_exch == 0

    # --- semantic_dedup hot-cell recovery certificate (opt-in, r12) ----
    if "semhot" in tiers:
        # one PLANTED hot semantic cell: half the corpus is a tight blob
        # around a single direction (noise ~0.1 of the base norm), so the
        # coarse k=16 codebook dumps ~n/80 vectors into one cell — far
        # over max_cell_size.  on_hot_cell="subcluster" must recover
        # WITHOUT manual intervention: recursive per-cell k-means splits
        # until every cell fits, planted exact-duplicate pairs (cosine 1,
        # never separable by an argmax split) still collapse, and the
        # final cells all respect the cap.  threshold=0.999999 keeps
        # merely-similar blob members apart (their pairwise cosine is
        # ~0.99 at this noise scale).
        from catabra_pandas_spark.pipeline import semantic_dedup
        n8 = n // 40
        half8 = n8 // 2
        dim8 = 32
        planted8 = n // 1000
        # cap below the blob size at ANY n (blob = n8/2), bounded above
        # so a near-cap subcell's O(cap^2) matrix stays executor-sized
        cap8 = min(20_000, max(1_000, n8 // 8))
        # duplicate plant: ids in [half8, half8 + planted8) reuse the
        # (hot) vector of (id - half8); hot ids < half8 share one base
        # direction plus small per-id noise, cold ids are hash-unique
        src8 = F.when(
            (F.col("id") >= half8) & (F.col("id") < half8 + planted8),
            F.col("id") - half8).otherwise(F.col("id"))
        is_hot8 = src8 < half8
        noise = [((F.pmod(F.xxhash64(src8, F.lit(d)), F.lit(2001))
                   - 1000) / 1000.0) for d in range(dim8)]
        base8 = [F.lit(1.0 if d % 2 == 0 else -1.0) for d in range(dim8)]
        emb8 = (spark.range(n8, numPartitions=64)
                .select(F.col("id").alias("vec_id"),
                        F.array(*[
                            F.when(is_hot8, base8[d] + 0.1 * noise[d])
                            .otherwise(noise[d]).alias(f"e{d}")
                            for d in range(dim8)]).alias("embedding"))
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        sd8 = semantic_dedup(emb8, threshold=0.999999, n_centroids=16,
                             n_iter=1, dim=dim8, max_cell_size=cap8,
                             on_hot_cell="subcluster",
                             subcluster_centroids=16) \
            .localCheckpoint(eager=True)
        t_sd8 = time.perf_counter() - t0
        n_cells8 = sd8.select("cell").distinct().count()
        max_cell8 = (sd8.groupBy("cell").count()
                     .agg(F.max("count")).collect()[0][0])
        print(f"semhot {n8:,} x {dim8}d, hot blob {half8:,} > cap {cap8:,}: "
              f"{t_sd8:.1f}s, {n_cells8} final cells, largest {max_cell8:,}")
        ok &= sd8.count() == n8
        split_ok = n_cells8 > 16 and max_cell8 <= cap8
        print(f"[{'ok' if split_ok else 'FAIL'}] semhot hot cell split "
              f"under cap without intervention")
        ok &= split_ok
        pairs8 = (sd8.filter((F.col("vec_id") >= half8)
                             & (F.col("vec_id") < half8 + planted8))
                  .select(F.col("vec_id").alias("dup_id"),
                          F.col("group_rep").alias("dup_rep"),
                          F.col("keep").alias("dup_keep"))
                  .join(sd8.select(F.col("vec_id").alias("src_id"),
                                   F.col("group_rep").alias("src_rep"),
                                   F.col("keep").alias("src_keep")),
                        on=F.col("dup_id") - half8 == F.col("src_id")))
        miss8 = pairs8.filter(
            ~F.col("dup_rep").eqNullSafe(F.col("src_rep"))).count()
        two8 = pairs8.filter(F.col("dup_keep") & F.col("src_keep")).count()
        print(f"[{'ok' if miss8 == 0 and two8 == 0 else 'FAIL'}] semhot "
              f"planted pairs collapsed post-split: "
              f"{planted8 - miss8}/{planted8}, double-keeps {two8}")
        ok &= miss8 == 0 and two8 == 0

    # --- semantic_dedup MULTI hot-cell recovery certificate (r13) ------
    if "semhot3" in tiers:
        # THREE simultaneous hot blobs (VERDICT r12 #7: a 100 TB corpus
        # hits many hot cells at once, the single-blob tier only proved
        # one).  Blob b's direction is Hadamard row b+1 (sign =
        # (-1)^popcount(d & (b+1))) — mutually orthogonal, so blobs land
        # in distinct coarse cells and stay separable.  Each blob is
        # ~n8/5 vectors > cap, so round 1 sees >= 3 hot cells AT ONCE.
        # max_subcluster_rounds=2 is the teeth: the recovery loop
        # subclusters EVERY hot cell per round and reassigns all hot
        # rows in one map-only pass, so 2 rounds suffice however many
        # blobs are hot — a per-cell-sequential implementation would
        # exhaust the budget and raise the loud in-task error.  Each
        # blob also carries planted exact-duplicate pairs that must
        # still collapse to one keeper after the splits.
        from catabra_pandas_spark.pipeline import semantic_dedup
        n8 = n // 40
        blob8 = n8 // 5                      # 3 blobs = 60% of corpus
        planted8 = max(1, n // 2000)         # dup plants per blob
        plant_lo = 3 * blob8                 # plants live in cold id space
        cap8 = min(20_000, max(1_000, n8 // 12))
        dim8 = 32
        p8 = F.col("id") - plant_lo
        in_plant = (F.col("id") >= plant_lo) & \
            (F.col("id") < plant_lo + 3 * planted8)
        # plant p duplicates the (p//3)-th vector of blob p%3
        src8 = F.when(in_plant,
                      F.pmod(p8, F.lit(3)) * blob8 + (p8 / 3).cast("long")
                      ).otherwise(F.col("id"))
        blob_of = (src8 / blob8).cast("long")  # 0,1,2 = blobs; >=3 cold
        is_blob8 = src8 < 3 * blob8
        had = [[1.0 if bin(d & (b + 1)).count("1") % 2 == 0 else -1.0
                for d in range(dim8)] for b in range(3)]
        noise = [((F.pmod(F.xxhash64(src8, F.lit(d)), F.lit(2001))
                   - 1000) / 1000.0) for d in range(dim8)]
        emb8 = (spark.range(n8, numPartitions=64)
                .select(F.col("id").alias("vec_id"),
                        blob_of.alias("blob"),
                        F.array(*[
                            F.when(is_blob8,
                                   F.when(blob_of == 0, F.lit(had[0][d]))
                                   .when(blob_of == 1, F.lit(had[1][d]))
                                   .otherwise(F.lit(had[2][d]))
                                   + 0.1 * noise[d])
                            .otherwise(noise[d]).alias(f"e{d}")
                            for d in range(dim8)]).alias("embedding"))
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        sd8 = (semantic_dedup(
                   emb8.select("vec_id", "embedding"),
                   threshold=0.999999, n_centroids=16, n_iter=1,
                   dim=dim8, max_cell_size=cap8,
                   on_hot_cell="subcluster", subcluster_centroids=16,
                   max_subcluster_rounds=2)
               .localCheckpoint(eager=True))
        t_sd8 = time.perf_counter() - t0
        n_cells8 = sd8.select("cell").distinct().count()
        max_cell8 = (sd8.groupBy("cell").count()
                     .agg(F.max("count")).collect()[0][0])
        print(f"semhot3 {n8:,} x {dim8}d, 3 blobs of {blob8:,} > cap "
              f"{cap8:,}: {t_sd8:.1f}s, {n_cells8} final cells, "
              f"largest {max_cell8:,}")
        ok &= sd8.count() == n8
        split_ok = n_cells8 > 16 and max_cell8 <= cap8
        print(f"[{'ok' if split_ok else 'FAIL'}] semhot3 ALL hot cells "
              f"split under cap within 2 simultaneous rounds")
        ok &= split_ok
        # orthogonal blobs never share a final cell
        mixed8 = (sd8.join(emb8.select("vec_id", "blob"), "vec_id")
                  .filter(F.col("blob") < 3)
                  .groupBy("cell")
                  .agg(F.count_distinct("blob").alias("nb"))
                  .filter(F.col("nb") > 1).count())
        print(f"[{'ok' if mixed8 == 0 else 'FAIL'}] semhot3 no final "
              f"cell mixes two blobs: mixed={mixed8}")
        ok &= mixed8 == 0
        pairs8 = (sd8.filter((F.col("vec_id") >= plant_lo)
                             & (F.col("vec_id") < plant_lo + 3 * planted8))
                  .select(F.col("vec_id").alias("dup_id"),
                          F.col("group_rep").alias("dup_rep"),
                          F.col("keep").alias("dup_keep"))
                  .join(sd8.select(F.col("vec_id").alias("src_id"),
                                   F.col("group_rep").alias("src_rep"),
                                   F.col("keep").alias("src_keep")),
                        on=(F.pmod(F.col("dup_id") - plant_lo, F.lit(3))
                            * blob8
                            + ((F.col("dup_id") - plant_lo) / 3)
                            .cast("long")) == F.col("src_id")))
        miss8 = pairs8.filter(
            ~F.col("dup_rep").eqNullSafe(F.col("src_rep"))).count()
        two8 = pairs8.filter(F.col("dup_keep") & F.col("src_keep")).count()
        print(f"[{'ok' if miss8 == 0 and two8 == 0 else 'FAIL'}] semhot3 "
              f"planted pairs collapsed across all 3 blobs: "
              f"{3 * planted8 - miss8}/{3 * planted8}, double-keeps {two8}")
        ok &= miss8 == 0 and two8 == 0

    # --- keyless group_intervals: chunked merge vs single-task ---------
    if "group" in tiers:
        gi = (synth_eav(spark, m, n_attrs=1)
              .select(F.col("timestamp").alias("start"),
                      (F.col("timestamp") + 3.0).alias("stop"))
              .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        chunked = cps.group_intervals(gi, start_col="start", stop_col="stop",
                                      distance=1.0).localCheckpoint(eager=True)
        t_chunked = time.perf_counter() - t0
        t0 = time.perf_counter()
        single = (cps.group_intervals(gi.withColumn("g", F.lit(0)),
                                      group_by="g",
                                      start_col="start", stop_col="stop",
                                      distance=1.0)
                  .drop("g").localCheckpoint(eager=True))
        t_single = time.perf_counter() - t0
        print(f"group_intervals keyless {m:,} ivs: chunked={t_chunked:.1f}s "
              f"single-task={t_single:.1f}s")
        ok &= compare("group_intervals chunked==single", chunked, single,
                      ["start", "stop"])

    # --- ANN kernels at n/10 vectors -----------------------------------
    if "ann" in tiers:
        # Cross-implementation consistency: (a) the broadcast-probe LSH (numpy
        # scoring, single corpus scan) against the shuffled bucket-equi-join
        # LSH (JVM expression scoring) — same candidate definition, so outputs
        # must be identical; (b) IVF probing EVERY cell degenerates to
        # exhaustive search and must equal brute-force cosine_topk exactly.
        from catabra_pandas_spark.pipeline.similarity import (
            cosine_topk, ivf_cosine_topk, lsh_cosine_topk)

        nv, dim = max(n // 10, 100_000), 32
        # full-mantissa hash noise (xxhash64 / 2^63), NOT a small value
        # grid: a 2001-value lattice dictionary-encodes in parquet and
        # made the float32-vs-int8 storage certificate below meaningless
        # (measured 1.36x instead of ~3.5x) — real embeddings are
        # near-incompressible, so the synthetic corpus must be too
        emb = spark.range(nv, numPartitions=64).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.xxhash64(F.col("id"), F.lit(d)).cast("double")
                       / F.lit(float(2 ** 63))) for d in range(dim)]
                    ).alias("embedding")).localCheckpoint(eager=True)
        # own tiny checkpoint: reads of emb's cached blocks count as
        # task Input Metrics and would drown the parquet scan bytes in
        # the storage certificate's job groups
        qv = emb.filter(F.col("vec_id") < 64).localCheckpoint(eager=True)
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
        # int8 quantized scan + exact re-rank must equal brute force at
        # scale (recall certificate: any quantization miss red-flags)
        from catabra_pandas_spark.pipeline.similarity import (
            q8_cosine_topk, quantize_embeddings)
        emb_q8 = quantize_embeddings(emb, dim=dim).localCheckpoint(
            eager=True)
        t0 = time.perf_counter()
        q8 = q8_cosine_topk(qv, emb_q8, k=10, dim=dim,
                            rerank_vec="embedding", rerank=8
                            ).localCheckpoint(eager=True)
        t_q8 = time.perf_counter() - t0
        print(f"q8 scan+rerank {nv:,} vecs: {t_q8:.1f}s "
              f"({t_q8 / t_brute:.1f}x brute)")
        ok &= compare("q8 scan + exact rerank == brute force", q8, brute,
                      ["query_id", "rank"])

        # --- q8 STORAGE certificate: the quantization tier's whole
        # motivation is scan BYTES (similarity.py quantize_embeddings
        # docstring) — persist the codes (+scale) and the float32 corpus
        # to parquet and measure what each top-k scan actually READS
        # (event-log Input Metrics), not what the prose claims.  tinyint
        # codes are 1/4 of float32 on the wire and both columns are
        # near-incompressible hash noise, so parquet keeps most of the
        # ratio; the scan also never touches scale_q8 (column pruning —
        # cosine is scale-invariant).
        import shutil
        import tempfile
        root = tempfile.mkdtemp(prefix="q8store_")
        f32_dir, q8_dir = f"{root}/f32", f"{root}/q8"
        emb.select("vec_id", F.col("embedding").cast("array<float>")
                   .alias("embedding")).write.parquet(f32_dir)
        emb_q8.select("vec_id", "codes_q8", "scale_q8").write.parquet(q8_dir)
        du = lambda d: sum(os.path.getsize(os.path.join(r, fn))
                           for r, _, fs in os.walk(d) for fn in fs)
        size_f32, size_q8 = du(f32_dir), du(q8_dir)

        # scan-byte attribution: neither event-log Input Metrics nor the
        # Hadoop FS counters see the vectorized reader's data pages in
        # Spark 4 local mode (measured: a 35 MB scan reported 20 KB — it
        # bypasses Hadoop streams; AQE stage jobs also run outside the
        # job group).  The faithful number for "what a 1000-executor
        # cluster pulls off object storage" is the PHYSICAL COMPRESSED
        # SIZE of the column chunks each plan reads — taken from parquet
        # footers, with the plan's ReadSchema asserted to prove the
        # column set (scale_q8 must be pruned: cosine is
        # scale-invariant, the scan never touches it).
        import glob as _glob
        import pyarrow.parquet as _pq

        def scan_bytes(d, cols):
            total = 0
            for fn in _glob.glob(os.path.join(d, "*.parquet")):
                md = _pq.ParquetFile(fn).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema.split(".")[0] in cols:
                            total += col.total_compressed_size
            return total

        t0 = time.perf_counter()
        q8_plan = q8_cosine_topk(qv, spark.read.parquet(q8_dir), k=10,
                                 dim=dim)
        q8_disk = q8_plan.localCheckpoint(eager=True)
        t_q8s = time.perf_counter() - t0
        t0 = time.perf_counter()
        f32_plan = cosine_topk(
            qv, spark.read.parquet(f32_dir).select(
                "vec_id", F.col("embedding").cast("array<double>")
                .alias("embedding")),
            k=10, dim=dim)
        f32_disk = f32_plan.localCheckpoint(eager=True)
        t_f32s = time.perf_counter() - t0
        # prove the column sets from the physical plans, then price them
        _jvm = spark.sparkContext._jvm
        q8_expl = _jvm.PythonSQLUtils.explainString(
            q8_plan._jdf.queryExecution(), "formatted")
        q8_read = q8_expl.split("ReadSchema")[1].split("\n")[0]
        assert "scale_q8" not in q8_read, \
            f"q8 scan failed to prune scale_q8: {q8_read}"
        assert "codes_q8" in q8_read
        in_q8 = scan_bytes(q8_dir, {"vec_id", "codes_q8"})
        in_f32 = scan_bytes(f32_dir, {"vec_id", "embedding"})
        q8_mem = q8_cosine_topk(qv, emb_q8, k=10, dim=dim
                                ).localCheckpoint(eager=True)
        ok &= compare("q8 top-k from parquet == from memory", q8_disk,
                      q8_mem, ["query_id", "rank"])
        n_f32 = f32_disk.count()
        disk_ratio = size_f32 / max(size_q8, 1)
        scan_ratio = (in_f32 / in_q8) if in_q8 else None
        print(f"q8 storage {nv:,} vecs x {dim}d: parquet {size_f32 >> 20}MB "
              f"f32 vs {size_q8 >> 20}MB q8 ({disk_ratio:.2f}x); scan read "
              f"{in_f32 and in_f32 >> 20}MB vs {in_q8 and in_q8 >> 20}MB "
              f"({scan_ratio and round(scan_ratio, 2)}x), wall "
              f"{t_f32s:.1f}s vs {t_q8s:.1f}s; f32 topk rows={n_f32}")
        # the claim under test is SCAN bytes ("the scan reads a quarter
        # of the float32 bytes") — >= 3x after parquet framing/vec_id
        # overhead at dim=32.  Disk carries scale_q8 too (pruned by the
        # scan), so its floor is softer.
        if scan_ratio is None:
            # no parquet files matched / empty footer metadata: the scan
            # certificate cannot be computed — that IS a failed
            # certificate, not a crash
            print("FAIL: q8 scan bytes are 0 (no parquet footers found) — "
                  "scan certificate not computable")
            ok = False
        elif scan_ratio < 3.0 or disk_ratio < 2.5:
            print(f"WEAK: q8 byte savings below the design claim "
                  f"(disk {disk_ratio:.2f}x, scan {scan_ratio:.2f}x)")
            ok = False
        shutil.rmtree(root, ignore_errors=True)

    # --- quality classifier certificate (opt-in, r13) -------------------
    if "qualclf" in tiers:
        # n/2 synthetic rows with a planted linear separation: training
        # must (a) recover the separation (AUC >> 0.5 on the scored
        # corpus), (b) be BIT-identical across two different
        # partitionings of the same rows (the decimal-gradient-sum
        # determinism claim at scale), and (c) cost exactly one
        # aggregation job per iteration + one moments job (job-count
        # evidence from the status tracker), with map-only scoring
        # (zero exchanges, plan-asserted).
        from catabra_pandas_spark.pipeline import (
            score_quality_classifier, train_quality_classifier)
        n9 = n // 2
        h9 = lambda k: F.xxhash64(F.col("id"), F.lit(k))  # noqa: E731
        u9 = lambda k: (F.pmod(h9(k), F.lit(10**9)).cast("double")  # noqa: E731
                        / 1e9)
        base9 = (spark.range(n9, numPartitions=64)
                 .select(F.col("id").alias("doc_id"),
                         (u9(1) * 4 - 2).alias("f1"),
                         (u9(2) * 6).alias("f2"),
                         u9(3).alias("u")))
        logit9 = 1.5 * F.col("f1") - 0.8 * (F.col("f2") - 3.0)
        data9 = (base9.select(
            "doc_id", "f1", "f2",
            (F.col("u") < F.lit(1.0) / (F.lit(1.0) + F.exp(-logit9)))
            .cast("int").alias("y")).localCheckpoint(eager=True))
        # job-count evidence: the trainer's only actions are .agg(...)
        # .collect() — intercept agg on the concrete DataFrame class
        _cdf = type(data9)
        _agg_calls = []
        _orig_agg = _cdf.agg

        def _counting_agg(self, *a, **kw):
            _agg_calls.append(1)
            return _orig_agg(self, *a, **kw)

        _cdf.agg = _counting_agg
        try:
            t0 = time.perf_counter()
            m9 = train_quality_classifier(data9, "y", ["f1", "f2"],
                                          n_iter=6, lr=1.0)
            t_train9 = time.perf_counter() - t0
        finally:
            _cdf.agg = _orig_agg
        print(f"qualclf {n9:,} rows: train 6 iters in {t_train9:.1f}s, "
              f"agg jobs={len(_agg_calls)} (1 moments + 6 iterations), "
              f"coef={[round(c, 4) for c in m9['coef']]}")
        ok &= len(_agg_calls) == 7
        m9b = train_quality_classifier(
            data9.repartition(13, "f2"), "y", ["f1", "f2"],
            n_iter=6, lr=1.0)
        det9 = (m9["coef"] == m9b["coef"]
                and m9["intercept"] == m9b["intercept"]
                and m9["mean"] == m9b["mean"])
        print(f"[{'ok' if det9 else 'FAIL'}] qualclf coefficients "
              f"BIT-identical across partitionings")
        ok &= det9
        scored9 = score_quality_classifier(data9, m9)
        plan9 = scored9._jdf.queryExecution().executedPlan().toString()
        n_exch9 = plan9.count("Exchange")
        agg9 = (scored9.groupBy("y")
                .agg(F.avg("quality_prob").alias("p")).collect())
        pmap9 = {int(r["y"]): float(r["p"]) for r in agg9}
        sep9 = pmap9[1] - pmap9[0]
        print(f"[{'ok' if n_exch9 == 0 and sep9 > 0.2 else 'FAIL'}] "
              f"qualclf map-only scoring (exchanges={n_exch9}), mean "
              f"prob separation {sep9:.3f} (pos {pmap9[1]:.3f} vs neg "
              f"{pmap9[0]:.3f})")
        ok &= n_exch9 == 0 and sep9 > 0.2

    # --- quantile_buckets certificate (opt-in, r13) ----------------------
    if "qbuckets" in tiers:
        # n rows of hash-unique scores in 5 skewed groups (one group owns
        # half the corpus): per-group head/middle/tail counts must hit
        # the EXACT type-1 rank arithmetic — head = ceil(n_g/3),
        # middle = ceil(2*n_g/3) - ceil(n_g/3) — because unique scores
        # leave no tie slack; the threshold table is broadcast-joined
        # (plan-asserted) and the rank pass is ONE sort exchange.
        from catabra_pandas_spark.pipeline import quantile_buckets
        import math as _math
        n10 = n
        g10 = (F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 5, F.lit(0))
               .otherwise(F.pmod(F.xxhash64("id"), F.lit(5))))
        data10 = (spark.range(n10, numPartitions=64)
                  .select(F.col("id").alias("rid"), g10.alias("g"),
                          # PROVABLY unique, exactly-representable
                          # scores: hash*n + id is a bijection of
                          # (hash mod 1e6, id) and stays < 2^53
                          (F.pmod(F.xxhash64("id", F.lit(7)),
                                  F.lit(10**6)) * F.lit(n10)
                           + F.col("id")).cast("double").alias("s"))
                  .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        b10 = quantile_buckets(data10, "s", group_by="g")
        counts10 = {(int(r["g"]), r["bucket"]): int(r["n"]) for r in
                    b10.groupBy("g", "bucket")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
        t_b10 = time.perf_counter() - t0
        sizes10 = {int(r["g"]): int(r["n"]) for r in
                   data10.groupBy("g")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
        bad10 = []
        for g, ng in sizes10.items():
            head = _math.ceil(ng / 3)
            middle = _math.ceil(2 * ng / 3) - head
            tail = ng - head - middle
            exp = {"head": head, "middle": middle, "tail": tail}
            for lab, cnt in exp.items():
                if counts10.get((g, lab), 0) != cnt:
                    bad10.append((g, lab, counts10.get((g, lab), 0), cnt))
        plan10 = b10._jdf.queryExecution().executedPlan().toString()
        bcast10 = "BroadcastHashJoin" in plan10
        print(f"qbuckets {n10:,} rows in {len(sizes10)} skewed groups: "
              f"{t_b10:.1f}s, broadcast threshold join={bcast10}")
        print(f"[{'ok' if not bad10 and bcast10 else 'FAIL'}] qbuckets "
              f"exact rank arithmetic per group "
              f"(mismatches={bad10[:3]})")
        ok &= not bad10 and bcast10

    # --- weighted sampling certificate (opt-in, r12) --------------------
    if "wsample" in tiers:
        # n rows, 1% planted HEAVY (weight 1000 vs 1): the A-Res draw of
        # n/1000 rows must (a) be identical across two full runs AND
        # across a repartition (determinism is md5-keyed, not
        # partition-keyed); (b) give the heavy 1% ~the weight-mass share
        # (0.910 = 0.01*1000 / (0.01*1000 + 0.99); k is 10x smaller than
        # the heavy pool so without-replacement exhaustion stays small —
        # drawing the whole pool would dilute the share to ~0.83);
        # (c) run as TakeOrdered with ZERO exchanges — the 100 TB plan
        # is per-partition top-n + merge, never a full sort shuffle.
        from catabra_pandas_spark.pipeline import weighted_sample
        n9 = n
        k9 = max(n // 1000, 500)
        rows9 = (spark.range(n9, numPartitions=64)
                 .select(F.col("id"),
                         F.when(F.pmod(F.xxhash64("id"), F.lit(100)) == 0,
                                1000.0).otherwise(1.0).alias("w"))
                 .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        s1 = [r["id"] for r in
              weighted_sample(rows9, k9, "w", on="id", seed=3)
              .select("id").collect()]
        t_ws = time.perf_counter() - t0
        s2 = [r["id"] for r in
              weighted_sample(rows9.repartition(17), k9, "w", on="id",
                              seed=3).select("id").collect()]
        same9 = sorted(s1) == sorted(s2) and len(s1) == k9
        heavy9 = rows9.filter(F.col("id").isin(s1)).filter("w > 1").count()
        frac9 = heavy9 / k9
        expl9 = weighted_sample(rows9, k9, "w", on="id", seed=3) \
            ._jdf.queryExecution().executedPlan().toString()
        n_ex9 = expl9.count("Exchange")
        plan9 = "TakeOrdered" in expl9 and n_ex9 == 0
        print(f"wsample {n9:,} rows -> {k9:,} drawn in {t_ws:.1f}s: "
              f"heavy-1% share {frac9:.3f} (weight mass 0.910), "
              f"repartition-stable={same9}, exchanges={n_ex9}")
        ok &= same9 and plan9 and 0.85 < frac9 < 0.97
        if not (same9 and plan9 and 0.85 < frac9 < 0.97):
            print(f"FAIL wsample: same={same9} plan={plan9} frac={frac9}")

    if "retrieval" in tiers:
        # n/10 documents (the text tier's generator: 10-50 words from a
        # 5k-word vocabulary, hash-derived executor-side) with a BINDING
        # 2k df cap.  Certifies at the 1M-doc scale: (a) doc_frequencies
        # is deterministic under the binding cap (the distributed LIMIT
        # ordering — same property the LM cap check proves); (b) the
        # tfidf / hashed-embedding Arrow scans are repartition-stable
        # row-for-row (content-defined scores, md5 buckets); (c)
        # bm25_search's global top-k compiles to TakeOrdered with ZERO
        # exchanges — per-partition top-k + driver merge, never a full
        # sort shuffle; (d) assign_shards balances and is a pure
        # zero-exchange projection.
        from catabra_pandas_spark.pipeline import (assign_shards,
                                                   bm25_search,
                                                   doc_frequencies,
                                                   hashed_tf_embedding,
                                                   tfidf_top_terms)

        ndr = max(n // 10, 100_000)
        words_r = F.transform(
            F.sequence(F.lit(1), F.pmod(F.xxhash64("id"), F.lit(40)) + 10),
            lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i),
                                                  F.lit(5000))))
        docs_r = spark.range(ndr, numPartitions=64).select(
            F.col("id").alias("doc_id"),
            F.array_join(words_r, " ").alias("text")) \
            .localCheckpoint(eager=True)
        t0 = time.perf_counter()
        st_r = doc_frequencies(docs_r, max_vocab=2000)
        t_df = time.perf_counter() - t0
        st_r2 = doc_frequencies(docs_r.repartition(17), max_vocab=2000)
        df_ok = st_r == st_r2 and len(st_r["df"]) == 2000 \
            and st_r["n_docs"] == ndr
        t0 = time.perf_counter()
        n_tfidf = tfidf_top_terms(docs_r, st_r, k=3).count()
        t_tf = time.perf_counter() - t0
        sample_ids = [i * (ndr // 1000) for i in range(1000)]
        pick = F.col("doc_id").isin(sample_ids)
        tf_a = {(r["doc_id"], r["rank"]): (r["term"], round(r["tfidf"], 9))
                for r in tfidf_top_terms(docs_r.filter(pick), st_r,
                                         k=3).collect()}
        tf_b = {(r["doc_id"], r["rank"]): (r["term"], round(r["tfidf"], 9))
                for r in tfidf_top_terms(docs_r.filter(pick).repartition(13),
                                         st_r, k=3).collect()}
        tf_ok = tf_a == tf_b and len(tf_a) > 0
        # query terms from the RETAINED vocabulary (the 2k cap is binding
        # over 5k near-uniform words, so a hardcoded token may be capped
        # out): ranks 10 / 500 / 1500 of the (count desc, token asc) order
        vocab_r = sorted(st_r["df"], key=lambda w: (-st_r["df"][w], w))
        query_r = " ".join([vocab_r[10], vocab_r[500], vocab_r[1500]])
        t0 = time.perf_counter()
        top_r = bm25_search(docs_r, st_r, query_r, k=10)
        hits_r = [tuple(r) for r in top_r.collect()]
        t_bm = time.perf_counter() - t0
        plan_r = top_r._jdf.queryExecution().executedPlan().toString()
        # every Exchange must be the documented small-source round-robin
        # guard (none on this 64-partition input at <=64 cores, one on a
        # wider box) — never a hash/sort exchange
        bm_plan_ok = "TakeOrderedAndProject" in plan_r \
            and plan_r.count("Exchange") \
            == plan_r.count("RoundRobinPartitioning")
        hits_r2 = [tuple(r) for r in
                   bm25_search(docs_r.repartition(29), st_r,
                               query_r, k=10).collect()]
        bm_ok = hits_r == hits_r2 and len(hits_r) == 10 and bm_plan_ok
        # batch form: 8 queries in one scan; per-partition top-k
        # accumulation must reproduce the single-query results exactly
        # and survive a repartition (lossless local pruning)
        from catabra_pandas_spark.pipeline import bm25_search_many
        queries_r = {f"q{i}": " ".join(vocab_r[37 * i:37 * i + 3])
                     for i in range(8)}
        t0 = time.perf_counter()
        many_r = {(r["query"], r["rank"]): (r["doc_id"],
                                            round(r["bm25"], 9))
                  for r in bm25_search_many(docs_r, st_r, queries_r,
                                            k=10).collect()}
        t_bmm = time.perf_counter() - t0
        many_r2 = {(r["query"], r["rank"]): (r["doc_id"],
                                             round(r["bm25"], 9))
                   for r in bm25_search_many(docs_r.repartition(29), st_r,
                                             queries_r, k=10).collect()}
        single_q3 = {("q3", i + 1): (r["doc_id"], round(r["bm25"], 9))
                     for i, r in enumerate(
                         bm25_search(docs_r, st_r, queries_r["q3"],
                                     k=10).collect())}
        bmm_ok = (many_r == many_r2 and len(many_r) == 80
                  and {k_: v for k_, v in many_r.items()
                       if k_[0] == "q3"} == single_q3)
        t0 = time.perf_counter()
        emb_r = hashed_tf_embedding(docs_r, dim=64)
        n_emb = emb_r.count()
        t_emb = time.perf_counter() - t0
        ea = {r["doc_id"]: tuple(r["embedding"]) for r in
              hashed_tf_embedding(docs_r.filter(pick), dim=64).collect()}
        eb = {r["doc_id"]: tuple(r["embedding"]) for r in
              hashed_tf_embedding(docs_r.filter(pick).repartition(13),
                                  dim=64).collect()}
        emb_ok = ea == eb and n_emb == ndr
        sh_r = assign_shards(docs_r.select("doc_id"), on="doc_id",
                             n_shards=64)
        sizes_r = [r["c"] for r in sh_r.groupBy("shard")
                   .agg(F.count(F.lit(1)).alias("c")).collect()]
        sh_plan = sh_r._jdf.queryExecution().executedPlan().toString()
        sh_ok = (len(sizes_r) == 64
                 and max(sizes_r) < 1.15 * ndr / 64
                 and min(sizes_r) > 0.85 * ndr / 64
                 and "Exchange" not in sh_plan)
        print(f"retrieval {ndr:,} docs: df_table={t_df:.1f}s (cap binding, "
              f"repartition-identical={df_ok}) tfidf={t_tf:.1f}s "
              f"({n_tfidf:,} rows, stable={tf_ok}) bm25={t_bm:.1f}s "
              f"(top10 stable={bm_ok}, exchanges="
              f"{plan_r.count('Exchange')}) bm25x8={t_bmm:.1f}s "
              f"(matches single + stable={bmm_ok}) "
              f"hashed_emb={t_emb:.1f}s "
              f"(stable={emb_ok}) shards balanced={sh_ok} "
              f"[{min(sizes_r)}..{max(sizes_r)} vs {ndr // 64}]")
        ok &= df_ok and tf_ok and bm_ok and bmm_ok and emb_ok and sh_ok
        if not (df_ok and tf_ok and bm_ok and bmm_ok and emb_ok and sh_ok):
            print(f"FAIL retrieval: df={df_ok} tfidf={tf_ok} bm25={bm_ok} "
                  f"bm25many={bmm_ok} emb={emb_ok} shards={sh_ok}")

    # --- text tier at n/10 documents -----------------------------------
    if "text" in tiers:
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

    # --- ExactSubstr at n docs with a hot boilerplate span -------------
    if "exactsubstr" in tiers:
        # ~50% of documents share ONE 8-token boilerplate span, so a
        # single window hash carries ~n/2 occurrences — the skew case for
        # the count shuffle.  Map-side partial aggregation must absorb it
        # (each task emits ONE row per distinct hash, so the hot hash
        # costs 64 combiner rows, not n/2 shuffled rows); the per-doc
        # collect_list of duplicated starts is bounded by doc length.
        from catabra_pandas_spark.pipeline import (exact_substring_dedup,
                                                   exact_substring_stats)

        nd = n
        base_words = F.transform(
            F.sequence(F.lit(1), F.pmod(F.xxhash64("id"), F.lit(12)) + 12),
            lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i),
                                                  F.lit(20_000))))
        boiler = F.array(*[F.lit(f"boiler{j}") for j in range(8)])
        words = F.when(F.col("id") % 2 == 0,
                       F.concat(F.slice(base_words, 1, 6), boiler,
                                F.slice(base_words, 7, 100))
                       ).otherwise(base_words)
        docs = spark.range(nd, numPartitions=64).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text")).localCheckpoint(
                eager=True)
        sc = spark.sparkContext
        sc.setJobGroup("exactsubstr_skew", "ExactSubstr skew tier")
        t0 = time.perf_counter()
        stats = exact_substring_stats(docs, width=8).localCheckpoint(
            eager=True)
        t_stats = time.perf_counter() - t0
        t0 = time.perf_counter()
        removed = exact_substring_dedup(docs, width=8)
        n_removed = removed.filter(F.col("n_kept") < F.col("n_tokens")).count()
        t_removal = time.perf_counter() - t0
        sc.setJobGroup("default", "")
        agg_row = stats.agg(
            F.count(F.lit(1)).alias("rows"),
            F.avg(F.when(F.col("doc_id") % 2 == 0, F.col("dup_fraction"))
                  ).alias("frac_even"),
            F.avg(F.when(F.col("doc_id") % 2 == 1, F.col("dup_fraction"))
                  ).alias("frac_odd")).collect()[0]
        max_ms, sw, sr = job_group_metrics(spark, "exactsubstr_skew")
        print(f"exactsubstr {nd:,} docs (hot span in 50%): "
              f"stats={t_stats:.1f}s removal={t_removal:.1f}s "
              f"max_task={max_ms}ms shuffle_w={sw and sw >> 20}MB "
              f"shuffle_r={sr and sr >> 20}MB")
        print(f"  dup_fraction: even-docs avg={agg_row['frac_even']:.3f} "
              f"odd-docs avg={agg_row['frac_odd']:.4f}; "
              f"{n_removed:,} docs shrank on removal")
        tier_ok = (agg_row["rows"] == nd
                   and agg_row["frac_even"] > 0.2
                   and agg_row["frac_odd"] < 0.01
                   and abs(n_removed - nd // 2) < nd // 100)
        print(f"[{'ok' if tier_ok else 'FAIL'}] exactsubstr skew tier")
        ok &= tier_ok

    # --- BPE at a realistic 16k-merge vocabulary ------------------------
    if "bpe16k" in tiers:
        # the incremental merge loop (pipeline/bpe.py _learn_merges) vs
        # the straight-from-the-paper rescan loop, on the SAME word-count
        # table; the rescan is timed over its first 250 merges and
        # extrapolated linearly (it does a full vocabulary sweep per
        # merge, so linear extrapolation UNDERSTATES its true 16k cost)
        from catabra_pandas_spark.pipeline.bpe import (_learn_merges,
                                                       _word_counts, _EOW)
        from catabra_pandas_spark.pipeline import bpe_tokenize

        nd = max(n // 50, 50_000)
        words = F.transform(
            F.sequence(F.lit(1), F.pmod(F.xxhash64("id"), F.lit(40)) + 10),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("id"), i), F.lit(30_000))))
        docs = spark.range(nd, numPartitions=64).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text")).localCheckpoint(
                eager=True)
        t0 = time.perf_counter()
        wc = _word_counts(docs, "text", lowercase=True, max_words=100_000)
        t_wc = time.perf_counter() - t0
        t0 = time.perf_counter()
        merges = _learn_merges(wc, n_merges=16_000)
        t_inc = time.perf_counter() - t0

        def rescan(word_counts, n_merges):
            words_ = [[list(w) + [_EOW], cnt] for w, cnt in word_counts]
            out = []
            for _ in range(n_merges):
                pairs: dict = {}
                for sym, cnt in words_:
                    for p in zip(sym, sym[1:]):
                        pairs[p] = pairs.get(p, 0) + cnt
                if not pairs:
                    break
                best, c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
                if c < 2:
                    break
                out.append(best)
                a, b = best
                for w in words_:
                    sym = w[0]
                    j, new = 0, []
                    while j < len(sym):
                        if j + 1 < len(sym) and sym[j] == a \
                                and sym[j + 1] == b:
                            new.append(a + b)
                            j += 2
                        else:
                            new.append(sym[j])
                            j += 1
                    w[0] = new
            return out

        probe = min(250, len(merges))
        t0 = time.perf_counter()
        base_merges = rescan(wc, probe)
        t_rescan_probe = time.perf_counter() - t0
        est_rescan = t_rescan_probe / probe * len(merges)
        same_prefix = base_merges == merges[:probe]
        t0 = time.perf_counter()
        tok_rows = bpe_tokenize(docs, merges).count()
        t_tok = time.perf_counter() - t0
        print(f"bpe16k {nd:,} docs: word_counts={t_wc:.1f}s "
              f"incremental_loop={t_inc:.1f}s for {len(merges):,} merges; "
              f"rescan {probe} merges={t_rescan_probe:.1f}s -> "
              f"~{est_rescan:.0f}s at {len(merges):,} "
              f"({est_rescan / max(t_inc, 1e-9):.0f}x); "
              f"tokenize={t_tok:.1f}s rows={tok_rows:,}")
        tier_ok = (same_prefix and tok_rows == nd
                   and t_inc < est_rescan / 5)
        print(f"[{'ok' if tier_ok else 'FAIL'}] bpe16k tier "
              f"(prefix identical={same_prefix})")
        ok &= tier_ok

    # --- block-grid cosine with a non-broadcastable query set ----------
    if "cosinebig" in tiers:
        # queries at n/50 rows x 32d (~hundreds of MB at cluster scale —
        # past any sane broadcast threshold): the (qb, cb) cogroup grid
        # shuffles each side O(blocks) times, NOT the |Q|x|C| pair rows a
        # naive crossJoin would materialize.  Recorded: wall, max task
        # duration, total shuffle bytes vs the pair-row estimate.
        from catabra_pandas_spark.pipeline.similarity import cosine_topk

        dim = 32
        nq = max(n // 50, 20_000)
        nc = max(n // 10, 100_000)
        mk = lambda m, tag: spark.range(m, numPartitions=64).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.pmod(F.xxhash64(F.col("id"), F.lit(tag), F.lit(d)),
                              F.lit(2001)).cast("double") / 1000.0 - 1.0)
                      for d in range(dim)]).alias("embedding"))
        qv = mk(nq, 1).localCheckpoint(eager=True)
        emb = mk(nc, 2).localCheckpoint(eager=True)
        sc = spark.sparkContext
        sc.setJobGroup("cosine_big", "non-broadcast block-grid cosine")
        t0 = time.perf_counter()
        out = cosine_topk(qv, emb, k=5, dim=dim, broadcast_queries=False,
                          n_query_blocks=8, n_corpus_blocks=16)
        n_out = out.count()
        t_big = time.perf_counter() - t0
        sc.setJobGroup("default", "")
        max_ms, sw, sr = job_group_metrics(spark, "cosine_big")
        pair_bytes = nq * nc * (8 + 8 + 8)  # naive crossJoin pair rows
        print(f"cosinebig {nq:,} queries x {nc:,} corpus x {dim}d: "
              f"wall={t_big:.1f}s max_task={max_ms}ms "
              f"shuffle_w={sw and sw >> 20}MB shuffle_r={sr and sr >> 20}MB "
              f"vs naive pair-rows ~{pair_bytes >> 20}MB")
        tier_ok = n_out == nq * 5 and (sw is None or sw < pair_bytes / 10)
        print(f"[{'ok' if tier_ok else 'FAIL'}] cosinebig tier "
              f"(rows={n_out:,})")
        ok &= tier_ok

    # --- skewed-entity interval join (SURVEY §7 hard-part 5) ------------
    if "skew" in tiers:
        # One entity owns ~50% of n observations — the worst realistic
        # hot-patient/hot-session shape for the interval-join tier
        # (mirrors the reference's 20k-entity scale tests,
        # tests/test_resample_eav.py:249-308, with the skew knob turned
        # all the way up).  SURVEY §7 said "rely on AQE skew handling;
        # salt only if measured" — this tier is that measurement.
        r = spark.range(n, numPartitions=64)
        h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(10**9))
        df = r.select(
            F.when(F.pmod(h(0), F.lit(2)) == 0, F.lit(0).cast("long"))
             .otherwise(F.pmod(h(1), F.lit(20_000)) + 1).alias("entity"),
            (h(2).cast("double") / 1e9 * span).alias("timestamp"),
            F.concat(F.lit("attr_"), (F.pmod(h(3), F.lit(3)) + 1)
                     .cast("string")).alias("attribute"),
            (h(4).cast("double") / 1e6).alias("value"),
        ).localCheckpoint(eager=True)
        ents = df.select("entity").distinct()
        wins = (ents.select("entity", F.lit(0.30 * span).alias("start"),
                            F.lit(0.40 * span).alias("stop"))
                .union(ents.select("entity", F.lit(0.60 * span).alias("start"),
                                   F.lit(0.70 * span).alias("stop")))
                .localCheckpoint(eager=True))
        kw = dict(entity_col="entity", time_col="timestamp",
                  attribute_col="attribute", value_col="value",
                  window_start_col="start", window_stop_col="stop",
                  regular=False)
        # mean, not sum: the hot entity's windows aggregate ~n/20 values
        # each, and two strategies summing 1M doubles in different orders
        # legitimately differ beyond any fixed decimal rounding (measured:
        # 2 rows at n=10M).  mean divides the same accumulated error by
        # the count (hot-group error ~1e-10); min/max/median are
        # order-exact.  Compared with compare_tol, not round+exceptAll —
        # means of two 6-decimal inputs land exactly on round boundaries.
        agg = {"attr_1": ["mean", "max"], "attr_2": "min",
               "attr_3": "median"}

        # correctness under skew: two independent algorithms must agree
        ev_direct = cps.resample_eav(df, wins, agg, join_strategy="direct",
                                     **kw).localCheckpoint(eager=True)
        ev_sweep = cps.resample_eav(df, wins, agg, join_strategy="sweep",
                                    **kw).localCheckpoint(eager=True)
        ok &= compare_tol("skew resample_eav direct==sweep", ev_direct,
                          ev_sweep, ["entity", "start", "stop"])
        iv = df.select("entity", F.col("timestamp").alias("start"),
                       (F.col("timestamp") + 2.0).alias("stop"), "value"
                       ).localCheckpoint(eager=True)  # break df lineage
        mi_kw = dict(on="entity", how="inner", left_start="start",
                     left_stop="stop", right_start="start",
                     right_stop="stop", suffixes=("_w", "_i"))
        mi_direct = cps.merge_intervals(wins, iv, strategy="direct",
                                        **mi_kw).localCheckpoint(eager=True)
        mi_sweep = cps.merge_intervals(wins, iv, strategy="sweep",
                                       **mi_kw).localCheckpoint(eager=True)
        ok &= compare("skew merge_intervals direct==sweep", mi_direct,
                      mi_sweep, ["entity"])

        # skew CERTIFICATE: force the shuffled SMJ path a 100 TB windows
        # table would take (20k-row windows broadcast at smoke scale, so
        # broadcast must be disabled for the miniature to be faithful)
        # and scale the AQE skew thresholds the same way the data is
        # scaled down (the hot partition is ~200 MB here; at cluster
        # scale it would dwarf the 256 MB default).
        old_conf = {k: spark.conf.get(k) for k in
                    ("spark.sql.autoBroadcastJoinThreshold",
                     "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                     "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                     "spark.sql.adaptive.forceOptimizeSkewedJoin")}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "8m")

        def smj_leg(label):
            plan_df = cps.resample_eav(df, wins, agg,
                                       join_strategy="direct", **kw)
            ms0 = int(time.time() * 1000)
            t0 = time.perf_counter()
            # collect(), NOT a noop write: writes wrap the plan in their
            # OWN QueryExecution, so the dataset's AQE plan would never
            # finalize and the skew markers would be invisible (measured)
            n_rows = len(plan_df.collect())
            wall = time.perf_counter() - t0
            ms1 = int(time.time() * 1000)
            expl = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                plan_df._jdf.queryExecution(), "formatted")
            split = "skew=true" in expl
            n_t, max_ms, med_ms = tasks_between(spark, ms0, ms1)
            ratio = (round(max_ms / max(med_ms, 1), 1)
                     if max_ms and med_ms else None)
            print(f"skew {n:,} obs (entity 0 owns 50%), {label}: wall="
                  f"{wall:.1f}s rows={n_rows} tasks={n_t} "
                  f"max_task={max_ms}ms median_task={med_ms}ms "
                  f"(ratio {ratio}x); AQE skew-split in final plan: {split}")
            return split, ratio, n_t

        try:
            # leg 1, default AQE: expect NO split — the window
            # aggregation downstream reuses the join's hash partitioning
            # on `entity`, and OptimizeSkewedJoin declines to split when
            # that would force an extra exchange
            split1, ratio1, n1 = smj_leg("default AQE")
            # leg 2: forceOptimizeSkewedJoin trades the extra exchange
            # for the split — the production knob for this exact shape
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
                           "true")
            split2, ratio2, n2 = smj_leg("forced skew-split")
        finally:
            for k, v in old_conf.items():
                spark.conf.set(k, v)
        if not split1:
            print("NOTE: default AQE keeps the hot entity in one task to "
                  "preserve the join->agg co-partitioning; at production "
                  "scale set spark.sql.adaptive.forceOptimizeSkewedJoin="
                  "true (measured above) or salt the hot entity on the "
                  "build side (SURVEY §7 hard-part 5 fallback)")
        ok &= bool(n1 and n2)
        if not split2:
            print("WEAK: even forced AQE did not split the skewed join")
            ok = False

    # --- streaming state-store footprint at n entities ------------------
    if "streamstate" in tiers:
        # The seven streaming operators claim O(1)/O(k) state PER GROUP
        # (streaming/__init__.py stream_asof:two scalars, stream_funnel:
        # k stage times).  This tier drives both over n DISTINCT entities
        # with availableNow and records the state store's own accounting
        # (stateOperators numRowsTotal / memoryUsedBytes from the final
        # query progress) — bytes-per-entity is the number a capacity
        # plan needs, not the docstring's O(1).
        import shutil
        import tempfile

        from catabra_pandas_spark.streaming import stream_asof, stream_funnel

        root = tempfile.mkdtemp(prefix="streamstate_")
        n_ent = n
        spark.range(n_ent, numPartitions=64).select(
            F.col("id").alias("entity"), F.lit(10).cast("long").alias("t"),
            F.col("id").alias("lid")).write.parquet(f"{root}/l")
        spark.range(n_ent, numPartitions=64).select(
            F.col("id").alias("entity"), F.lit(5).cast("long").alias("t"),
            (F.col("id") * 0.5).alias("value")).write.parquet(f"{root}/r")
        ls = spark.readStream.schema(
            "entity long, t long, lid long").parquet(f"{root}/l")
        rs = spark.readStream.schema(
            "entity long, t long, value double").parquet(f"{root}/r")

        def run_stream(out_df, mode, ck):
            t0 = time.perf_counter()
            q = (out_df.writeStream.format("noop").outputMode(mode)
                 .option("checkpointLocation", f"{root}/{ck}")
                 .trigger(availableNow=True).start())
            q.awaitTermination(1800)
            wall = time.perf_counter() - t0
            # the LAST progress can be a trailing no-data batch with an
            # empty stateOperators list (observed in a long-session full
            # sweep — the r13 crash); take the max-state progress from
            # recentProgress instead of trusting lastProgress alone
            best = {}
            for pr in (q.recentProgress or []) + \
                    ([q.lastProgress] if q.lastProgress else []):
                for so in (pr or {}).get("stateOperators") or []:
                    if (so.get("numRowsTotal") or 0) >= \
                            (best.get("numRowsTotal") or 0):
                        best = so
            return (wall, best.get("numRowsTotal"),
                    best.get("memoryUsedBytes"))

        w1, rows1, mem1 = run_stream(
            stream_asof(ls, rs, on="t", by="entity", right_value="value"),
            "append", "ck_asof")
        bpe1 = mem1 / rows1 if rows1 else None
        print(f"streamstate stream_asof {n_ent:,} entities: wall={w1:.1f}s "
              f"state_rows={rows1 and format(rows1, ',')} "
              f"state_mem={mem1 and mem1 >> 20}MB "
              f"({bpe1 and round(bpe1, 1)} B/entity)")

        ev = spark.range(n_ent, numPartitions=64).select(
            F.col("id").alias("entity"),
            F.explode(F.array(F.lit("A"), F.lit("B"))).alias("event_type"))
        ev = ev.select("entity", "event_type", F.timestamp_seconds(
            F.lit(1_600_000_000) + F.when(F.col("event_type") == "A", 0)
            .otherwise(60)).alias("timestamp"))
        ev.write.parquet(f"{root}/ev")
        es = spark.readStream.schema(
            "entity long, event_type string, timestamp timestamp"
        ).parquet(f"{root}/ev")
        w2, rows2, mem2 = run_stream(
            stream_funnel(es, steps=["A", "B"]), "update", "ck_funnel")
        bpe2 = mem2 / rows2 if rows2 else None
        print(f"streamstate stream_funnel {n_ent:,} entities (2 steps): "
              f"wall={w2:.1f}s state_rows={rows2 and format(rows2, ',')} "
              f"state_mem={mem2 and mem2 >> 20}MB "
              f"({bpe2 and round(bpe2, 1)} B/entity)")
        # the O(1)/O(k) claim: state rows == entities, and per-entity
        # bytes stay in store-overhead territory (hundreds of bytes),
        # never proportional to event volume
        ok &= rows1 == n_ent and rows2 == n_ent
        if (bpe1 and bpe1 > 2048) or (bpe2 and bpe2 > 2048):
            print(f"WEAK: streaming state exceeds 2 KB/entity "
                  f"(asof {bpe1}, funnel {bpe2})")
            ok = False
        shutil.rmtree(root, ignore_errors=True)

    print("SCALE_SMOKE", "PASS" if ok else "FAIL")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
