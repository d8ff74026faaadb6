"""Streaming tier: batch-mode value correctness (the window expressions are
identical in both modes) + real ``readStream`` plumbing with
``trigger(availableNow)`` into a memory sink."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from catabra_pandas_spark import group_intervals, impute
from catabra_pandas_spark.streaming import (stream_ffill, stream_resample_eav,
                                            stream_sessionize)

from .conftest import assert_pdf_equal, to_sdf


def _events_pdf():
    # 2 entities, clear 10-minute-gap session structure
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for ent, offs in [
        ("a", [0, 1, 2, 30, 31, 90]),       # sessions {0,1,2} {30,31} {90}
        ("b", [5, 40, 41, 42]),              # sessions {5} {40,41,42}
    ]:
        for i, m in enumerate(offs):
            rows.append({
                "entity": ent,
                "timestamp": base + pd.Timedelta(minutes=m),
                "attribute": "hr" if i % 2 == 0 else "spo2",
                "value": float(10 * m + i),
            })
    return pd.DataFrame(rows)


def test_sessionize_batch_matches_group_intervals(spark):
    pdf = _events_pdf()
    sdf = spark.createDataFrame(pdf)
    out = stream_sessionize(sdf, "10 minutes", agg={"value": ["mean", "count"]}) \
        .toPandas()

    # oracle 1: group_intervals with the same gap on the same points gives
    # the same cluster structure.  (session_window's gap is INCLUSIVE —
    # an event exactly at the session end merges, probed in
    # test_sessionize_matches_gap_scan — so distance=600.0 would match
    # too; 599.9 also works because this fixture has no exact-10-minute
    # gaps, and is kept as-is.)
    gi = group_intervals(sdf, group_by="entity", point_col="timestamp",
                         distance=599.9)
    gsess = (gi.groupBy("entity", "interval_group")
             .agg(F.min("timestamp").alias("session_start"),
                  F.max("timestamp").alias("session_stop"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.avg("value").alias("value_mean"),
                  F.count("value").alias("value_count"))
             .drop("interval_group")
             .toPandas())
    assert_pdf_equal(
        out.drop(columns=["window_start", "window_stop"]),
        gsess,
        sort_by=["entity", "session_start"],
    )
    # session_window invariants
    assert (out["session_stop"] < out["window_stop"]).all()
    assert (out["session_start"] >= out["window_start"]).all()
    assert len(out) == 5


def test_resample_tumbling_batch_values(spark):
    pdf = _events_pdf()
    sdf = spark.createDataFrame(pdf)
    out = stream_resample_eav(
        sdf, {"hr": ["mean", "count"], "spo2": ["max"]},
        duration="1 hour").toPandas()

    # pandas oracle: floor timestamps to the hour, conditional aggs
    pdf = pdf.assign(w=pdf["timestamp"].dt.floor("h"))
    exp = (pdf.groupby(["entity", "w"])
           .apply(lambda g: pd.Series({
               "hr_mean": g.loc[g.attribute == "hr", "value"].mean(),
               "hr_count": float(g.loc[g.attribute == "hr", "value"].count()),
               "spo2_max": g.loc[g.attribute == "spo2", "value"].max(),
           }), include_groups=False)
           .reset_index()
           .rename(columns={"w": "window_start"}))
    got = out.drop(columns=["window_stop"]).assign(
        hr_count=lambda d: d.hr_count.astype(float))
    assert_pdf_equal(got, exp, sort_by=["entity", "window_start"])


def test_stream_ffill_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): state carries the
    last non-null value ACROSS micro-batches (maxFilesPerTrigger=1 forces
    one batch per file), matching the batch window ffill."""
    import time as _time

    base = pd.Timestamp("2026-01-01")
    early = pd.DataFrame({
        "entity": ["a", "a", "b", "b"],
        "timestamp": [base, base + pd.Timedelta(minutes=1),
                      base, base + pd.Timedelta(minutes=2)],
        "value": [1.0, None, None, 4.0],
    })
    late = pd.DataFrame({
        "entity": ["a", "a", "b"],
        "timestamp": [base + pd.Timedelta(minutes=10),
                      base + pd.Timedelta(minutes=11),
                      base + pd.Timedelta(minutes=10)],
        "value": [None, 7.0, None],   # 'a' min10 and 'b' min10 fill from state
    })
    src_dir = str(tmp_path / "ffill_src")
    to_sdf(spark, early).coalesce(1).write.mode("overwrite").parquet(src_dir)
    _time.sleep(1.2)  # file-source batch order follows modification time
    to_sdf(spark, late).coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = stream_ffill(stream, value_col="value")
    q = (out.writeStream.format("memory").queryName("ffill_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ffill_test").toPandas()

    both = pd.concat([early, late], ignore_index=True)
    exp = impute(to_sdf(spark, both), method="ffill", columns="value",
                 group_by="entity", order_by="timestamp").toPandas()
    assert_pdf_equal(got, exp, sort_by=["entity", "timestamp"])
    # the cross-batch fills specifically
    g = got.set_index(["entity", "timestamp"]).value
    assert g[("a", base + pd.Timedelta(minutes=10))] == 1.0
    assert g[("b", base + pd.Timedelta(minutes=10))] == 4.0


def test_stream_ffill_integer_values(spark, tmp_path):
    """Integer value columns must not fail Arrow conversion: the filled
    output is declared double (float64 state), in both modes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2026-01-01")
    src_dir = str(tmp_path / "ffill_int_src")
    # pyarrow write: a genuine int64 column with a NULL (createDataFrame
    # would surface pd.NA as double NaN, which is a value, not missing)
    tbl = pa.table({
        "entity": pa.array(["a", "a", "a"]),
        "timestamp": pa.array(
            [base + pd.Timedelta(minutes=m) for m in (0, 1, 2)],
            type=pa.timestamp("us")),
        "value": pa.array([5, None, 7], type=pa.int64()),
    })
    import os
    os.makedirs(src_dir, exist_ok=True)
    pq.write_table(tbl, f"{src_dir}/part0.parquet")
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = stream_ffill(stream, value_col="value")
    q = (out.writeStream.format("memory").queryName("ffill_int_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ffill_int_test").toPandas()
    assert got.value.dtype.kind == "f"
    assert sorted(got.value) == [5.0, 5.0, 7.0]
    # batch dispatch agrees on dtype and values
    batch = stream_ffill(spark.read.parquet(src_dir), value_col="value").toPandas()
    assert batch.value.dtype.kind == "f"
    assert sorted(batch.value) == [5.0, 5.0, 7.0]


def test_streaming_plumbing_available_now(spark, tmp_path):
    """Real streaming execution: parquet source -> watermark -> session
    window -> memory sink, results equal to the batch run."""
    pdf = _events_pdf()
    src_dir = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    assert stream.isStreaming
    sess = stream_sessionize(stream, "10 minutes", watermark="1 hour",
                             agg={"value": ["mean"]})
    q = (sess.writeStream.format("memory").queryName("sess_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_test").toPandas()

    batch = stream_sessionize(spark.createDataFrame(pdf), "10 minutes",
                              agg={"value": ["mean"]}).toPandas()
    assert_pdf_equal(got, batch, sort_by=["entity", "session_start"])


def test_stream_funnel_stateful(spark, tmp_path):
    """Stateful streaming funnel: stage matches accumulate ACROSS
    micro-batches (state = k matched times), update-mode rows refresh the
    entity's funnel status, and the final status equals the batch
    operator on the concatenated data."""
    import time as _time

    from catabra_pandas_spark.operators.events import funnel
    from catabra_pandas_spark.streaming import stream_funnel

    base = pd.Timestamp("2026-01-01")
    early = pd.DataFrame({
        "entity": ["a", "a", "b", "c"],
        "timestamp": [base, base + pd.Timedelta(minutes=1),
                      base + pd.Timedelta(minutes=2),
                      base + pd.Timedelta(minutes=3)],
        "event_type": ["view", "cart", "view", "cart"],  # c: cart first -> no row
    })
    late = pd.DataFrame({
        "entity": ["a", "b"],
        "timestamp": [base + pd.Timedelta(minutes=10),
                      base + pd.Timedelta(minutes=11)],
        "event_type": ["purchase", "cart"],   # a completes; b reaches 2
    })
    src_dir = str(tmp_path / "funnel_src")
    to_sdf(spark, early).coalesce(1).write.mode("overwrite").parquet(src_dir)
    _time.sleep(1.2)
    to_sdf(spark, late).coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = stream_funnel(stream, ["view", "cart", "purchase"])
    q = (out.writeStream.format("memory").queryName("funnel_test")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM funnel_test").toPandas()

    # update mode: keep each entity's most-advanced row = final status
    final = (got.sort_values("n_stages").groupby("entity").tail(1)
             .reset_index(drop=True))
    both = pd.concat([early, late], ignore_index=True)
    exp = funnel(to_sdf(spark, both), ["view", "cart", "purchase"]).toPandas()
    assert_pdf_equal(final, exp, sort_by=["entity"])
    # the cross-batch completion specifically
    a = final.set_index("entity").loc["a"]
    assert bool(a.converted) and a.n_stages == 3
    assert a.t_convert == base + pd.Timedelta(minutes=10)
    assert "c" not in set(final.entity)  # never emitted a step-0 event


def test_stream_dedup_batch_deterministic(spark):
    pdf = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "timestamp": pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:05",
                                     "2026-01-01 00:01", "2026-01-01 00:02"]),
        "id": [3, 1, 2, 9],
        "v": [30.0, 10.0, 20.0, 90.0],
    })
    from catabra_pandas_spark.streaming import stream_dedup

    out = stream_dedup(spark.createDataFrame(pdf), subset="k",
                       id_col="id").toPandas()
    assert out.columns.tolist() == ["k", "timestamp", "id", "v"]
    got = out.sort_values("k")[["k", "id", "v"]].values.tolist()
    assert got == [["a", 1, 10.0], ["b", 9, 90.0]]

    # without id_col: smallest remaining-column struct (timestamp leads)
    out2 = stream_dedup(spark.createDataFrame(pdf), subset="k").toPandas()
    assert sorted(out2["id"].tolist()) == [3, 9]


def test_stream_dedup_cross_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops a duplicate key arriving in a
    LATER micro-batch within the watermark window."""
    import time as _time
    from catabra_pandas_spark.streaming import stream_dedup

    base = pd.Timestamp("2026-01-01")
    early = pd.DataFrame({
        "k": ["a", "b"],
        "timestamp": [base, base + pd.Timedelta(minutes=1)],
        "v": [1.0, 2.0],
    })
    late = pd.DataFrame({
        "k": ["a", "c"],   # 'a' is a dup within the watermark -> dropped
        "timestamp": [base + pd.Timedelta(minutes=2),
                      base + pd.Timedelta(minutes=3)],
        "v": [99.0, 3.0],
    })
    src_dir = str(tmp_path / "dedup_src")
    spark.createDataFrame(early).coalesce(1).write.mode("overwrite").parquet(src_dir)
    _time.sleep(1.2)
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = stream_dedup(stream, subset="k", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test").toPandas()
    assert sorted(got["k"].tolist()) == ["a", "b", "c"]
    assert got.loc[got["k"] == "a", "v"].tolist() == [1.0]  # first arrival won

    # streaming without watermark must refuse
    with pytest.raises(ValueError):
        stream_dedup(stream, subset="k")


def test_stream_dedup_all_null_ids(spark):
    """Groups whose every id is null must keep a REAL row, not a fabricated
    all-null payload (min_by skips null orderings — regression test)."""
    from catabra_pandas_spark.streaming import stream_dedup

    pdf = pd.DataFrame({
        "k": ["a", "a", "b"],
        "id": [None, None, 7.0],
        "v": [1.0, 2.0, 9.0],
    })
    out = stream_dedup(to_sdf(spark, pdf), subset="k",
                       id_col="id").toPandas().sort_values("k")
    assert out["v"].tolist() == [1.0, 9.0]  # smallest payload survives


def test_stream_resample_interval_batch_values(spark):
    """Batch-dispatch value check against a hand-computed duration-weighted
    expectation: proper intervals spanning window boundaries, a zero-length
    interval, a null value (contributes 0 but still creates the group)."""
    import pandas as pd

    from catabra_pandas_spark.streaming import stream_resample_interval

    H = 3600
    rows = [
        # entity, start_s, stop_s, attr, value
        (1, 0.25 * H, 0.75 * H, "a", 10.0),    # inside hour 0 -> 10
        (1, 0.5 * H, 1.5 * H, "a", 4.0),       # half in hour 0, half hour 1
        (1, 1.25 * H, 1.25 * H, "a", 7.0),     # zero-length, hour 1 -> 7
        (1, 0.1 * H, 0.9 * H, "b", None),      # null value -> 0, group exists
        (2, 2.5 * H, 4.5 * H, "a", 6.0),       # hours 2,3,4: 0.25,0.5,0.25
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "a_s", "b_s", "attribute", "value"])
    pdf["start"] = pd.to_datetime(pdf.pop("a_s"), unit="s")
    pdf["stop"] = pd.to_datetime(pdf.pop("b_s"), unit="s")
    from .conftest import to_sdf
    sdf = to_sdf(spark, pdf)
    out = stream_resample_interval(
        sdf, ["a", "b"], "1 hour").toPandas()
    out["h"] = out["window_start"].astype("int64") // (H * 10**9)
    got = {(r.entity, r.h): (round(r.a, 6), round(r.b, 6))
           for r in out.itertuples()}
    assert got == {
        (1, 0): (10.0 + 2.0, 0.0),
        (1, 1): (2.0 + 7.0, 0.0),
        (2, 2): (1.5, 0.0),
        (2, 3): (3.0, 0.0),
        (2, 4): (1.5, 0.0),
    }


def test_stream_resample_interval_streaming(spark, tmp_path):
    """Real readStream plumbing: same values arrive over availableNow."""
    import pandas as pd

    from catabra_pandas_spark.streaming import stream_resample_interval

    src_dir = str(tmp_path / "src")
    H = 3600
    pdf = pd.DataFrame({
        "entity": [1, 1],
        "start": pd.to_datetime([0.25 * H, 0.5 * H], unit="s"),
        "stop": pd.to_datetime([0.75 * H, 1.5 * H], unit="s"),
        "attribute": ["a", "a"],
        "value": [10.0, 4.0],
    })
    spark.createDataFrame(pdf).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = stream_resample_interval(stream, ["a"], "1 hour", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("sri")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    res = spark.sql("select * from sri").toPandas()
    # with availableNow + append, windows at the final watermark may be
    # withheld; assert whatever emitted matches the batch computation
    batch = stream_resample_interval(
        spark.read.parquet(src_dir), ["a"], "1 hour").toPandas()
    merged = res.merge(batch, on=["entity", "window_start", "window_stop"],
                       suffixes=("_s", "_b"))
    assert len(merged) == len(res)
    assert (merged["a_s"] == merged["a_b"]).all()


def test_map_only_text_ops_run_under_streaming(spark, tmp_path):
    """Map-only pipeline operators (scrub_pii, text_quality, repetition
    folds) are streaming-safe by construction: the same expressions run
    under readStream with no extra state.  Exercise one end-to-end
    availableNow micro-batch run and compare to the batch result."""
    import pandas as pd
    from catabra_pandas_spark.pipeline import scrub_pii, text_quality

    src = str(tmp_path / "src")
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["mail a@b.co now", "server 10.0.0.1 up", "plain text here"],
    })
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema("doc_id long, text string").parquet(src))
    out = scrub_pii(text_quality(stream))
    sink = str(tmp_path / "sink")
    q = (out.writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(sink).orderBy("doc_id").toPandas()
    want = (scrub_pii(text_quality(spark.read.parquet(src)))
            .orderBy("doc_id").toPandas())
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)],
        want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)])


def test_stream_asof_stateful(spark, tmp_path):
    """Streaming backward as-of join: state (last right key/value) carries
    ACROSS micro-batches; right rows update it, left rows emit joined.
    Matches the batch merge_asof dispatch on the same data."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_asof

    base = pd.Timestamp("2026-03-01")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # left = clicks, right = quotes; entity 'a' gets a quote only in
    # batch 1, so its batch-2 clicks must join from state
    l_early = pd.DataFrame({"entity": ["a", "b"], "timestamp": [mins(1), mins(1)],
                            "click_id": [10, 20]})
    r_early = pd.DataFrame({"entity": ["a"], "timestamp": [mins(0)],
                            "value": [5.0]})
    l_late = pd.DataFrame({"entity": ["a", "b"], "timestamp": [mins(30), mins(30)],
                           "click_id": [11, 21]})
    r_late = pd.DataFrame({"entity": ["b"], "timestamp": [mins(29)],
                           "value": [9.0]})
    ldir, rdir = str(tmp_path / "asof_l"), str(tmp_path / "asof_r")
    to_sdf(spark, l_early).coalesce(1).write.mode("overwrite").parquet(ldir)
    to_sdf(spark, r_early).coalesce(1).write.mode("overwrite").parquet(rdir)
    _time.sleep(1.2)
    to_sdf(spark, l_late).coalesce(1).write.mode("append").parquet(ldir)
    to_sdf(spark, r_late).coalesce(1).write.mode("append").parquet(rdir)

    lschema = spark.read.parquet(ldir).schema
    rschema = spark.read.parquet(rdir).schema
    ls = (spark.readStream.schema(lschema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(rschema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    out = stream_asof(ls, rs, on="timestamp", by="entity",
                      right_value="value")
    q = (out.writeStream.format("memory").queryName("asof_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM asof_test").toPandas()
           .set_index("click_id").sort_index())

    # batch dispatch on the full data = the oracle
    lb = pd.concat([l_early, l_late], ignore_index=True)
    rb = pd.concat([r_early, r_late], ignore_index=True)
    exp = (stream_asof(to_sdf(spark, lb), to_sdf(spark, rb),
                       on="timestamp", by="entity", right_value="value")
           .toPandas().set_index("click_id").sort_index())
    pd.testing.assert_series_equal(got.value_asof, exp.value_asof)
    # the cross-batch case: a's minute-30 click joins the minute-0 quote
    assert got.loc[11, "value_asof"] == 5.0
    # b's first click precedes any quote
    assert pd.isna(got.loc[20, "value_asof"])
    assert got.loc[21, "value_asof"] == 9.0


def test_stream_asof_tolerance_and_ties(spark):
    """Batch dispatch: tolerance bounds the lookback; right rows at the
    exact left key match (allow_exact_matches)."""
    from catabra_pandas_spark.streaming import stream_asof

    left = pd.DataFrame({"entity": [1, 1, 1], "t": [10, 20, 100],
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"entity": [1, 1], "t": [10, 15], "value": [1.0, 2.0]})
    out = (stream_asof(to_sdf(spark, left), to_sdf(spark, right),
                       on="t", by="entity", right_value="value",
                       tolerance=10)
           .toPandas().set_index("lid").sort_index())
    assert out.loc[0, "value_asof"] == 1.0    # exact-key match
    assert out.loc[1, "value_asof"] == 2.0    # within tolerance
    assert pd.isna(out.loc[2, "value_asof"])  # 100 - 15 > 10


def test_stream_asof_state_timeout(spark, tmp_path):
    """Event-time timeout: with a watermark, a group's (last right key,
    value) state expires once the watermark passes its last event by the
    watermark interval — a later left row then emits UNMATCHED instead of
    joining a stale quote."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_asof

    base = pd.Timestamp("2026-04-01")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # batch 1: entity 'a' gets a quote at t=0
    r1 = pd.DataFrame({"entity": ["a"], "timestamp": [mins(0)], "value": [5.0]})
    l1 = pd.DataFrame({"entity": ["a"], "timestamp": [mins(1)], "click_id": [0]})
    # batch 2: other-entity traffic far in the future advances the
    # watermark past a's timeout (10-minute watermark, events at +6h)
    r2 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(360)], "value": [1.0]})
    l2 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(361)], "click_id": [90]})
    # batch 3: z-only traffic — 'a' has NO data here, so its expiry fires
    # (a timed-out group that receives data in the same batch is invoked
    # with the data instead, state intact)
    r3 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(370)], "value": [2.0]})
    l3 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(371)], "click_id": [91]})
    # batch 4: a's next click — state must be gone
    l4 = pd.DataFrame({"entity": ["a"], "timestamp": [mins(400)], "click_id": [1]})
    r4 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(400)], "value": [3.0]})

    ldir, rdir = str(tmp_path / "asto_l"), str(tmp_path / "asto_r")
    for i, (lpdf, rpdf) in enumerate([(l1, r1), (l2, r2), (l3, r3), (l4, r4)]):
        mode = "overwrite" if i == 0 else "append"
        to_sdf(spark, lpdf).coalesce(1).write.mode(mode).parquet(ldir)
        to_sdf(spark, rpdf).coalesce(1).write.mode(mode).parquet(rdir)
        _time.sleep(1.2)

    ls = (spark.readStream.schema(spark.read.parquet(ldir).schema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(spark.read.parquet(rdir).schema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    out = stream_asof(ls, rs, on="timestamp", by="entity",
                      right_value="value", watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("asof_timeout")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM asof_timeout").toPandas()
           .set_index("click_id").sort_index())

    assert got.loc[0, "value_asof"] == 5.0      # in-horizon join
    assert pd.isna(got.loc[1, "value_asof"])    # state expired at +6h watermark
    assert got.loc[90, "value_asof"] == 1.0


def test_stream_asof_float_keys(spark, tmp_path):
    """Fractional `on` keys keep a float64 key space (double state field)
    instead of truncating to int64: a left row at t=1.2 must NOT join a
    right row at t=1.9 (under truncation both became key 1 and the
    right-before-left tie order joined the future quote), and tolerance
    keeps sub-unit precision.  Streaming result == exact batch dispatch."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_asof

    l1 = pd.DataFrame({"entity": [1], "t": [1.2], "lid": [0]})
    r1 = pd.DataFrame({"entity": [1, 1], "t": [0.5, 1.9],
                       "value": [1.0, 2.0]})
    l2 = pd.DataFrame({"entity": [1, 1], "t": [2.0, 9.0], "lid": [1, 2]})
    r2 = pd.DataFrame({"entity": [1], "t": [8.4], "value": [3.0]})
    ldir, rdir = str(tmp_path / "asf_l"), str(tmp_path / "asf_r")
    for i, (lpdf, rpdf) in enumerate([(l1, r1), (l2, r2)]):
        mode = "overwrite" if i == 0 else "append"
        to_sdf(spark, lpdf).coalesce(1).write.mode(mode).parquet(ldir)
        to_sdf(spark, rpdf).coalesce(1).write.mode(mode).parquet(rdir)
        _time.sleep(1.2)

    ls = (spark.readStream.schema(spark.read.parquet(ldir).schema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(spark.read.parquet(rdir).schema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    out = stream_asof(ls, rs, on="t", by="entity", right_value="value",
                      tolerance=0.7)
    q = (out.writeStream.format("memory").queryName("asof_float")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM asof_float").toPandas()
           .set_index("lid").sort_index())

    assert got.loc[0, "value_asof"] == 1.0    # 1.2 joins 0.5, NOT 1.9
    assert got.loc[1, "value_asof"] == 2.0    # 2.0 - 1.9 = 0.1 <= 0.7
    assert got.loc[2, "value_asof"] == 3.0    # 9.0 - 8.4 = 0.6 <= 0.7

    lb, rb = pd.concat([l1, l2], ignore_index=True), \
        pd.concat([r1, r2], ignore_index=True)
    exp = (stream_asof(to_sdf(spark, lb), to_sdf(spark, rb), on="t",
                       by="entity", right_value="value", tolerance=0.7)
           .toPandas().set_index("lid").sort_index())
    pd.testing.assert_series_equal(got.value_asof, exp.value_asof)


def test_stream_asof_rejects_nonnumeric_key(spark, tmp_path):
    """A string `on` key raises up front on the streaming path instead of
    silently producing a divergent int-cast keyspace."""
    import pytest

    from catabra_pandas_spark.streaming import stream_asof

    lpdf = pd.DataFrame({"entity": [1], "t": ["x"], "lid": [0]})
    rpdf = pd.DataFrame({"entity": [1], "t": ["y"], "value": [1.0]})
    ldir, rdir = str(tmp_path / "asr_l"), str(tmp_path / "asr_r")
    to_sdf(spark, lpdf).write.mode("overwrite").parquet(ldir)
    to_sdf(spark, rpdf).write.mode("overwrite").parquet(rdir)
    ls = spark.readStream.schema(spark.read.parquet(ldir).schema).parquet(ldir)
    rs = spark.readStream.schema(spark.read.parquet(rdir).schema).parquet(rdir)
    with pytest.raises(ValueError, match="day-time interval or numeric"):
        stream_asof(ls, rs, on="t", by="entity", right_value="value")


def test_stream_asof_interval_key(spark, tmp_path):
    """DayTimeIntervalType `on` keys on the STREAMING path: same int64
    microsecond key space as timestamps (intervals are microsecond-
    quantized internally), tolerance in seconds, state carried across
    micro-batches.  Streaming result == exact batch merge_asof dispatch
    on the same data."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_asof

    mk = lambda pdf: (to_sdf(spark, pdf).withColumn(  # noqa: E731
        "t", F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("t"))))
    # sub-second fractions: 1.2 must NOT join 1.9 (truncation hazard),
    # and entity state must carry quote t=1.9 into batch 2
    l1 = pd.DataFrame({"entity": [1], "t": [1.2], "lid": [0]})
    r1 = pd.DataFrame({"entity": [1, 1], "t": [0.5, 1.9],
                       "value": [1.0, 2.0]})
    l2 = pd.DataFrame({"entity": [1, 1], "t": [2.0, 9.0], "lid": [1, 2]})
    r2 = pd.DataFrame({"entity": [1], "t": [8.4], "value": [3.0]})
    ldir, rdir = str(tmp_path / "asi_l"), str(tmp_path / "asi_r")
    for i, (lpdf, rpdf) in enumerate([(l1, r1), (l2, r2)]):
        mode = "overwrite" if i == 0 else "append"
        mk(lpdf).coalesce(1).write.mode(mode).parquet(ldir)
        mk(rpdf).coalesce(1).write.mode(mode).parquet(rdir)
        _time.sleep(1.2)

    ls = (spark.readStream.schema(spark.read.parquet(ldir).schema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(spark.read.parquet(rdir).schema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    out = stream_asof(ls, rs, on="t", by="entity", right_value="value",
                      tolerance=0.7)
    q = (out.writeStream.format("memory").queryName("asof_itv")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM asof_itv").toPandas()
           .set_index("lid").sort_index())

    assert got.loc[0, "value_asof"] == 1.0    # 1.2s joins 0.5s, NOT 1.9s
    assert got.loc[1, "value_asof"] == 2.0    # 2.0 - 1.9 = 0.1 <= 0.7
    assert got.loc[2, "value_asof"] == 3.0    # 9.0 - 8.4 = 0.6 <= 0.7

    lb, rb = pd.concat([l1, l2], ignore_index=True), \
        pd.concat([r1, r2], ignore_index=True)
    exp = (stream_asof(mk(lb), mk(rb), on="t", by="entity",
                       right_value="value", tolerance=0.7)
           .toPandas().set_index("lid").sort_index())
    pd.testing.assert_series_equal(got.value_asof, exp.value_asof)


def test_stream_funnel_state_timeout(spark, tmp_path):
    """stream_funnel event-time timeout: an entity's matched-stage state
    expires once the watermark passes its last event by the watermark
    interval, so a later step-2 event starts a fresh funnel instead of
    completing the stale one."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_funnel

    base = pd.Timestamp("2026-05-01")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    b1 = pd.DataFrame({"entity": ["a"], "timestamp": [mins(0)],
                       "event_type": ["view"]})
    # far-future traffic for another entity advances the watermark
    b2 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(360)],
                       "event_type": ["view"]})
    b3 = pd.DataFrame({"entity": ["z"], "timestamp": [mins(370)],
                       "event_type": ["click"]})
    # a's click arrives after its state expired: no stage-0 view on
    # record anymore -> no funnel row for the click alone
    b4 = pd.DataFrame({"entity": ["a"], "timestamp": [mins(400)],
                       "event_type": ["click"]})
    src = str(tmp_path / "funnel_timeout_src")
    for i, pdf in enumerate([b1, b2, b3, b4]):
        to_sdf(spark, pdf).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append").parquet(src)
        _time.sleep(1.2)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_funnel(stream, ["view", "click"], watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("funnel_timeout")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM funnel_timeout").toPandas()

    # a reached stage 1 in batch 1; after expiry its batch-4 click matches
    # nothing (stage 0 must come first), so a's LAST emitted row is still
    # n_stages=1, unconverted — without the timeout it would show 2/True
    last_a = got[got.entity == "a"].iloc[-1]
    assert last_a.n_stages == 1 and not last_a.converted
    last_z = got[got.entity == "z"].iloc[-1]
    assert last_z.n_stages == 2 and last_z.converted


def test_stream_asof_numeric_key(spark, tmp_path):
    """Streaming with a NUMERIC ordering key (long micros, no watermark):
    state carries across micro-batches; tolerance is in raw key units;
    watermark is refused (event-time timeout needs a timestamp key)."""
    import time as _time

    from catabra_pandas_spark.streaming import stream_asof

    l1 = pd.DataFrame({"entity": [1], "t": [100], "lid": [0]})
    r1 = pd.DataFrame({"entity": [1], "t": [90], "value": [7.0]})
    l2 = pd.DataFrame({"entity": [1, 1], "t": [150, 500], "lid": [1, 2]})
    r2 = pd.DataFrame({"entity": [1], "t": [140], "value": [8.0]})
    ldir, rdir = str(tmp_path / "num_l"), str(tmp_path / "num_r")
    to_sdf(spark, l1).coalesce(1).write.mode("overwrite").parquet(ldir)
    to_sdf(spark, r1).coalesce(1).write.mode("overwrite").parquet(rdir)
    _time.sleep(1.2)
    to_sdf(spark, l2).coalesce(1).write.mode("append").parquet(ldir)
    to_sdf(spark, r2).coalesce(1).write.mode("append").parquet(rdir)

    ls = (spark.readStream.schema(spark.read.parquet(ldir).schema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(spark.read.parquet(rdir).schema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    out = stream_asof(ls, rs, on="t", by="entity", right_value="value",
                      tolerance=100)
    q = (out.writeStream.format("memory").queryName("asof_num")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM asof_num").toPandas()
           .set_index("lid").sort_index())
    assert got.loc[0, "value_asof"] == 7.0    # batch-1 state
    assert got.loc[1, "value_asof"] == 8.0    # in-batch right row
    assert pd.isna(got.loc[2, "value_asof"])  # 500 - 140 > tolerance 100

    with pytest.raises(ValueError, match="timestamp"):
        stream_asof(ls, rs, on="t", by="entity", right_value="value",
                    watermark="10 minutes")


def test_stream_asof_rejects_wide_decimal_keys(spark, tmp_path):
    """Decimal `on` keys wider than float64's 15 exactly-representable
    digits are rejected up front on the streaming path: the state keeps
    keys as float64, so a decimal(20,2) could collide/reorder in the
    stream while the exact batch dispatch compares full precision.
    Narrow decimals (<= 15 digits) still plan fine."""
    import pytest

    from catabra_pandas_spark.streaming import stream_asof

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.sql("SELECT 1L AS entity, CAST(1.5 AS DECIMAL(20,2)) AS t, "
              "0L AS lid").write.parquet(lsrc)
    spark.sql("SELECT 1L AS entity, CAST(1.0 AS DECIMAL(20,2)) AS t, "
              "2.0D AS value").write.parquet(rsrc)
    ls = spark.readStream.schema(
        "entity long, t decimal(20,2), lid long").parquet(lsrc)
    rs = spark.readStream.schema(
        "entity long, t decimal(20,2), value double").parquet(rsrc)
    with pytest.raises(ValueError, match="decimal"):
        stream_asof(ls, rs, on="t", by="entity", right_value="value")

    # decimal(12,2) fits float64 exactly -> accepted at plan time
    ls2 = spark.readStream.schema(
        "entity long, t decimal(12,2), lid long").parquet(lsrc)
    rs2 = spark.readStream.schema(
        "entity long, t decimal(12,2), value double").parquet(rsrc)
    stream_asof(ls2, rs2, on="t", by="entity", right_value="value")


from hypothesis import given as _hyp_given, settings as _hyp_settings
from hypothesis import strategies as _st

_ab_keys = _st.integers(min_value=0, max_value=2)
_ab_mins = _st.integers(min_value=0, max_value=9)


@_hyp_given(
    left=_st.lists(_st.tuples(_ab_keys, _ab_mins), min_size=0, max_size=8),
    right=_st.lists(_st.tuples(_ab_keys, _ab_mins), min_size=0, max_size=6),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_asof_cross_batch_property(spark, left, right, cut):
    """Randomized CROSS-BATCH state: random (entity, minute) events split
    into two micro-batches at an event-time cut (every batch-1 event
    strictly earlier than every batch-2 event — the regime the operator
    documents as exactly batch-equivalent) must reproduce pandas
    merge_asof on the full data.  Sentinel rows pad every file so the
    two sources always deliver the same number of files and the
    time-cut batch pairing holds."""
    import tempfile
    import time as _time
    import uuid

    from catabra_pandas_spark.streaming import stream_asof

    base = pd.Timestamp("2026-04-01")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    SENT = 99  # sentinel entity, dropped from the comparison
    lpdf = pd.DataFrame({
        "entity": pd.Series([k for k, _ in left], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m in left],
                               dtype="datetime64[ns]"),
        "lid": pd.Series(range(len(left)), dtype="int64")})
    rpdf = (pd.DataFrame({
        "entity": pd.Series([k for k, _ in right], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m in right],
                               dtype="datetime64[ns]"),
        "value": pd.Series([float(10 * k + m) for k, m in right],
                           dtype="float64")})
        .drop_duplicates(["entity", "timestamp"]))  # key-tie nuance

    def halves(df, pad_cols):
        lo = df[df.timestamp < mins(cut)]
        hi = df[df.timestamp >= mins(cut)]
        pad_lo = pd.DataFrame([{**pad_cols, "entity": SENT,
                                "timestamp": mins(0)}])
        pad_hi = pd.DataFrame([{**pad_cols, "entity": SENT,
                                "timestamp": mins(cut)}])
        return (pd.concat([lo, pad_lo], ignore_index=True)[df.columns],
                pd.concat([hi, pad_hi], ignore_index=True)[df.columns])

    l1, l2 = halves(lpdf, {"lid": -1})
    r1, r2 = halves(rpdf, {"value": -1.0})
    root = tempfile.mkdtemp()
    ldir, rdir = f"{root}/l", f"{root}/r"
    to_sdf(spark, l1).coalesce(1).write.mode("overwrite").parquet(ldir)
    to_sdf(spark, r1).coalesce(1).write.mode("overwrite").parquet(rdir)
    _time.sleep(1.2)  # file mod-time orders the micro-batches
    to_sdf(spark, l2).coalesce(1).write.mode("append").parquet(ldir)
    to_sdf(spark, r2).coalesce(1).write.mode("append").parquet(rdir)

    ls = (spark.readStream.schema(spark.read.parquet(ldir).schema)
          .option("maxFilesPerTrigger", 1).parquet(ldir))
    rs = (spark.readStream.schema(spark.read.parquet(rdir).schema)
          .option("maxFilesPerTrigger", 1).parquet(rdir))
    name = f"asof_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_asof(ls, rs, on="timestamp", by="entity",
                     right_value="value")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT")
           .sort_values("lid").reset_index(drop=True))

    if len(lpdf) and len(rpdf):
        exp = pd.merge_asof(
            lpdf.sort_values("timestamp", kind="stable"),
            rpdf.sort_values("timestamp", kind="stable"),
            on="timestamp", by="entity", direction="backward"
        ).sort_values("lid").reset_index(drop=True)
        exp_vals = list(exp.value.fillna(-999.0))
    else:
        exp_vals = [-999.0] * len(lpdf)
    assert list(got.lid) == list(lpdf.sort_values("lid").lid)
    assert list(got.value_asof.fillna(-999.0)) == exp_vals


@_hyp_given(
    rows=_st.lists(_st.tuples(_ab_keys, _ab_mins,
                              _st.sampled_from([None, 1.0, 2.0, 5.0])),
                   min_size=1, max_size=10),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_ffill_cross_batch_property(spark, rows, cut):
    """Randomized cross-batch forward fill: random null patterns split
    into two event-time-ordered micro-batches must equal the batch
    impute(ffill) on the full data.  (entity, minute) pairs are deduped
    so order_by ties cannot make either side's pick ambiguous."""
    import tempfile
    import time as _time
    import uuid

    base = pd.Timestamp("2026-04-02")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    SENT = 99
    pdf = (pd.DataFrame({
        "entity": pd.Series([k for k, _, _ in rows], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m, _ in rows],
                               dtype="datetime64[ns]"),
        "value": pd.Series([v for _, _, v in rows], dtype="float64")})
        .drop_duplicates(["entity", "timestamp"]))

    lo = pdf[pdf.timestamp < mins(cut)]
    hi = pdf[pdf.timestamp >= mins(cut)]
    pad = lambda m: pd.DataFrame(  # noqa: E731
        [{"entity": SENT, "timestamp": mins(m), "value": 0.0}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"ffill_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_ffill(stream, value_col="value")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT")
           .set_index(["entity", "timestamp"]).value.sort_index())

    exp = (impute(to_sdf(spark, pdf), method="ffill", columns="value",
                  group_by="entity", order_by="timestamp").toPandas()
           .set_index(["entity", "timestamp"]).value.sort_index())
    assert list(got.index) == list(exp.index)
    assert list(got.fillna(-999.0)) == list(exp.fillna(-999.0))


@_hyp_given(
    events=_st.lists(_st.tuples(_ab_keys, _ab_mins,
                                _st.sampled_from(["view", "cart", "purchase",
                                                  "noise"])),
                     min_size=0, max_size=14),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_funnel_cross_batch_property(spark, events, cut):
    """Randomized cross-batch funnel state (VERDICT r10 #5): random
    (entity, minute, step) events — including repeats, out-of-order
    stages, and non-step noise — split into two event-time-ordered
    micro-batches must end at exactly the batch operator's funnel row
    per entity.  Greedy earliest-completion matching is prefix-stable
    (state after a time prefix = greedy on that prefix), so the time-cut
    split is the regime the operator documents as batch-equivalent."""
    import tempfile
    import time as _time
    import uuid

    from catabra_pandas_spark.operators.events import funnel
    from catabra_pandas_spark.streaming import stream_funnel

    base = pd.Timestamp("2026-04-03")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    pdf = pd.DataFrame({
        "entity": pd.Series([k for k, _, _ in events], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m, _ in events],
                               dtype="datetime64[ns]"),
        "event_type": pd.Series([t for _, _, t in events], dtype="object")})

    lo = pdf[pdf.timestamp < mins(cut)]
    hi = pdf[pdf.timestamp >= mins(cut)]
    SENT = 99
    pad = lambda m: pd.DataFrame(  # noqa: E731
        [{"entity": SENT, "timestamp": mins(m), "event_type": "view"}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"funnel_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_funnel(stream, ["view", "cart", "purchase"])
         .writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT"))
    # update mode: the most-advanced row per entity is the final status
    # (n_stages is monotone across updates; equal-stage refreshes are
    # identical rows)
    final = (got.sort_values("n_stages").groupby("entity").tail(1)
             .reset_index(drop=True))

    if len(pdf) == 0:
        assert len(final) == 0
        return
    exp = funnel(to_sdf(spark, pdf),
                 ["view", "cart", "purchase"]).toPandas()
    assert_pdf_equal(final, exp, sort_by=["entity"])


@_hyp_given(
    rows=_st.lists(_st.tuples(_ab_keys, _ab_mins), min_size=0, max_size=12),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_dedup_cross_batch_property(spark, rows, cut):
    """Randomized cross-batch dedup state: duplicate keys scattered across
    the event-time cut must collapse to ONE row per key — a key first
    seen in batch 1 suppresses its batch-2 duplicates through the
    watermark state.  Every duplicate of a key carries an identical
    payload (a function of the key), so the surviving row is unique and
    the result must equal the batch dedup exactly, independent of
    arrival order inside a micro-batch (which streaming does not
    guarantee)."""
    import tempfile
    import time as _time
    import uuid

    from catabra_pandas_spark.streaming import stream_dedup

    base = pd.Timestamp("2026-04-04")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    pdf = (pd.DataFrame({
        "k": pd.Series([k for k, _ in rows], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m in rows],
                               dtype="datetime64[ns]"),
        "v": pd.Series([float(10 * k) for k, _ in rows], dtype="float64")})
        # one row per (k, minute): the *surviving timestamp* is arrival-
        # order-dependent only among same-key rows; keep payloads keyed
        .drop_duplicates(["k", "timestamp"]))

    lo = pdf[pdf.timestamp < mins(cut)]
    hi = pdf[pdf.timestamp >= mins(cut)]
    SENT = 99
    pad = lambda m: pd.DataFrame(  # noqa: E731
        [{"k": SENT, "timestamp": mins(m), "v": 0.0}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"dedup_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_dedup(stream, subset="k", watermark="1 hour")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT k, v FROM {name}").toPandas()
           .query("k != @SENT").sort_values("k").reset_index(drop=True))

    # exactly one row per distinct key, carrying that key's payload
    exp = (pdf[["k", "v"]].drop_duplicates("k")
           .sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == exp.k.tolist()
    assert got.v.tolist() == exp.v.tolist()


@_hyp_given(
    ivs=_st.lists(_st.tuples(_ab_keys, _ab_mins,
                             _st.integers(min_value=0, max_value=5),
                             _st.sampled_from([1.0, 2.0, 5.0, None])),
                  min_size=0, max_size=10),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_resample_interval_cross_batch_property(spark, ivs, cut):
    """Randomized cross-batch duration-weighted resampling: random
    (entity, start-minute, span, value) intervals split at a start-time
    cut must produce exactly the batch-path result for every window —
    running (entity, window) sums accumulate across micro-batches, and a
    far-future flush batch advances the watermark past every real
    window so append mode emits them all (sentinel rows excluded from
    the comparison)."""
    import tempfile
    import time as _time
    import uuid

    from catabra_pandas_spark.streaming import stream_resample_interval

    base = pd.Timestamp("2026-04-05")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    pdf = pd.DataFrame({
        "entity": pd.Series([k for k, _, _, _ in ivs], dtype="int64"),
        "start": pd.Series([mins(m) for _, m, _, _ in ivs],
                           dtype="datetime64[ns]"),
        "stop": pd.Series([mins(m + s) for _, m, s, _ in ivs],
                          dtype="datetime64[ns]"),
        "attribute": pd.Series(["a"] * len(ivs), dtype="object"),
        "value": pd.Series([v for _, _, _, v in ivs], dtype="float64")})

    lo = pdf[pdf.start < mins(cut)]
    hi = pdf[pdf.start >= mins(cut)]
    SENT = 99
    pad = lambda m: pd.DataFrame([{  # noqa: E731
        "entity": SENT, "start": mins(m), "stop": mins(m),
        "attribute": "a", "value": 1.0}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]
    flush = pad(10_000)[pdf.columns]  # batch 3: watermark passes all real windows

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, flush).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"sri_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_resample_interval(stream, ["a"], "2 minutes",
                                  watermark="10 minutes")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT")
           .set_index(["entity", "window_start"]).a.sort_index())

    if len(pdf) == 0:
        assert len(got) == 0
        return
    exp = (stream_resample_interval(to_sdf(spark, pdf), ["a"], "2 minutes")
           .toPandas()
           .set_index(["entity", "window_start"]).a.sort_index())
    import numpy as np
    assert list(got.index) == list(exp.index)
    assert np.allclose(got.values, exp.values, rtol=1e-9)


@_hyp_given(
    rows=_st.lists(_st.tuples(_ab_keys, _ab_mins,
                              _st.sampled_from(["hr", "bp"]),
                              _st.sampled_from([1.0, 2.0, 5.0, None])),
                   min_size=0, max_size=12),
    cut=_st.sampled_from([2, 5, 8]),
    slide=_st.sampled_from([None, "2 minutes"]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_resample_eav_cross_batch_property(spark, rows, cut, slide):
    """Randomized cross-batch regular-window resampling, tumbling AND
    sliding: per-(entity, window, attribute) aggregates accumulate
    across the event-time cut, and the far-future flush batch advances
    the watermark so append mode emits every real window — must equal
    the batch dispatch of the same call exactly (counts/min/max exact;
    mean under float tolerance)."""
    import tempfile
    import time as _time
    import uuid

    import numpy as np

    from catabra_pandas_spark.streaming import stream_resample_eav

    base = pd.Timestamp("2026-04-06")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    pdf = pd.DataFrame({
        "entity": pd.Series([k for k, _, _, _ in rows], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m, _, _ in rows],
                               dtype="datetime64[ns]"),
        "attribute": pd.Series([a for _, _, a, _ in rows], dtype="object"),
        "value": pd.Series([v for _, _, _, v in rows], dtype="float64")})

    lo = pdf[pdf.timestamp < mins(cut)]
    hi = pdf[pdf.timestamp >= mins(cut)]
    SENT = 99
    pad = lambda m: pd.DataFrame([{  # noqa: E731
        "entity": SENT, "timestamp": mins(m), "attribute": "hr",
        "value": 1.0}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]
    flush = pad(10_000)[pdf.columns]

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, flush).coalesce(1).write.mode("append").parquet(src)

    agg = {"hr": ["count", "min", "mean"], "bp": ["max", "count"]}
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"sre_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_resample_eav(stream, agg, "2 minutes", slide=slide,
                             watermark="10 minutes")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT")
           .set_index(["entity", "window_start"]).sort_index())

    if len(pdf) == 0:
        assert len(got) == 0
        return
    exp = (stream_resample_eav(to_sdf(spark, pdf), agg, "2 minutes",
                               slide=slide).toPandas()
           .set_index(["entity", "window_start"]).sort_index())
    assert list(got.index) == list(exp.index)
    for c in ("hr_count", "bp_count", "hr_min", "bp_max"):
        a = got[c].astype(float).fillna(-999.0)
        b = exp[c].astype(float).fillna(-999.0)
        assert a.tolist() == b.tolist(), c
    assert np.allclose(got["hr_mean"].astype(float).fillna(-999.0),
                       exp["hr_mean"].astype(float).fillna(-999.0),
                       rtol=1e-9), "hr_mean"


@_hyp_given(
    rows=_st.lists(_st.tuples(_ab_keys, _ab_mins,
                              _st.sampled_from([1.0, 2.0, 5.0])),
                   min_size=0, max_size=14),
    cut=_st.sampled_from([2, 5, 8]))
@_hyp_settings(max_examples=4, deadline=None)
def test_stream_sessionize_cross_batch_property(spark, rows, cut):
    """Randomized cross-batch session state (completes the tier: the
    seventh and last stateful operator gets the deterministic
    time-cut harness).  Random (entity, minute, value) events split into
    two event-time-ordered micro-batches: sessions SPANNING the cut must
    merge in session_window state across batches, and a far-future flush
    batch advances the watermark past every real session so append mode
    emits each exactly once.  Oracle: an independent pandas gap-scan
    replay with the INCLUSIVE gap rule (an event exactly at session end
    merges — the r10-documented session_window subtlety)."""
    import tempfile
    import time as _time
    import uuid

    from catabra_pandas_spark.streaming import stream_sessionize

    base = pd.Timestamp("2026-04-07")
    mins = lambda m: base + pd.Timedelta(minutes=int(m))  # noqa: E731
    pdf = (pd.DataFrame({
        "entity": pd.Series([k for k, _, _ in rows], dtype="int64"),
        "timestamp": pd.Series([mins(m) for _, m, _ in rows],
                               dtype="datetime64[ns]"),
        "value": pd.Series([v for _, _, v in rows], dtype="float64")})
        .drop_duplicates(["entity", "timestamp"]))

    lo = pdf[pdf.timestamp < mins(cut)]
    hi = pdf[pdf.timestamp >= mins(cut)]
    SENT = 99
    pad = lambda m: pd.DataFrame([{  # noqa: E731
        "entity": SENT, "timestamp": mins(m), "value": 0.0}])
    h1 = pd.concat([lo, pad(0)], ignore_index=True)[pdf.columns]
    h2 = pd.concat([hi, pad(cut)], ignore_index=True)[pdf.columns]
    flush = pad(10_000)[pdf.columns]

    src = tempfile.mkdtemp() + "/src"
    to_sdf(spark, h1).coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, h2).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    to_sdf(spark, flush).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"sess_prop_{uuid.uuid4().hex[:8]}"
    q = (stream_sessionize(stream, "3 minutes", watermark="5 minutes",
                           agg={"value": ["sum", "count"]})
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .query("entity != @SENT")
           .drop(columns=["window_start", "window_stop"])
           .sort_values(["entity", "session_start"])
           .reset_index(drop=True))

    # independent oracle: per-entity gap scan, INCLUSIVE 3-minute gap
    exp_rows = []
    for ent, sub in pdf.groupby("entity"):
        sub = sub.sort_values("timestamp")
        cur = []
        for _, r in sub.iterrows():
            if cur and (r.timestamp - cur[-1].timestamp
                        ) > pd.Timedelta(minutes=3):
                exp_rows.append((ent, cur))
                cur = []
            cur.append(r)
        if cur:
            exp_rows.append((ent, cur))
    exp = pd.DataFrame([{
        "entity": ent,
        "session_start": evs[0].timestamp,
        "session_stop": evs[-1].timestamp,
        "n_events": len(evs),
        "value_sum": float(sum(e.value for e in evs)),
        "value_count": len(evs),
    } for ent, evs in exp_rows]).sort_values(
        ["entity", "session_start"]).reset_index(drop=True) \
        if exp_rows else pd.DataFrame(columns=got.columns)

    assert len(got) == len(exp)
    if len(exp):
        for c in ("entity", "session_start", "session_stop", "n_events",
                  "value_count"):
            assert got[c].tolist() == exp[c].tolist(), c
        import numpy as np
        assert np.allclose(got["value_sum"], exp["value_sum"], rtol=1e-12)


def test_map_only_curation_ops_run_on_streams(spark, tmp_path):
    """The zero-shuffle curation operators are streaming-compatible by
    construction (pure projections / stateless mapInPandas): the SAME
    operator call works unchanged on a readStream source and produces
    batch-identical rows — the property that lets a 100 TB pipeline
    reuse one cleaning/sharding/featurization definition for both its
    backfill and its live-ingest paths."""
    from catabra_pandas_spark.pipeline import (assign_shards,
                                               hashed_tf_embedding,
                                               normalize_text, strip_html)

    rows = [(1, "<p>Café &amp; BAR</p>"), (2, "plain  TEXT here"),
            (3, "<div>líne one</div><div>line two</div>")]
    src_dir = str(tmp_path / "docs_src")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src_dir)
    schema = "doc_id long, text string"

    def pipeline(df):
        out = strip_html(df)
        out = normalize_text(out)
        out = assign_shards(out, on="doc_id", n_shards=4)
        emb = hashed_tf_embedding(out.select("doc_id",
                                             F.col("text_norm").alias("text")),
                                  dim=8)
        return out, emb

    batch_df = spark.read.schema(schema).parquet(src_dir)
    b_out, b_emb = pipeline(batch_df)
    stream_df = spark.readStream.schema(schema).parquet(src_dir)
    s_out, s_emb = pipeline(stream_df)
    assert s_out.isStreaming and s_emb.isStreaming

    q1 = (s_out.writeStream.format("memory").queryName("clean_stream")
          .outputMode("append").trigger(availableNow=True).start())
    q1.awaitTermination(60)
    q2 = (s_emb.writeStream.format("memory").queryName("emb_stream")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(60)

    got = {r["doc_id"]: (r["text_norm"], r["shard"], r["shard_order"])
           for r in spark.sql("SELECT * FROM clean_stream").collect()}
    exp = {r["doc_id"]: (r["text_norm"], r["shard"], r["shard_order"])
           for r in b_out.collect()}
    assert got == exp and len(got) == 3
    assert got[1][0] == "cafe & bar"
    got_emb = {r["doc_id"]: list(r["embedding"])
               for r in spark.sql("SELECT * FROM emb_stream").collect()}
    exp_emb = {r["doc_id"]: list(r["embedding"]) for r in b_emb.collect()}
    assert got_emb == exp_emb
