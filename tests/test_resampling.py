from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from catabra_pandas_spark import make_windows, resample_eav, resample_interval
from .conftest import assert_pdf_equal, to_sdf


def _eav_data(seed, n=600, n_entities=12, attrs=("hr", "bp", "temp")):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "entity": rng.integers(0, n_entities, n),
        "timestamp": rng.uniform(0, 100, n).round(2),
        "attribute": rng.choice(attrs, n),
        "value": rng.normal(50, 10, n).round(2),
    })
    df.loc[rng.random(n) < 0.15, "value"] = np.nan
    df.loc[rng.random(n) < 0.05, "timestamp"] = np.nan
    df["obs_id"] = np.arange(n)
    return df


def _windows(seed, n_entities=12, per_entity=4, overlapping=True, na_frac=0.0):
    rng = np.random.default_rng(seed + 1000)
    rows = []
    for e in range(n_entities):
        for _ in range(per_entity):
            s = rng.uniform(0, 80)
            d = rng.uniform(5, 30) if overlapping else 10
            rows.append((e, round(s, 2), round(s + d, 2)))
    w = pd.DataFrame(rows, columns=["entity", "timestamp_start", "timestamp_stop"])
    if na_frac:
        w.loc[rng.random(len(w)) < na_frac, "timestamp_start"] = np.nan
    w["win_id"] = np.arange(len(w))
    return w


def _slow_eav(df, win, agg, include_start=True, include_stop=True):
    """Per-window python loop oracle (reference tests/util.py:13-130 pattern)."""
    out = win.copy()
    for a, fns in agg.items():
        if not isinstance(fns, list):
            fns = [fns]
        for fn in fns:
            vals = []
            for _, w in win.iterrows():
                sub = df[(df.entity == w.entity) & (df.attribute == a) & df.timestamp.notna()]
                lo = sub.timestamp >= w.timestamp_start if include_start else sub.timestamp > w.timestamp_start
                hi = sub.timestamp <= w.timestamp_stop if include_stop else sub.timestamp < w.timestamp_stop
                if pd.isna(w.timestamp_start) or pd.isna(w.timestamp_stop):
                    sub = sub.iloc[:0]
                else:
                    sub = sub[lo & hi]
                sub = sub.sort_values(["timestamp", "obs_id"])
                v = sub.value
                vv = v.dropna()
                if fn == "mean":
                    r = vv.mean()
                elif fn == "min":
                    r = vv.min()
                elif fn == "max":
                    r = vv.max()
                elif fn == "sum":
                    r = vv.sum() if len(vv) else np.nan
                elif fn == "prod":
                    r = vv.prod() if len(vv) else np.nan
                elif fn == "median":
                    r = vv.median()
                elif fn == "p25":
                    r = vv.quantile(0.25)
                elif fn == "std":
                    r = vv.std()
                elif fn == "var":
                    r = vv.var()
                elif fn == "sem":
                    r = vv.sem()
                elif fn == "skew":
                    r = vv.skew() if len(vv) >= 3 else np.nan
                elif fn == "mad":
                    r = (vv - vv.mean()).abs().mean()
                elif fn == "size":
                    r = len(sub)
                elif fn == "count":
                    r = len(vv)
                elif fn == "nunique":
                    r = vv.nunique()
                elif fn == "mode":
                    if len(vv):
                        vc = vv.value_counts()
                        r = sorted(vc[vc == vc.max()].index)[0]
                    else:
                        r = np.nan
                elif fn == "mode_count":
                    r = vv.value_counts().max() if len(vv) else 0
                elif fn.startswith("r") or fn.startswith("t"):
                    k = int(fn[1:])
                    col = sub.value if fn[0] == "r" else sub.timestamp
                    try:
                        r = col.iloc[k] if k >= 0 or -k <= len(col) else np.nan
                        if k >= len(col):
                            r = np.nan
                    except IndexError:
                        r = np.nan
                else:
                    raise AssertionError(fn)
                vals.append(r)
            out[f"{a}_{fn}"] = vals
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("incl", [(True, True), (True, False), (False, False)])
def test_resample_eav_standard(spark, seed, incl):
    df = _eav_data(seed)
    win = _windows(seed, na_frac=0.1)
    agg = {"hr": ["mean", "min", "max", "sum", "count", "size"],
           "bp": ["median", "p25", "std", "var", "nunique"],
           "temp": ["sem", "mad", "skew", "prod"]}
    out = resample_eav(
        to_sdf(spark, df), to_sdf(spark, win), agg,
        include_start=incl[0], include_stop=incl[1], tiebreak_col="obs_id",
    ).toPandas()
    exp = _slow_eav(df, win, agg, *incl)
    assert_pdf_equal(out, exp, sort_by=["win_id"])


@pytest.mark.parametrize("incl", [(True, True), (True, False),
                                  (False, True), (False, False)])
def test_resample_eav_regular_grid_fast_path(spark, incl):
    """An aligned constant-duration (tumbling) grid takes the arithmetic
    window-assignment fast path (reference resampling.py:1738-1763); its
    results must equal the generic interval-join path for all four endpoint
    combinations, including boundary observations, observations before the
    first window, and null-endpoint windows."""
    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "entity": rng.integers(0, 6, n),
        "timestamp": rng.integers(-50, 1000, n).astype("int64"),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.normal(50, 10, n).round(2),
    })
    # force exact boundary hits
    df.loc[:40, "timestamp"] = rng.choice([0, 100, 200, 500], 41)
    df["obs_id"] = np.arange(n)
    rows = [(e, s, s + 100.0) for e in range(6) for s in range(0, 1000, 100)]
    win = pd.DataFrame(rows, columns=["entity", "timestamp_start", "timestamp_stop"])
    win["win_id"] = np.arange(len(win))
    agg = {"hr": ["mean", "count", "sum"], "bp": ["max", "size"]}

    recs = [(int(e), None if i == 3 else int(s), int(p), int(w))  # null start: invalid window
            for i, (e, s, p, w) in enumerate(win.itertuples(index=False))]
    sdf = to_sdf(spark, df)
    swin = spark.createDataFrame(
        recs, "entity long, timestamp_start long, timestamp_stop long, win_id long")
    fast = resample_eav(sdf, swin, agg, include_start=incl[0],
                        include_stop=incl[1], tiebreak_col="obs_id")
    # the fast path joins on the derived window index
    assert "__w_idx__" in fast._jdf.queryExecution().executedPlan().toString()
    slow = resample_eav(sdf, swin, agg, include_start=incl[0],
                        include_stop=incl[1], tiebreak_col="obs_id",
                        regular=False).toPandas()
    assert_pdf_equal(fast.toPandas(), slow, sort_by=["win_id"])


def test_resample_eav_explicit_grid_tuple(spark):
    """regular=(origin, duration) takes the fast path with no probe job and
    must equal the probed auto path."""
    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "entity": rng.integers(0, 4, 200),
        "timestamp": rng.integers(0, 800, 200).astype("int64"),
        "attribute": rng.choice(["hr", "bp"], 200),
        "value": rng.normal(0, 1, 200).round(2),
        "obs_id": np.arange(200),
    })
    rows = [(e, s, s + 100) for e in range(4) for s in range(0, 800, 100)]
    win = pd.DataFrame(rows, columns=["entity", "timestamp_start", "timestamp_stop"])
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    agg = {"hr": ["mean", "count"]}
    auto = resample_eav(sdf, swin, agg, tiebreak_col="obs_id").toPandas()
    explicit = resample_eav(sdf, swin, agg, tiebreak_col="obs_id",
                            regular=(0, 100)).toPandas()
    assert_pdf_equal(explicit, auto,
                     sort_by=["entity", "timestamp_start"])


@pytest.mark.parametrize("incl", [(True, False), (True, True)])
def test_resample_eav_sliding_grid(spark, incl):
    """regular=(origin, duration, stride) with stride < duration (sliding
    windows): enumerated candidates + residual filter must equal the
    generic interval-join path."""
    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "entity": rng.integers(0, 4, 300),
        "timestamp": rng.integers(-20, 900, 300).astype("int64"),
        "attribute": rng.choice(["hr", "bp"], 300),
        "value": rng.normal(0, 1, 300).round(2),
        "obs_id": np.arange(300),
    })
    df.loc[:20, "timestamp"] = rng.choice([0, 50, 100, 400], 21)  # boundaries
    # sliding: duration 100, stride 50 -> every obs in ~2 windows
    rows = [(e, s, s + 100) for e in range(4) for s in range(0, 900, 50)]
    win = pd.DataFrame(rows, columns=["entity", "timestamp_start", "timestamp_stop"])
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    agg = {"hr": ["mean", "count"], "bp": ["sum"]}
    fast = resample_eav(sdf, swin, agg, include_start=incl[0],
                        include_stop=incl[1], tiebreak_col="obs_id",
                        regular=(0, 100, 50)).toPandas()
    slow = resample_eav(sdf, swin, agg, include_start=incl[0],
                        include_stop=incl[1], tiebreak_col="obs_id",
                        regular=False).toPandas()
    assert_pdf_equal(fast, slow, sort_by=["entity", "timestamp_start"])


def test_resample_eav_irregular_falls_back(spark):
    """Non-constant durations must not take the grid path."""
    df = _eav_data(5)
    df["timestamp"] = (df["timestamp"] * 100).fillna(-1).astype("int64")
    df.loc[df.timestamp < 0, "timestamp"] = None
    win = pd.DataFrame({
        "entity": [0, 0, 1], "timestamp_start": [0, 100, 0],
        "timestamp_stop": [100, 350, 80], "win_id": [0, 1, 2]})
    out = resample_eav(to_sdf(spark, df), spark.createDataFrame(win),
                       {"hr": ["count"]}, tiebreak_col="obs_id")
    assert "__w_idx__" not in out._jdf.queryExecution().executedPlan().toString()


def test_resample_eav_mode_ranks(spark):
    df = _eav_data(2)
    # make values coarse so modes are meaningful
    df["value"] = (df["value"] / 10).round()
    win = _windows(2)
    agg = {"hr": ["mode", "mode_count", "r0", "r-1", "r1"],
           "bp": ["t0", "t-1"]}
    # defaults: include_start=True, include_stop=False (reference parity)
    out = resample_eav(to_sdf(spark, df), to_sdf(spark, win), agg,
                       tiebreak_col="obs_id").toPandas()
    exp = _slow_eav(df, win, agg, include_start=True, include_stop=False)
    assert_pdf_equal(out, exp, sort_by=["win_id"])


def test_resample_eav_half_infinite_and_custom(spark):
    df = _eav_data(3)
    win = _windows(3).drop(columns=["timestamp_start"])  # -inf start

    def myrange(s):
        return float(s.max() - s.min()) if len(s.dropna()) else None

    out = resample_eav(to_sdf(spark, df), to_sdf(spark, win),
                       {"hr": ["count", myrange]}).toPandas()

    exp = win.copy()
    counts, ranges = [], []
    for _, w in win.iterrows():
        # default include_stop=False (reference parity) -> strict upper bound
        sub = df[(df.entity == w.entity) & (df.attribute == "hr")
                 & df.timestamp.notna() & (df.timestamp < w.timestamp_stop)]
        counts.append(sub.value.notna().sum())
        vv = sub.value.dropna()
        ranges.append(vv.max() - vv.min() if len(vv) else np.nan)
    exp["hr_count"] = counts
    exp["hr_myrange"] = ranges
    assert_pdf_equal(out, exp, sort_by=["win_id"])


def test_resample_eav_custom_agg_schema_probe(spark):
    """Without custom_agg_schemas, the output type is inferred by probing
    the callable with a dummy Series (reference resampling.py:256-272)."""
    df = _eav_data(4)
    win = _windows(4)

    def n_valid(s):
        return int(s.notna().sum())

    def verdict(s):
        return "some" if s.notna().any() else "none"

    out = resample_eav(to_sdf(spark, df), to_sdf(spark, win),
                       {"hr": [n_valid, verdict]})
    dt = dict(out.dtypes)
    assert dt["hr_n_valid"] == "bigint"
    assert dt["hr_verdict"] == "string"
    pdf = out.toPandas()
    # None = window with no observations at all (the callable never ran)
    assert set(pdf.hr_verdict.dropna().unique()) <= {"some", "none"}
    assert (pdf.loc[pdf.hr_verdict == "some", "hr_n_valid"] > 0).all()


def test_resample_eav_custom_agg_multi_output_and_time(spark):
    """r6 contract extensions: a callable may return a dict of named
    outputs (-> N columns), and a TWO-argument callable receives
    (times, values) — reference resampling.py:128-161 / docs Example 2."""
    from catabra_pandas_spark.operators.resampling import _custom_agg_arity

    assert _custom_agg_arity(lambda s: s.max()) == 1
    assert _custom_agg_arity(lambda t, v: 0.0) == 2
    df = _eav_data(5)
    win = _windows(5)

    def span(s):
        s = s.dropna()
        return {"lo": float(s.min()) if len(s) else None,
                "hi": float(s.max()) if len(s) else None}

    def t_weighted(times, values):
        m = values.notna()
        if not m.any():
            return None
        # value at the LATEST observation time — needs the time axis
        return float(values[m].iloc[times[m].to_numpy().argmax()])

    out = resample_eav(to_sdf(spark, df), to_sdf(spark, win),
                       {"hr": [span, t_weighted]}).toPandas()
    assert {"hr_lo", "hr_hi", "hr_t_weighted"} <= set(out.columns)
    # oracle per window
    for _, w in out.iterrows():
        sub = df[(df.entity == w.entity) & (df.attribute == "hr")
                 & (df.timestamp >= w.timestamp_start)
                 & (df.timestamp < w.timestamp_stop)].dropna(subset=["value"])
        if len(sub):
            assert abs(w.hr_lo - sub.value.min()) < 1e-9
            assert abs(w.hr_hi - sub.value.max()) < 1e-9
            assert abs(w.hr_t_weighted
                       - sub.sort_values("timestamp").value.iloc[-1]) < 1e-9
        else:
            assert pd.isna(w.hr_lo) and pd.isna(w.hr_t_weighted)


def test_resample_eav_custom_agg_duplicate_columns_raise(spark):
    """Two multi-output callables on one attribute sharing an output key
    would produce duplicate columns and ambiguous downstream joins — the
    collision is detected up front with a clear error (ADVICE r6)."""
    df = _eav_data(6)
    win = _windows(6)

    def stats_a(s):
        return {"lo": float(s.min()) if len(s.dropna()) else None}

    def stats_b(s):
        return {"lo": float(s.max()) if len(s.dropna()) else None}

    with pytest.raises(ValueError, match="duplicate output"):
        resample_eav(to_sdf(spark, df), to_sdf(spark, win),
                     {"hr": [stats_a, stats_b]})


def _interval_data(seed, n=300, n_entities=10):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "entity": rng.integers(0, n_entities, n),
        "start": rng.uniform(0, 100, n).round(2),
        "attribute": rng.choice(["drug_a", "drug_b"], n),
        "value": rng.normal(5, 2, n).round(2),
    })
    df["stop"] = df["start"] + rng.uniform(0, 20, n).round(2)
    df.loc[rng.random(n) < 0.3, "stop"] = df["start"]  # zero-length
    df.loc[rng.random(n) < 0.1, "value"] = np.nan
    # a few infinite intervals
    inf_idx = rng.choice(n, 6, replace=False)
    df.loc[inf_idx[:3], "start"] = -np.inf
    df.loc[inf_idx[3:], "stop"] = np.inf
    return df


def _slow_interval(df, win, attrs, epsilon=1e-7):
    """Reference tests/util.py:133-269 pattern."""
    out = win.copy()
    for a in attrs:
        vals = []
        for _, w in win.iterrows():
            if pd.isna(w.timestamp_start) or pd.isna(w.timestamp_stop):
                vals.append(0.0)
                continue
            total = 0.0
            sub = df[(df.entity == w.entity) & (df.attribute == a)
                     & df.start.notna() & df.stop.notna() & (df.start <= df.stop)]
            for _, r in sub.iterrows():
                lo, hi = max(r.start, w.timestamp_start), min(r.stop, w.timestamp_stop)
                if hi < lo:
                    continue
                v = 0.0 if pd.isna(r.value) else r.value
                li = r.stop - r.start
                if li == 0:
                    f = 1.0
                    total += v * f
                elif np.isinf(li):
                    if np.isinf(hi - lo):
                        total += v
                    else:
                        total += epsilon * np.sign(v)
                else:
                    total += v * (hi - lo) / li
            vals.append(total)
        out[a] = vals
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_resample_interval(spark, seed):
    df = _interval_data(seed)
    win = _windows(seed, n_entities=10, na_frac=0.1).rename(
        columns={"timestamp_start": "start_start", "timestamp_stop": "start_stop"})
    sdf = to_sdf(spark, df)
    swin = to_sdf(spark, win)
    out = resample_interval(sdf, swin, attributes=["drug_a", "drug_b"]).toPandas()
    exp = _slow_interval(df, win.rename(columns={
        "start_start": "timestamp_start", "start_stop": "timestamp_stop"}),
        ["drug_a", "drug_b"]).rename(columns={
        "timestamp_start": "start_start", "timestamp_stop": "start_stop"})
    assert_pdf_equal(out, exp, sort_by=["win_id"])


def test_resample_deterministic_across_partitioning(spark):
    """VERDICT r1 "What's wrong" #2: window identity must not depend on plan
    evaluation order.  Run the same resample under different shuffle
    partitioning (a proxy for AQE re-planning / task retries) and require
    byte-identical results; also duplicate a window row and require the
    duplicate to carry the same aggregates."""
    df = _eav_data(7)
    win = _windows(7)
    # duplicate one window row: both copies must get identical (not summed) aggs
    win = pd.concat([win, win.iloc[[0]]], ignore_index=True)
    agg = {"hr": ["count", "mean", "r0"], "bp": ["sum"]}

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        out1 = resample_eav(to_sdf(spark, df), to_sdf(spark, win), agg,
                            tiebreak_col="obs_id").toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        out2 = resample_eav(to_sdf(spark, df), to_sdf(spark, win), agg,
                            tiebreak_col="obs_id").toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert_pdf_equal(out1, out2, sort_by=["win_id", "hr_count"])
    # the duplicated window row agrees with its original
    dup = out1[out1.win_id == win.iloc[0].win_id]
    assert len(dup) == 2
    assert dup.drop(columns=["win_id"]).round(9).drop_duplicates().shape[0] == 1


def test_make_windows(spark):
    df = _eav_data(4)
    sdf = to_sdf(spark, df)
    # relative windows anchored at each observation time
    mw = make_windows(start_rel=-5.0, stop_rel=0.0)
    win = mw(sdf, entity_col="entity", time_col="timestamp")
    assert win.columns == ["entity", "timestamp_start", "timestamp_stop"]
    row = win.filter("timestamp_stop is not null").first()
    assert abs((row["timestamp_stop"] - row["timestamp_start"]) - 5.0) < 1e-9
    # windows from an aggregated source via SQL string
    mw2 = make_windows(
        df="SELECT entity, max(timestamp) AS anchor FROM df GROUP BY entity",
        anchor="anchor", start_rel=-10.0, duration=10.0)
    win2 = mw2(sdf, entity_col="entity", time_col="timestamp")
    assert win2.count() == df.entity.nunique()
    # use in resample_eav end-to-end
    out = resample_eav(sdf, mw2, {"hr": "count"}).toPandas()
    assert len(out) == df.entity.nunique()


@pytest.mark.parametrize("incl", [(True, False), (True, True), (False, False)])
def test_resample_eav_bucketized_equals_join(spark, incl):
    """bucket_width (the irregular-window scale path) must be result-
    identical to the plain entity join."""
    inc_s, inc_p = incl
    df = _eav_data(seed=11)
    win = _windows(seed=11, overlapping=True, na_frac=0.1)
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    agg = {"hr": ["mean", "count"], "bp": ["max", "p25"]}
    base = resample_eav(sdf, swin, agg, include_start=inc_s,
                        include_stop=inc_p, regular=False).toPandas()
    bkt = resample_eav(sdf, swin, agg, include_start=inc_s,
                       include_stop=inc_p, regular=False,
                       bucket_width=7.0).toPandas()
    assert_pdf_equal(bkt, base, sort_by=["win_id"])


def test_resample_interval_bucketized_equals_join(spark):
    """bucket_width path incl. the infinite-interval split must equal the
    plain join (the test data contains +-inf observation intervals)."""
    df = _interval_data(seed=5)
    win = _windows(seed=5, n_entities=10, na_frac=0.1).rename(
        columns={"timestamp_start": "start_start", "timestamp_stop": "start_stop"})
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    base = resample_interval(sdf, swin,
                             attributes=["drug_a", "drug_b"]).toPandas()
    bkt = resample_interval(sdf, swin, attributes=["drug_a", "drug_b"],
                            bucket_width=12.5).toPandas()
    assert_pdf_equal(bkt, base, sort_by=["win_id"])


def test_resample_eav_bucketized_infinite_windows(spark):
    """Windows with +-inf endpoint VALUES route through the plain join
    instead of crashing the bucket explode (regression test)."""
    df = pd.DataFrame({
        "entity": [1, 1, 1],
        "timestamp": [5.0, 15.0, 50.0],
        "attribute": ["hr", "hr", "hr"],
        "value": [1.0, 2.0, 4.0],
    })
    win = pd.DataFrame({
        "entity": [1, 1],
        "timestamp_start": [0.0, 10.0],
        "timestamp_stop": [np.inf, 20.0],
    })
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    base = resample_eav(sdf, swin, {"hr": ["sum", "count"]},
                        regular=False).toPandas()
    bkt = resample_eav(sdf, swin, {"hr": ["sum", "count"]},
                       regular=False, bucket_width=10.0).toPandas()
    assert_pdf_equal(bkt, base, sort_by=["timestamp_start"])
    inf_row = bkt[np.isinf(bkt["timestamp_stop"])]
    assert inf_row["hr_sum"].tolist() == [7.0]


def test_resample_interval_bucketized_infinite_windows(spark):
    df = pd.DataFrame({
        "entity": [1, 1],
        "start": [5.0, 30.0],
        "stop": [15.0, 40.0],
        "attribute": ["drug_a", "drug_a"],
        "value": [10.0, 4.0],
    })
    win = pd.DataFrame({
        "entity": [1, 1],
        "start_start": [0.0, -np.inf],
        "start_stop": [20.0, np.inf],
    })
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    base = resample_interval(sdf, swin, attributes=["drug_a"]).toPandas()
    bkt = resample_interval(sdf, swin, attributes=["drug_a"],
                            bucket_width=10.0).toPandas()
    assert_pdf_equal(bkt, base, sort_by=["start_start"])


def test_resample_eav_approx_percentiles(spark):
    """approx_percentiles bounds per-group memory; at high accuracy the
    sketch must agree closely with the exact percentile."""
    df = _eav_data(seed=3, n=800)
    win = _windows(seed=3, overlapping=False)
    sdf, swin = to_sdf(spark, df), to_sdf(spark, win)
    agg = {"hr": ["median", "p25", "min", "max"]}
    exact = resample_eav(sdf, swin, agg, regular=False).toPandas() \
        .sort_values("win_id").reset_index(drop=True)
    approx = resample_eav(sdf, swin, agg, regular=False,
                          approx_percentiles=10000).toPandas() \
        .sort_values("win_id").reset_index(drop=True)
    for c in ("hr_median", "hr_p25"):
        a, b = exact[c], approx[c]
        mask = a.notna()
        assert (b[mask].notna()).all()
        # percentile_approx returns an OBSERVED value (exact interpolates),
        # so agreement is bounded by the window's value spread, and the
        # sketch value must lie inside the window's [min, max]
        assert (b[mask] >= exact.loc[mask, "hr_min"]).all()
        assert (b[mask] <= exact.loc[mask, "hr_max"]).all()
        spread = exact.loc[mask, "hr_max"] - exact.loc[mask, "hr_min"]
        assert (abs(a[mask] - b[mask]) <= spread + 1e-9).all()


def test_resample_eav_sweep_join_strategy(spark):
    """join_strategy="sweep" (windows=intervals, observations=points)
    produces the same resampled aggregates as the default theta join on
    irregular overlapping windows, including a window with a null
    endpoint (matches nothing) and include-flag variants."""
    import numpy as np
    import pandas as pd

    from catabra_pandas_spark import resample_eav

    rng = np.random.RandomState(17)
    n = 600
    obs = pd.DataFrame({
        "entity": rng.randint(0, 8, n),
        "timestamp": rng.randint(0, 1000, n).astype(float),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.uniform(0, 100, n).round(3),
    })
    m = 60
    win = pd.DataFrame({
        "entity": rng.randint(0, 8, m),
        "timestamp_start": rng.randint(0, 900, m).astype(float),
    })
    win["timestamp_stop"] = win["timestamp_start"] + rng.randint(10, 300, m)
    win.loc[0, "timestamp_stop"] = np.nan  # matches nothing on both paths
    sobs, swin = to_sdf(spark, obs), to_sdf(spark, win)

    agg = {"hr": ["mean", "count", "max"], "bp": ["sum", "min"]}
    for inc in ((True, False), (True, True), (False, False)):
        kw = dict(include_start=inc[0], include_stop=inc[1], regular=False)
        d = resample_eav(sobs, swin, agg, **kw).toPandas()
        s = resample_eav(sobs, swin, agg, join_strategy="sweep", **kw).toPandas()
        cols = sorted(d.columns)
        assert sorted(s.columns) == cols
        a2 = s[cols].sort_values(cols).reset_index(drop=True)
        b2 = d[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a2, b2, check_like=True)


def test_resample_interval_sweep_join_strategy(spark):
    """resample_interval(join_strategy="sweep") equals the direct join,
    including zero-length intervals, infinite observation endpoints
    (epsilon rule), and a null-endpoint window (matches nothing)."""
    import numpy as np
    import pandas as pd

    from catabra_pandas_spark import resample_interval

    rng = np.random.RandomState(23)
    n = 400
    obs = pd.DataFrame({
        "entity": rng.randint(0, 6, n),
        "start": rng.randint(0, 900, n).astype(float),
        "attribute": rng.choice(["x", "y"], n),
        "value": rng.uniform(-5, 5, n).round(3),
    })
    obs["stop"] = obs["start"] + rng.randint(0, 120, n)
    obs.loc[:4, "stop"] = obs.loc[:4, "start"]          # zero-length
    obs.loc[5, ["start", "stop"]] = [-np.inf, 50.0]     # infinite interval
    obs.loc[6, ["start", "stop"]] = [100.0, np.inf]
    m = 40
    win = pd.DataFrame({
        "entity": rng.randint(0, 6, m),
        "t_start": rng.randint(0, 800, m).astype(float),
    })
    win["t_stop"] = win["t_start"] + rng.randint(20, 250, m)
    win.loc[0, "t_stop"] = np.nan                        # matches nothing
    sobs, swin = to_sdf(spark, obs), to_sdf(spark, win)
    kw = dict(attributes=["x", "y"], time_col="t",
              window_start_col="t_start", window_stop_col="t_stop")
    d = resample_interval(sobs, swin, **kw).toPandas()
    s = resample_interval(sobs, swin, join_strategy="sweep", **kw).toPandas()
    cols = sorted(d.columns)
    assert sorted(s.columns) == cols
    a2 = s[cols].sort_values(cols).reset_index(drop=True)
    b2 = d[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2, check_like=True, atol=1e-9)


def test_resample_eav_auto_strategy(spark):
    """join_strategy="auto" (r11): on the few-large-entities shape the
    cost detector (shared with merge_intervals) routes the irregular
    observation-window join through the sweep — the reference's
    per-entity selector regime (reference resampling.py:1271-1281) —
    while healthy many-entity workloads keep the direct plan.  Verified
    by plan identity (sameSemantics against the explicit strategies) so
    a silently dead detector cannot pass, plus a value check."""
    rng = np.random.RandomState(31)
    n, m = 40_000, 30_000
    obs = pd.DataFrame({
        "entity": rng.randint(0, 2, n),
        "timestamp": rng.uniform(0, 1000, n),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.uniform(0, 100, n).round(2)})
    win = pd.DataFrame({"entity": rng.randint(0, 2, m),
                        "timestamp_start": rng.uniform(0, 995, m)})
    win["timestamp_stop"] = win["timestamp_start"] + rng.uniform(0, 0.05, m)
    o, w = spark.createDataFrame(obs), spark.createDataFrame(win)

    spec = {"hr": ["count", "mean"], "bp": ["count"]}
    kw = dict(regular=False, assume_unique_windows=True)
    auto = resample_eav(o, w, spec, **kw)
    assert auto.sameSemantics(
        resample_eav(o, w, spec, join_strategy="sweep", **kw))
    direct = resample_eav(o, w, spec, join_strategy="direct", **kw)
    assert not auto.sameSemantics(direct)
    a = auto.toPandas().sort_values(
        ["entity", "timestamp_start"]).reset_index(drop=True)
    d = direct.toPandas().sort_values(
        ["entity", "timestamp_start"]).reset_index(drop=True)
    assert a["hr_count"].tolist() == d["hr_count"].tolist()
    assert np.allclose(a["hr_mean"].astype(float), d["hr_mean"].astype(float),
                       rtol=1e-9, equal_nan=True)

    # many entities -> healthy regime, auto stays direct
    o2 = spark.createDataFrame(obs.assign(entity=rng.randint(0, 20_000, n)))
    w2 = spark.createDataFrame(win.assign(entity=rng.randint(0, 20_000, m)))
    assert resample_eav(o2, w2, spec, **kw).sameSemantics(
        resample_eav(o2, w2, spec, join_strategy="direct", **kw))

    # a detected regular grid still wins over the detector (strictly
    # cheaper than either direct or sweep); integral axis — grid
    # detection needs exact long arithmetic
    og = spark.createDataFrame(obs.assign(
        timestamp=rng.randint(0, 1000, n)))
    wg = pd.DataFrame({"entity": rng.randint(0, 2, m)})
    wg["timestamp_start"] = rng.randint(0, 100, m) * 10
    wg["timestamp_stop"] = wg["timestamp_start"] + 10
    sg = spark.createDataFrame(wg)
    assert resample_eav(og, sg, spec, assume_unique_windows=True).sameSemantics(
        resample_eav(og, sg, spec, assume_unique_windows=True,
                     join_strategy="direct"))  # grid path on BOTH sides

    # kill switch restores the pre-r11 auto (always direct)
    spark.conf.set("spark.catabra.merge.costAuto", "false")
    try:
        assert resample_eav(o, w, spec, **kw).sameSemantics(direct)
    finally:
        spark.conf.set("spark.catabra.merge.costAuto", "true")


def test_resample_interval_auto_strategy(spark):
    """resample_interval join_strategy="auto" (r11): same cost detector;
    few large entities flip the pair join to the merge_intervals sweep
    delegate, many entities stay direct, and the duration-weighted sums
    agree between the two plans."""
    from catabra_pandas_spark import resample_interval

    rng = np.random.RandomState(37)
    n, m = 40_000, 30_000
    obs = pd.DataFrame({
        "entity": rng.randint(0, 2, n),
        "start": rng.uniform(0, 1000, n),
        "attribute": rng.choice(["x", "y"], n),
        "value": rng.uniform(-5, 5, n).round(3)})
    obs["stop"] = obs["start"] + rng.uniform(0, 0.05, n)
    win = pd.DataFrame({"entity": rng.randint(0, 2, m),
                        "t_start": rng.uniform(0, 995, m)})
    win["t_stop"] = win["t_start"] + rng.uniform(0, 0.05, m)
    o, w = spark.createDataFrame(obs), spark.createDataFrame(win)

    kw = dict(attributes=["x", "y"], time_col="t",
              window_start_col="t_start", window_stop_col="t_stop",
              assume_unique_windows=True)
    auto = resample_interval(o, w, **kw)
    assert auto.sameSemantics(
        resample_interval(o, w, join_strategy="sweep", **kw))
    direct = resample_interval(o, w, join_strategy="direct", **kw)
    assert not auto.sameSemantics(direct)
    a = auto.toPandas().sort_values(["entity", "t_start"]).reset_index(drop=True)
    d = direct.toPandas().sort_values(["entity", "t_start"]).reset_index(drop=True)
    assert np.allclose(a["x"], d["x"], atol=1e-9)
    assert np.allclose(a["y"], d["y"], atol=1e-9)

    o2 = spark.createDataFrame(obs.assign(entity=rng.randint(0, 20_000, n)))
    w2 = spark.createDataFrame(win.assign(entity=rng.randint(0, 20_000, m)))
    assert resample_interval(o2, w2, **kw).sameSemantics(
        resample_interval(o2, w2, join_strategy="direct", **kw))


def test_resample_eav_auto_strategy_one_sided_windows(spark):
    """The cost detector can route a windows frame with only ONE endpoint
    column (half-infinite windows) into the sweep leg — pin that the
    one-sided sweep agrees with direct under the auto pick."""
    rng = np.random.RandomState(3)
    n, m = 40_000, 30_000
    obs = pd.DataFrame({
        "entity": rng.randint(0, 2, n),
        "timestamp": rng.uniform(0, 1000, n),
        "attribute": np.where(rng.rand(n) < 0.5, "hr", "bp"),
        "value": rng.uniform(0, 100, n).round(2)})
    win = pd.DataFrame({"entity": rng.randint(0, 2, m),
                        "timestamp_start": rng.uniform(0, 995, m)})
    o, w = spark.createDataFrame(obs), spark.createDataFrame(win)
    spec = {"hr": ["count"]}
    kw = dict(regular=False, assume_unique_windows=True)
    auto = resample_eav(o, w, spec, **kw)
    assert auto.sameSemantics(
        resample_eav(o, w, spec, join_strategy="sweep", **kw))
    direct = resample_eav(o, w, spec, join_strategy="direct", **kw)
    assert not auto.sameSemantics(direct)
    a = auto.toPandas().sort_values(
        ["entity", "timestamp_start"]).reset_index(drop=True)
    d = direct.toPandas().sort_values(
        ["entity", "timestamp_start"]).reset_index(drop=True)
    assert len(a) == len(d) == m
    assert a["hr_count"].tolist() == d["hr_count"].tolist()
