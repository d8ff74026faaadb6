"""Dtype-matrix coverage, modeled on the reference test generator's sweep
(reference tests/util.py:377-416: float/int/bool/timedelta/timestamp/str/
ordered-categorical).  Spark mapping: double/long/boolean/day-time-interval/
timestamp/string; ordered categoricals are strings (SURVEY.md §1.2).

Each test runs an operator on non-numeric endpoint/value dtypes and compares
against a local pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from catabra_pandas_spark import group_intervals, merge_intervals, resample_eav
from .conftest import assert_pdf_equal, to_sdf


def _ts(seed, n, base="2024-01-01"):
    rng = np.random.default_rng(seed)
    return pd.Timestamp(base) + pd.to_timedelta(rng.integers(0, 90 * 24 * 3600, n), unit="s")


def _pairs_oracle(left, right, on):
    """Equi-merge + interval post-filter, closed endpoints (the reference's
    test oracle pattern)."""
    m = left.merge(right, on=on)
    ok = (m["start"] <= m["rstop"]) & (m["rstart"] <= m["stop"])
    return m[ok.fillna(False)]


def _dtype_matrix_frames(kind):
    rng = np.random.default_rng(11)
    n_l, n_r = 200, 80
    if kind == "timestamp":
        ls = _ts(1, n_l)
        rs = _ts(2, n_r)
        ld = pd.to_timedelta(rng.integers(0, 10 * 24 * 3600, n_l), unit="s")
        rd = pd.to_timedelta(rng.integers(0, 10 * 24 * 3600, n_r), unit="s")
        left = pd.DataFrame({"g": rng.integers(0, 8, n_l), "start": ls, "stop": ls + ld,
                             "idx": np.arange(n_l)})
        right = pd.DataFrame({"g": rng.integers(0, 8, n_r), "rstart": rs, "rstop": rs + rd,
                              "ridx": np.arange(n_r)})
    elif kind == "date":
        ls = _ts(3, n_l).normalize()
        rs = _ts(4, n_r).normalize()
        left = pd.DataFrame({"g": rng.integers(0, 8, n_l), "start": ls.date,
                             "stop": (ls + pd.to_timedelta(rng.integers(0, 14, n_l), unit="D")).date,
                             "idx": np.arange(n_l)})
        right = pd.DataFrame({"g": rng.integers(0, 8, n_r), "rstart": rs.date,
                              "rstop": (rs + pd.to_timedelta(rng.integers(0, 14, n_r), unit="D")).date,
                              "ridx": np.arange(n_r)})
    elif kind == "string":
        # lexicographically ordered version-ish strings
        def vstr(a):
            return np.array([f"v{x:04d}" for x in a])
        a = rng.integers(0, 500, n_l)
        b = rng.integers(0, 500, n_r)
        left = pd.DataFrame({"g": rng.integers(0, 8, n_l), "start": vstr(a),
                             "stop": vstr(a + rng.integers(0, 60, n_l)),
                             "idx": np.arange(n_l)})
        right = pd.DataFrame({"g": rng.integers(0, 8, n_r), "rstart": vstr(b),
                              "rstop": vstr(b + rng.integers(0, 60, n_r)),
                              "ridx": np.arange(n_r)})
    else:  # timedelta -> Spark day-time interval
        a = pd.to_timedelta(rng.integers(0, 3600, n_l), unit="s")
        b = pd.to_timedelta(rng.integers(0, 3600, n_r), unit="s")
        left = pd.DataFrame({"g": rng.integers(0, 8, n_l), "start": a,
                             "stop": a + pd.to_timedelta(rng.integers(0, 600, n_l), unit="s"),
                             "idx": np.arange(n_l)})
        right = pd.DataFrame({"g": rng.integers(0, 8, n_r), "rstart": b,
                              "rstop": b + pd.to_timedelta(rng.integers(0, 600, n_r), unit="s"),
                              "ridx": np.arange(n_r)})
    return left, right


@pytest.mark.parametrize("kind", ["timestamp", "date", "string", "timedelta"])
def test_merge_intervals_dtype_matrix(spark, kind):
    left, right = _dtype_matrix_frames(kind)
    out = merge_intervals(
        to_sdf(spark, left), to_sdf(spark, right), on="g", how="inner",
        left_start="start", left_stop="stop",
        right_start="rstart", right_stop="rstop").toPandas()
    exp = _pairs_oracle(left, right, "g")
    if kind == "timedelta":
        # Spark day-time intervals come back as timedelta64; normalize
        for c in ("start", "stop"):
            out[c] = pd.to_timedelta(out[c])
        for c in ("rstart", "rstop"):
            out[c] = pd.to_timedelta(out[c])
    assert_pdf_equal(out, exp, sort_by=["idx", "ridx"])


# adversarial widths per coerced unit (seconds / dict codes): "narrow" is
# far below the typical span (many exploded buckets per interval, anchor
# dedup constantly firing), "wide" exceeds the whole domain (one bucket —
# degenerates to the equi-join + residual filter)
_BUCKET_WIDTHS = {
    "timestamp": (3600.0, 1e12),
    "date": (3 * 86400.0, 1e12),
    "string": (3.0, 1e9),
    "timedelta": (7.0, 1e9),
}


@pytest.mark.parametrize("kind", ["timestamp", "date", "string", "timedelta"])
@pytest.mark.parametrize("width_class", ["narrow", "wide"])
def test_merge_intervals_bucket_dtype_matrix(spark, kind, width_class):
    """The bucket (large-large) strategy over the full endpoint dtype grid
    with ADVERSARIAL widths (VERDICT r9 #3/#4): date endpoints ride the
    shared epoch coercion, day-time intervals the merging-local
    CAST-to-seconds truncation (monotone only — the sub-second spans here
    make truncated endpoints collide across bucket boundaries), strings
    the order-preserving dictionary codes.  Must equal the plain pandas
    oracle — i.e. the direct path — row-for-row."""
    left, right = _dtype_matrix_frames(kind)
    if kind == "timedelta":
        # millisecond jitter so truncation to whole seconds is LOSSY and
        # bucket assignment genuinely coarser than the exact predicate
        rng = np.random.default_rng(99)
        left["start"] = left["start"] + pd.to_timedelta(
            rng.integers(0, 1000, len(left)), unit="ms")
        left["stop"] = left["stop"] + pd.to_timedelta(
            rng.integers(1000, 2000, len(left)), unit="ms")
        right["rstart"] = right["rstart"] + pd.to_timedelta(
            rng.integers(0, 1000, len(right)), unit="ms")
        right["rstop"] = right["rstop"] + pd.to_timedelta(
            rng.integers(1000, 2000, len(right)), unit="ms")
    width = _BUCKET_WIDTHS[kind][0 if width_class == "narrow" else 1]
    out = merge_intervals(
        to_sdf(spark, left), to_sdf(spark, right), on="g", how="inner",
        left_start="start", left_stop="stop",
        right_start="rstart", right_stop="rstop",
        strategy="bucket", bucket_width=width).toPandas()
    exp = _pairs_oracle(left, right, "g")
    if kind == "timedelta":
        for c in ("start", "stop", "rstart", "rstop"):
            out[c] = pd.to_timedelta(out[c])
    assert_pdf_equal(out, exp, sort_by=["idx", "ridx"])


def test_merge_intervals_bucket_mixed_interval_endfields(spark):
    """ADVICE r10: Spark's interval→bigint cast reports totals in the
    interval's END FIELD unit (INTERVAL '3' DAY → 3, not 259200).  If the
    two sides of a bucket join carry day-time intervals with DIFFERENT
    end fields, an un-normalized cast computes bucket ids in different
    units and silently drops matching pairs.  _bucket_numeric must
    normalize both sides to the canonical DAY TO SECOND field range
    first.  Left: whole-day intervals cast to INTERVAL DAY (end field
    DAY — lossless since values are whole days); right: second-granular
    INTERVAL DAY TO SECOND."""
    from pyspark.sql import functions as F, types as T

    rng = np.random.default_rng(41)
    n_l, n_r = 120, 90
    ld = pd.to_timedelta(rng.integers(0, 40, n_l), unit="D")
    left = pd.DataFrame({"g": rng.integers(0, 6, n_l), "start": ld,
                         "stop": ld + pd.to_timedelta(rng.integers(0, 10, n_l), unit="D"),
                         "idx": np.arange(n_l)})
    rd = pd.to_timedelta(rng.integers(0, 40 * 86400, n_r), unit="s")
    right = pd.DataFrame({"g": rng.integers(0, 6, n_r), "rstart": rd,
                          "rstop": rd + pd.to_timedelta(rng.integers(0, 10 * 86400, n_r), unit="s"),
                          "ridx": np.arange(n_r)})

    li = to_sdf(spark, left)
    day_only = T.DayTimeIntervalType(T.DayTimeIntervalType.DAY,
                                     T.DayTimeIntervalType.DAY)
    li = li.withColumn("start", F.col("start").cast(day_only)) \
           .withColumn("stop", F.col("stop").cast(day_only))
    assert li.schema["start"].dataType == day_only  # end field really differs
    ri = to_sdf(spark, right)

    for width in (86400.0 * 3, 1e12):  # narrow (many buckets) and one-bucket
        out = merge_intervals(
            li, ri, on="g", how="inner",
            left_start="start", left_stop="stop",
            right_start="rstart", right_stop="rstop",
            strategy="bucket", bucket_width=width).toPandas()
        exp = _pairs_oracle(left, right, "g")
        for c in ("start", "stop", "rstart", "rstop"):
            out[c] = pd.to_timedelta(out[c])
        assert_pdf_equal(out, exp, sort_by=["idx", "ridx"])


def test_group_intervals_timestamp(spark):
    """Timestamp endpoints; distance is seconds (epoch-seconds comparison
    domain, documented in group_intervals)."""
    rng = np.random.default_rng(12)
    n = 300
    s = _ts(5, n)
    df = pd.DataFrame({
        "g": rng.integers(0, 6, n),
        "start": s,
        "stop": s + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s"),
        "idx": np.arange(n),
    })
    out = group_intervals(to_sdf(spark, df), group_by="g",
                          start_col="start", stop_col="stop",
                          distance=6 * 3600).toPandas()

    # pandas oracle: sort by (start, stop), islands where gap > distance
    exp_groups = {}
    for g, sub in df.sort_values(["start", "stop"]).groupby("g"):
        gid, runmax = -1, None
        for _, r in sub.iterrows():
            if runmax is None or (r.start - runmax).total_seconds() > 6 * 3600:
                gid += 1
            runmax = r.stop if runmax is None else max(runmax, r.stop)
            exp_groups[r.idx] = gid
    exp = df.copy()
    exp["interval_group"] = exp.idx.map(exp_groups)
    out["start"] = pd.to_datetime(out["start"])
    out["stop"] = pd.to_datetime(out["stop"])
    assert_pdf_equal(out, exp, sort_by=["idx"])


def test_resample_eav_timestamp_windows_bool_values(spark):
    """Timestamp time axis + boolean values: bool promotes to a float type
    (reference resampling.py:1558-1570) and aggregates like pandas."""
    rng = np.random.default_rng(13)
    n = 400
    t = _ts(6, n)
    df = pd.DataFrame({
        "entity": rng.integers(0, 8, n),
        "timestamp": t,
        "attribute": rng.choice(["ok", "warn"], n),
        "value": rng.random(n) < 0.4,
    })
    wins = []
    for e in range(8):
        for w in range(3):
            s = pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(rng.integers(0, 60)))
            wins.append((e, s, s + pd.Timedelta(days=14)))
    win = pd.DataFrame(wins, columns=["entity", "timestamp_start", "timestamp_stop"])
    win["win_id"] = np.arange(len(win))

    out = resample_eav(to_sdf(spark, df), to_sdf(spark, win),
                       {"ok": ["mean", "sum", "count"]},
                       include_start=True, include_stop=False).toPandas()

    exp = win.copy()
    means, sums, counts = [], [], []
    for _, w in win.iterrows():
        sub = df[(df.entity == w.entity) & (df.attribute == "ok")
                 & (df.timestamp >= w.timestamp_start) & (df.timestamp < w.timestamp_stop)]
        v = sub.value.astype(float)
        means.append(v.mean() if len(v) else np.nan)
        sums.append(v.sum() if len(v) else np.nan)
        counts.append(len(v))
    exp["ok_mean"], exp["ok_sum"], exp["ok_count"] = means, sums, counts
    for c in ("timestamp_start", "timestamp_stop"):
        out[c] = pd.to_datetime(out[c])
    assert_pdf_equal(out, exp, sort_by=["win_id"])


def test_resample_interval_timestamp(spark):
    """resample_interval's duration-weighted factor on timestamp endpoints
    (epoch-seconds arithmetic path)."""
    from catabra_pandas_spark import resample_interval

    rng = np.random.default_rng(14)
    n = 200
    s = _ts(7, n)
    df = pd.DataFrame({
        "entity": rng.integers(0, 6, n),
        "start": s,
        "attribute": np.where(rng.random(n) < 0.5, "drug_a", "drug_b"),
        "value": rng.normal(5, 2, n).round(2),
    })
    df["stop"] = df["start"] + pd.to_timedelta(rng.integers(0, 20 * 24 * 3600, n), unit="s")
    wins = []
    for e in range(6):
        for _ in range(3):
            ws = pd.Timestamp("2024-01-15") + pd.Timedelta(days=int(rng.integers(0, 60)))
            wins.append((e, ws, ws + pd.Timedelta(days=10)))
    win = pd.DataFrame(wins, columns=["entity", "start_start", "start_stop"])
    win["win_id"] = np.arange(len(win))

    out = resample_interval(to_sdf(spark, df), to_sdf(spark, win),
                            attributes=["drug_a", "drug_b"]).toPandas()

    exp = win.copy()
    for a in ("drug_a", "drug_b"):
        vals = []
        for _, w in win.iterrows():
            total = 0.0
            sub = df[(df.entity == w.entity) & (df.attribute == a)]
            for _, r in sub.iterrows():
                lo = max(r.start, w.start_start)
                hi = min(r.stop, w.start_stop)
                if hi < lo:
                    continue
                v = 0.0 if pd.isna(r.value) else r.value
                li = (r.stop - r.start).total_seconds()
                total += v if li == 0 else v * (hi - lo).total_seconds() / li
            vals.append(total)
        exp[a] = vals
    for c in ("start_start", "start_stop"):
        out[c] = pd.to_datetime(out[c])
    assert_pdf_equal(out, exp, sort_by=["win_id"])


def test_merge_string_keep_first(spark):
    """keep reduction over string intervals (min_by on string order)."""
    left = pd.DataFrame({"g": [1, 1, 2], "start": ["b", "f", "a"],
                         "stop": ["d", "h", "c"], "idx": [0, 1, 2]})
    right = pd.DataFrame({"g": [1, 1, 1, 2], "rstart": ["a", "c", "g", "b"],
                          "rstop": ["c", "e", "i", "b"], "ridx": [0, 1, 2, 3]})
    out = merge_intervals(
        to_sdf(spark, left), to_sdf(spark, right), on="g", how="left",
        keep="first", keep_by="rstart",
        left_start="start", left_stop="stop",
        right_start="rstart", right_stop="rstop").toPandas()
    m = _pairs_oracle(left, right, "g")
    exp = m.sort_values("rstart", kind="stable").groupby("idx", as_index=False).first()
    exp = exp[m.columns.tolist()]
    assert_pdf_equal(out, exp, sort_by=["idx"])


@pytest.mark.parametrize("kind", ["timestamp", "string"])
def test_merge_sweep_dtype(spark, kind):
    """The sweep strategy orders events by the endpoint dtype's natural
    ordering — verify timestamp and string (lexicographic) endpoints
    against the direct join."""
    rng = np.random.default_rng(7)
    n_l, n_r = 200, 120
    if kind == "timestamp":
        ls = pd.Series(_ts(1, n_l))
        left = pd.DataFrame({"group": rng.integers(0, 6, n_l), "start": ls,
                             "stop": ls + pd.to_timedelta(rng.integers(0, 5 * 24 * 3600, n_l), unit="s"),
                             "idx": np.arange(n_l)})
        rs = pd.Series(_ts(2, n_r))
        right = pd.DataFrame({"group": rng.integers(0, 6, n_r), "rstart": rs,
                              "rstop": rs + pd.to_timedelta(rng.integers(0, 3 * 24 * 3600, n_r), unit="s"),
                              "ridx": np.arange(n_r)})
    else:
        import string as _s
        lo = ["".join(rng.choice(list(_s.ascii_lowercase), 3)) for _ in range(n_l)]
        left = pd.DataFrame({"group": rng.integers(0, 6, n_l), "start": lo,
                             "stop": [w + "zz" for w in lo], "idx": np.arange(n_l)})
        ro = ["".join(rng.choice(list(_s.ascii_lowercase), 3)) for _ in range(n_r)]
        right = pd.DataFrame({"group": rng.integers(0, 6, n_r), "rstart": ro,
                              "rstop": [w + "m" for w in ro], "ridx": np.arange(n_r)})
    li, ri = to_sdf(spark, left), to_sdf(spark, right)
    kw = dict(on="group", how="inner", left_start="start", left_stop="stop",
              right_start="rstart", right_stop="rstop")
    d = merge_intervals(li, ri, **kw).toPandas()
    s = merge_intervals(li, ri, strategy="sweep", **kw).toPandas()
    assert len(s) == len(d)
    assert_pdf_equal(s, d, sort_by=["idx", "ridx"])


def test_ordered_categorical_endpoints(spark):
    """The last dtype-grid row (reference tests/util.py:377-416): ordered
    categoricals map to StringType + encode_ordered_categories, whose
    codes follow the EXPLICIT category order — here the reverse of the
    lexicographic one — and feed merge_intervals like any numeric axis."""
    from catabra_pandas_spark import encode_ordered_categories

    # severity ordered low->critical; lexicographic order would be
    # critical < high < low < medium
    order = ["low", "medium", "high", "critical"]
    pts = to_sdf(spark, pd.DataFrame({
        "id": [0, 1, 2, 3, 4],
        "sev": ["low", "medium", "high", "critical", "unknown"]}))
    enc = encode_ordered_categories(pts, "sev", order, out_col="code")
    got = {r.id: r.code for r in enc.collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 4, 4: None}

    bands = to_sdf(spark, pd.DataFrame({
        "band": ["ok", "alert"],
        "lo_cat": ["low", "high"], "hi_cat": ["medium", "critical"]}))
    bands = encode_ordered_categories(bands, "lo_cat", order, out_col="lo")
    bands = encode_ordered_categories(bands, "hi_cat", order, out_col="hi")
    out = merge_intervals(
        enc, bands.select("band", "lo", "hi"), how="inner",
        left_start="code", left_stop="code",
        right_start="lo", right_stop="hi",
        strategy="bucket", bucket_width=2).toPandas()
    assert dict(zip(out.id, out.band)) == {0: "ok", 1: "ok",
                                           2: "alert", 3: "alert"}
    # lexicographic STRING endpoints would band these differently:
    # 'medium' > 'high' lexicographically, proving the order came from
    # the category list, not the strings
    with pytest.raises(ValueError, match="distinct"):
        encode_ordered_categories(pts, "sev", ["low", "low"])


def test_encode_ordered_categories_integer_levels(spark):
    """Category levels need not be strings: integer levels (e.g. coded
    enums whose numeric order is NOT the semantic order) encode by the
    explicit list position."""
    from catabra_pandas_spark import encode_ordered_categories

    pts = to_sdf(spark, pd.DataFrame({"id": [0, 1, 2, 3],
                                      "lvl": [10, 99, 7, 5]}))
    # semantic order: 99 < 7 < 10 (deliberately not numeric order)
    enc = encode_ordered_categories(pts, "lvl", [99, 7, 10], out_col="code")
    got = {r.id: r.code for r in enc.collect()}
    assert got == {0: 3, 1: 1, 2: 2, 3: None}


def test_resample_eav_interval_time_col_sweep_vs_direct(spark):
    """DayTimeIntervalType time axis on the SWEEP escape leg (VERDICT r10
    #4): the sort-sweep kernel orders events by the column's natural
    ordering — no numeric coercion anywhere on its path — so day-time
    intervals (elapsed-time EAV data: time since admission/first event)
    must agree with the direct leg cell-for-cell.  Millisecond jitter
    makes sub-second ordering load-bearing.  Exact aggregations compare
    with ==; mean/sum reduce in non-deterministic order, so they get a
    float tolerance."""
    from catabra_pandas_spark import resample_eav

    rng = np.random.default_rng(23)
    n = 800
    obs = pd.DataFrame({
        "entity": rng.integers(0, 6, n),
        "timestamp": pd.to_timedelta(
            rng.integers(0, 86400 * 10, n) * 1000 + rng.integers(0, 1000, n),
            unit="ms"),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.normal(50, 10, n).round(2)})
    wins = []
    for e in range(6):
        for _ in range(4):
            s = pd.Timedelta(seconds=int(rng.integers(0, 86400 * 8)))
            wins.append((e, s, s + pd.Timedelta(days=1)))
    win = pd.DataFrame(wins, columns=["entity", "timestamp_start",
                                      "timestamp_stop"])
    win["win_id"] = np.arange(len(win))
    o, w = to_sdf(spark, obs), to_sdf(spark, win)
    assert "DayTimeInterval" in str(o.schema["timestamp"].dataType)

    spec = {"hr": ["count", "min", "max", "mean"], "bp": ["count", "sum"]}
    d = resample_eav(o, w, spec, join_strategy="direct") \
        .orderBy("win_id").toPandas()
    s = resample_eav(o, w, spec, join_strategy="sweep") \
        .orderBy("win_id").toPandas()
    for c in ("hr_count", "hr_min", "hr_max", "bp_count"):
        assert d[c].equals(s[c]), c
    for c in ("hr_mean", "bp_sum"):
        assert np.allclose(d[c].astype(float), s[c].astype(float),
                           rtol=1e-9, equal_nan=True), c


def test_resample_eav_interval_time_col_bucket_vs_direct(spark):
    """DayTimeIntervalType time axis on the BUCKET escape leg (VERDICT r10
    missing #2, closed r11): bucket ids come from the monotone
    ``util.bucket_numeric_double`` coercion — canonical DAY TO SECOND
    normalization, then truncation to whole seconds — so the bucket leg
    must agree with direct cell-for-cell even with millisecond jitter in
    the observations (truncation only WIDENS the candidate set; the exact
    endpoint predicate on the original interval columns decides).
    Sub-second observation times sitting exactly around window endpoints
    are the adversarial case: a non-monotone or unit-mismatched coercion
    would silently drop their windows' candidate pairs.

    Second variant — the ADVICE r10 end-field hazard transplanted to this
    operator: window endpoints as INTERVAL DAY (end field DAY), observation
    times as INTERVAL DAY TO SECOND.  Without canonical-field
    normalization the two sides' bucket ids would be computed in
    different units (days vs seconds) and candidates silently vanish."""
    from pyspark.sql import functions as F, types as T
    from catabra_pandas_spark import resample_eav

    rng = np.random.default_rng(29)
    n = 800
    obs = pd.DataFrame({
        "entity": rng.integers(0, 6, n),
        "timestamp": pd.to_timedelta(
            rng.integers(0, 86400 * 10, n) * 1000 + rng.integers(0, 1000, n),
            unit="ms"),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.normal(50, 10, n).round(2)})
    wins = []
    for e in range(6):
        for _ in range(4):
            s = pd.Timedelta(seconds=int(rng.integers(0, 86400 * 8)))
            wins.append((e, s, s + pd.Timedelta(days=1)))
    win = pd.DataFrame(wins, columns=["entity", "timestamp_start",
                                      "timestamp_stop"])
    win["win_id"] = np.arange(len(win))
    o, w = to_sdf(spark, obs), to_sdf(spark, win)
    assert "DayTimeInterval" in str(o.schema["timestamp"].dataType)

    spec = {"hr": ["count", "min", "max", "mean"], "bp": ["count", "sum"]}
    d = resample_eav(o, w, spec, join_strategy="direct") \
        .orderBy("win_id").toPandas()
    exact = ("hr_count", "hr_min", "hr_max", "bp_count")
    approx = ("hr_mean", "bp_sum")
    for width in (3600.0, 86400.0 * 2, 1e12):  # narrow / near-span / one-bucket
        b = resample_eav(o, w, spec, bucket_width=width) \
            .orderBy("win_id").toPandas()
        for c in exact:
            assert d[c].equals(b[c]), (width, c)
        for c in approx:
            assert np.allclose(d[c].astype(float), b[c].astype(float),
                               rtol=1e-9, equal_nan=True), (width, c)

    # mixed end fields: whole-day window endpoints as INTERVAL DAY
    day_only = T.DayTimeIntervalType(T.DayTimeIntervalType.DAY,
                                     T.DayTimeIntervalType.DAY)
    wd = w.withColumn("timestamp_start",
                      F.col("timestamp_start").cast(day_only)) \
          .withColumn("timestamp_stop", F.col("timestamp_stop").cast(day_only))
    # whole-day casts truncate to days, so re-derive the direct answer on
    # the SAME (coarsened) windows — the comparison is bucket==direct on
    # identical inputs, not vs the second-granular windows above
    dd = resample_eav(o, wd, spec, join_strategy="direct") \
        .orderBy("win_id").toPandas()
    assert wd.schema["timestamp_start"].dataType == day_only
    for width in (86400.0 * 3, 1e12):
        bd = resample_eav(o, wd, spec, bucket_width=width) \
            .orderBy("win_id").toPandas()
        for c in exact:
            assert dd[c].equals(bd[c]), (width, c)
        for c in approx:
            assert np.allclose(dd[c].astype(float), bd[c].astype(float),
                               rtol=1e-9, equal_nan=True), (width, c)


def test_interval_total_seconds_exact(spark):
    """util.interval_total_seconds: exact field-extraction sum — negative
    intervals are sign-consistent across every field, sub-second parts
    survive (the truncating bigint cast loses them), and day-only END
    FIELDS widen to the canonical range first (extract needs the full
    field range; an un-widened INTERVAL DAY would also report totals in
    days — the ADVICE r10 unit hazard)."""
    from pyspark.sql import functions as F, types as T
    from catabra_pandas_spark.util import interval_total_seconds

    df = spark.sql("""
      SELECT * FROM VALUES
        (INTERVAL '3' DAY),
        (INTERVAL '-1 02:03:04.500617' DAY TO SECOND),
        (INTERVAL '0 00:00:00.000001' DAY TO SECOND),
        (INTERVAL '2 23:59:59.999999' DAY TO SECOND)
      AS t(itv)
    """)
    got = [r[0] for r in df.select(interval_total_seconds(F.col("itv"))).collect()]
    assert got == [259200.0, -93784.500617, 1e-06, 259199.999999]

    day_only = T.DayTimeIntervalType(T.DayTimeIntervalType.DAY,
                                     T.DayTimeIntervalType.DAY)
    d2 = df.select(F.col("itv").cast(day_only).alias("d"))
    assert d2.schema["d"].dataType == day_only
    got2 = [r[0] for r in d2.select(interval_total_seconds(F.col("d"))).collect()]
    # the day-only cast truncates toward zero to whole days first
    assert got2 == [259200.0, -86400.0, 0.0, 172800.0]


def test_resample_interval_interval_dtype_all_legs(spark):
    """resample_interval on a DayTimeIntervalType axis (reference dtype
    contract: "float, int, time delta, date time", reference
    resampling.py:473-476) — previously failed at analysis time.  Oracle:
    the SAME engine on the exact float-second representation of the same
    data (timedeltas are integral microseconds, so total_seconds() is
    exact and the duration-weighted factors must agree to float
    round-off).  Millisecond jitter makes sub-second overlap fractions
    load-bearing: a truncating coercion would move them.  All three legs
    (direct / bucket / sweep) must agree with the float oracle; includes
    zero-length intervals."""
    from catabra_pandas_spark import resample_interval

    rng = np.random.default_rng(43)
    n, m = 600, 80
    start_ms = rng.integers(0, 900_000, n)         # sub-second jitter
    width_ms = rng.integers(0, 120_000, n)
    width_ms[:10] = 0                              # zero-length intervals
    obs = pd.DataFrame({
        "entity": rng.integers(0, 5, n),
        "start": pd.to_timedelta(start_ms, unit="ms"),
        "attribute": rng.choice(["x", "y"], n),
        "value": rng.uniform(-5, 5, n).round(3)})
    obs["stop"] = obs["start"] + pd.to_timedelta(width_ms, unit="ms")
    win = pd.DataFrame({
        "entity": rng.integers(0, 5, m),
        "t_start": pd.to_timedelta(rng.integers(0, 800_000, m), unit="ms")})
    win["t_stop"] = win["t_start"] + pd.to_timedelta(
        rng.integers(10_000, 300_000, m), unit="ms")

    fobs = obs.assign(start=obs["start"].dt.total_seconds(),
                      stop=obs["stop"].dt.total_seconds())
    fwin = win.assign(t_start=win["t_start"].dt.total_seconds(),
                      t_stop=win["t_stop"].dt.total_seconds())

    kw = dict(attributes=["x", "y"], time_col="t",
              window_start_col="t_start", window_stop_col="t_stop")
    sobs, swin = to_sdf(spark, obs), to_sdf(spark, win)
    assert "DayTimeInterval" in str(sobs.schema["start"].dataType)
    oracle = resample_interval(to_sdf(spark, fobs), to_sdf(spark, fwin),
                               **kw).toPandas()

    def key(df):
        d = df.copy()
        for c in ("t_start", "t_stop"):
            if not np.issubdtype(d[c].dtype, np.floating):
                d[c] = pd.to_timedelta(d[c]).dt.total_seconds()
        return d.sort_values(["entity", "t_start", "t_stop"],
                             na_position="last").reset_index(drop=True)

    exp = key(oracle)
    legs = {
        "direct": dict(join_strategy="direct"),
        "sweep": dict(join_strategy="sweep"),
        "bucket_narrow": dict(bucket_width=60.0),
        "bucket_one": dict(bucket_width=1e9),
    }
    for name, extra in legs.items():
        got = key(resample_interval(sobs, swin, **kw, **extra).toPandas())
        assert len(got) == len(exp), name
        for c in ("x", "y"):
            assert np.allclose(got[c], exp[c], atol=1e-9), (
                name, c, np.abs(got[c] - exp[c]).max())


def test_resample_eav_interval_regular_grid_fast_path(spark):
    """Tumbling elapsed-time windows ("every 6 hours since admission") on
    a DayTimeIntervalType axis now take the regular-grid fast path: grid
    detection and window-index arithmetic run on exact total MICROSECONDS
    (util.interval_total_micros — decimal field extraction scaled before
    the long cast, nothing rounded).  Pinned three ways: (a) the auto
    probe compiles to the same plan as the explicit regular=(origin,
    duration) grid, (b) values equal the regular=False irregular join,
    (c) a mixed-family pair (interval observations, integer-typed window
    endpoints) must NOT detect a grid — indexes would be computed in
    different units — and falls back to the direct join."""
    from pyspark.sql import functions as F
    from catabra_pandas_spark import resample_eav

    rng = np.random.default_rng(61)
    n = 2000
    obs = pd.DataFrame({
        "entity": rng.integers(0, 6, n),
        "timestamp": pd.to_timedelta(
            rng.integers(0, 4 * 86400_000, n), unit="ms"),
        "attribute": rng.choice(["hr", "bp"], n),
        "value": rng.normal(50, 10, n).round(2)})
    six_h = 6 * 3600
    wins = []
    for e in range(6):
        for k in range(16):  # aligned 6h tumbling grid over 4 days
            wins.append((e, pd.Timedelta(seconds=k * six_h),
                         pd.Timedelta(seconds=(k + 1) * six_h)))
    win = pd.DataFrame(wins, columns=["entity", "timestamp_start",
                                      "timestamp_stop"])
    o, w = to_sdf(spark, obs), to_sdf(spark, win)
    assert "DayTimeInterval" in str(o.schema["timestamp"].dataType)

    spec = {"hr": ["count", "mean"], "bp": ["count", "sum"]}
    auto = resample_eav(o, w, spec, assume_unique_windows=True)
    explicit = resample_eav(o, w, spec, assume_unique_windows=True,
                            regular=(0, six_h * 1_000_000))
    assert auto.sameSemantics(explicit)  # probe found the micros grid
    irr = resample_eav(o, w, spec, assume_unique_windows=True,
                       regular=False)
    assert not auto.sameSemantics(irr)

    key = ["entity", "timestamp_start", "timestamp_stop"]
    a = auto.toPandas().sort_values(key).reset_index(drop=True)
    b = irr.toPandas().sort_values(key).reset_index(drop=True)
    for c in ("hr_count", "bp_count"):
        assert a[c].equals(b[c]), c
    for c in ("hr_mean", "bp_sum"):
        assert np.allclose(a[c].astype(float), b[c].astype(float),
                           rtol=1e-9, equal_nan=True), c

    # sliding elapsed-time grid: stride 3h inside 6h windows
    slid = []
    for e in range(6):
        for k in range(30):
            slid.append((e, pd.Timedelta(seconds=k * 3 * 3600),
                         pd.Timedelta(seconds=k * 3 * 3600 + six_h)))
    ws = to_sdf(spark, pd.DataFrame(
        slid, columns=["entity", "timestamp_start", "timestamp_stop"]))
    sl = resample_eav(o, ws, spec, assume_unique_windows=True,
                      regular=(0, six_h * 1_000_000, 3 * 3600 * 1_000_000))
    si = resample_eav(o, ws, spec, assume_unique_windows=True,
                      regular=False)
    a = sl.toPandas().sort_values(key).reset_index(drop=True)
    b = si.toPandas().sort_values(key).reset_index(drop=True)
    for c in ("hr_count", "bp_count"):
        assert a[c].equals(b[c]), ("sliding", c)

    # mixed family: integer window endpoints + interval observations must
    # not silently grid (the units differ — raw seconds vs total micros).
    # The family guard skips the probe, so the plan is the direct theta
    # join, whose interval-vs-bigint comparison fails at ANALYSIS time —
    # loud, never silently mis-assigned (before the guard, the detected
    # "grid" would have equi-joined mismatched indexes and returned
    # plausible wrong numbers)
    wi = pd.DataFrame({"entity": [0, 1], "timestamp_start": [0, 0],
                       "timestamp_stop": [six_h, six_h]})
    with pytest.raises(Exception, match="INTERVAL|BINARY_OP_DIFF_TYPES"):
        resample_eav(o, to_sdf(spark, wi), {"hr": ["count"]},
                     assume_unique_windows=True).collect()
