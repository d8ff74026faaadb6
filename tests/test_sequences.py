from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from catabra_pandas_spark import impute, prev_next_values
from .conftest import assert_pdf_equal, to_sdf


def _rand_seq(seed, n=200, n_groups=10, null_frac=0.3):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "entity": rng.integers(0, n_groups, n),
        "t": rng.permutation(n).astype(float),
        "v": rng.normal(size=n),
    })
    pdf.loc[rng.random(n) < null_frac, "v"] = np.nan
    # one all-null group
    pdf.loc[pdf["entity"] == 0, "v"] = np.nan
    return pdf


@pytest.mark.parametrize("seed", [0, 1])
def test_prev_next_values(spark, seed):
    pdf = _rand_seq(seed)
    sdf = to_sdf(spark, pdf)
    out = prev_next_values(
        sdf, sort_by="t", group_by="entity",
        columns={"v": {"prev_name": "v_prev", "prev_fill": -1.0, "next_name": "v_next"}},
        first_indicator_name="is_first", last_indicator_name="is_last",
    ).toPandas()

    exp = pdf.sort_values(["entity", "t"]).copy()
    g = exp.groupby("entity")["v"]
    # Reference semantics (misc.py:595-604): prev_fill applies ONLY to the
    # first row of each group; a null predecessor *value* stays null.
    exp["v_prev"] = g.shift(1)
    exp["is_first"] = ~exp.duplicated("entity")
    exp.loc[exp["is_first"], "v_prev"] = -1.0
    exp["v_next"] = g.shift(-1)
    exp["is_last"] = ~exp.duplicated("entity", keep="last")
    # The fixture guarantees interior null predecessors (group 0 is all-null),
    # so this test genuinely distinguishes boundary-only fill from coalesce.
    assert exp.loc[~exp["is_first"], "v_prev"].isna().any()
    assert_pdf_equal(out, exp, sort_by=["entity", "t"])


@pytest.mark.parametrize("method", ["ffill", "bfill", "afill", "linear", "lfill"])
@pytest.mark.parametrize("limit", [None, 2])
def test_impute(spark, method, limit):
    pdf = _rand_seq(3)
    sdf = to_sdf(spark, pdf)
    out = impute(sdf, method=method, columns="v", group_by="entity",
                 order_by="t", limit=limit).toPandas()

    exp = pdf.sort_values(["entity", "t"]).copy()

    def fill(s: pd.Series) -> pd.Series:
        if method == "ffill":
            return s.ffill(limit=limit)
        if method == "bfill":
            return s.bfill(limit=limit)
        if method == "afill":
            f, b = s.ffill(limit=limit), s.bfill(limit=limit)
            return f.add(b).div(2).fillna(f).fillna(b)
        if method == "linear":
            return s.interpolate(method="linear", limit=limit, limit_area="inside")
        if method == "lfill":
            r = s.interpolate(method="linear", limit=limit, limit_area="inside")
            return r.ffill(limit=limit).bfill(limit=limit)
        raise AssertionError(method)

    exp["v"] = exp.groupby("entity")["v"].transform(lambda s: fill(s.reset_index(drop=True)).values)
    assert_pdf_equal(out, exp, sort_by=["entity", "t"])
