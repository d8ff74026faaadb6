"""Packing tier: sequence packing, greedy bin packing (reference
partition_series parity, catabra_pandas/misc.py:644-696), document
chunking."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from catabra_pandas_spark.pipeline.packing import (
    chunk_documents, pack_bins, pack_sequences)
from tests.conftest import to_sdf


def _reference_first_fit(weights, budget):
    """The reference algorithm, re-coded from its spec (misc.py:644-696,
    shuffle=False): scan in order, first bin with room, else a new bin."""
    bins, out = {}, []
    m = 0
    for x in weights:
        j = -1
        if x < budget:
            for k, v in bins.items():
                if v + x <= budget:
                    bins[k] += x
                    j = k
                    break
        if j < 0:
            j = m
            m += 1
            bins[j] = x
        out.append(j)
    return out


@pytest.fixture(scope="module")
def weighted(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "id": np.arange(400),
        "g": rng.randint(0, 4, 400),
        "w": rng.randint(1, 120, 400).astype("int64"),
    })
    # a couple of oversized items (heavier than any budget used below)
    pdf.loc[[5, 77], "w"] = 10_000
    return to_sdf(spark, pdf), pdf


def test_pack_sequences_matches_cumsum(spark, weighted):
    sdf, pdf = weighted
    out = pack_sequences(sdf, "w", 256, "id", group_by="g").toPandas()
    for g, grp in pdf.sort_values("id").groupby("g"):
        start = grp.w.cumsum().shift(fill_value=0)
        got = out[out.g == g].set_index("id").sort_index()
        np.testing.assert_array_equal(got.bin_id, start.values // 256)
        np.testing.assert_array_equal(got.bin_offset, start.values % 256)


def test_pack_bins_first_fit_reference_parity(spark, weighted):
    sdf, pdf = weighted
    out = pack_bins(sdf, "w", 256, "id", group_by="g").toPandas()
    for g, grp in pdf.sort_values("id").groupby("g"):
        expect = _reference_first_fit(grp.w.tolist(), 256)
        got = out[out.g == g].sort_values("id").bin_id.tolist()
        assert got == expect


@pytest.mark.parametrize("mode", ["first_fit", "next_fit"])
def test_pack_bins_budget_respected(spark, weighted, mode):
    sdf, pdf = weighted
    out = pack_bins(sdf, "w", 256, "id", group_by="g", mode=mode).toPandas()
    assert len(out) == len(pdf)
    loads = out.groupby(["g", "bin_id"]).w.agg(["sum", "count"])
    # any bin over budget must be a singleton holding one oversized item
    over = loads[loads["sum"] > 256]
    assert (over["count"] == 1).all()
    # bin ids dense from 0 per group
    for g, grp in out.groupby("g"):
        ids = sorted(grp.bin_id.unique())
        assert ids == list(range(len(ids)))


def test_pack_bins_null_keys_raise(spark):
    """NULL group or order keys would be packed and then silently dropped
    by the inner join-back (NULL never equals NULL) — both must raise."""
    pdf = pd.DataFrame({"g": ["a", None, "a"], "id": [1.0, 2.0, 3.0],
                        "w": [10.0, 10.0, 10.0]})
    with pytest.raises(Exception, match="non-NULL group"):
        pack_bins(to_sdf(spark, pdf), "w", 100, "id", group_by="g").count()
    pdf2 = pd.DataFrame({"g": ["a", "a"], "id": [1.0, None],
                         "w": [10.0, 10.0]})
    with pytest.raises(Exception, match="non-NULL order"):
        pack_bins(to_sdf(spark, pdf2), "w", 100, "id", group_by="g").count()


def test_pack_bins_keyless_single_group(spark):
    pdf = pd.DataFrame({"id": range(10), "w": [100] * 10})
    out = pack_bins(to_sdf(spark, pdf), "w", 250, "id").toPandas()
    assert out.bin_id.max() == 4  # 2 per bin
    assert len(out) == 10


def test_chunk_documents_cover_and_overlap(spark):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "a b", ""],
    })
    out = chunk_documents(to_sdf(spark, docs), max_tokens=4, overlap=1,
                          ).toPandas().sort_values(["doc_id", "chunk_idx"])
    d1 = out[out.doc_id == 1]
    # stride 3: chunks [0:4],[3:7],[6:10] -> 3 chunks
    assert d1.chunk_text.tolist() == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert d1.n_chunk_tokens.tolist() == [4, 4, 4]
    assert out[out.doc_id == 2].chunk_text.tolist() == ["a b"]
    assert (out.doc_id != 3).all()  # empty doc -> no rows


def test_chunk_documents_validation(spark):
    docs = to_sdf(spark, pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)


# --- hypothesis property tier ------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(weights=st.lists(st.sampled_from([1.0, 3.0, 50.0, 120.0, 255.0,
                                         256.0, 300.0]),
                        min_size=0, max_size=20),
       budget=st.sampled_from([256.0, 257.5]),
       groups=st.integers(min_value=1, max_value=3),
       mode=st.sampled_from(["first_fit", "next_fit"]))
def test_pack_bins_property(spark, weights, budget, groups, mode):
    """Greedy packing vs the spec replay on random weight sequences: the
    domain pins the adversarial cases — items exactly AT the budget
    (x < budget is strict for the reuse scan), oversized singletons, and
    many tiny items that first_fit backfills but next_fit cannot."""
    def _next_fit(ws, b):
        out, cur, used, m = [], -1, 0.0, 0
        for x in ws:
            if cur < 0 or used + x > b:
                cur, used, m = m, 0.0, m + 1
            used += x
            out.append(cur)
        return out

    pdf = pd.DataFrame({
        "g": [i % groups for i in range(len(weights))],
        "id": range(len(weights)),
        "w": weights})
    sdf = spark.createDataFrame(
        [(int(i % groups), int(i), float(w))
         for i, w in enumerate(weights)],
        "g long, id long, w double")  # explicit: empty lists infer nothing
    out = (pack_bins(sdf, "w", budget, "id", group_by="g",
                     mode=mode).toPandas()
           .sort_values("id").reset_index(drop=True))
    for g, grp in pdf.groupby("g"):
        ws = grp.sort_values("id").w.tolist()
        exp = (_reference_first_fit(ws, budget) if mode == "first_fit"
               else _next_fit(ws, budget))
        got = out[out.g == g].sort_values("id").bin_id.tolist()
        assert got == exp, (g, mode, ws, got, exp)
