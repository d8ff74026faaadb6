"""Quality classification for corpus curation: CCNet / LLaMA-style
"looks like the target" filtering (Wenzek et al. 2020 trained a fasttext
classifier against Wikipedia; LLaMA used a wiki-reference classifier)
re-expressed as engine-replayable logistic regression over numeric
document features (e.g. the :func:`text.text_quality` columns).

Scale design (the module's whole point at 100 TB):

* **Training is sufficient-statistics gradient descent**: one iteration
  = ONE map-side-combinable aggregation over the corpus (the summed
  per-row gradient), driver state = O(d) coefficients, re-broadcast as
  plan literals.  ``n_iter`` passes total, no UDF anywhere — the
  sigmoid, the dot product and the gradient terms are all JVM column
  expressions inside whole-stage codegen.
* **Deterministic like everything in this repo**: float summation order
  across partitions is not associative, so naive ``sum(double)`` would
  make the trained weights depend on partitioning (the BLAS
  row-position lesson from the r12 ``semantic_dedup`` fix, applied to
  GD).  Instead every per-row gradient term is rounded to
  ``_GRAD_DECIMALS`` decimals and summed as ``DECIMAL(38,12)`` — exact
  integer arithmetic, associative and commutative — so retraining on
  any repartitioning of the same rows reproduces the coefficients
  BIT-identically, and a DuckDB twin running the same unrolled
  iterations lands on the same numbers (the rounding boundary is ~4
  orders of magnitude above cross-engine libm ulp).
* **Scoring is map-only**: a pure column expression from model
  literals — zero shuffle at any corpus size, SQL-replayable verbatim.

Standardization statistics (mean/std per feature) come from the same
decimal-sum trick (sum(x), sum(x^2), count), so they are deterministic
too.  Null or NaN features contribute the standardized value 0 (the
feature mean) — the conventional mean-impute, expressed inline.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F

# per-term rounding before the exact decimal sum: coarse enough that
# cross-engine libm ulp (~1e-16 relative on |term| <= ~10) cannot move a
# rounded value, fine enough that the gradient noise (~1e-12 per term)
# is invisible next to lr-scale updates
_GRAD_DECIMALS = 12
_DEC = "decimal(38,12)"


def _dsum(c: Column) -> Column:
    """Exact, order-independent sum: round to _GRAD_DECIMALS then add as
    DECIMAL(38,12).  38-12=26 integer digits absorb ~1e13 rows of
    |term| <= 1e13 before overflow — far past any corpus."""
    return F.sum(F.round(c, _GRAD_DECIMALS).cast(_DEC))


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _std_feature(col: str, mean: float, scale: float) -> Column:
    """(x - mean) / scale with null/NaN imputed to the mean (=> 0)."""
    x = F.col(col).cast("double")
    x = F.when(x.isNull() | F.isnan(x), F.lit(float(mean))).otherwise(x)
    return (x - F.lit(float(mean))) / F.lit(float(scale))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    n_iter: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Train a logistic-regression quality classifier on numeric feature
    columns against a boolean/0-1 ``label_col`` (e.g. ``lang == 'en'``,
    "is from the curated slice").

    Full-batch gradient descent on standardized features:
    ``w -= lr * (grad/n + l2*w)`` with ``grad_j = Σ_i (σ(w·x_i+b)-y_i)
    x_ij`` — each iteration is one aggregation job whose per-row terms
    are pure codegen expressions and whose sums are exact decimals (see
    module docstring), so the result is independent of partitioning and
    row order.  Rows with a null label are excluded; null/NaN features
    mean-impute.  ``lr=1`` on standardized features converges fast for
    the shallow separations quality filtering needs; raise ``n_iter``
    rather than ``lr`` if the loss is still moving.

    Returns a plain-dict model (O(d) driver state, embeddable as SQL
    literals): ``{"features", "mean", "scale", "coef", "intercept",
    "n_rows", "n_iter", "lr", "l2"}`` for :func:`score_quality_classifier`.

    Cost: ``1 + n_iter`` corpus scans (one for the standardization
    moments, one per iteration).  Persist ``df`` upstream if it is an
    expensive pipeline.
    """
    feature_cols = list(feature_cols)
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    y = F.col(label_col).cast("double")
    base = df.select(
        y.alias("__y__"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).filter(F.col("__y__").isNotNull())

    # pass 1: deterministic standardization moments
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in feature_cols:
        x = F.col(c)
        x = F.when(x.isNull() | F.isnan(x), F.lit(0.0)).otherwise(x)
        miss = F.when(F.col(c).isNull() | F.isnan(F.col(c)), F.lit(1.0)) \
            .otherwise(F.lit(0.0))
        aggs.append(_dsum(x).alias(f"s1_{c}"))
        aggs.append(_dsum(x * x).alias(f"s2_{c}"))
        aggs.append(F.sum(miss.cast("long")).alias(f"miss_{c}"))
    row = base.agg(*aggs).collect()[0]
    n = int(row["n"])
    if n == 0:
        raise ValueError("no rows with a non-null label")
    means, scales = [], []
    for c in feature_cols:
        n_ok = n - int(row[f"miss_{c}"])
        s1 = float(row[f"s1_{c}"])
        s2 = float(row[f"s2_{c}"])
        m = s1 / n_ok if n_ok else 0.0
        var = max(s2 / n_ok - m * m, 0.0) if n_ok else 0.0
        means.append(m)
        scales.append(var ** 0.5 if var > 1e-24 else 1.0)

    feats = [_std_feature(c, means[j], scales[j])
             for j, c in enumerate(feature_cols)]
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(int(n_iter)):
        z = F.lit(float(b))
        for j in range(len(feats)):
            z = z + F.lit(float(w[j])) * feats[j]
        resid = _sigmoid(z) - F.col("__y__")
        it_aggs = [_dsum(resid).alias("g0")]
        it_aggs += [_dsum(resid * feats[j]).alias(f"g{j + 1}")
                    for j in range(len(feats))]
        g = base.agg(*it_aggs).collect()[0]
        # grouping matters for float reproducibility: the SQL twin
        # replays exactly  w_new = w - lr * (g/n + l2*w)
        b -= lr * (float(g["g0"]) / n)
        for j in range(len(feats)):
            w[j] -= lr * (float(g[f"g{j + 1}"]) / n + l2 * w[j])

    return {"features": feature_cols, "mean": means, "scale": scales,
            "coef": w, "intercept": b, "n_rows": n,
            "n_iter": int(n_iter), "lr": float(lr), "l2": float(l2)}


def score_quality_classifier(
    df: DataFrame,
    model: Mapping,
    out_col: str = "quality_prob",
    keep_features: bool = True,
) -> DataFrame:
    """Attach ``σ(w·x_std + b)`` from a :func:`train_quality_classifier`
    model — a pure column expression from model literals: map-only, zero
    shuffle, whole-stage codegen, SQL-replayable verbatim (the model IS
    a handful of literals).  Filter on ``out_col`` downstream to apply
    the quality gate; the threshold choice stays with the caller, as in
    CCNet's head/middle/tail split."""
    feats = [_std_feature(c, model["mean"][j], model["scale"][j])
             for j, c in enumerate(model["features"])]
    z = F.lit(float(model["intercept"]))
    for j in range(len(feats)):
        z = z + F.lit(float(model["coef"][j])) * feats[j]
    out = df.withColumn(out_col, _sigmoid(z))
    if not keep_features:
        out = out.drop(*[c for c in model["features"] if c in df.columns])
    return out
