"""Distributed logistic-regression text classifier trained entirely as
Spark aggregates (engine add; no reference analogue — this is the
fastText-style quality/language filter every large-scale LLM curation
pipeline trains over its corpus, e.g. the CCNet / GPT-3 quality
classifiers).

Model: binary logistic regression over ``dim`` hashed bag-of-words
frequency features plus a bias. The feature matrix NEVER leaves the
cluster; the only driver-side state is the weight vector (``dim + 1``
floats — model-sized, like k-means centroids). Each batch-GD iteration
is exactly ONE combinable aggregate over the cached feature frame:

  p_d = sigmoid(Σ_b w_b·x_{d,b} + w_bias)   — pure projection, weights
                                              inlined as literals
  g_b = Σ_d (p_d − y_d)·x_{d,b}             — one map-side-combinable
                                              agg; exchange = dim+1
                                              doubles per partition
  w  ← w − lr·g/N                           — driver update, dim+1 floats

so the per-iteration cost at 100 TB is one scan of the cached features
and a dim-bounded exchange — no join, no per-doc shuffle, no collect of
rows. Featurization is md5-bucketed (engine-portable, never native
``hash()``) so the identical model is reproducible in any SQL engine;
every floating-point reduction is rounded at a fixed decimal before it
feeds the next step, which pins the iteration bit-for-bit across
engines regardless of summation order (same discipline as
sketches.py / text.bpe_train).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_features", "train_logreg", "score_logreg",
           "token_bucket_col"]

# rounding pins: Σ-over-docs gradients at 6 dp (|err| of the raw sum is
# ~1e-12), weights at 10 dp, per-doc logits at 9 dp, probabilities at
# 9 dp (scores exported at 6 dp). Each reduction is rounded BEFORE use
# so cross-engine sum-order noise (≤ ~1e-12) can never propagate.
_G_DP, _W_DP, _Z_DP, _P_DP = 6, 10, 9, 9


def token_bucket_col(tok: Column, dim: int, salt: str = "lrf") -> Column:
    """Feature bucket of one token: first 32 md5 bits mod ``dim``
    (portable across engines — DuckDB twin:
    ``('0x' || substr(md5('{salt}:' || t), 1, 8))::BIGINT % dim``)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), tok)), 1, 8),
               16, 10).cast("bigint"),
        F.lit(dim))


def hashed_features(docs: DataFrame, *, text_col: str = "text",
                    label: Column, dim: int = 16,
                    salt: str = "lrf") -> DataFrame:
    """``doc_id, y, x`` where ``x`` is the dense length-``dim`` array of
    hashed-bucket token frequencies (count_b / n_tokens). Dense-array
    form keeps training shuffle-free: the gradient aggregate reads
    ``x[i]`` as a plain projection. Pure codegen — the bucket lambda
    runs inside ``filter`` over the token array, no UDF. Empty docs are
    excluded (both engines). For dim ≫ 64 prefer a long-format
    (doc, bucket, count) layout + pivot; at filter-model sizes the
    dense scan is cheaper than the extra shuffle."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = (docs.where(F.length(F.trim(F.col(text_col))) > 0)
         .select("doc_id", label.cast("double").alias("y"),
                 toks.alias("_toks")))
    # hash each token ONCE into an int bucket array, then count per
    # bucket with integer compares. Filtering the token array per
    # bucket writes the md5 into dim lambda bodies; at dim=16 the
    # end-to-end cost is the same (A/B-measured — the md5 term is small
    # against the aggregate passes), but the single-hash form does not
    # lean on expression dedup and stays flat as dim grows
    d = d.withColumn("_b", F.transform(
        F.col("_toks"), lambda t: token_bucket_col(t, dim, salt)))
    n = F.greatest(F.size("_toks"), F.lit(1)).cast("double")
    x = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(F.col("_b"), lambda v: v == b)) / n)
    return d.select("doc_id", "y", x.alias("x"))


def _p_col(w: list[float], bias: float) -> Column:
    """sigmoid(Σ w_b·x[b] + bias), logit rounded at _Z_DP then p at
    _P_DP — all literal arithmetic, whole-stage codegen."""
    z = F.lit(bias)
    for i, wi in enumerate(w):
        z = z + F.lit(wi) * F.col("x")[i]
    z = F.round(z, _Z_DP)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), _P_DP)


def train_logreg(feats: DataFrame, *, dim: int, iters: int = 2,
                 lr: float = 8.0) -> tuple[list[float], float]:
    """Batch gradient descent from w=0. Returns ``(weights, bias)``
    after ``iters`` rounds; each round is ONE aggregate action over
    ``feats`` (cache it first). Iteration 1 needs no logit: w=0 gives
    p=0.5 exactly, so its gradient is computed in the same single-agg
    shape with a literal p."""
    _no_rows = ("train_logreg: no training rows (all docs filtered or "
                "empty) — the gradient sums would be NULL and n=0 "
                "divides; a model fit on nothing is undefined")
    if iters <= 0:
        # no gradient job to ride the count on — pay it explicitly
        if feats.count() == 0:
            raise ValueError(_no_rows)
        return [0.0] * dim, 0.0
    w, bias = [0.0] * dim, 0.0
    n = 0
    for it in range(iters):
        p = F.lit(0.5) if it == 0 else _p_col(w, bias)
        aggs = ([F.round(F.sum((p - F.col("y")) * F.col("x")[i]), _G_DP)
                 .alias(f"g{i}") for i in range(dim)]
                + [F.round(F.sum(p - F.col("y")), _G_DP).alias("gb")])
        if it == 0:
            # the row count rides the FIRST gradient aggregate (r11):
            # a separate count() action cost one whole extra job (and
            # the first full pass over an un-materialized feats)
            aggs.append(F.count("*").alias("_n"))
        row = feats.agg(*aggs).first()
        if it == 0:
            n = row["_n"]
            if n == 0:
                raise ValueError(_no_rows)
        w = [round(w[i] - lr * row[f"g{i}"] / n, _W_DP)
             for i in range(dim)]
        bias = round(bias - lr * row["gb"] / n, _W_DP)
    return w, bias


def score_logreg(feats: DataFrame, w: list[float], bias: float,
                 *, score_dp: int = 6) -> DataFrame:
    """``doc_id, label, score, pred``: per-doc probability under
    (w, bias) — pure projection, zero shuffles. ``pred`` thresholds the
    ROUNDED score so the decision is engine-exact at the boundary."""
    z = F.lit(bias)
    for i, wi in enumerate(w):
        z = z + F.lit(wi) * F.col("x")[i]
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, _Z_DP))),
                    score_dp)
    return feats.select(
        "doc_id", F.col("y").cast("int").alias("label"),
        score.alias("score"),
        (score >= 0.5).cast("int").alias("pred"))
