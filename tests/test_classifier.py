"""Hashed n-gram linear quality classifier (operators/classifier.py)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from buzz_rust_spark.errors import BuzzBadRequestError
from buzz_rust_spark.operators.classifier import (
    TextClassifierModel,
    _doc_feature_arrays,
    _exploded_features,
    classifier_scores,
    train_text_classifier,
)

GOOD = ["clear", "insight", "coherent", "thorough", "precise"]
BAD = ["spam", "click", "buy", "casino", "pills"]
NEUT = ["apple", "river", "stone", "cloud", "train", "light", "paper"]


def _corpus(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2
        pool = GOOD if y else BAD
        words = [rng.choice(NEUT) for _ in range(20)] + [
            rng.choice(pool) for _ in range(3)
        ]
        rng.shuffle(words)
        rows.append((i, " ".join(words), y))
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        _corpus(), "doc_id long, text string, label int"
    ).repartition(8)


@pytest.fixture(scope="module")
def model(labeled):
    return train_text_classifier(labeled, dim=1 << 14, iters=40)


def test_training_separates_planted_vocabulary(labeled, model):
    """Loss falls monotonically-ish and the planted good/bad words are
    perfectly separated on the training set."""
    assert model.losses[0] == pytest.approx(np.log(2), abs=1e-3)
    assert model.losses[-1] < 0.55 * model.losses[0]
    assert max(model.losses) == model.losses[0]  # never worse than start
    sc = (
        classifier_scores(labeled, model)
        .toPandas()
        .set_index("doc_id")["score"]
        .sort_index()
    )
    y = np.arange(len(sc)) % 2 == 1
    assert float(np.mean((sc.to_numpy() > 0.5) == y)) == 1.0


def test_distributed_scoring_matches_local_margins(labeled, model):
    """JVM broadcast-join scoring == numpy dot product over the same sparse
    features, doc by doc."""
    fa = _doc_feature_arrays(
        labeled, "text", "doc_id", "label", model.dim, model.bigrams
    ).toPandas()
    local = {}
    for _, r in fa.iterrows():
        ii = np.asarray(r["idxs"], dtype=np.int64)
        vv = np.asarray(r["vals"], dtype=np.float64)
        m = (float(model.weights[ii] @ vv) if ii.size else 0.0) + model.bias
        local[r["_id"]] = 1.0 / (1.0 + np.exp(-m))
    sc = classifier_scores(labeled, model).toPandas()
    assert len(sc) == len(local)
    for _, r in sc.iterrows():
        assert r["score"] == pytest.approx(local[r["doc_id"]], abs=1e-9)


def test_training_is_partition_invariant(labeled):
    """Full-batch GD: 1-partition and 8-partition training agree to float
    tolerance (the gradient is a global sum either way)."""
    m1 = train_text_classifier(labeled.coalesce(1), dim=1 << 12, iters=5)
    m8 = train_text_classifier(labeled.repartition(8), dim=1 << 12, iters=5)
    assert m1.bias == pytest.approx(m8.bias, abs=1e-9)
    np.testing.assert_allclose(m1.weights, m8.weights, atol=1e-9)
    assert m1.losses == pytest.approx(m8.losses, abs=1e-9)


def test_first_gradient_matches_numpy_reference(spark):
    """One GD step against a hand-computed dense logistic gradient."""
    rows = [(0, "aa bb", 1), (1, "bb cc", 0), (2, "aa cc aa", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    dim = 1 << 10
    m = train_text_classifier(df, dim=dim, iters=1, lr=0.5, l2=0.0)

    # rebuild the feature matrix exactly as the operator defines it
    fa = _doc_feature_arrays(df, "text", "doc_id", "label", dim, True).toPandas()
    X = np.zeros((3, dim))
    y = np.zeros(3)
    for _, r in fa.iterrows():
        X[int(r["_id"]), np.asarray(r["idxs"], dtype=np.int64)] = np.asarray(r["vals"])
        y[int(r["_id"])] = r["y"]
    # at w=0: p=0.5 for every doc
    grad = X.T @ (np.full(3, 0.5) - y) / 3
    gb = float(np.sum(0.5 - y) / 3)
    expect_w = -0.5 * grad / np.sqrt(1e-8 + grad * grad)
    expect_b = -0.5 * gb / np.sqrt(1e-8 + gb * gb)
    np.testing.assert_allclose(m.weights, expect_w, atol=1e-6)
    assert m.bias == pytest.approx(expect_b, abs=1e-6)


def test_empty_and_null_docs_score_bias(spark):
    """Zero-gram documents train the bias and score sigmoid(bias)."""
    rows = [(0, "good good good", 1), (1, "", 0), (2, "bad", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    m = train_text_classifier(df, dim=1 << 10, iters=10)
    sc = classifier_scores(df, m).toPandas().set_index("doc_id")["score"]
    assert sc[1] == pytest.approx(1.0 / (1.0 + np.exp(-m.bias)), abs=1e-9)


def test_feature_values_are_tf_normalized(spark):
    df = spark.createDataFrame([(0, "aa aa bb")], "doc_id long, text string")
    ex = _exploded_features(df, "text", "doc_id", 1 << 16, bigrams=True).toPandas()
    # grams: aa aa bb aa_aa aa_bb → totals 5; aa:2/5, bb:1/5, bigrams 1/5
    assert ex["val"].sum() == pytest.approx(1.0)
    assert sorted(ex["val"]) == pytest.approx([0.2, 0.2, 0.2, 0.4])


def test_scoring_has_no_python_nodes(labeled, model):
    plan = classifier_scores(labeled, model)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_classifier_featurization_tokenizes_once(labeled, model):
    """Round-13 optimization pin: the gram pipeline stages the token array
    in its own projection, so the regex tokenization (`split`) appears
    exactly ONCE in the featurization/scoring plan.  The inline form ran it
    15× per document (the gram expression references tokens 5× and was
    evaluated at 3 operators); a reintroduced pre-filter above the staging
    projection would push down by substitution and regress the count."""
    from buzz_rust_spark.operators.classifier import _doc_feature_arrays

    feats = _doc_feature_arrays(labeled, "text", "doc_id", "label", 1 << 18, True)
    plan = feats._sc._jvm.PythonSQLUtils.explainString(
        feats._jdf.queryExecution(), "formatted"
    )
    assert plan.count("split(") == 1
    score_plan = classifier_scores(labeled, model)._sc._jvm.PythonSQLUtils.explainString(
        classifier_scores(labeled, model)._jdf.queryExecution(), "formatted"
    )
    assert score_plan.count("split(") == 1


def test_bad_args(labeled):
    with pytest.raises(BuzzBadRequestError):
        train_text_classifier(labeled, dim=0)
    with pytest.raises(BuzzBadRequestError):
        train_text_classifier(labeled, iters=0)
    with pytest.raises(BuzzBadRequestError):
        train_text_classifier(labeled.where(F.lit(False)))


def test_null_label_raises_instead_of_nan_poisoning(spark):
    """One null label must be a typed error, not a silent all-NaN model."""
    rows = [(0, "aa bb", 1), (1, "bb cc", None), (2, "cc dd", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    with pytest.raises(BuzzBadRequestError, match="null/NaN 'label'"):
        train_text_classifier(df, dim=1 << 10, iters=1)


def test_nan_label_raises_like_null(spark):
    """A NaN double label passes isNull() but poisons e = p - y just the
    same — it must hit the identical typed guard."""
    rows = [(0, "aa bb", 1.0), (1, "bb cc", float("nan")), (2, "cc dd", 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    with pytest.raises(BuzzBadRequestError, match="null/NaN 'label'"):
        train_text_classifier(df, dim=1 << 10, iters=1)


def test_training_cache_released_on_return(spark, labeled):
    """The featurized persist is freed deterministically when training ends
    (and on the error path), not parked until the next registry scope."""
    before = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    train_text_classifier(labeled, dim=1 << 10, iters=2)
    after = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before


def test_classifier_save_load_roundtrip(spark, labeled, model, tmp_path):
    """Persisted artifact scores bit-identically to the in-memory model."""
    from buzz_rust_spark.operators.artifacts import load_classifier, save_classifier

    path = str(tmp_path / "clf")
    save_classifier(spark, model, path)
    loaded = load_classifier(spark, path)
    assert loaded.dim == model.dim and loaded.bigrams == model.bigrams
    assert loaded.bias == model.bias
    np.testing.assert_array_equal(loaded.weights, model.weights)
    a = classifier_scores(labeled, model).toPandas().set_index("doc_id")["score"]
    b = classifier_scores(labeled, loaded).toPandas().set_index("doc_id")["score"]
    assert (a.sort_index() == b.sort_index()).all()


def test_artifact_arrays_roundtrip_1d_2d_3d(spark, tmp_path):
    from buzz_rust_spark.operators.artifacts import load_arrays, save_arrays

    rng = np.random.RandomState(11)
    arrays = {
        "one": rng.randn(7),
        "two": rng.randn(5, 3),
        "three": rng.randn(2, 4, 6),  # PQ codebook shape (m, k, dsub)
    }
    path = str(tmp_path / "arrs")
    save_arrays(spark, path, arrays)
    back = load_arrays(spark, path)
    assert set(back) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(back[k], arrays[k])


def test_pq_codebooks_roundtrip_through_artifacts(spark, tmp_path):
    """IVF/PQ parameters persist and reload with identical search results."""
    from buzz_rust_spark.operators.artifacts import load_arrays, save_arrays
    from buzz_rust_spark.operators.pq import pq_encode, pq_topk, train_pq_codebooks

    rng = np.random.RandomState(4)
    rows = [(i, rng.randn(16).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(corpus, dim=16, m=4, k=16)
    path = str(tmp_path / "pq")
    save_arrays(spark, path, {"codebooks": books})
    books2 = load_arrays(spark, path)["codebooks"]
    np.testing.assert_array_equal(books, books2)
    enc = pq_encode(corpus, books2)
    queries = spark.createDataFrame(rows[:3], "vec_id long, embedding array<double>")
    out = pq_topk(enc, queries, books2, k=5).collect()
    assert len(out) == 15
