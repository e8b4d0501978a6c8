"""Hashed n-gram linear text classifier — the "quality classifier" stage of
published LLM-data pipelines (GPT-3's logistic-regression filter over hashed
text features, Brown et al. 2020 App. A; CCNet / fastText-style linear models
over averaged n-gram vectors, Joulin et al. 2016).  Rebuild extension — the
reference engine has no ML surface; this fills the training-data-pipeline gap
the brief names alongside dedup/similarity.

Design (the published distributed-linear-model split):

- **Featurize once.** Documents become sparse hashed bag-of-n-gram vectors
  (unigrams + bigrams, hashing trick, ``dim`` buckets, tf normalized by the
  document's gram count) — all JVM expressions: tokenize → n-gram → xxhash64
  → pmod.  The per-document ``(indices, values)`` arrays are built in ONE
  aggregation and persisted for the whole training run.
- **Broadcast-weight full-batch gradient descent.**  The weight vector (a
  few MB dense at ``dim=2**18``) broadcasts each iteration; an Arrow-batched
  kernel computes per-batch sparse gradient partials ``X^T (sigmoid(Xw+b)-y)``
  accumulated densely in numpy, and emits only NONZERO (idx, grad) rows —
  map-side pre-aggregation, so the only shuffle per iteration is keyed by
  feature index (≤ ``dim`` rows, never the corpus).  Adagrad scaling, fixed
  iteration count → deterministic up to float summation order.
- **JVM-only scoring.**  The trained model becomes a small (idx, weight)
  relation that broadcast-joins the exploded corpus features and sums per
  document — no Python in the serving path, so corpus scoring rides
  whole-stage codegen at 100 TB.  (Training's Python kernel is the same
  allowlisted pattern as the d05/s01 BLAS kernels.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError
from ..functions.cache import persist_tracked
from ..functions.parallelism import ensure_parallelism
from ..functions.text import tokens

DEFAULT_DIM = 1 << 18


@dataclass
class TextClassifierModel:
    """Trained linear model: dense weights + bias over hashed n-gram space."""

    dim: int
    bias: float
    weights: "object"  # numpy float64[dim]
    bigrams: bool = True
    iters_run: int = 0
    losses: list = field(default_factory=list)

    def weight_rows(self) -> list:
        """Nonzero (idx, weight) pairs — the broadcastable serving relation."""
        import numpy as np

        nz = np.flatnonzero(self.weights)
        return [(int(i), float(self.weights[i])) for i in nz]


def _gram_array_of(toks, bigrams: bool):
    """Unigram (+ bigram) string array over an already-staged token ARRAY
    column (see ``_exploded_grams`` for why staging matters)."""
    if not bigrams:
        return toks
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.concat(toks, bi)


def _exploded_grams(
    df: DataFrame, text_col: str, id_col: str, dim: int, bigrams: bool
) -> DataFrame:
    """(_id, _total, idx): one row per GRAM OCCURRENCE, hashed to a bucket.

    The token array is STAGED in its own projection (round 13 — the same
    fix as the round-12 dedup/t05 shingle staging): the gram expression
    references ``tokens(text)`` FIVE times (unigram concat arm + both
    bigram slice arms and both their greatest(size-1) lengths) and was
    evaluated three places (filter + size + explode), so the inline form
    ran the regex tokenization 15× per document (plan-counted); over the
    staged attribute it runs once.  The gram EXPRESSION stays inline over
    the attribute — generator inputs must remain expressions (the
    bare-materialized-array form measured 3-8× slower in round 12; see
    ``word_shingles_of``).  The old ``_total > 0`` pre-filter is GONE, not
    just moved: a non-outer explode already drops empty/null gram arrays
    (identical output), and because Catalyst pushes filter predicates
    through projections BY SUBSTITUTION, any filter above the staging
    projection re-inlines the full tokens expression below it (observed:
    the pushed-down filter alone kept 5 of the 15 tokenizations).

    The gram total rides on every row (computed below the Generate so it
    evaluates once per document — same placement rule as the shingle
    index); no shuffle happens here."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_tk"),
    )
    gram = _gram_array_of(F.col("_tk"), bigrams)
    with_n = base.select(
        "_id",
        "_tk",
        F.size(gram).alias("_total"),
    )
    exploded = with_n.select(
        "_id",
        "_total",
        F.explode(gram).alias("_g"),
    )
    return exploded.select(
        "_id",
        "_total",
        F.pmod(F.xxhash64("_g"), F.lit(dim)).cast("int").alias("idx"),
    )


def _exploded_features(
    df: DataFrame, text_col: str, id_col: str, dim: int, bigrams: bool
) -> DataFrame:
    """(_id, idx, val) sparse hashed features, one row per (doc, bucket).

    ``val`` is the bucket's gram count over the document's TOTAL gram count
    (fastText's mean-of-n-gram normalization), so documents of different
    lengths are comparable."""
    return (
        _exploded_grams(df, text_col, id_col, dim, bigrams)
        .groupBy("_id", "idx")
        .agg(
            (F.count(F.lit(1)) / F.first("_total")).alias("val"),
        )
    )


def _doc_feature_arrays(
    df: DataFrame, text_col: str, id_col: str, label_col: str, dim: int, bigrams: bool
) -> DataFrame:
    """(_id, idxs, vals, y): per-document sorted sparse vectors + label.

    Documents with zero grams keep empty arrays (they still train the bias).
    Arrays are sorted by index so downstream float sums are order-stable."""
    ex = _exploded_features(df, text_col, id_col, dim, bigrams)
    per_doc = ex.groupBy("_id").agg(
        F.array_sort(F.collect_list(F.struct("idx", "val"))).alias("_sv")
    )
    labels = df.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("double").alias("y")
    )
    return labels.join(per_doc, on="_id", how="left").select(
        "_id",
        F.coalesce(
            F.transform("_sv", lambda s: s["idx"]),
            F.array().cast("array<int>"),
        ).alias("idxs"),
        F.coalesce(
            F.transform("_sv", lambda s: s["val"]),
            F.array().cast("array<double>"),
        ).alias("vals"),
        "y",
    )


def train_text_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
    bigrams: bool = True,
) -> TextClassifierModel:
    """Train a logistic hashed-n-gram classifier on labeled documents.

    One featurization job + ``iters`` gradient jobs; each gradient job
    shuffles at most ``dim`` (idx, partial) rows.  The driver holds only the
    dense weight/accumulator vectors (``dim`` floats) and the per-iteration
    aggregated gradient — never document data."""
    import numpy as np

    if dim <= 0 or dim > (1 << 28):
        raise BuzzBadRequestError(f"dim must be in (0, 2^28], got {dim}")
    if iters <= 0:
        raise BuzzBadRequestError(f"iters must be positive, got {iters}")

    feats = persist_tracked(
        _doc_feature_arrays(df, text_col, id_col, label_col, dim, bigrams)
    )
    counts = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(F.col("y").isNull() | F.isnan("y"), 1)
        ).alias("n_bad"),
    ).first()
    n_docs = counts["n"]
    if n_docs == 0:
        raise BuzzBadRequestError("no labeled documents to train on")
    if counts["n_bad"]:
        # a single NaN (or null) label would silently poison the shared
        # gradient: e = p - NaN propagates into the bias and every touched
        # feature weight with no error raised
        raise BuzzBadRequestError(
            f"{counts['n_bad']} documents have a null/NaN {label_col!r} label"
        )

    spark = df.sparkSession
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    g_acc = np.full(dim, 1e-8, dtype=np.float64)  # Adagrad accumulators
    gb_acc = 1e-8
    losses: list[float] = []

    grad_schema = "idx INT, g DOUBLE"

    # training is EAGER (the count and every gradient job run inside this
    # function), so the featurized cache is garbage the moment we return --
    # release it deterministically instead of waiting for the registry scope
    try:
        for _ in range(iters):
            bw = spark.sparkContext.broadcast(w)
            b_now = b

            def grad_partials(
                batches: Iterator["object"], _bw=bw, _b=b_now, _dim=dim
            ) -> Iterator["object"]:
                import numpy as _np
                import pandas as _pd

                wv = _bw.value
                dense = _np.zeros(_dim, dtype=_np.float64)
                g_bias = 0.0
                loss = 0.0
                for batch in batches:
                    for idxs, vals, y in zip(batch["idxs"], batch["vals"], batch["y"]):
                        ii = _np.asarray(idxs, dtype=_np.int64)
                        vv = _np.asarray(vals, dtype=_np.float64)
                        m = float(wv[ii] @ vv) + _b if ii.size else _b
                        # overflow-safe sigmoid on both tails
                        if m >= 0:
                            p = 1.0 / (1.0 + _np.exp(-m))
                        else:
                            em = _np.exp(m)
                            p = em / (1.0 + em)
                        e = p - y
                        if ii.size:
                            _np.add.at(dense, ii, e * vv)
                        g_bias += e
                        # stable log-loss (for the training curve only)
                        loss += _np.log1p(_np.exp(-m)) + (1.0 - y) * m if m >= 0 else (
                            _np.log1p(_np.exp(m)) - y * m
                        )
                nz = _np.flatnonzero(dense)
                out = _pd.DataFrame(
                    {"idx": nz.astype("int32"), "g": dense[nz]}
                )
                # idx -1 carries the bias gradient, -2 the loss partial
                extra = _pd.DataFrame({"idx": [-1, -2], "g": [g_bias, loss]})
                yield _pd.concat([out, extra], ignore_index=True)

            agg = (
                feats.mapInPandas(grad_partials, schema=grad_schema)
                .groupBy("idx")
                .agg(F.sum("g").alias("g"))
            )
            pdf = agg.toPandas()
            bw.unpersist()

            grad = np.zeros(dim, dtype=np.float64)
            g_bias = 0.0
            loss = 0.0
            for idx, g in zip(pdf["idx"].to_numpy(), pdf["g"].to_numpy()):
                if idx == -1:
                    g_bias = g
                elif idx == -2:
                    loss = g
                else:
                    grad[idx] = g
            grad /= n_docs
            g_bias /= n_docs
            grad += l2 * w

            g_acc += grad * grad
            gb_acc += g_bias * g_bias
            w -= lr * grad / np.sqrt(g_acc)
            b -= lr * g_bias / np.sqrt(gb_acc)
            losses.append(float(loss / n_docs))

        return TextClassifierModel(
            dim=dim, bias=float(b), weights=w, bigrams=bigrams,
            iters_run=iters, losses=losses,
        )
    finally:
        feats.unpersist()


def classifier_weights_df(spark: SparkSession, model: TextClassifierModel) -> DataFrame:
    """The model's nonzero (idx, w) serving relation as a DataFrame — build
    it ONCE per session/stream and pass to :func:`classifier_scores` when
    scoring repeatedly (a long-running ingest loop would otherwise re-ship
    the weight list through the driver every micro-batch)."""
    rows = model.weight_rows()
    wdf = spark.createDataFrame(rows or [(0, 0.0)], "idx INT, w DOUBLE")
    if not rows:
        wdf = wdf.where(F.lit(False))
    return wdf


def classifier_scores(
    df: DataFrame,
    model: TextClassifierModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "score",
    weights_df: DataFrame | None = None,
) -> DataFrame:
    """(id, score) — sigmoid linear score per document, PURE JVM.

    The model's nonzero weights become a small relation that broadcast-joins
    the RAW exploded grams (score = Σ w[hash(gram)] / total is linear, so no
    per-(doc, bucket) pre-aggregation is needed) and the per-document sum is
    the ONLY corpus shuffle, keyed by doc id.  Documents with no feature hits
    (or no grams) score ``sigmoid(bias)`` via the left join's coalesce.  No
    Python runs over the corpus, so this is the shape to ship: whole-stage
    codegen end-to-end, one shuffle."""
    wdf = (
        weights_df
        if weights_df is not None
        else classifier_weights_df(df.sparkSession, model)
    )

    grams = _exploded_grams(df, text_col, id_col, model.dim, model.bigrams)
    sums = (
        grams.join(F.broadcast(wdf), on="idx", how="inner")
        .groupBy("_id")
        .agg((F.sum("w") / F.first("_total")).alias("_dot"))
    )
    margin = F.coalesce(F.col("_dot"), F.lit(0.0)) + F.lit(model.bias)
    return (
        df.select(F.col(id_col))
        .join(sums.withColumnRenamed("_id", id_col), on=id_col, how="left")
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias(score_col),
        )
    )
