"""N-gram language-model quality scoring (the CCNet recipe, Wenzek et al.
2020: score every document by LM perplexity and keep/bucket by score —
their KenLM 5-gram is a trained artifact; the distributed mechanics are the
same for any order, so this trains an add-alpha-smoothed bigram LM from a
reference corpus and scores documents by mean log-probability).

Rebuild extension (no reference analog).  Spark-first shape:

- **Training** is two count aggregates (unigrams, bigrams) — the only passes
  whose cost grows with the reference corpus; both partial-aggregate
  map-side, keyed by the gram, so a trillion-token corpus trains with two
  bounded-output shuffles.
- **Scoring** explodes each document into (prev, word) transitions (a
  narrow in-array zip — no window function), joins the count relations on
  the gram key, and averages log-probabilities per document with one
  groupBy on the id.  The unigram relation is broadcast-size for any real
  vocabulary; the bigram join is a plain equi-join keyed by the pair.

Probability model (documented so the DuckDB oracle can reproduce it
bit-for-bit): for document tokens w_0..w_T,

    P(w_0)          = (c1(w_0) + a) / (N + a * V)
    P(w_i | w_i-1)  = (c2(w_i-1, w_i) + a) / (c1(w_i-1) + a * V)

with c1/c2 the training unigram/bigram counts, N total training tokens, V
the training vocabulary size, and a the smoothing constant.  Out-of-vocab
words/transitions get the smoothed floor via the +a terms (counts coalesce
to 0).  The document score is the mean natural-log probability; perplexity
is exp(-score).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parallelism import ensure_parallelism
from ..functions.text import tokens


@dataclass
class NgramLM:
    """Trained bigram LM state: two count relations + scalar constants.
    Both relations persist like any table; re-training on corpus growth is
    re-running two aggregates (or unioning + re-summing count deltas)."""

    unigrams: DataFrame  # (w string, c1 long)
    bigrams: DataFrame  # (w1 string, w2 string, c2 long)
    n_tokens: int
    vocab_size: int
    alpha: float


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> NgramLM:
    """Train the smoothed bigram LM over ``df[text_col]``.

    Two shuffles total (unigram + bigram hash aggregates); N and V fall out
    of one small driver aggregate over the unigram relation."""
    from ..functions.cache import persist_tracked

    base = ensure_parallelism(df)
    # Token array staged below each explode (round 12): the bigram leg
    # referenced the tokenize expression four times per row (two slices +
    # size guard) — staging measured modestly faster at sf1 with identical
    # checksums, and it can never be slower than re-running the regex.
    tokenized = base.select(tokens(F.col(text_col)).alias("_tk"))
    tk = F.col("_tk")
    # Persist both count relations: totals reads uni once at train time, and
    # lm_score reads uni TWICE (word + context sides) and bigrams once —
    # without the persists each read re-tokenizes the whole reference corpus
    # (the redundant-scan pattern this repo eliminates everywhere else).
    uni = persist_tracked(
        tokenized.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # adjacent pairs via an in-array zip: no window, no positional shuffle
    pairs = F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, 1, F.size(tk) - 1),
            F.slice(tk, 2, F.size(tk) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = persist_tracked(
        tokenized.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    totals = uni.agg(
        F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    return NgramLM(
        unigrams=uni,
        bigrams=bi,
        n_tokens=int(totals["n"] or 0),
        vocab_size=int(totals["v"] or 0),
        alpha=alpha,
    )


def lm_score(
    lm: NgramLM,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_scored, avg_logprob, perplexity) per document.

    ``avg_logprob`` is the mean ln-probability over the document's tokens
    (rounded to 6 dp for cross-engine stability); ``perplexity`` =
    round(exp(-avg_logprob), 6).  Documents with zero tokens keep a row
    with n_scored=0 and null scores (they carry no evidence either way —
    callers decide their fate explicitly)."""
    a = F.lit(lm.alpha)
    av = F.lit(lm.alpha * lm.vocab_size)
    n_train = F.lit(float(lm.n_tokens))

    # token array staged below the explode (round 12, see train_bigram_lm)
    toks = F.col("_tk")
    # (prev, word) transitions: prev of the first token is null → unigram
    prevs = F.concat(
        F.array(F.lit(None).cast("string")), F.slice(toks, 1, F.size(toks) - 1)
    )
    transitions = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.explode(
            F.when(F.size(toks) > 0, F.arrays_zip(prevs.alias("prev"), toks.alias("w")))
            .otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
        ).alias("t"),
    ).select(id_col, F.col("t.prev").alias("prev"), F.col("t.w").alias("w"))

    uni_w = lm.unigrams.select(F.col("w"), F.col("c1").alias("_cw"))
    uni_prev = lm.unigrams.select(
        F.col("w").alias("prev"), F.col("c1").alias("_cprev")
    )
    scored = (
        transitions.join(F.broadcast(uni_w), on="w", how="left")
        .join(F.broadcast(uni_prev), on="prev", how="left")
        .join(lm.bigrams.withColumnRenamed("w1", "prev").withColumnRenamed("w2", "w"),
              on=["prev", "w"], how="left")
        .withColumn(
            "_logp",
            F.when(
                F.col("prev").isNull(),
                F.log(
                    (F.coalesce(F.col("_cw"), F.lit(0)) + a) / (n_train + av)
                ),
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + a)
                    / (F.coalesce(F.col("_cprev"), F.lit(0)) + av)
                )
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(F.avg("_logp"), 6).alias("avg_logprob"),
    )
    # keep zero-token documents (explode emits nothing for them)
    return (
        df.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
            F.col("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("perplexity"),
        )
    )
