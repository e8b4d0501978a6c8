"""Byte-pair-encoding tokenizer training and encoding at corpus scale.

The canonical BPE training algorithm (Sennrich et al. 2016) operates on the
WORD-FREQUENCY table, not the raw corpus: pair statistics are weighted word
counts, so a billion-document corpus and its 10M-row word-count table train
identical merges.  That makes the Spark split obvious and scale-correct:

- **Distributed**: one tokenize + hash-aggregate shuffle produces
  ``(word, count)`` — the only pass whose cost grows with the corpus.
- **Driver-side**: merge training loops over the bounded word-count dict
  (capped at ``max_words`` by frequency; the tail it drops cannot influence
  early merges, which is the standard practical cap).
- **Distributed again**: ``bpe_encode`` applies the learned merge ranking
  inside an Arrow-batched pandas UDF with a per-worker word→pieces cache
  (word frequency is Zipfian, so the cache hit rate is ~the corpus's
  type/token ratio).

Ties in pair frequency break lexicographically, so training is deterministic
for a fixed input — rerunning on the same corpus yields identical merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parallelism import ensure_parallelism
from ..functions.text import tokens

END = "</w>"  # end-of-word marker (standard BPE: distinguishes "low"+"er"
# inside a word from "lower" at word end)


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int | None = 100_000
) -> list[tuple[str, int]]:
    """(word, count) from the corpus — ONE tokenize pass + ONE shuffle; the
    driver collects at most ``max_words`` rows (highest-frequency first,
    lexicographic tie-break for determinism)."""
    wc = (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
    )
    if max_words is not None:
        wc = wc.limit(max_words)
    return [(r["w"], r["n"]) for r in wc.collect()]


def train_bpe(
    df: DataFrame,
    num_merges: int = 64,
    text_col: str = "text",
    max_words: int | None = 100_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the ordered merge list [(left, right), ...]; apply with
    :func:`bpe_encode`.  Training cost is O(num_merges × vocab) on the
    driver — independent of corpus size once the word counts exist."""
    counts = word_counts(df, text_col, max_words)
    # each word as a tuple of symbols, last symbol carries the end marker
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in counts:
        if not w:
            continue
        sym = tuple(w[:-1]) + (w[-1] + END,)
        vocab[sym] = vocab.get(sym, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # deterministic: max frequency, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges (by rank) to one word; pure function, used by the UDF and
    as the test oracle."""
    if not word:
        return []
    sym = list(word[:-1]) + [word[-1] + END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces) per document.

    Tokenization happens JVM-side with the SAME ``tokens()`` expression
    training used (a Python-side re-split would disagree on Unicode
    whitespace Java's ``\\s`` does not match — NBSP etc. — and silently
    decouple the encoder from the trained word statistics); the UDF only
    maps each word through the merge table.  The merge ranking rides in the
    UDF closure (broadcast-small); the word→pieces cache lives in the
    closure too, so it survives across Arrow batches within a worker and
    the merge loop runs roughly once per word TYPE per worker, not per
    token (Zipfian hit rate)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}
    cache: dict[str, list[str]] = {}

    @F.pandas_udf(ArrayType(StringType()))
    def encode(tok_arrays):
        def enc(words):
            out = []
            # NULL text -> tokens() yields a null array -> words is None
            # here; emit no pieces rather than failing the task
            for w in words if words is not None else []:
                pieces = cache.get(w)
                if pieces is None:
                    pieces = encode_word(w, ranks)
                    cache[w] = pieces
                out.extend(pieces)
            return out

        return pd.Series([enc(words) for words in tok_arrays])

    return ensure_parallelism(df).select(
        F.col(id_col),
        encode(tokens(F.col(text_col))).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces"))
