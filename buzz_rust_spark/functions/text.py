"""Text column helpers — tokenization, shingles, portable hashes.

Everything here is built-in-function compositions (JVM-side).  Two hash
families are provided:

- ``portable_hash`` — the first 60 bits of md5, as a long.  *Portable*: any
  engine with md5 computes the identical value (DuckDB:
  ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``), which is what the
  correctness oracles use.  One codegen'd JVM digest call per value.
- ``fast_hash`` — Spark's ``xxhash64``, the production path (no digest
  allocation, ~3× faster than md5).  Operators take a ``hash_fn`` switch;
  production defaults use ``fast``, oracle-checked queries use ``portable``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lower, collapse runs of whitespace to single spaces, trim.

    Collapse BEFORE trim: Spark's ``trim`` strips spaces only, so the old
    trim-then-collapse order left a leading/trailing space whenever the edge
    whitespace was a tab/newline — '\\nfoo' and 'foo' hashed differently and
    escaped dedup (caught by a hypothesis property test, round 4)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text; empty string → empty array.

    Splits directly on ``\\s+`` — one regex pass instead of
    normalize-then-split (two passes).  ``array_remove`` drops the empty
    strings a leading/trailing tab or newline would produce (space-only
    ``trim`` can't strip them — same edge the round-4 ``normalize_text``
    fix covers), so the output equals splitting the normalized text on
    single spaces for EVERY input.  Tokenization is the hot inner loop of
    every shingle/ngram operator, so the regex pass count matters at corpus
    scale; the array_remove is a cheap non-regex pass."""
    t = F.trim(F.lower(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.array_remove(F.split(t, r"\s+"), "")
    )


def word_shingles_of(toks: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) over an ALREADY-TOKENIZED array
    column.  Documents with fewer than n tokens yield a single shingle of
    all tokens.

    Prefer this over :func:`word_shingles` whenever the caller can stage the
    token array in its own projection first (``select(tokens(col).alias(t))``
    then shingle over the attribute): ``toks`` is referenced four times here
    — including from inside the ``slice`` lambda, which higher-order
    functions evaluate INTERPRETED, once per output element — so handing in
    the raw text column re-runs the regex tokenization once per *shingle*
    rather than once per document.  Round-12 A/B on the sf1 corpus: staging
    the token array cut the d02 inverted-index stage 7.4→3.0 s and d03's
    hashed-shingle base 4.0→1.5 s, byte-identical results (the staging
    projection survives CollapseProject exactly because the alias is
    referenced repeatedly by non-trivial expressions).  Do NOT go further
    and stage the SHINGLE array as a bare generator input: that variant
    measured 3–8× SLOWER (probe record in OPTIMIZATION_r12.md) — keep the
    shingle construction an inline expression over the token attribute."""
    return F.array_distinct(
        F.when(
            F.size(toks) <= n,
            F.array(F.concat_ws(" ", toks)),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def word_shingles(col: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) of the normalized text.
    Documents with fewer than n tokens yield a single shingle of all tokens.
    See :func:`word_shingles_of` for the staged-tokens form hot paths use."""
    return word_shingles_of(tokens(col), n)


def portable_hash(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — identical in any engine
    with md5 (DuckDB: ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def fast_hash(col: Column) -> Column:
    return F.xxhash64(col)


def hash_column(col: Column, hash_fn: str) -> Column:
    if hash_fn == "portable":
        return portable_hash(col)
    if hash_fn == "fast":
        return fast_hash(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'portable' or 'fast')")


def hash_column2(col: Column, hash_fn: str) -> Column:
    """A second 64-bit hash INDEPENDENT of :func:`hash_column`, for callers
    that need a 128-bit composite key (e.g. span scrubbing, where a 64-bit
    collision would destroy text).  'portable' takes md5 bits 60-120 (the
    same digest's next hex window — independent bits, and DuckDB can
    reproduce it the same way); 'fast' seeds xxhash64 by prepending a
    literal discriminator column."""
    if hash_fn == "portable":
        return F.conv(F.substring(F.md5(col.cast("binary")), 16, 15), 16, 10).cast(
            "long"
        )
    if hash_fn == "fast":
        return F.xxhash64(F.lit("\x01"), col)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'portable' or 'fast')")
