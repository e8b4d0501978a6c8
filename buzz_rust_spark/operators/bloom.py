"""Distributed Bloom-filter state for steady-state ingestion dedup.

At 100 TB the exact seen-hash table (``dedup_incremental``) is the
gold-standard state, but it grows with the corpus: one 16-byte digest per
distinct document forever.  A Bloom filter caps the state at ``m`` bits for
an accepted false-positive rate (a false positive drops a genuinely new
document — the standard trade in ingestion pipelines; false negatives never
happen, so no duplicate ever slips through).

Spark has an internal BloomFilter aggregate but does not register it for
SQL/DataFrame use, so this is a from-scratch rebuild with two properties the
built-in lacks:

- **The state is a DataFrame**, not a driver-side object: a sparse relation
  ``(word_idx int, bits long)`` — one row per non-zero 64-bit word of the
  bitmap.  It persists like any table (parquet/Delta), merges with a
  ``bit_or`` aggregate, and never has to fit on the driver.
- **Everything is JVM expressions** (xxhash64 + shifts), no Python, no UDF:
  build is explode→group-by-word ``bit_or``; membership is an
  explode→left-join→``bool_and`` — one shuffle each, keyed by word index.

Hashing is the standard double-hash scheme (Kirsch–Mitzenmacher 2006):
position_i = (h1 + i*h2) mod m for i in 0..k-1 gives k independent-enough
probes from two xxhash64 calls per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bit-budget defaults: m = 2^20 bits (128 KiB), k = 7 probes gives
# ~0.8% fpp at n = m/10 items; callers size m to their corpus.
DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 7


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for ``key`` (double hashing).

    Both hashes are reduced mod ``m`` BEFORE the probe arithmetic so
    ``h1 + i*h2`` stays far from int64 overflow under ANSI mode; the stride
    is forced odd (bitwise OR 1) so it never degenerates mod a power-of-two
    ``m``."""
    m = F.lit(num_bits).cast("long")
    h1 = F.pmod(F.xxhash64(key, F.lit(0x5EED1)), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(0x5EED2)), m).bitwiseOR(F.lit(1).cast("long"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, m),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Build the sparse bitmap ``(word_idx, bits)`` over ``df[key_col]``.

    One explode (``num_hashes`` rows per key) and ONE shuffle: the group-by
    on the 64-bit word index, with ``bit_or`` partial-aggregating map-side —
    the shuffled volume is bounded by ``num_bits/64`` words per map task no
    matter how many keys go in."""
    pos = df.select(
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("_p")
    ).select(
        F.expr("CAST(_p DIV 64 AS INT)").alias("word_idx"),
        F.expr("SHIFTLEFT(1L, CAST(_p % 64 AS INT))").alias("_m"),
    )
    return pos.groupBy("word_idx").agg(F.bit_or("_m").alias("bits"))


def bloom_merge(*states: DataFrame) -> DataFrame:
    """Union of Bloom states built with the same (num_bits, num_hashes):
    ``bit_or`` over the unioned sparse words."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    df: DataFrame,
    state: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    out_col: str = "might_contain",
    broadcast_state: bool = True,
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: True iff every probe bit for the
    key is set in ``state`` (no false negatives; false positives at the
    filter's fpp).

    Shape: explode the k probes, join the sparse state on word_idx, then a
    ``bool_and`` group-back keyed by the ORIGINAL row.  The state is
    ≤ ``num_bits/64`` rows (~10 bits per inserted item at 1% fpp): up to
    hundreds of millions of items that is broadcast-size and the group-back
    is the only shuffle.  For multi-billion-item filters (state in the GBs)
    pass ``broadcast_state=False`` to shuffle-join on word_idx instead —
    still one bounded-key join, never a sort."""
    probes = df.select(
        F.col(key_col).alias("_k"),
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("_p"),
    ).select(
        "_k",
        F.expr("CAST(_p DIV 64 AS INT)").alias("word_idx"),
        F.expr("SHIFTLEFT(1L, CAST(_p % 64 AS INT))").alias("_m"),
    )
    state_side = F.broadcast(state) if broadcast_state else state
    hits = (
        probes.join(state_side, on="word_idx", how="left")
        .select(
            "_k",
            (F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(F.col("_m"))
             != 0).alias("_hit"),
        )
        .groupBy("_k")
        .agg(F.bool_and("_hit").alias(out_col))
    )
    # NULL keys are a real equivalence class: xxhash64 skips null inputs, so
    # every NULL key shares one constant probe signature (build inserts it,
    # membership finds it).  The join back must therefore be NULL-SAFE —
    # plain equality would leave out_col NULL for null keys, and a caller
    # filtering on it would silently drop every null-key row.  EqualNullSafe
    # is still an equi-join key to Spark, so the join strategy is unchanged.
    hits = hits.select(F.col("_k").alias("_bloom_k"), F.col(out_col))
    return (
        df.join(hits, on=F.col(key_col).eqNullSafe(F.col("_bloom_k")), how="left")
        .drop("_bloom_k")
    )


def dedup_incremental_bloom(
    new_df: DataFrame,
    bloom_state: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Bloom-state variant of ``dedup_incremental``: drop documents whose
    normalized-text digest the filter has (maybe) seen, then drop
    within-batch exact duplicates (min-id survivor).

    Guarantee direction: every true duplicate IS dropped (no false
    negatives); an fpp-fraction of genuinely new documents is also dropped —
    the bounded-state trade.  Callers append ``bloom_build`` of the
    survivors' ``text_hash`` (via ``bloom_merge``) to advance the state.

    Null-text documents form ONE equivalence class (matching
    ``dedup_exact``'s group-by-null semantics): their digest is NULL, which
    hashes to a constant probe signature, so the first null doc ever seen
    survives and every later one — within the batch or across batches once
    the state advances — is dropped as a duplicate."""
    from ..functions.text import normalize_text

    hashed = new_df.withColumn(
        "text_hash", F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    )
    flagged = bloom_might_contain(
        hashed, bloom_state, "text_hash", num_bits, num_hashes, out_col="_seen"
    )
    fresh = flagged.where(~F.col("_seen")).drop("_seen")
    # Null-safe min-id survivor join: groupBy already treats NULL digests as
    # one group, but a plain equi-join on text_hash would never match the
    # NULL group's keeper row — silently dropping every null-text document.
    keepers = fresh.groupBy("text_hash").agg(F.min(id_col).alias(id_col)).select(
        F.col("text_hash").alias("_kh"), F.col(id_col).alias("_kid")
    )
    return (
        fresh.join(
            keepers,
            on=F.col("text_hash").eqNullSafe(F.col("_kh"))
            & (F.col(id_col) == F.col("_kid")),
            how="leftsemi",
        )
    )
