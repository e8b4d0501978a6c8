"""Similarity search over embedding columns (``array<float>``).

Rebuild extension (no reference analog).  Two strategies:

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus, dot products via JVM higher-order functions, per-query
  top-k with a window.  At 100 TB corpus scale this is one broadcast-join pass
  over the corpus — no shuffle of the corpus itself; only (n_queries × corpus)
  score rows reach the rank shuffle, so keep the query set bounded or use the
  LSH variant.
- ``cosine_topk_lsh`` — approximate: random-hyperplane LSH bucket join; only
  vectors sharing a hyperplane-sign prefix are scored.  Sub-quadratic; recall
  tunable by number of tables/bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.vector import as_double_array, cosine_similarity


def _lcg_doubles(count: int) -> list[float]:
    """Deterministic pseudo-random doubles in [-1, 1) (seedless, portable)."""
    out = []
    x = 0x853C49E6748FEA9B
    for _ in range(count):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(x / float(1 << 62) - 1.0)
    return out


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-``k`` corpus neighbors per query vector by cosine.

    Output: (query_id, neighbor_id, cosine, rank); self-matches excluded when
    ids share a namespace.  Ties broken by neighbor id for determinism."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("_cv"),
    )
    scored = (
        c.join(broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature: ``bits`` sign bits packed in a long.
    Vectors with small angle agree on most bits (SimHash for cosine space)."""
    planes = [_lcg_doubles(dim) for _ in range(bits)]
    v = as_double_array(F.col(vec_col))
    bit_cols = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig + b
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("lsh_sig"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-``k``: candidates must share ≥1 of ``bands`` bit-bands
    of the hyperplane signature; candidates are scored exactly and ranked.

    Scale shape: the corpus is hashed once (narrow map), the join is keyed by
    (band, band-bits) — shuffle proportional to bucket collisions, not |corpus|
    × |queries|."""
    if bits % bands != 0:
        raise ValueError("bands must divide bits")
    width = bits // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        sigs = hyperplane_signatures(df, dim, bits, id_col, vec_col)
        return sigs.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("lsh_sig"), b * width).bitwiseAND(
                            F.lit(mask)
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("_band", "_bits"),
        )

    cand = (
        banded(corpus, "neighbor_id", "_cv")
        .join(banded(queries, "query_id", "_qv"), on=["_band", "_bits"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
