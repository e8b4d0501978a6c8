"""Product quantization (PQ) for embedding columns: compress ``array<float>``
vectors to ``m`` bytes and run approximate top-k search over the codes.

Rebuild extension (no reference analog; the reference engine has no vector
surface at all — SURVEY.md §2.B "Array/map functions: none used").  At 100 TB
the embedding column IS the table: a 64-dim float32 vector is 256 bytes/row,
while an m=8 PQ code is 8 bytes/row — a 32x reduction that turns an ANN scan
from I/O-bound to CPU-bound.  The standard recipe (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011):

- **train**: split the vector into ``m`` subspaces; k-means each subspace on a
  bounded driver-side sample (same train-small/assign-big shape as
  ``train_ivf_centroids``) → ``m`` codebooks of ``k`` centroids.
- **encode**: per row, per subspace, the index of the nearest centroid →
  ``m`` uint8 codes packed in a ``binary`` column.  One vectorized pandas UDF,
  no shuffle — the codebooks ride in the UDF closure like a broadcast table.
- **search (ADC)**: per query, precompute an (m, k) table of
  query-subvector x centroid inner products; a code's approximate score is
  ``m`` table lookups — no float vector ever leaves the scan.  Each Arrow
  batch emits only its local top-k per query, so the rank shuffle carries
  O(n_queries x k x n_batches) rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError
from ..functions.vector import as_double_array


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 256,
    sample_size: int = 4096,
    iterations: int = 8,
    vec_col: str = "embedding",
):
    """Train ``m`` per-subspace codebooks of ``k`` centroids each; returns a
    numpy array of shape (m, k_eff, dim // m).

    The sample is bounded at ``sample_size`` rows regardless of corpus size
    (seeded Bernoulli sample + limit — O(scan), no global sort), so training
    cost is O(sample x k x m) on the driver.  ``k`` is capped at the sample
    size; codes stay one byte, so ``k`` must be <= 256."""
    import numpy as np

    if dim % m != 0:
        raise BuzzBadRequestError(f"dim {dim} must be divisible by m {m}")
    if not 1 <= k <= 256:
        raise BuzzBadRequestError("k must be in [1, 256] (codes are one byte)")
    from .similarity import bounded_vector_sample, lloyd_kmeans

    rows = bounded_vector_sample(corpus, vec_col, sample_size)
    if not rows:
        raise BuzzBadRequestError("cannot train PQ codebooks on an empty corpus")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    dsub = dim // m
    k_eff = min(k, len(x))
    books = np.empty((m, k_eff, dsub), dtype=np.float64)
    for s in range(m):
        # per-subspace slice through the SHARED Lloyd kernel (one
        # implementation for IVF and PQ; the two copies previously drifted
        # independently)
        books[s] = lloyd_kmeans(x[:, s * dsub : (s + 1) * dsub], k_eff, iterations)
    return books


def _encode_udf(codebooks):
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    books = np.ascontiguousarray(codebooks)  # (m, k, dsub)
    m, _, dsub = books.shape
    # ||c||^2 per subspace, precomputed once per executor
    cnorms = (books**2).sum(axis=2)  # (m, k)

    # no annotations: locally-imported pandas types aren't resolvable by
    # pandas_udf signature inspection (same constraint as dedup.simhash64)
    @F.pandas_udf(BinaryType())
    def encode(vecs):
        out = []
        if len(vecs) == 0:
            return pd.Series(out, dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, dim)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]  # (n, dsub)
            # argmin over ||xs - c||^2 = ||c||^2 - 2 xs.c (+ ||xs||^2 const)
            d = cnorms[s][None, :] - 2.0 * (xs @ books[s].T)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series([bytes(row) for row in codes])

    return encode


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: output (id_col, pq_code binary(m)).

    One narrow vectorized pass; the output relation is what a 100 TB deployment
    writes back to parquet as its searchable index (m bytes/row)."""
    enc = _encode_udf(codebooks)
    return df.select(
        F.col(id_col), enc(as_double_array(F.col(vec_col))).alias("pq_code")
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    rerank_corpus: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-``k`` over a PQ-coded corpus.

    ``codes`` is the (id, pq_code) relation from :func:`pq_encode`; queries
    keep full-precision vectors.  Scores are approximate inner products
    (monotone in cosine for unit-norm corpora).  Per Arrow batch only the
    local per-query top-k survives, then one small rank shuffle finalizes —
    the corpus itself is never shuffled.

    ``rerank_corpus`` enables the standard two-stage recipe: ADC produces a
    ``shortlist`` (default 4k) per query from the compressed codes, then ONLY
    the shortlisted rows fetch their full-precision vectors (a join keyed by
    id — O(n_queries x shortlist) rows, not the corpus) and are re-scored with
    exact cosine.  Compression does the scan; floats do the final ordering.

    Output: (query_id, neighbor_id, score, rank) — ties broken by neighbor id.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    query_id_col = query_id_col or id_col
    # ids ride through numpy int64 arrays and a cast('long') — non-integral
    # id columns would crash the driver (ValueError) or the tasks
    # (CAST_INVALID_INPUT under ANSI); fail with a typed, named error.
    from pyspark.sql.types import IntegralType

    for df_, col_ in ((queries, query_id_col), (codes, id_col)):
        if not isinstance(df_.schema[col_].dataType, IntegralType):
            raise BuzzBadRequestError(
                f"pq_topk requires an integral id column; {col_!r} is "
                f"{df_.schema[col_].dataType.simpleString()}"
            )
    books = np.ascontiguousarray(codebooks)  # (m, kk, dsub)
    m, _, dsub = books.shape

    qrows = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            as_double_array(F.col(vec_col)).alias("_qv"),
        )
        .collect()
    )
    if not qrows:
        raise BuzzBadRequestError("query set is empty")
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["_qv"], dtype=np.float64) for r in qrows])
    # ADC lookup tables: tables[q, s, c] = q_s . centroid_{s,c}
    tables = np.einsum(
        "qsd,skd->qsk", qmat.reshape(len(qmat), m, dsub), books
    )  # (nq, m, kk)
    arange_m = np.arange(m)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("score", DoubleType()),
        ]
    )
    kk = int(k) if rerank_corpus is None else int(shortlist or 4 * k)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_nid"].to_numpy()
            cmat = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["pq_code"]]
            )  # (n, m)
            parts = []
            for qi in range(len(qids)):
                # score_i = sum_s tables[qi, s, cmat[i, s]]
                scores = tables[qi][arange_m[:, None], cmat.T].sum(axis=0)
                mask = ids != qids[qi]
                sid, ssc = ids[mask], scores[mask]
                np.nan_to_num(ssc, copy=False, nan=-np.inf)
                if len(sid) > kk:
                    # local top-k, TIE-AWARE at the k-th boundary: every row
                    # tied with the k-th score enters the (score desc,
                    # id asc) ordering before the cut, so which tied
                    # neighbor survives never depends on batch layout
                    # (bare argpartition made the k boundary
                    # partitioning-dependent)
                    part = np.argpartition(-ssc, kk - 1)[:kk]
                    kth = ssc[part].min()
                    cand = np.nonzero(ssc >= kth)[0]
                    order = np.lexsort((sid[cand], -ssc[cand]))
                    sel = cand[order][:kk]
                    sid, ssc = sid[sel], ssc[sel]
                parts.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "neighbor_id": sid, "score": ssc}
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    local = codes.select(
        F.col(id_col).cast("long").alias("_nid"), "pq_code"
    ).mapInPandas(scan, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    ranked = local.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= kk
    )
    if rerank_corpus is None:
        return ranked.select(
            "query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank"
        )
    ranked = ranked.select("query_id", "neighbor_id")

    from ..functions.vector import cosine_similarity

    # Exact re-rank: only shortlist rows fetch full vectors.  The query side
    # is the tiny collected set, re-broadcast as a literal relation.
    qdf = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("_qv"),
    )
    cvecs = rerank_corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("_cv"),
    )
    exact = (
        ranked.join(cvecs, on="neighbor_id")
        .join(F.broadcast(qdf), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )
