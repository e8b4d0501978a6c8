"""Similarity search over embedding columns (``array<float>``).

Rebuild extension (no reference analog).  Two strategies:

- ``cosine_topk_bruteforce`` — exact top-k: the (bounded) query set rides
  along as a closed-over numpy matrix; one ``mapInPandas`` pass scores each
  corpus partition by BLAS matmul and emits only partial top-k candidates,
  so the corpus is scanned once and never shuffled — only k × n_queries rows
  per partition reach the final exact rank.  Keep the query set bounded or
  use the LSH variant.
- ``cosine_topk_lsh`` — approximate: random-hyperplane LSH bucket join; only
  vectors sharing a hyperplane-sign prefix are scored.  Sub-quadratic; recall
  tunable by number of tables/bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cache import persist_tracked
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

    Scale shape: the (bounded) query set is collected once and closed over; a
    ``mapInPandas`` pass scores each corpus partition against ALL queries with
    one BLAS matmul and emits only its PARTIAL top-k per query — so the
    corpus is scanned once, never shuffled, and the final exact rank runs
    over ≤ k × n_queries rows per partition.  (The previous shape — broadcast
    nested-loop join + per-row higher-order dot product + full-width window —
    shuffled every (query, corpus) score row and paid an interpreted lambda
    per element.)

    Output: (query_id, neighbor_id, cosine, rank); self-matches excluded when
    ids share a namespace.  Ties broken by neighbor id for determinism —
    including ties AT the k-th boundary within a partition, which are widened
    into the candidate set before ranking so results never depend on corpus
    partitioning.  Requires integral ids (cast to long); rows with null ids
    or null embeddings are dropped, ragged embeddings are masked per batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    query_id_col = query_id_col or id_col
    # collect unordered and sort driver-side: an orderBy before collect costs
    # an AQE sort stage (profiled as 2 extra jobs per call) to order rows
    # Python can sort in microseconds (guide §5: the driver should do almost
    # no data work — but sorting k rows it already holds is not data work)
    # null/uncastable query ids are dropped BEFORE the collect (documented
    # semantics: rows with null ids are dropped) — a None in the collected
    # rows would make the sort key unorderable and np.array(qids) an object
    # array (ADVICE r12).
    qrows = sorted(
        queries.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            as_double_array(F.col(vec_col)).alias("_qv"),
        )
        .where(F.col("query_id").isNotNull())
        .collect(),
        key=lambda r: r["query_id"],
    )
    if not qrows:
        empty = [
            ("query_id", LongType()),
            ("neighbor_id", LongType()),
            ("cosine", DoubleType()),
        ]
        return corpus.sparkSession.createDataFrame(
            [], StructType([StructField(n, t) for n, t in empty])
        ).withColumn("rank", F.lit(1).cast("int")).limit(0)
    qids = np.array([r["query_id"] for r in qrows], dtype="int64")
    qm = np.stack([np.asarray(r["_qv"], dtype="float64") for r in qrows])
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qm = qm / qn[:, None]

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    kk = int(k)

    dim = qm.shape[1]

    def partial_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            vs = pdf["_v"].to_numpy()
            # mask ragged vectors (wrong dimensionality) — np.stack would
            # raise and fail the task; nulls are filtered JVM-side below
            lens = np.fromiter((len(v) for v in vs), dtype="int64", count=len(vs))
            good = lens == dim
            if not good.all():
                ids = ids[good]
                vs = vs[good]
            if not len(ids):
                continue
            m = np.stack(vs).astype("float64")
            nn = np.linalg.norm(m, axis=1)
            nn[nn == 0] = 1.0
            sims = (m / nn[:, None]) @ qm.T  # (batch, n_queries)
            sims[ids[:, None] == qids[None, :]] = -np.inf  # self-matches
            # NaN scores (corpus vectors with NaN elements) must never reach
            # the k-th-boundary min below: one NaN kth would empty the whole
            # batch's candidate set ('>= NaN' is all-False).  -inf keeps the
            # row unselectable while real neighbors still surface.
            np.nan_to_num(sims, copy=False, nan=-np.inf)
            take = min(kk, len(ids))
            # partial exact top-k per query, TIE-AWARE at the k-th boundary:
            # argpartition finds the k-th score, then every row tied with it
            # is included before the (score desc, id asc) lexsort — so which
            # tied neighbor survives never depends on partition row order.
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            out_q, out_i, out_c = [], [], []
            for col in range(qids.shape[0]):
                colsims = sims[:, col]
                kth = colsims[part[:, col]].min()
                cand = np.nonzero(colsims >= kth)[0]
                order = np.lexsort((ids[cand], -colsims[cand]))
                sel = cand[order][:take]
                keep = np.isfinite(colsims[sel])
                out_q.append(np.full(keep.sum(), qids[col]))
                out_i.append(ids[sel][keep])
                out_c.append(colsims[sel][keep])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_i),
                    "cosine": np.concatenate(out_c),
                }
            )

    # null vectors are dropped JVM-side (a null row can't be a neighbor and
    # would fail np.stack); ids must be integral — documented requirement.
    # Deliberately NOT ensure_parallelism'd: spreading this tiny corpus's
    # BLAS pass over 32 Python tasks was measured 2.1-2.5x SLOWER than the
    # single-task stage (780-930 ms vs 375 ms) — each fresh Python worker
    # pays its numpy/pandas import before the first batch, which dwarfs the
    # matmul at this scale (guide §1.1: a "fresh ideal plan" losing to the
    # gotcha; §4.5 worker-init cost).  At real scale the scan arrives with
    # many splits and is already parallel without any repartition.
    candidates = (
        corpus.select(
            F.col(id_col).cast("long").alias("_id"),
            as_double_array(F.col(vec_col)).alias("_v"),
        )
        .where(F.col("_v").isNotNull() & F.col("_id").isNotNull())
        .mapInPandas(partial_topk, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
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
    Vectors with small angle agree on most bits (SimHash for cosine space).

    All ``bits`` planes are sliced from ONE continuous LCG stream — drawing
    each plane from a fresh stream would reseed the same constant and make
    every plane identical (signatures collapse to {0, all-ones} and the
    bucket join degenerates toward a cross join)."""
    stream = _lcg_doubles(dim * bits)
    planes = [stream[i * dim : (i + 1) * dim] for i in range(bits)]
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
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-``k``: candidates must share ≥1 of ``bands`` bit-bands
    of the hyperplane signature; candidates are scored exactly and ranked.

    Scale shape: the corpus is hashed once (narrow map), the join is keyed by
    (band, band-bits) — shuffle proportional to bucket collisions, not |corpus|
    × |queries|.

    ``multiprobe=1`` additionally probes, PER QUERY BAND, every bucket at
    Hamming distance 1 (each single bit of the band flipped) — the standard
    multi-probe LSH recall boost (Lv et al., VLDB'07).  Only the (small)
    query side fans out ×(width+1); the corpus relation, its signatures, and
    the shuffle key layout are unchanged, so recall rises without re-hashing
    or replicating the corpus."""
    if bits % bands != 0:
        raise ValueError("bands must divide bits")
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe must be 0 or 1 (single-bit probing)")
    width = bits // bands
    mask = (1 << width) - 1

    def banded(
        df: DataFrame, id_alias: str, vec_alias: str, probe: bool = False
    ) -> DataFrame:
        # Persist the signatures: the posexplode below re-evaluates its input
        # per emitted band row, and the signature is `bits` dot-product folds —
        # cached, each band row just re-reads a long.  Tracked for release.
        sigs = persist_tracked(
            hyperplane_signatures(df, dim, bits, id_col, vec_col)
        )
        band_vals = [
            F.shiftrightunsigned(F.col("lsh_sig"), b * width).bitwiseAND(
                F.lit(mask)
            )
            for b in range(bands)
        ]
        if probe:
            # (band, value) pairs: the exact bucket plus width 1-bit flips
            entries = [
                F.struct(F.lit(b).alias("_band"), v.alias("_bits"))
                for b, base in enumerate(band_vals)
                for v in [base]
                + [base.bitwiseXOR(F.lit(1 << j)) for j in range(width)]
            ]
            return sigs.select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).alias(vec_alias),
                F.explode(F.array(*entries)).alias("_e"),
            ).select(
                id_alias, vec_alias, F.col("_e._band").alias("_band"),
                F.col("_e._bits").alias("_bits"),
            )
        return sigs.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.posexplode(F.array(*band_vals)).alias("_band", "_bits"),
        )

    cand = (
        banded(corpus, "neighbor_id", "_cv")
        .join(
            banded(queries, "query_id", "_qv", probe=multiprobe >= 1),
            on=["_band", "_bits"],
        )
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


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iterations: int = 8,
    vec_col: str = "embedding",
    order_col: str | None = None,
):
    """K-means centroids from a bounded driver-side sample (numpy Lloyd).

    Scale shape: the sample is capped at ``sample_size`` rows no matter the
    corpus size, so training cost is O(sample × k) on the driver — the
    standard IVF recipe (train small, assign big).  The sample is a seeded
    ``df.sample`` + limit: O(scan), no global sort, no vector-to-string cast
    (the previous ``orderBy(xxhash64(cast))`` sorted the whole corpus to pick
    4096 rows).  Deterministic for a fixed seed and input layout; centroid
    quality does not depend on which rows are drawn.

    ``order_col`` switches to a PARTITION-INVARIANT sample: the
    ``sample_size`` rows with the smallest ``xxhash64(order_col)``, in that
    hash order (Spark plans sort+limit as per-partition TakeOrdered + merge —
    no global sort), so the same corpus yields the same centroids under any
    repartitioning.  Callers whose semantics promise layout-independence
    (``semantic_dedup``) use this path."""
    import numpy as np

    if order_col is not None:
        rows = [
            r
            for r in corpus.select(
                F.xxhash64(F.col(order_col)).alias("_o"),
                as_double_array(F.col(vec_col)).alias("v"),
            )
            .orderBy("_o", "v")
            .limit(sample_size)
            .collect()
        ]
        n = len(rows)
        if n == 0:
            raise ValueError("cannot train IVF centroids on an empty corpus")
    else:
        rows = bounded_vector_sample(corpus, vec_col, sample_size)
        if not rows:
            raise ValueError("cannot train IVF centroids on an empty corpus")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    k = min(n_centroids, len(x))
    return lloyd_kmeans(x, k, iterations)


def bounded_vector_sample(
    corpus: DataFrame, vec_col: str, sample_size: int
) -> list:
    """Driver-side sample of at most ``sample_size`` vectors: seeded
    Bernoulli 2× oversample + limit — O(scan), no global sort.  Shared by
    IVF and PQ training (one recipe, one place to fix)."""
    narrow = corpus.select(as_double_array(F.col(vec_col)).alias("v"))
    n = narrow.count()
    if n == 0:
        return []
    if n <= sample_size:
        return narrow.collect()
    fraction = min(1.0, 2.0 * sample_size / n)
    return narrow.sample(fraction=fraction, seed=42).limit(sample_size).collect()


def lloyd_kmeans(x, k: int, iterations: int):
    """Plain numpy Lloyd iteration, init from the first ``k`` rows —
    the shared training kernel for IVF centroids and PQ codebooks."""
    centroids = x[:k].copy()
    for _ in range(iterations):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def _nearest_centroids_udf(centroids, nprobe: int):
    """Pandas UDF: ids of the ``nprobe`` nearest centroids (by L2) per vector.
    The centroid matrix rides inside the serialized UDF closure — the same
    broadcast-small-side pattern as a broadcast join."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    c = centroids  # (k, dim)
    c_norms = (c**2).sum(axis=1)

    # no annotations: locally-imported pandas types aren't resolvable by
    # pandas_udf signature inspection (same constraint as dedup.simhash64)
    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest(vecs):
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            d = c_norms - 2.0 * (c @ x)  # + ||x||² constant — argmin unaffected
            order = np.argsort(d, kind="stable")[:nprobe]
            out.append([int(i) for i in order])
        return pd.Series(out)

    return nearest


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-``k`` via IVF (inverted-file) partitioning: corpus
    vectors are assigned to their nearest centroid; each query scores only the
    ``nprobe`` nearest cells.  Join is keyed by cell id → shuffle carries
    ~|corpus| × nprobe/k_centroids candidate rows, not |corpus| × |queries|.

    Output schema matches ``cosine_topk_bruteforce``; recall rises with
    ``nprobe`` (= n_centroids ⇒ exact)."""
    centroids = train_ivf_centroids(corpus, dim, n_centroids, vec_col=vec_col)
    assign1 = _nearest_centroids_udf(centroids, 1)
    assignp = _nearest_centroids_udf(centroids, nprobe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cell", F.element_at(assign1(F.col("_cv")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("_qv"),
    ).withColumn("_cell", F.explode(assignp(F.col("_qv"))))

    scored = (
        c.join(q, on="_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
        # a (query, neighbor) pair may meet in several probed cells
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def allpairs_cosine_blocked(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_block_rows: int = 2048,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` via blocked matrix multiply.

    Rows are hashed into ``n_blocks`` blocks; every block pair (i ≤ j) becomes
    one task whose vectors arrive as two pandas groups and are scored with a
    single BLAS matmul — the standard exact all-pairs shape at scale (each
    side's data is replicated ~n_blocks/2 times, but every comparison happens
    inside vectorized numpy instead of per-pair interpreted expressions).
    Output: (id_1 < id_2, cosine), cosine rounded to 6 dp.

    ``n_blocks=None`` (default since round 12) derives the block count from
    the corpus size — ``ceil(n / target_block_rows)`` — instead of a
    constant tuned for one scale (guide §2: partitioning must be
    scale-adaptive).  Block pairs grow as n_blocks²/2, so a constant 8 pays
    36 Python group round-trips and 8× input replication even on a corpus
    small enough for one BLAS call, while at larger n the derived count
    keeps every sims block ≈ ``target_block_rows²`` (≤ ~34 MB of float64 at
    the default) — bounded task memory at any scale.  The result is exact
    either way, so the blocking factor changes nothing downstream: a stale
    or approximate ``n_rows`` only moves the task-size/parallelism trade,
    never the output.

    ``n_rows`` (round 13) lets the caller supply the corpus size when it
    already knows one — e.g. from parquet footer metadata — and skips the
    sizing action entirely.  Without it, deriving n runs ``vectors.count()``
    as ONE EXTRA JOB per call; on a bare file scan that is metadata-cheap,
    but on a computed/filtered input it executes the full upstream plan
    (ADVICE r12) — pass ``n_rows`` (or an explicit ``n_blocks``) in those
    pipelines.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id_1", LongType()),
            StructField("id_2", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    if n_blocks is None:
        n = n_rows if n_rows is not None else vectors.count()
        n_blocks = max(1, -(-n // target_block_rows))

    base = vectors.select(
        F.col(id_col).cast("long").alias("_id"),
        as_double_array(F.col(vec_col)).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # Each vector participates in every block pair involving its block:
    # as side a for pairs (blk, j >= blk), as side b for pairs (i <= blk, blk).
    # The diagonal pair (blk, blk) keeps one copy of each side.
    a_side = base.select(
        "_id", "_v", F.lit(0).alias("_side"),
        F.col("_blk").alias("_bi"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("_bj"),
    )
    b_side = base.select(
        "_id", "_v", F.lit(1).alias("_side"),
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("_bi"),
        F.col("_blk").alias("_bj"),
    )
    both = a_side.select("_bi", "_bj", "_side", "_id", "_v").unionByName(
        b_side.select("_bi", "_bj", "_side", "_id", "_v")
    )

    thr = float(threshold)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bi = int(pdf["_bi"].iloc[0])
        bj = int(pdf["_bj"].iloc[0])
        a = pdf[pdf["_side"] == 0]
        b = pdf[pdf["_side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_1": [], "id_2": [], "cosine": []}).astype(
                {"id_1": "int64", "id_2": "int64", "cosine": "float64"}
            )
        ida = a["_id"].to_numpy()
        idb = b["_id"].to_numpy()
        ma = np.stack(a["_v"].to_numpy())
        mb = np.stack(b["_v"].to_numpy())
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        sims = (ma / na[:, None]) @ (mb / nb[:, None]).T
        ii, jj = np.nonzero(sims >= thr)
        id1 = ida[ii]
        id2 = idb[jj]
        # orient pairs id_1 < id_2; diagonal blocks see each pair twice and
        # self-pairs once — keep the i<j orientation only
        if bi == bj:
            keep = id1 < id2
        else:
            keep = id1 != id2
        lo = np.minimum(id1[keep], id2[keep])
        hi = np.maximum(id1[keep], id2[keep])
        return pd.DataFrame(
            {"id_1": lo, "id_2": hi, "cosine": sims[ii[keep], jj[keep]]}
        )

    out = both.groupBy("_bi", "_bj").applyInPandas(score, schema=out_schema)
    # off-diagonal blocks emit each unordered pair once; only orientation
    # normalization above could duplicate if ids hash to different blocks in
    # both roles — dropDuplicates guards the (rare) symmetric emission
    return (
        out.dropDuplicates(["id_1", "id_2"])
        .select("id_1", "id_2", F.round("cosine", 6).alias("cosine"))
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    Published recipe (SemDeDup, Abbas et al. 2023): cluster the embeddings
    with k-means, then WITHIN each cluster drop every item whose cosine to an
    already-kept item exceeds ``threshold`` — semantically-redundant examples
    are removed without any text comparison.  This implementation is
    deterministic end-to-end: centroids come from the seeded bounded-sample
    trainer (:func:`train_ivf_centroids`) and within-cluster pruning is
    greedy BY ASCENDING ID (an item is kept iff its cosine to every
    previously-KEPT lower-id item in the cluster is below the threshold), so
    the survivor set never depends on partitioning.

    Scale shape: one narrow pass assigns each vector to its nearest centroid
    (closure-broadcast centroid matrix — no join); ONE shuffle groups by
    cluster; each cluster prunes inside ``applyInPandas`` with incremental
    BLAS (each row scores against the kept-prefix matrix in one matvec).
    Per-task cost is O(cluster_size × kept) — at corpus scale you raise
    ``n_clusters`` so clusters stay bounded, the same knob as IVF (and the
    published recipe: they use k ≈ corpus/10k).  Cross-cluster duplicates
    are not compared — the documented recall trade of the method (near-dups
    have near-identical embeddings, which land in the same cell).

    Output: every input id with (cluster, kept, max_cosine_kept) where
    ``max_cosine_kept`` is the similarity to the closest kept lower-id item
    (the evidence for each drop; 1-indexed rank not needed).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # Null ids/vectors, wrong-dimension vectors, and vectors containing a
    # null/NaN ELEMENT are dropped up front — training, dim inference,
    # assignment, and the prune kernel all see the same clean relation.  The
    # element check matters for correctness, not just robustness: one NaN
    # vector kept early in a cluster would make every later row's max-cosine
    # NaN and silently mark the whole cluster as duplicates.
    clean = vectors.select(
        F.col(id_col).cast("long").alias("_id"),
        as_double_array(F.col(vec_col)).alias("_v"),
    ).where(
        F.col("_v").isNotNull()
        & F.col("_id").isNotNull()
        & ~F.exists(F.col("_v"), lambda x: x.isNull() | F.isnan(x))
    )
    if dim is None:
        first = clean.select(F.size(F.col("_v")).alias("d")).first()
        dim = 1 if first is None else int(first["d"])
    clean = clean.where(F.size(F.col("_v")) == dim)

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cluster", IntegerType()),
            StructField("kept", BooleanType()),
            StructField("max_cosine_kept", DoubleType()),
        ]
    )
    # Empty (or fully-filtered) input: return an empty result instead of
    # aborting in centroid training — a dedup operator must tolerate an
    # empty batch.
    if not clean.take(1):
        return vectors.sparkSession.createDataFrame([], out_schema)
    # order_col makes the driver-side k-means sample partition-invariant,
    # which the survivor-set determinism documented above depends on.
    centroids = train_ivf_centroids(
        clean, dim, n_clusters, vec_col="_v", order_col="_id"
    )
    assign1 = _nearest_centroids_udf(centroids, 1)
    thr = float(threshold)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        m = np.stack(pdf["_v"].to_numpy()[order]).astype("float64")
        nn = np.linalg.norm(m, axis=1)
        nn[nn == 0] = 1.0
        m = m / nn[:, None]
        kept = np.zeros(len(ids), dtype=bool)
        max_cos = np.full(len(ids), -1.0)
        kept_rows: list[int] = []
        for i in range(len(ids)):
            if kept_rows:
                sims = m[kept_rows] @ m[i]
                max_cos[i] = float(sims.max())
            if max_cos[i] < thr:
                kept[i] = True
                kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": int(pdf["_cell"].iloc[0]),
                "kept": kept,
                "max_cosine_kept": np.round(max_cos, 6),
            }
        )

    assigned = clean.withColumn("_cell", F.element_at(assign1(F.col("_v")), 1))
    return assigned.groupBy("_cell").applyInPandas(prune, schema=out_schema)
