"""Deduplication operators for large-scale document corpora.

These are rebuild extensions (the reference engine has no dedup surface); they
are designed Spark-first for 100 TB corpora:

- ``exact_duplicates`` — one shuffle on a 16-byte digest, map-side partial agg.
- ``ngram_jaccard_pairs`` — all verified near-dup pairs by n-gram Jaccard;
  candidate generation is inverted-index style (explode shingles → self-join on
  shingle hash), so cost is Σ bucket², not n² — the standard scalable shape.
- ``minhash_lsh_pairs`` — MinHash signatures + LSH banding: candidates only
  need to collide on one band, verification computes true Jaccard.  At scale
  this is the canonical sub-quadratic near-dup join; all hashing stays
  JVM-side (higher-order functions / xxhash64 — no Python in the hot path).
- ``simhash_pairs`` — 64-bit SimHash via a vectorized pandas UDF (numpy bit
  ops), Hamming-distance candidates via band join on 4×16-bit chunks.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cache import persist_tracked
from ..functions.parallelism import ensure_parallelism
from ..functions.text import (
    hash_column,
    hash_column2,
    normalize_text,
    tokens,
    word_shingles,
    word_shingles_of,
)

_LOG = logging.getLogger(__name__)
# one warning per process, not per iteration — the leak is per-call-bounded
# and a hot loop must not spam the driver log
_WARNED_CKPT_UNPERSIST = False

# Fixed (a, b) parameters for the MinHash permutation family
# h_i(x) = (a_i * x + b_i) mod p — deterministic, seedless, portable.
# p < 2^31 keeps a*x < 2^62, safe in int64 arithmetic everywhere.
MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)


def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic pseudo-random (a,b) pairs from a small LCG (no RNG state,
    reproducible everywhere)."""
    params = []
    x = 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (MINHASH_PRIME - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MINHASH_PRIME
        params.append((a, b))
    return params


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) texts: returns one row per distinct text
    with the surviving (minimum) id and the duplicate count.

    Scale: a single hash-aggregate shuffle keyed on md5(normalized text) — the
    digest (16 bytes) shuffles instead of the document body."""
    return (
        df.select(
            F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8")).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Drop exact duplicates, keeping the minimum-id row per normalized text."""
    survivors = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(survivors, on=id_col, how="inner")


def _with_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    # Shingling is the CPU-heavy narrow stage: spread single-row-group inputs
    # across cores first (no-op on well-split inputs).
    return _tokenized(df, text_col, id_col).select(
        "_id",
        word_shingles_of(F.col("_tk"), n).alias("_shingles"),
    )


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(_id, _tk array<string>) — the token array STAGED in its own
    projection so every downstream shingle expression reads the attribute
    instead of re-running the regex tokenization (which `word_shingles_of`'s
    slice lambda would otherwise re-evaluate once per ELEMENT — see that
    docstring for the round-12 A/B numbers).  The projection survives
    CollapseProject because `_tk` is referenced repeatedly by non-cheap
    expressions; nothing is persisted."""
    return ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_tk"),
    )


def _hashed_shingle_docs(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_fn: str
) -> DataFrame:
    """PERSISTED (_id, _hs array<long>) — each document's distinct shingle
    hashes (the relation ``minhash_lsh_pairs`` has always cached as
    ``shh``).  ONLY for callers that re-read the arrays several times
    (signatures + two verification join sides): a round-12 experiment that
    based the d02 inverted index on this cache was REVERTED — at sf1 the
    columnar cache materialization of the array column cost ~12 s where the
    inline double-evaluation index pipeline builds the whole exploded index
    in ~4 s (cache write of array<long> is far slower than recomputing the
    shingles; guide §5 "caching is only worth it when recomputing is more
    expensive than the pressure it creates")."""
    return persist_tracked(
        _tokenized(df, text_col, id_col).select(
            "_id",
            F.transform(
                word_shingles_of(F.col("_tk"), n),
                lambda s: hash_column(s, hash_fn),
            ).alias("_hs"),
        )
    )


def _exploded_shingle_index(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_fn: str
) -> DataFrame:
    """(doc id, doc shingle count, shingle hash) inverted index, one row per
    (doc, shingle).

    The explode input is an inline EXPRESSION over the staged token
    attribute (``_tokenized``): three round-12 A/B probes fixed this exact
    shape (all sf1, byte-identical checksums, numbers in
    OPTIMIZATION_r12.md):

    - token array materialized below, shingle expression inline → index
      stage 7.4→3.0 s (the regex tokenization no longer re-runs inside the
      slice lambda once per shingle);
    - shingle ARRAY materialized below and fed to the generator as a bare
      attribute → 3–8× SLOWER than even the old double-evaluation form;
      keep generator inputs expressions;
    - persisted hash-array base (the round-12 cache experiment, REVERTED):
      the columnar cache write alone cost ~3× the whole inline pipeline.

    ``_n`` (the document's distinct-shingle count, needed for the Jaccard
    denominator) rides along on every index row.  It MUST be computed in a
    projection BELOW the Generate so it evaluates once per DOCUMENT and is
    passed through: referencing size(shingles) in the same select as the
    explode puts it in the Generate's PARENT project, i.e. once per shingle
    (measured 8× slower).  The shingle expression is still evaluated twice
    per document (size + explode) — over the token attribute that is cheap,
    and both cache-based alternatives measured slower."""
    sh = word_shingles_of(F.col("_tk"), n)
    with_n = _tokenized(df, text_col, id_col).select(
        "_id",
        "_tk",
        F.size(sh).alias("_n"),
    )
    return with_n.select(
        "_id",
        "_n",
        F.explode(sh).alias("_s"),
    ).select("_id", "_n", hash_column(F.col("_s"), hash_fn).alias("_h"))


# Σ df² (the dense path's candidate-pair volume) above which the AUTO
# Jaccard mode picks the prefix-filtered path.  Re-measured round 11 on
# the regenerated sf1 corpus (BENCH.md): dense 13.5–24.7 s vs prefix
# 38.7–44.2 s at Σ = 254M — dense WINS at 50k docs on this corpus shape
# (round 10's 18-vs-28 crossover does not reproduce on the new data);
# dense cost grows ~linearly in Σ while the prefix path's is dominated
# by its fixed shuffle overhead, putting the extrapolated crossover
# near Σ ≈ 700M.  1B keeps dense through everything measured and
# switches where the quadratic term must dominate.
PREFIX_AUTO_PAIR_BUDGET = 1_000_000_000

# Candidate-pair rows per aggregation task above which the dense path's
# pair-count aggregate gets its OWN partition count instead of the session's
# ``spark.sql.shuffle.partitions``.  Measured (round 13, sf1, event log):
# with 32 partitions the 254M-pair count aggregate spilled ~1.25 GB to disk
# on BOTH sides (partial map-side agg AND final agg — each task's hash table
# overflowed its share of execution memory and fell back to sort-based
# aggregation; guide §5 "heavy spill is slow", §2.2 "fewer, larger reduce
# partitions" sized to the data).  2M pair rows/task keeps the per-task hash
# table ~100 MB — in-memory at 32 concurrent tasks in the local harness and
# a sane executor-task budget at cluster scale.  The count comes from the
# SAME Σ df² probe the auto path already runs, so adapting costs no extra
# pass; the partition count affects only layout, never results.
PAIR_AGG_ROWS_PER_TASK = 2_000_000
# Upper bound on the derived partition count: a corpus at the prefix-switch
# boundary (Σ df² near 1e9) derives ~500 partitions; anything far past that
# switches to the prefix path anyway, and a runaway count (bad stats) must
# not schedule millions of tasks.
PAIR_AGG_MAX_PARTITIONS = 8_192


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    hash_fn: str = "fast",
    shingle_df_cap: int | None = 10_000,
    prefix_filter: bool | str = "auto",
) -> DataFrame:
    """All pairs (id_1 < id_2) whose word-``n``-gram Jaccard ≥ ``threshold``.

    With ``prefix_filter=True``, candidate generation uses the
    AllPairs/PPJoin PREFIX principle
    (Bayardo et al., WWW'07; Xiao et al., WWW'08): shingles order
    globally by (document frequency, hash) and only each document's
    first ``n_i − ⌈t·n_i⌉ + 1`` shingles — its rarest — are indexed; a
    pair with Jaccard ≥ t must share a prefix shingle (overlap ≥ ⌈t·n⌉
    forces the prefixes to intersect), so completeness holds while the
    candidate volume collapses (rare shingles have tiny postings).
    Candidates verify EXACTLY against the full hashed shingle sets
    (JVM ``array_intersect``).  Measured (BENCH.md round 11, regenerated
    sf1 corpus): the prefix path's extra shuffles (df agg + join,
    per-doc arrays, verification joins) carry enough fixed overhead that
    the DENSE path wins through Σbucket² = 254M (sf1: dense 13.5–24.7 s
    vs prefix 38.7–44.2 s); prefix is the asymptotic option for corpora
    whose candidate volume grows past ``PREFIX_AUTO_PAIR_BUDGET``.

    ``prefix_filter="auto"`` (the default, round-11) COST-SWITCHES from
    the observable that decides the race: Σ bucket² over the posting
    lists — the dense path's exact candidate-pair volume — read off the
    SAME persisted posting-list aggregation the dense path starts with
    (one cheap scan of persisted data, NO extra shuffle; the dense
    plan's shuffle count is unchanged).  Σ ≤ ``PREFIX_AUTO_PAIR_BUDGET``
    proceeds dense on those buckets; above it switches to prefix,
    REUSING the buckets as both the document-frequency relation (bucket
    size = df) and the re-derived shingle index — the probe is a
    prefix-path input, not a wasted pass.

    ``prefix_filter=False`` (or threshold 0) keeps the dense path:
    explode distinct shingles → hash → self-join on shingle hash → count
    common shingles per pair → Jaccard from |A|+|B|-common.  Only 8-byte
    hashes and counts move through the shuffles; cost is
    Σ (docs-per-shingle)².

    Under both paths ``shingle_df_cap`` bounds every posting list:
    shingles appearing in more than ``cap`` documents (stopword runs —
    quadratic hot buckets at corpus scale) are dropped from CANDIDATE
    GENERATION only.  The dense path restores exact common counts for
    capped shingles via per-doc hot arrays, so a true pair is missed
    only if EVERY shared shingle is hotter than the cap; the prefix path
    misses a pair only if every shared PREFIX shingle is hotter — both
    are the pathological all-stopword case the cap exists for.
    """
    if prefix_filter == "auto" and threshold > 0:
        all_buckets = persist_tracked(
            _exploded_shingle_index(df, text_col, id_col, n, hash_fn)
            .groupBy("_h")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_id"), F.col("_n")))
                ).alias("_ids")
            )
        )
        probe = all_buckets.agg(
            F.sum(F.size("_ids").cast("long") * F.size("_ids")).alias("_s"),
            F.max(F.size("_ids")).alias("_max"),
        ).first()
        est = probe["_s"] or 0
        max_bucket = probe["_max"] or 0
        # Pair-volume-adaptive aggregation layout (round 13): when the dense
        # candidate volume Σ df² would put more than PAIR_AGG_ROWS_PER_TASK
        # raw pair rows into each of the session's default shuffle
        # partitions, give the pair-count aggregate ceil(est / rows_per_task)
        # partitions of its own (bounded above).  Below the threshold the
        # plan is byte-identical to round 12's.
        shuffle_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        pair_parts = None
        if est > PAIR_AGG_ROWS_PER_TASK * shuffle_parts:
            pair_parts = min(
                -(-est // PAIR_AGG_ROWS_PER_TASK), PAIR_AGG_MAX_PARTITIONS
            )
        if est > PREFIX_AUTO_PAIR_BUDGET:
            # run the prefix path EXACTLY as the opt-in form would — a
            # bucket-reuse variant (re-deriving the index and df relation
            # from the persisted arrays) measured 16 s SLOWER at sf1
            # than the plain path (two full re-reads of the persisted
            # arrays through the df join and the verification join), so
            # the probe shuffle is written off instead: past this Σ it
            # is noise against the quadratic dense cost being avoided
            all_buckets.unpersist()
            return _ngram_jaccard_prefix(
                df, text_col, id_col, n, threshold, hash_fn,
                shingle_df_cap,
            )
        return _ngram_jaccard_dense(
            None, threshold,
            # The probe already knows the LARGEST posting list.  When no
            # bucket exceeds the cap, the hot relation is empty BY
            # CONSTRUCTION (`where(size > cap)` matches nothing) and the
            # correction joins add size(intersect([],[])) = 0 — so eliding
            # the whole hot subtree is result-identical while removing two
            # broadcast-build jobs and two joins from the plan (guide §2.4:
            # remove shuffles/passes outright; §1.2 order-of-operations).
            # The cap still bounds candidate generation whenever a hot
            # bucket actually exists.
            shingle_df_cap
            if (shingle_df_cap is not None and max_bucket > shingle_df_cap)
            else None,
            _buckets=all_buckets.where(F.size("_ids") > 1),
            _pair_agg_partitions=pair_parts,
        )
    if prefix_filter and threshold > 0:
        return _ngram_jaccard_prefix(
            df, text_col, id_col, n, threshold, hash_fn, shingle_df_cap
        )
    return _ngram_jaccard_dense(
        _exploded_shingle_index(df, text_col, id_col, n, hash_fn),
        threshold,
        shingle_df_cap,
    )


def _ngram_jaccard_dense(
    exploded: DataFrame | None,
    threshold: float,
    shingle_df_cap: int | None,
    _buckets: DataFrame | None = None,
    _pair_agg_partitions: int | None = None,
) -> DataFrame:
    # ONE shuffle groups the (id, size, hash) index into per-shingle posting
    # lists; candidate pairs are generated inside each bucket (sorted
    # (id, n) structs → id_1 < id_2 for free, and every candidate pair
    # carries both Jaccard denominators with it — no sizes relation, no
    # re-join at the end).  Bucket size doubles as document frequency, so
    # the hot set falls out of the same aggregation with no extra pass and
    # no driver collect.  Pair volume is Σ bucket²; buckets are persisted
    # because the cold-pairs and hot-correction branches both read them.
    # (``_buckets`` — the auto path's already-persisted posting lists —
    # skips the shuffle entirely.)
    buckets = _buckets if _buckets is not None else persist_tracked(
        exploded.groupBy("_h")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("_n")))
            ).alias("_ids")
        )
        .where(F.size("_ids") > 1)
    )
    doc_hot = None
    cold_buckets = buckets
    if shingle_df_cap is not None:
        cold_buckets = buckets.where(F.size("_ids") <= shingle_df_cap)
        # Per-doc hot-shingle arrays (shingles in MORE than `cap` documents —
        # stopword runs whose buckets would be quadratic at corpus scale),
        # used to restore exact common counts for pairs sharing hot shingles.
        # The hot relation is tiny by construction: ≤ total_shingles/cap rows.
        doc_hot = (
            buckets.where(F.size("_ids") > shingle_df_cap)
            .select("_h", F.explode("_ids").alias("_e"))
            .groupBy(F.col("_e._id").alias("_id"))
            .agg(F.sort_array(F.collect_list("_h")).alias("_hot"))
        )
    # Two chained generators keep per-row memory bounded by one posting list
    # (never the full pairs array of a bucket): explode the left entry with
    # its position, then explode the entries after it.
    pairs = cold_buckets.select(
        F.posexplode("_ids").alias("_i", "_e1"), F.col("_ids")
    ).select(
        F.col("_e1._id").alias("id_1"),
        F.col("_e1._n").alias("_n1"),
        F.explode(
            F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
        ).alias("_e2"),
    )
    if threshold > 0:
        # Length filter (AllPairs/PPJoin): common ≤ min(n1,n2) and
        # |union| ≥ max(n1,n2), so J ≤ min/max — a pair whose sizes differ
        # by more than the threshold ratio can NEVER reach it and is
        # dropped BEFORE the pair-count shuffle (pure codegen predicate;
        # sound for hot-corrected pairs too, the bound is size-only).
        pairs = pairs.where(
            (F.col("_n1") >= F.lit(threshold) * F.col("_e2._n"))
            & (F.col("_e2._n") >= F.lit(threshold) * F.col("_n1"))
        )
    # _n1/_n2 are functionally dependent on the ids; grouping on all four
    # keeps the aggregate a plain count with no first()/join fix-up.
    pair_rows = pairs.select(
        "id_1",
        "_n1",
        F.col("_e2._id").alias("id_2"),
        F.col("_e2._n").alias("_n2"),
    )
    if _pair_agg_partitions is not None:
        # Pair-volume-adaptive layout (see PAIR_AGG_ROWS_PER_TASK): hash-
        # repartition the raw pair rows by the pair key into enough
        # partitions that each count task's hash table stays in memory.
        # HashPartitioning(id_1, id_2) satisfies the groupBy's clustering
        # (subset of the keys), so this IS the aggregate's exchange — no
        # second shuffle — and AQE leaves numbered repartitions alone; both
        # aggregate phases run ABOVE it (plan-verified: no agg below the
        # exchange).  Measured at sf1 (round 13, alternating A/B ×3, event
        # log, checksum-identical output): the old 32-partition shape's
        # map-side partial agg collapsed only 95.8M→95.4M pair rows
        # (candidate multiplicity ≈ 1 after the length filter) while its
        # hash tables spilled 1.24 GB and the 32-task final agg spilled
        # another 1.28 GB; this shape shuffles the raw pairs (95.8M rows,
        # 1.46 GB — within 2% of the "aggregated" volume) with ZERO spill
        # on either side: pair stage 8.8-15.3 s → 4.1-8.2 s, agg stage
        # 5.3-9.3 s → 4.2-6.6 s, d02 warm exec median 24.1 → 11.0 s (guide
        # §5: heavy spill is slow; §2.2: partitions sized to the data).
        # At/below the default partition count the round-12 shape is kept
        # verbatim — partial aggregation is right when it fits in memory.
        pair_rows = pair_rows.repartition(
            _pair_agg_partitions, "id_1", "id_2"
        )
    common = pair_rows.groupBy("id_1", "id_2", "_n1", "_n2").agg(
        F.count(F.lit(1)).alias("_common")
    )
    if doc_hot is not None:
        no_hot = F.array().cast("array<long>")
        common = (
            common.join(
                doc_hot.select(F.col("_id").alias("id_1"), F.col("_hot").alias("_h1")),
                on="id_1",
                how="left",
            )
            .join(
                doc_hot.select(F.col("_id").alias("id_2"), F.col("_hot").alias("_h2")),
                on="id_2",
                how="left",
            )
            .withColumn(
                "_common",
                F.col("_common")
                + F.size(
                    F.array_intersect(
                        F.coalesce("_h1", no_hot), F.coalesce("_h2", no_hot)
                    )
                ),
            )
            .drop("_h1", "_h2")
        )
    return (
        common.select(
            "id_1",
            "id_2",
            (
                F.col("_common")
                / (F.col("_n1") + F.col("_n2") - F.col("_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _ngram_jaccard_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    hash_fn: str,
    shingle_df_cap: int | None,
) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs (see :func:`ngram_jaccard_pairs`).

    Plan shape: one df aggregation over the inverted index, one join
    attaching df to index rows, one per-doc collect into the globally
    ordered hash array (rarest first), prefix-posting buckets → candidate
    pairs with the AllPairs length filter, then exact verification by
    joining the DISTINCT candidates back to the full per-doc hash arrays
    — ``array_intersect`` runs JVM-side, and the denominators ride the
    candidate rows.  Every relation that moves is 8-byte hashes, ids, and
    counts; the per-doc arrays shuffle once into the verification join.

    Round-13 "single-explode" experiment — tried and REVERTED (measure
    first, guide §1.1): replacing the df count + attach join with ONE
    posting-list aggregation (collect_list per shingle, df = size, then
    re-explode to hand each (doc, shingle) its df joinlessly) measured
    60-100% SLOWER at sf1 (alternating A/B, checksum-identical: old exec
    30.7/31.2/35.1 s vs new 49.6/61.1 s).  Collecting 2.6M (_id, _n)
    structs into 0.8M per-shingle lists and re-exploding costs far more
    than the second (cheap, fully codegen'd) index derivation plus the
    broadcast of the count-only df relation.  Do not re-try the
    restructure on intuition; it only wins if the tokenize pass dominates
    BOTH aggregations, which it does not on any measured corpus.

    Completeness: overlap ≥ ⌈t·max(n1,n2)⌉ for J ≥ t, and two sets with
    overlap ≥ α must share an element within their first (size − α + 1)
    elements under ANY shared total order — the (df, hash) order makes
    those prefix elements the rarest, so the postings stay small."""
    from functools import reduce

    exploded = _exploded_shingle_index(df, text_col, id_col, n, hash_fn)
    dfreq = exploded.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    # per-doc shingle hashes in the GLOBAL (df, h) order; ties on the
    # struct sort are total, so every document orders identically
    docs = (
        exploded.join(dfreq, on="_h")
        .groupBy("_id", "_n")
        .agg(
            F.sort_array(F.collect_list(F.struct("_df", "_h"))).alias("_sh")
        )
        .select(
            "_id",
            "_n",
            F.col("_sh._h").alias("_all"),
            F.slice(
                F.col("_sh._h"),
                1,
                F.greatest(
                    F.lit(0),
                    F.col("_n")
                    - F.ceil(F.lit(threshold) * F.col("_n")).cast("int")
                    + 1,
                ),
            ).alias("_pref"),
        )
    )
    docs = persist_tracked(docs)
    buckets = (
        docs.select("_id", "_n", F.explode("_pref").alias("_h"))
        .groupBy("_h")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("_n")))
            ).alias("_ids")
        )
        .where(F.size("_ids") > 1)
    )
    if shingle_df_cap is not None:
        buckets = buckets.where(F.size("_ids") <= shingle_df_cap)
    pairs = buckets.select(
        F.posexplode("_ids").alias("_i", "_e1"), F.col("_ids")
    ).select(
        F.col("_e1._id").alias("id_1"),
        F.col("_e1._n").alias("_n1"),
        F.explode(
            F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
        ).alias("_e2"),
    )
    # AllPairs length filter: J ≤ min(n1,n2)/max(n1,n2)
    pairs = pairs.where(
        (F.col("_n1") >= F.lit(threshold) * F.col("_e2._n"))
        & (F.col("_e2._n") >= F.lit(threshold) * F.col("_n1"))
    )
    cand = pairs.select(
        "id_1",
        "_n1",
        F.col("_e2._id").alias("id_2"),
        F.col("_e2._n").alias("_n2"),
    ).distinct()
    scored = (
        cand.join(
            docs.select(F.col("_id").alias("id_1"), F.col("_all").alias("_a1")),
            on="id_1",
        )
        .join(
            docs.select(F.col("_id").alias("id_2"), F.col("_all").alias("_a2")),
            on="id_2",
        )
        .withColumn(
            "_common", F.size(F.array_intersect("_a1", "_a2"))
        )
    )
    return scored.select(
        "id_1",
        "id_2",
        (
            F.col("_common")
            / (F.col("_n1") + F.col("_n2") - F.col("_common"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    hash_fn: str = "fast",
    _shingles: DataFrame | None = None,
    _hashed_shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<long> of length ``num_hashes``) per document.

    Signature i = min over shingles s of (a_i * h(s) + b_i) mod p.  The whole
    computation is two nested higher-order functions over the shingle array —
    no explode, no shuffle, evaluated in codegen.  ``_shingles`` lets a caller
    share one (possibly persisted) shingle relation across plan branches;
    ``_hashed_shingles`` (``_id``, ``_hs array<long>`` of raw shingle hashes)
    skips the string-hash fold entirely."""
    params = _minhash_params(num_hashes)
    if _hashed_shingles is not None:
        hashed = _hashed_shingles.select(
            "_id",
            F.transform(
                F.col("_hs"),
                lambda h: (h % MINHASH_PRIME + MINHASH_PRIME) % MINHASH_PRIME,
            ).alias("_hashes"),
        )
    else:
        sh = (
            _shingles
            if _shingles is not None
            else _with_shingles(df, text_col, id_col, n)
        )
        # Materialize the per-shingle hash array in its own projection so the
        # string hash fold runs once, not once per permutation (Catalyst does
        # not CSE across the k lambdas).  (h % p + p) % p maps xxhash64's
        # negative outputs into [0, p).
        hashed = sh.select(
            "_id",
            F.transform(
                F.col("_shingles"),
                lambda s: (hash_column(s, hash_fn) % MINHASH_PRIME + MINHASH_PRIME)
                % MINHASH_PRIME,
            ).alias("_hashes"),
        )

    # One SQL-parsed expression instead of k × (transform + array_min)
    # Column/lambda constructions: building each pyspark lambda costs several
    # py4j round trips, and at k=32 the DRIVER spent ~0.9 s per call just
    # constructing this expression tree (profiled round 12 — d03's build time
    # was 1.27 s against 1.86 s of actual execution).  The parsed tree is the
    # SAME expression (a_i * h + b_i) % p folded through array_min, so plans
    # and results are bit-identical; only the construction path changes
    # (guide §1.2: per-task work includes the driver's fixed costs at small
    # scale).  Literals carry the L suffix so arithmetic stays int64.
    terms = ",".join(
        f"array_min(transform(_hashes, h -> ({a}L * h + {b}L) % {MINHASH_PRIME}L))"
        for a, b in params
    )
    sig = F.expr(f"array({terms})")
    return hashed.select(F.col("_id").alias(id_col), sig.alias("signature"))


def band_signatures(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Explode (id, signature) into (``_id``, ``_band``, ``_digest``) LSH
    band rows.  The digest is the raw signature element for r=1, else
    xxhash64 of the band slice — an 8-byte join key either way (string
    concat digests shuffle several× more bytes and compare slower)."""
    r = rows_per_band
    # single parsed expression for the same reason as minhash_signatures'
    # permutation array: k Column constructions → one JVM parse
    if r == 1:
        digests = ",".join(f"signature[{j}]" for j in range(bands))
    else:
        digests = ",".join(
            f"xxhash64(slice(signature, {j * r + 1}, {r}))" for j in range(bands)
        )
    return sigs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.expr(f"array({digests})")).alias("_band", "_digest"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 32,
    threshold: float = 0.8,
    hash_fn: str = "fast",
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, verified with true Jaccard.

    ``bands`` must divide ``num_hashes``; rows per band r = num_hashes/bands.
    Candidates = pairs agreeing on all r rows of ≥1 band (join on the band
    digest); each candidate is then *verified* by computing exact n-gram
    Jaccard, so the output contains no false positives.  With r=1 (the
    default: bands == num_hashes) the miss probability for a pair at the
    threshold is (1-t)^k ≈ 4e-23 — recall is effectively exact while the join
    stays sub-quadratic."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # ONE hashed-shingle relation (_id, _hs array<long>) serves signature
    # generation AND both verification join sides; persisting it avoids
    # re-shingling the corpus three times, and carrying 8-byte hashes instead
    # of shingle strings keeps the verification join rows ~10× narrower (the
    # Jaccard over distinct hashes equals the Jaccard over distinct shingles
    # modulo 64-bit collisions).  minhash_lsh_pairs is the ONLY consumer of
    # this persisted relation: the d02/d11 index deliberately rebuilds
    # inline from _tokenized instead — the cached-base experiment was
    # REVERTED (see _hashed_shingle_docs's docstring for the sf1 numbers);
    # do not re-introduce the sharing (ADVICE r12).
    shh = _hashed_shingle_docs(df, text_col, id_col, n, hash_fn)
    # Persist signatures too: the band posexplode below would otherwise
    # re-evaluate the full 32-permutation signature expression per emitted
    # band row (generator-input re-evaluation, see _exploded_shingle_index).
    sigs = persist_tracked(
        minhash_signatures(
            df, text_col, id_col, n, num_hashes, hash_fn, _hashed_shingles=shh
        )
    )
    banded = band_signatures(sigs, id_col, bands, r)
    # Same posting-list shape as ngram_jaccard_pairs: ONE shuffle groups the
    # band rows into (band, digest) buckets and pairs are generated inside
    # each bucket (sorted ids → id_1 < id_2 for free).  The previous
    # self-join on the digest shuffled the banded relation onto both join
    # sides; pair volume (Σ bucket²) is identical.
    bucketed = (
        banded.groupBy("_band", "_digest")
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    candidates = (
        bucketed.select(F.posexplode("_ids").alias("_i", "id_1"), F.col("_ids"))
        .select(
            "id_1",
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
            ).alias("id_2"),
        )
        .distinct()
    )
    verified = (
        candidates.join(
            shh.select(F.col("_id").alias("id_1"), F.col("_hs").alias("_sh1")),
            on="id_1",
        )
        .join(
            shh.select(F.col("_id").alias("id_2"), F.col("_hs").alias("_sh2")),
            on="id_2",
        )
        .select(
            "id_1",
            "id_2",
            (
                F.size(F.array_intersect("_sh1", "_sh2"))
                / F.size(F.array_union("_sh1", "_sh2"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF (numpy bit
    counting — the per-bit ±weight accumulation has no efficient built-in
    expression, so this is the sanctioned Pandas-UDF path for custom kernels)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    # no annotations: PEP-563 stringified hints aren't resolvable by
    # pandas_udf's signature inspection when pandas is imported locally
    @F.pandas_udf(LongType())
    def simhash64(texts):
        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        # Vectorized per Arrow batch: hash every token of every document
        # once, unpack all hashes to a (n_tokens, 64) bit matrix in one
        # shot, then one segment-sum per document — no per-token Python
        # loop (round-4 rewrite of the per-token accumulation; identical
        # output, pinned by test_simhash_vectorized_checksum).
        doc_tokens = [(t or "").lower().split() for t in texts]
        counts = np.fromiter(
            (len(toks) for toks in doc_tokens), dtype=np.int64, count=len(doc_tokens)
        )
        flat = [tok for toks in doc_tokens for tok in toks]
        if flat:
            hashes = hash_tokens(flat)
            # (n_tokens, 64) sign matrix: bit set → +1, clear → -1.  int8
            # keeps the transient at 64 B/token (int64 would be 512 B/token —
            # a multi-GB spike on a 10k-row Arrow batch of long documents);
            # the reduceat accumulates into int64 so segment sums can't
            # saturate.
            bits = (
                (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int8)
            signs = 2 * bits - 1  # int8
            # per-document segment sums via reduceat over the flat matrix
            nonempty = counts > 0
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1][nonempty]
            acc = np.add.reduceat(signs, starts, axis=0, dtype=np.int64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            values = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[nonempty] = values.astype(np.int64)  # two's-complement view
        return pd.Series(out)

    return ensure_parallelism(df).select(
        F.col(id_col), simhash64(F.col(text_col)).alias("simhash")
    )


def hash_token(tok: str) -> int:
    """Portable 64-bit FNV-1a (scalar reference; the SimHash UDF uses the
    vectorized :func:`hash_tokens` with identical output)."""
    h = 0xCBF29CE484222325
    for byte in tok.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) % (1 << 64)
    return h


# Tokens longer than this hash through the scalar loop instead of the padded
# matrix: the matrix is n_tokens × max_len bytes, so ONE pathological
# unbroken token (a 500 KB base64 blob in a web crawl) must not inflate the
# whole batch's buffer to n_tokens × 500 KB.
_VECTOR_HASH_MAX_LEN = 256


def hash_tokens(tokens: list[str]):
    """64-bit FNV-1a of every token, vectorized ACROSS tokens: all byte
    strings pack into one padded (n_tokens, max_len) uint8 matrix and the
    FNV fold loops over BYTE POSITIONS (bounded by the longest token), not
    tokens — each step is one masked numpy xor-multiply over every token at
    once.  Bit-identical to :func:`hash_token` (uint64 wraps = mod 2^64).

    Rare oversized tokens (> ``_VECTOR_HASH_MAX_LEN`` bytes) fall back to
    the scalar loop individually, bounding the padded buffer at
    n_tokens × 256 B regardless of the longest token in the batch."""
    import numpy as np

    encoded = [t.encode("utf-8") for t in tokens]
    n = len(encoded)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0 or lens.max() == 0:
        return h
    big = lens > _VECTOR_HASH_MAX_LEN
    if big.any():
        for i in np.nonzero(big)[0]:
            h[i] = np.uint64(hash_token(tokens[int(i)]))
        lens = np.where(big, 0, lens)
        if lens.max() == 0:
            return h
    width = int(lens.max())
    buf = np.zeros((n, width), dtype=np.uint8)
    for i, b in enumerate(encoded):  # per-token memcpy only, no arithmetic
        if len(b) <= width:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    prime = np.uint64(0x100000001B3)
    for j in range(width):
        active = lens > j
        h[active] = (h[active] ^ buf[active, j].astype(np.uint64)) * prime
    return h


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunk_df_cap: int | None = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Uses the pigeonhole band trick: split 64 bits into ``max_hamming + 1``
    chunks; any pair within the radius must agree exactly on ≥1 chunk, so
    candidates come from equi-joins on chunk values — sub-quadratic, shuffle
    keyed by 16-bit chunk.

    ``chunk_df_cap`` bounds every (chunk, value) bucket, same trade as
    ``ngram_jaccard_pairs``'s df-cap: a degenerate corpus (millions of
    short/empty docs all hashing to signature 0) would otherwise collect one
    quadratic hot bucket into a single aggregation row.  Pairs inside a
    capped bucket are found only if they also share a COLDER chunk; truly
    identical signatures in an over-cap population are the pathological case
    the cap exists for (route those through exact dedup first)."""
    chunks = max_hamming + 1
    width = 64 // chunks
    # Persist the signature relation: the chunk posexplode below is a
    # generator whose input would otherwise re-evaluate the pandas-UDF
    # kernel per emitted row, and WITHOUT a persist the (former) two-sided
    # self-join ran the Python kernel once per join side — the exact defect
    # class fixed in minhash_lsh_pairs (see the persist at its `sigs`).
    sigs = persist_tracked(
        simhash_signatures(df, text_col, id_col).select(
            F.col(id_col).alias("_id"), "simhash"
        )
    )
    mask = (1 << width) - 1
    banded = sigs.select(
        "_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_chunk", "_val"),
    )
    # Same posting-list shape as ngram_jaccard_pairs / minhash_lsh_pairs:
    # ONE shuffle groups band rows into (chunk, value) buckets; pairs are
    # generated inside each bucket (sorted (id, simhash) structs → id_1 <
    # id_2 for free, and each pair carries both signatures so no re-join is
    # needed for the Hamming check).
    bucketed = (
        banded.groupBy("_chunk", "_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("simhash")))
            ).alias("_ids")
        )
        .where(F.size("_ids") > 1)
    )
    if chunk_df_cap is not None:
        bucketed = bucketed.where(F.size("_ids") <= chunk_df_cap)
    pairs = (
        bucketed.select(F.posexplode("_ids").alias("_i", "_e1"), F.col("_ids"))
        .select(
            F.col("_e1._id").alias("id_1"),
            F.col("_e1.simhash").alias("_s1"),
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
            ).alias("_e2"),
        )
        .select(
            "id_1",
            F.col("_e2._id").alias("id_2"),
            "_s1",
            F.col("_e2.simhash").alias("_s2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2")))
    return pairs.select(
        "id_1", "id_2", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def duplicate_clusters(
    pairs: DataFrame,
    id1_col: str = "id_1",
    id2_col: str = "id_2",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a duplicate-pair graph: every node mapped to
    its component's minimum id (``cluster_id``) — the canonical-survivor
    assignment step after any near-dup pair generator.

    Algorithm: iterative min-label propagation (the standard Spark CC shape —
    alternating join + min-aggregate until a fixpoint, O(graph diameter)
    rounds; near-dup graphs are shallow so this converges in a few).  Each
    round is ONE job: the new labels carry the previous round's label
    alongside, an ``Observation`` (CollectMetrics — computed inside the same
    action, zero extra passes) counts the changed rows while the eager
    ``localCheckpoint`` materializes them — a driver loop, but over
    whole-DataFrame ops, so every round is fully distributed."""
    global _WARNED_CKPT_UNPERSIST
    from pyspark.sql import Observation

    edges = persist_tracked(
        pairs.select(F.col(id1_col).alias("src"), F.col(id2_col).alias("dst"))
        .union(pairs.select(F.col(id2_col).alias("src"), F.col(id1_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    prev_ckpt_rdd = None
    for _ in range(max_iterations):
        # candidate label for each node: min over its own and neighbors' labels
        lab = labels.select("node", "label")
        neighbor_labels = (
            edges.join(lab, edges.dst == lab["node"])
            .select(F.col("src").alias("node"), "label")
        )
        obs = Observation()
        new_labels = (
            labels.select("node", "label")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # carry the previous label so convergence is decided by the SAME
            # action that materializes the checkpoint (the join reads the
            # previous round's cached checkpoint, not a recompute)
            .join(
                labels.select(F.col("node"), F.col("label").alias("_prev")),
                on="node",
                how="left",
            )
            .observe(
                obs,
                F.count(
                    F.when(~F.col("label").eqNullSafe(F.col("_prev")), 1)
                ).alias("changed"),
            )
            # localCheckpoint (not just persist) TRUNCATES lineage: without it
            # the plan grows by one join per round (~50 nodes/iteration) and
            # planning cost/driver memory blow up long before the data does.
            # eager=True is the round's single job; it also fires the
            # observation above.
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"]
        labels.unpersist()  # releases the initial persist (round 1)
        # DataFrame.unpersist does NOT free a localCheckpoint's storage —
        # each round would leak one checkpointed labels copy.  The storage
        # belongs to the INTERNAL RDD inside the checkpoint's LogicalRDD
        # plan (df.rdd wraps a derived deserializer RDD; unpersisting that
        # is a no-op), so release it at the source.  The previous round's
        # checkpoint is safe to drop once this round's is eagerly
        # materialized; only the FINAL one (which the returned plan reads)
        # stays — a single bounded residue per call.
        if prev_ckpt_rdd is not None:
            try:
                prev_ckpt_rdd.unpersist(False)
            except Exception:
                # Internal API moved (Spark upgrade / plan-shape change) —
                # a bounded per-call leak, not an error, but it must be
                # OBSERVABLE or the regression is silent (pinned by
                # test_duplicate_clusters_releases_checkpoints).
                if not _WARNED_CKPT_UNPERSIST:
                    _WARNED_CKPT_UNPERSIST = True
                    _LOG.warning(
                        "duplicate_clusters: could not unpersist round"
                        " checkpoint (Spark internal API changed?) — storage"
                        " will accumulate one labels copy per iteration"
                    )
        try:
            prev_ckpt_rdd = new_labels._jdf.queryExecution().analyzed().rdd()
        except Exception:
            prev_ckpt_rdd = None
            if not _WARNED_CKPT_UNPERSIST:
                _WARNED_CKPT_UNPERSIST = True
                _LOG.warning(
                    "duplicate_clusters: could not reach the checkpoint RDD"
                    " (Spark internal API changed?) — storage will accumulate"
                    " one labels copy per iteration"
                )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 10,
) -> DataFrame:
    """Corpus-wide paragraph-level deduplication (the CCNet/RefinedWeb
    boilerplate-removal step): every paragraph that already appeared earlier
    in the corpus — in ANY document — is dropped; each document is rebuilt
    from its surviving paragraphs in original order.

    "First occurrence" is the minimum (doc id, paragraph position), a total
    order that makes the result deterministic under any partitioning.
    Paragraphs shorter than ``min_chars`` (blank lines, headers, markup
    stubs) pass through untouched: deduping them would hot-spot the shuffle
    on near-universal keys and strip legitimate structure.

    Scale shape — two shuffles, no windows: the first-occurrence owner per
    paragraph hash is a ``min(struct(id, pos))`` hash aggregate (map-side
    partial, so a paragraph duplicated a billion times still combines down
    to one row per map task — a window/row_number formulation would pull
    every copy of a hot paragraph into one task); survivors then reassemble
    with one groupBy on the document id.  Only 16-byte digests and positions
    shuffle on the dedup hop, never paragraph text.

    Output: (id, text of surviving paragraphs, n_paragraphs, n_kept).
    Documents whose every paragraph was seen elsewhere survive with empty
    text (n_kept = 0) so the caller decides whether to drop them.
    """
    # The exploded paragraph relation feeds FOUR branches (eligible/hashed,
    # short, the kept join, totals) — persist it so the corpus is scanned and
    # split exactly once instead of re-derived per branch (at 100 TB the
    # split pass IS the cost).  Tracked for release at next query entry.
    paras = persist_tracked(
        ensure_parallelism(df).select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_para"),
        )
    )
    eligible = paras.where(F.length(F.trim(F.col("_para"))) >= min_chars)
    # md5 of the normalized paragraph: dedup is whitespace/case-insensitive,
    # matching exact_duplicates' document-level semantics.
    hashed = eligible.select(
        "_id",
        "_pos",
        F.md5(F.encode(normalize_text(F.col("_para")), "UTF-8")).alias("_h"),
    )
    owners = hashed.groupBy("_h").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_o")
    )
    keep_marks = hashed.join(owners, on="_h").where(
        (F.col("_id") == F.col("_o._id")) & (F.col("_pos") == F.col("_o._pos"))
    ).select("_id", "_pos")
    short = paras.where(F.length(F.trim(F.col("_para"))) < min_chars).select(
        "_id", "_pos"
    )
    kept = paras.join(short.union(keep_marks), on=["_id", "_pos"], how="leftsemi")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda e: e["_para"],
            ),
            "\n",
        ).alias("_kept_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = paras.groupBy("_id").agg(F.count(F.lit(1)).alias("n_paragraphs"))
    return (
        totals.join(rebuilt, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_kept_text"), F.lit("")).alias(text_col),
            "n_paragraphs",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def dedup_incremental(
    new_df: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deduplicate a NEW batch against an already-ingested corpus: drops new
    documents whose normalized text hash appears in ``seen_hashes``
    (a relation with a ``text_hash`` column, e.g. persisted output of
    ``exact_duplicates``), then drops within-batch exact duplicates.

    This is the steady-state ingestion path at scale — the full corpus is
    never re-shingled; the seen-hash relation is the only state carried
    between batches, and the anti-join shuffles 16-byte digests keyed
    exactly like the batch's own dedup aggregate.

    Returns the surviving rows of ``new_df`` plus their ``text_hash`` so the
    caller can append them to the seen-hash state.

    Null-text documents form ONE equivalence class (matching
    ``dedup_exact``'s group-by-null semantics): the joins below are
    null-safe, so the first null doc survives, later ones — in-batch or in a
    state that already carries a NULL digest row — are dropped.
    EqualNullSafe is still an equi-join key to Spark; strategies unchanged."""
    hashed = new_df.withColumn(
        "text_hash",
        F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8")),
    )
    seen = seen_hashes.select(F.col("text_hash").alias("_sh"))
    fresh = hashed.join(
        seen, on=F.col("text_hash").eqNullSafe(F.col("_sh")), how="left_anti"
    )
    # within-batch: keep the minimum-id row per digest (exact_duplicates
    # semantics), resolved with one map-side-combinable aggregate.
    keepers = fresh.groupBy("text_hash").agg(F.min(id_col).alias(id_col)).select(
        F.col("text_hash").alias("_kh"), F.col(id_col).alias("_kid")
    )
    return fresh.join(
        keepers,
        on=F.col("text_hash").eqNullSafe(F.col("_kh"))
        & (F.col(id_col) == F.col("_kid")),
        how="leftsemi",
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    min_count: int = 2,
    hash_fn: str = "fast",
) -> DataFrame:
    """Exact repeated token spans across the corpus (the fixed-window variant
    of suffix-based exact-substring dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): every ``span``-token window
    that occurs at least ``min_count`` times corpus-wide, with its occurrence
    count, distinct-document count, and first (minimum-id) document.

    Shape: one narrow explode of window positions per document (documents
    with fewer than ``span`` tokens contribute nothing), the span hashed
    INSIDE the same stage so only 8-byte hashes (plus the doc id) reach the
    shuffle — span text never moves.  Counting is two-phase: a
    (hash, doc) pre-aggregate partial-combines map-side (collapsing the
    within-document repeats that dominate boilerplate), then the per-hash
    rollup computes occurrences, distinct docs, and min id in one pass.
    Cost is O(total_tokens * span) hash work in a map stage — perfectly
    parallel — and the shuffled volume is bounded by distinct
    (hash, doc) pairs.  A rolling (Rabin-Karp) hash would make the map
    stage O(total_tokens); md5/xxhash over the joined span keeps the
    candidate generation portable (identical in any engine) and the
    constant factor is span-bounded.

    At 100 TB: no all-pairs anywhere — hot spans (license boilerplate)
    concentrate into single reducers only as pre-aggregated per-doc counts,
    so the worst key carries at most one row per containing document.

    Span identity is the exposed 64-bit ``span_hash`` (the schema is pinned),
    so two distinct spans can alias at the birthday rate — n²/2^65 colliding
    pairs ≈ a few million across 10^13 spans (~1 in 4M spans), each merging
    two span populations into one inflated count.  Acceptable for the
    REPORTING this operator does; the REMOVAL path
    (``scrub_repeated_spans``) uses a 128-bit composite key where a
    collision would destroy text."""
    with_toks = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    positions = with_toks.where(F.size("_toks") >= span).select(
        "_id",
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks") - span + 1)).alias("_pos"),
    )
    hashed = positions.select(
        "_id",
        hash_column(
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_pos"), span)), hash_fn
        ).alias("span_hash"),
    )
    per_doc = hashed.groupBy("span_hash", "_id").agg(
        F.count(F.lit(1)).alias("_occ")
    )
    return (
        per_doc.groupBy("span_hash")
        .agg(
            F.sum("_occ").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_id").alias("first_doc"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def scrub_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    hash_fn: str = "fast",
    passthrough: bool = False,
) -> DataFrame:
    """Remove every non-first occurrence of each repeated ``span``-token
    window and rebuild the documents — the removal half of exact-substring
    dedup (Lee et al. 2022): the corpus-wide first occurrence (minimum
    (doc, position)) of a repeated span survives, every other occurrence's
    token range is cut, and overlapping cuts union naturally.

    Returns (id, n_tokens, n_removed, text) with the scrubbed text.
    ``passthrough=True`` instead returns ALL input columns plus
    (n_tokens, n_removed), and replaces ``text_col`` ONLY for documents
    that actually had a cut — untouched documents keep their original
    text byte-for-byte (the token-join rebuild lowercases and collapses
    whitespace, which a pipeline must not inflict on unaffected rows).

    Scale shape: the span index is the same one-narrow-explode as
    ``repeated_spans``; ownership (count + first occurrence) is ONE
    aggregate keyed by the 8-byte span hash carrying a min(struct) — no
    window function, so a boilerplate span occurring in 10M documents costs
    one combinable aggregate, not a 10M-row sort.  Cut positions shuffle
    back keyed by document id (ints only), and the rebuild is a
    higher-order filter over the token array — per-document work is
    O(tokens × cuts-in-doc), JVM-side, no Python.

    Both shared relations are persisted for the operator's lifetime
    (released by the scoped-cache registry): the tokenized corpus feeds the
    span index AND the rebuild, and the span index feeds the ownership
    aggregate AND the cut join — without the persists the corpus would be
    re-scanned and re-tokenized three times (the redundant-scan pattern the
    paragraph-dedup rewrite eliminated; the tokenize pass IS the cost at
    100 TB).

    Span identity is a 128-BIT composite key (two independent hashes of the
    span text): a removal decision on a hash collision scrubs genuinely
    unique text, and at 10^13 spans a single 64-bit key makes millions of
    collisions statistically certain.  With 128 bits the expected colliding
    pairs are n²/2^129 ≈ 1e-13 — effectively exact; the cost is 8 extra
    bytes per span row in the one shuffle that carries them."""
    base = ensure_parallelism(df)
    if passthrough:
        with_toks = persist_tracked(
            base.select(
                base["*"],
                F.col(id_col).alias("_id"),
                tokens(F.col(text_col)).alias("_toks"),
            )
        )
    else:
        with_toks = persist_tracked(
            base.select(
                F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
            )
        )
    # 128-bit span key: the primary hash plus hash_column2's independent
    # second hash (any engine can reproduce both).  Collisions on the
    # composite require BOTH 64-bit hashes to collide simultaneously.
    span_text = F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_pos"), span))
    positions = persist_tracked(
        with_toks.where(F.size("_toks") >= span)
        .select(
            "_id",
            F.explode(F.sequence(F.lit(1), F.size("_toks") - span + 1)).alias("_pos"),
            "_toks",
        )
        .select(
            "_id",
            "_pos",
            hash_column(span_text, hash_fn).alias("_h"),
            hash_column2(span_text, hash_fn).alias("_h2"),
        )
    )
    owners = positions.groupBy("_h", "_h2").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_first"),
    ).where(F.col("_cnt") >= 2)
    cuts = (
        positions.join(owners, on=["_h", "_h2"])
        .where(
            (F.col("_id") != F.col("_first._id"))
            | (F.col("_pos") != F.col("_first._pos"))
        )
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("_pos")).alias("_cuts"))
    )
    no_cuts = F.array().cast("array<int>")
    rebuilt = with_toks.join(cuts, on="_id", how="left").withColumn(
        "_kept",
        F.filter(
            F.col("_toks"),
            lambda tok, i: ~F.exists(
                F.coalesce(F.col("_cuts"), no_cuts),
                lambda s: (i + 1 >= s) & (i + 1 < s + span),
            ),
        ),
    )
    n_removed = F.size("_toks") - F.size("_kept")
    if passthrough:
        others = [c for c in df.columns if c != text_col]
        return rebuilt.select(
            *[F.col(c) for c in others],
            F.size("_toks").alias("n_tokens"),
            n_removed.alias("n_removed"),
            F.when(n_removed > 0, F.concat_ws(" ", F.col("_kept")))
            .otherwise(F.col(text_col))
            .alias(text_col),
        )
    return rebuilt.select(
        F.col("_id").alias(id_col),
        F.size("_toks").alias("n_tokens"),
        n_removed.alias("n_removed"),
        F.concat_ws(" ", F.col("_kept")).alias(text_col),
    )
