"""Deterministic sampling for dataset mixing: stratified rates and
train/val/test splits keyed by content hash.

Rebuild extension (no reference analog) for the training-data surface: corpus
mixing ("2 parts web, 1 part code, 0.1 parts forums") and leakage-free splits
need sampling that is (a) deterministic across reruns and task retries — so a
resumed 100 TB job samples the same rows — and (b) a pure narrow filter, so it
pushes into the scan and never shuffles.  Both come from hashing row KEYS to a
uniform [0, 1) value (md5 prefix — portable, any engine computes the same
split) instead of RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError

# 2^60 — portable_hash yields the first 60 bits of md5 as a non-negative long.
_HASH_SPACE = float(1 << 60)


def _unit_hash(key: Column) -> Column:
    """Uniform [0, 1) from the md5-prefix hash of ``key`` (deterministic,
    engine-portable; same construction as the t06 hash-sample oracle)."""
    from ..functions.text import portable_hash

    return portable_hash(key) / F.lit(_HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its own rate: ``fractions[stratum]`` of rows whose
    ``strata_col`` equals ``stratum`` survive (deterministically, by key hash).

    ``key_cols`` identifies a row for hashing (defaults to all non-strata
    columns); strata missing from ``fractions`` keep ``default_fraction``.
    The whole operator is one ``when``-chain filter — narrow, no shuffle, and
    the same rows survive on any rerun or partial retry."""
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise BuzzBadRequestError(
                f"fraction for stratum {stratum!r} must be in [0,1], got {frac}"
            )
    if not 0.0 <= default_fraction <= 1.0:
        raise BuzzBadRequestError("default_fraction must be in [0,1]")
    key_cols = key_cols or [c for c in df.columns if c != strata_col]
    if not key_cols:
        raise BuzzBadRequestError("need at least one key column to hash")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    u = _unit_hash(key)
    threshold = F.lit(float(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(float(frac))
        ).otherwise(threshold)
    return df.where(u < threshold)


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    token_budget: int,
    tokens_col: str = "n_tokens",
    key_cols: list[str] | None = None,
    allow_upsample: bool = True,
    source_col: str = "source_name",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Blend named corpora to hit ``token_budget`` total tokens at the given
    mixture ``weights`` ("2 parts web, 1 part code") — the data-mixing step of
    a pretraining pipeline.

    Per source: target tokens = budget x weight / sum(weights); the kept
    fraction is target / available.  Downsampling is a deterministic hash
    filter (same machinery as :func:`stratified_sample` — narrow, rerun- and
    retry-stable).  When a source is smaller than its target and
    ``allow_upsample`` is true, the source is repeated whole for each full
    epoch (``epoch_col`` = 0, 1, ...) plus a hash-sampled fractional final
    epoch — the standard multi-epoch upsampling recipe; with
    ``allow_upsample=False`` small sources are used at most once.

    One bounded aggregate per source (a count+sum — driver-side planning like
    IVF training) sets the fractions; the data path itself stays lazy and
    shuffle-free.  Output: union of the sampled sources with ``source_col``
    and ``epoch_col`` attached.  Realized tokens land within one document of
    each target in expectation; exact budgets are a tokenizer-time concern.
    """
    if not sources:
        raise BuzzBadRequestError("sources must be non-empty")
    missing = sorted(set(sources) - set(weights))
    if missing:
        raise BuzzBadRequestError(f"sources missing a weight: {missing}")
    total_w = float(sum(weights[name] for name in sources))
    if total_w <= 0 or any(weights[name] < 0 for name in sources):
        raise BuzzBadRequestError("weights must be non-negative and sum > 0")
    if token_budget <= 0:
        raise BuzzBadRequestError("token_budget must be positive")

    out: DataFrame | None = None
    for name in sorted(sources):
        df = sources[name]
        if tokens_col not in df.columns:
            raise BuzzBadRequestError(
                f"source {name!r} lacks token column {tokens_col!r}"
            )
        target = token_budget * weights[name] / total_w
        available = df.agg(F.sum(tokens_col)).first()[0] or 0
        keys = key_cols or [c for c in df.columns if c != tokens_col]
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys])
        if available <= 0 or target <= 0:
            continue
        if target >= available:
            epochs = target / available if allow_upsample else 1.0
        else:
            epochs = target / available
        full, frac = int(epochs), epochs - int(epochs)
        parts = []
        for e in range(full):
            parts.append(df.withColumn(epoch_col, F.lit(e)))
        if frac > 0:
            # Rotate the hash per epoch so the fractional epoch's sample is
            # independent of which rows earlier FULL epochs carried (they
            # carry all rows) and of other sources' samples.
            ue = _unit_hash(F.concat_ws("\x1f", key, F.lit(str(full))))
            parts.append(df.where(ue < F.lit(frac)).withColumn(epoch_col, F.lit(full)))
        sampled = parts[0]
        for p in parts[1:]:
            sampled = sampled.unionByName(p)
        sampled = sampled.withColumn(source_col, F.lit(name))
        out = sampled if out is None else out.unionByName(sampled)
    if out is None:
        raise BuzzBadRequestError("no source contributed any tokens")
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split ("train"/"val"/"test", any
    names) with probability proportional to ``weights`` — leakage-free and
    stable: a row's split depends only on its key, so re-ingesting a document
    (or rerunning the job) can never move it across the boundary.

    One narrow projection; downstream filters on ``split_col`` prune at scan
    time when the output is written partitioned by split."""
    if not weights:
        raise BuzzBadRequestError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise BuzzBadRequestError("weights must be non-negative and sum > 0")
    if not key_cols:
        raise BuzzBadRequestError("need at least one key column to hash")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    u = _unit_hash(key)
    # cumulative thresholds in sorted-name order (deterministic layout)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def shuffle_epoch(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle of the corpus for one training epoch —
    WITHOUT a global sort.

    The order is defined by ``key = xxhash64(id, epoch)``: rows hash-
    repartition into ``num_shards`` shards by key and sort by key only
    WITHIN each shard.  Reading shards in shard order yields a total order
    (every key in shard i sorts the same shard-local way on every rerun and
    task retry), uniformly pseudo-random per epoch, with a different
    permutation each epoch.  This is the standard 100 TB recipe: one hash
    exchange + a per-partition sort, versus a rangepartition + global sort
    (sampling pass, skew-prone boundaries) that ``orderBy`` would plan.

    Output: the input columns plus ``_shard`` and ``_order`` (the in-shard
    sort key) so writers can lay the epoch out as ordered shard files.
    """
    if num_shards is None:
        num_shards = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    num_shards = int(num_shards)
    keyed = df.withColumn(
        "_order", F.xxhash64(F.col(id_col), F.lit(int(epoch)))
    ).withColumn(
        "_shard", F.pmod(F.col("_order"), F.lit(num_shards)).cast("int")
    )
    # id_col as the final sort key: on an xxhash64 collision two rows tie on
    # (_shard, _order) and their relative order would otherwise depend on
    # input order — breaking retry-stability at billion-row scale.
    return keyed.repartition(num_shards, F.col("_shard")).sortWithinPartitions(
        "_shard", "_order", id_col
    )


def top_fraction_by_group(
    df: DataFrame,
    fraction: float,
    score_col: str = "quality",
    group_col: str = "source",
    id_col: str = "doc_id",
    exact: bool = False,
    relative_error: float = 1e-3,
) -> DataFrame:
    """Keep the top ``fraction`` of rows by ``score_col`` within each group —
    percentile-based quality selection (keep the best X% per source/domain).

    Two physical strategies, same semantics up to threshold precision:

    - ``exact=False`` (the 100 TB default): per-group score threshold via
      ``percentile_approx`` — ONE map-side-combinable aggregate producing one
      row per group, broadcast-joined back, filter ``score >= threshold``.
      The corpus is never sorted; cost is two narrow passes + a tiny join.
    - ``exact=True``: rank with a ``row_number`` window per group (ties
      broken by ``id_col`` for determinism) and keep
      ``rank <= ceil(fraction * group_size)``.  Exact but pays a per-group
      sort — the right tool when groups are modest or exactness is audited.

    The approx path may keep slightly more/fewer rows when many scores tie
    at the threshold (all ties >= threshold are kept)."""
    if not 0.0 < fraction <= 1.0:
        raise BuzzBadRequestError(f"fraction must be in (0, 1], got {fraction}")
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.col(score_col).desc(), F.col(id_col)
        )
        wn = Window.partitionBy(group_col)
        ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wn)
        )
        # round before ceil: n * fraction computed in binary floating point
        # overshoots decimal-exact products (100 * 0.07 = 7.000000000000001,
        # ceil -> 8) — a 9-dp round restores the intended keep count
        return ranked.where(
            F.col("_rn") <= F.ceil(F.round(F.col("_n") * F.lit(fraction), 9))
        ).drop("_rn", "_n")
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(
            score_col, F.lit(1.0 - fraction), F.lit(int(1.0 / relative_error))
        ).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), on=group_col)
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )
