"""Zone-map file pruning: skip catalog files whose parquet footer min/max
provably exclude a predicate — partition pruning's sibling for NON-partition
columns.

Extends the reference's manifest pruning (catalog/mod.rs:43-99 evaluates
``partition_filter`` over partition VALUES only) with the standard data-lake
zone-map: each file's per-column [min, max] from its parquet footer.  Pairs
with :func:`~buzz_rust_spark.sources.writer.write_zordered` — Z-order layout
makes those intervals tight on every clustered dimension, so a band filter on
any of them skips most files.

Why a catalog-level prune when Spark already does row-group skipping: at
100 TB / 10^5 files, pruning BEFORE the read means those files are never
listed into the scan, never opened, never scheduled — the win is task-count
and metadata I/O, on top of (not instead of) parquet's own row-group stats.

Stats collection is one footer read per file (KiB each): serial for a
handful, an IO-bound thread pool past ``SERIAL_MAX``, and ONE distributed
Spark job past ``SPARK_JOB_MIN`` — a 10^5-file manifest must never pay
10^5 serial driver GETs before the query plans.  Collected intervals
memoize per path for the session (immutable-file catalog contract);
production catalogs store them at write time exactly like Delta's
``stats`` on add actions.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any

from ..errors import BuzzBadRequestError
from .manifest import CatalogFile
from .static_catalog import StaticCatalog

_OPS = {"=", "<", "<=", ">", ">=", "between", "in"}

# (col, min, max) per file; None min/max = no stats for that column → keep.
FileStats = dict[str, dict[str, tuple[Any, Any]]]


# collection strategy thresholds: a handful of footers reads serially, a
# medium manifest through an IO-bound thread pool, a large one as one
# distributed Spark job (100k files must never be 100k serial GETs on the
# driver before the query plans)
SERIAL_MAX = 8
THREADS = 16
SPARK_JOB_MIN = 1024

# path → {col: (min, max)} memo.  Manifest files are immutable by the
# catalog contract (the reference's SizedFile: a key names one frozen
# object), so footer stats never change for a given path — repeated
# stats_filter queries over the same catalog pay the footer GETs once per
# session.  Bounded: evicted wholesale past the cap (stats rows are tiny;
# the cap only guards a pathological number of distinct paths).
_STATS_CACHE: dict[str, dict[str, tuple[Any, Any]]] = {}
_STATS_CACHE_MAX = 500_000


def _footer_stats(path: str, cols: list[str]) -> dict[str, tuple[Any, Any]]:
    """One file's per-column [min, max] from its parquet footer (merged
    across row groups) — the unit of work every collection strategy
    (serial / thread pool / Spark job) runs; tests seam concurrency here."""
    import pyarrow.parquet as pq

    from .schema_check import _pyarrow_path

    md = pq.read_metadata(_pyarrow_path(path))
    names = md.schema.names
    per_col: dict[str, tuple[Any, Any]] = {}
    for col in cols:
        if col not in names:
            continue
        idx = names.index(col)
        mins, maxs = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                mins = []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            per_col[col] = (min(mins), max(maxs))
    return per_col


def collect_file_stats(
    paths: list[str], cols: list[str], spark=None
) -> FileStats:
    """Per-file [min, max] for ``cols`` from parquet footer metadata.
    Columns without statistics are omitted (treated as unprunable — always
    safe).

    Collection scales with the candidate list: a few files read serially;
    past ``SERIAL_MAX`` a thread pool overlaps the footer GETs (IO-bound —
    KiB each); past ``SPARK_JOB_MIN`` (and given ``spark``) ONE
    distributed mapInPandas job reads them executor-side and ships back
    one stats row per file, so a 10^5-file static manifest plans without
    10^5 serial driver GETs.  Results memoize per path for the session
    (immutable-file contract), so repeated stats-filtered queries over
    the same catalog collect once."""
    todo = [
        p for p in paths
        if not set(cols) <= set(_STATS_CACHE.get(p, ()))
    ]
    if len(_STATS_CACHE) > _STATS_CACHE_MAX:
        _STATS_CACHE.clear()
    if todo:
        if spark is not None and len(todo) >= SPARK_JOB_MIN:
            collected = _collect_distributed(spark, todo, cols)
        elif len(todo) > SERIAL_MAX:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(THREADS, len(todo))
            ) as pool:
                collected = dict(
                    zip(todo, pool.map(lambda p: _footer_stats(p, cols), todo))
                )
        else:
            collected = {p: _footer_stats(p, cols) for p in todo}
        for p, per_col in collected.items():
            _STATS_CACHE.setdefault(p, {}).update(per_col)
    return {
        p: {
            c: _STATS_CACHE.get(p, {}).get(c)
            for c in cols
            if c in _STATS_CACHE.get(p, {})
        }
        for p in paths
    }


def _collect_distributed(
    spark, paths: list[str], cols: list[str]
) -> FileStats:
    """One mapInPandas job over the candidate paths: each task reads its
    files' footers and returns one pickled stats row per file (pickle
    keeps min/max type fidelity — int/str/bytes/date survive the hop
    exactly; JSON would stringify them and break interval comparisons).
    Driver traffic is O(files) tiny rows."""
    import base64
    import pickle

    def task(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [
                base64.b64encode(
                    pickle.dumps(_footer_stats(p, cols))
                ).decode()
                for p in pdf["path"]
            ]
            yield pd.DataFrame({"path": pdf["path"], "stats": blobs})

    n_parts = min(
        len(paths),
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    rows = (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(task, "path string, stats string")
        .collect()
    )
    return {
        r.path: pickle.loads(base64.b64decode(r.stats)) for r in rows
    }


def _may_match(interval: tuple[Any, Any], op: str, value: Any) -> bool:
    lo, hi = interval
    # Conservative on ANY comparison trouble: a half-open interval (external
    # Delta logs record null min/max for all-null columns) or a cross-type
    # comparison (int predicate on string stats, bytes stats) keeps the file
    # rather than aborting the query — same guard delta_writer's
    # _key_overlap_candidates applies.
    if lo is None or hi is None:
        return True
    try:
        if op == "=":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        if op == "in":
            # value = list of candidates; the file may match if ANY falls
            # inside its interval
            return any(lo <= v <= hi for v in value)
        # between: value = (a, b) inclusive
        a, b = value
        return hi >= a and lo <= b
    except TypeError:
        return True


def prune_files_by_stats(
    files: list[CatalogFile],
    stats: FileStats,
    conjuncts: list[tuple[str, str, Any]],
) -> list[CatalogFile]:
    """Files that MAY satisfy every conjunct ``(col, op, value)``.

    Conservative by construction: a file with no stats for a referenced
    column always survives, so pruning can never change query results — only
    shrink the scan."""
    for col, op, _ in conjuncts:
        if op not in _OPS:
            raise BuzzBadRequestError(
                f"zone-map op must be one of {sorted(_OPS)}, got {op!r}"
            )
    kept = []
    for f in files:
        per_col = stats.get(f.key, {})
        if all(
            col not in per_col or _may_match(per_col[col], op, value)
            for col, op, value in conjuncts
        ):
            kept.append(f)
    return kept


def prune_catalog_by_stats(
    catalog: StaticCatalog,
    conjuncts: list[tuple[str, str, Any]],
    stats: FileStats | None = None,
    spark=None,
) -> StaticCatalog:
    """A copy of ``catalog`` scanning only files that may match ``conjuncts``
    (stats collected from footers when not supplied — concurrently, and
    distributed past ``SPARK_JOB_MIN`` when ``spark`` is given).  The
    caller still applies the real filter to the resulting DataFrame — the
    zone map only shrinks the file list."""
    if stats is None:
        resolved = {f.key: catalog.resolve_key(f.key) for f in catalog.files}
        raw = collect_file_stats(
            list(resolved.values()),
            sorted({c for c, _, _ in conjuncts}),
            spark=spark,
        )
        stats = {key: raw[uri] for key, uri in resolved.items()}
    return replace(
        catalog, files=prune_files_by_stats(catalog.files, stats, conjuncts)
    )


def stats_conjuncts_from_sql(filter_sql: str) -> list[tuple[str, str, Any]]:
    """Extract zone-map conjuncts ``(col, op, value)`` from a SQL
    predicate, via the same conservative conjunction parser the Iceberg
    partition skipping uses.  STRICTLY an optimization extraction: terms
    outside the subset (OR, functions, IN lists with several values,
    unparseable literals) are simply DROPPED — the caller must still
    apply the full predicate to the scan, so dropping a term only means
    less pruning, never a wrong result.  Quoted literals stay strings;
    bare literals become floats (matching Spark's numeric coercion)."""
    from .iceberg import _parse_conjuncts

    parsed = _parse_conjuncts(filter_sql)
    out: list[tuple[str, str, Any]] = []
    for col, op, vals in parsed or ():
        if op not in _OPS:
            continue
        decoded = []
        ok = True
        for raw, quoted in vals:
            if quoted:
                decoded.append(raw)
            else:
                # integer literals stay exact ints: float() rounds past
                # 2^53, and a rounded equality bound could wrongly prune
                # the file holding the matching long value
                try:
                    decoded.append(
                        int(raw) if "." not in str(raw) else float(raw)
                    )
                except (TypeError, ValueError):
                    ok = False
                    break
        # mixed string/numeric IN lists take different comparison domains
        # per element — skip the term rather than half-prune it (ints and
        # floats share the numeric domain)
        domains = {str if isinstance(v, str) else float for v in decoded}
        if not ok or len(domains) != 1:
            continue
        if op == "in":
            out.append((col, "in", decoded))
        elif len(decoded) == 1:
            out.append((col, op, decoded[0]))
    return out


def stats_from_delta_log(catalog) -> FileStats:
    """Zone-map stats from a Delta table's own log (the ``stats`` JSON the
    write path records on every add action) — zero footer reads: at 10^5
    files the log replay the reader already did is the ONLY metadata I/O.

    Files whose add action carries no stats simply get an empty entry
    (→ unprunable, always kept)."""
    import json as _json

    out: FileStats = {}
    for f in catalog.files:
        per_col: dict[str, tuple[Any, Any]] = {}
        raw = getattr(catalog, "_add_stats", {}).get(f.key)
        if raw:
            s = _json.loads(raw) if isinstance(raw, str) else raw
            for col, lo in (s.get("minValues") or {}).items():
                hi = (s.get("maxValues") or {}).get(col)
                if hi is not None:
                    per_col[col] = (lo, hi)
        out[f.key] = per_col
    return out
