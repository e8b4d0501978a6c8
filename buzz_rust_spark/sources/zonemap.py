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

Stats collection is one footer read per file (driver-side, O(files), bytes
per file) and is cacheable alongside the manifest; production catalogs store
these stats at write time exactly like Delta's ``stats`` on add actions.
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


def collect_file_stats(paths: list[str], cols: list[str]) -> FileStats:
    """Per-file [min, max] for ``cols`` from parquet footer metadata (merged
    across row groups).  Columns without statistics are omitted (treated as
    unprunable — always safe)."""
    import pyarrow.parquet as pq

    from .schema_check import _pyarrow_path

    out: FileStats = {}
    for path in paths:
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
        out[path] = per_col
    return out


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
) -> StaticCatalog:
    """A copy of ``catalog`` scanning only files that may match ``conjuncts``
    (stats collected from footers when not supplied).  The caller still
    applies the real filter to the resulting DataFrame — the zone map only
    shrinks the file list."""
    if stats is None:
        resolved = {f.key: catalog.resolve_key(f.key) for f in catalog.files}
        raw = collect_file_stats(
            list(resolved.values()), sorted({c for c, _, _ in conjuncts})
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
