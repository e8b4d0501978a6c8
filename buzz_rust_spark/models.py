"""User-facing query model: the BuzzQuery JSON surface.

Shapes mirror the reference's request model (reference: code/src/models/query.rs:3-41
and code/examples/query.json): a query is a list of named SQL *steps* plus the
catalogs it reads.  The reference restricts steps to exactly ``[HBee, HComb]``
(query_planner.rs:66-71); this rebuild validates that shape in *strict* mode and
otherwise generalizes to N chained steps, because Spark's Catalyst performs the
map/reduce split automatically and more stages are free.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from .errors import BuzzBadRequestError


class BuzzStepType(str, Enum):
    """reference: models/query.rs:4-7."""

    HBEE = "HBee"
    HCOMB = "HComb"


class BuzzCatalogType(str, Enum):
    """reference: models/query.rs:24-28."""

    STATIC = "Static"
    DELTA_LAKE = "DeltaLake"
    PARQUET_DIR = "ParquetDir"  # rebuild extension: a directory of parquet files
    ICEBERG = "Iceberg"  # rebuild extension: read-only Apache Iceberg v1/v2 tables


@dataclass
class BuzzStep:
    """One SQL stage (reference: models/query.rs:9-15)."""

    sql: str
    name: str
    step_type: BuzzStepType
    partition_filter: str | None = None
    # rebuild extension: a row predicate applied to the step's catalog
    # scans AND used for zone-map file skipping on column stats
    # (non-partition columns — partition_filter's sibling)
    stats_filter: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> BuzzStep:
        try:
            return cls(
                sql=d["sql"],
                name=d["name"],
                step_type=BuzzStepType(d["step_type"]),
                partition_filter=d.get("partition_filter"),
                stats_filter=d.get("stats_filter"),
            )
        except (KeyError, ValueError) as exc:
            raise BuzzBadRequestError(f"invalid step spec {d!r}: {exc}") from exc


@dataclass
class HCombCapacity:
    """reference: models/query.rs:17-21.  ``zones`` shards the reduce: hbee
    splits go round-robin across ``min(zones, nb_files)`` zones, the HComb SQL
    runs per zone over only that zone's hbee outputs, and the result is the
    comb-by-comb concatenation (query_planner.rs:111-132,
    fuse_service.rs:130-135; implemented in BuzzEngine._run_zoned for the
    reference's distributable 2-step single-catalog shape — other shapes run
    single-zone, where Spark shuffle parallelism subsumes zoning)."""

    zones: int = 1


@dataclass
class BuzzCatalog:
    """reference: models/query.rs:30-34."""

    name: str
    uri: str
    type: BuzzCatalogType

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> BuzzCatalog:
        try:
            return cls(name=d["name"], uri=d["uri"], type=BuzzCatalogType(d["type"]))
        except (KeyError, ValueError) as exc:
            raise BuzzBadRequestError(f"invalid catalog spec {d!r}: {exc}") from exc


@dataclass
class BuzzQuery:
    """reference: models/query.rs:36-41."""

    steps: list[BuzzStep]
    catalogs: list[BuzzCatalog] = field(default_factory=list)
    capacity: HCombCapacity = field(default_factory=HCombCapacity)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> BuzzQuery:
        if "steps" not in d or not isinstance(d["steps"], list) or not d["steps"]:
            raise BuzzBadRequestError("query must contain a non-empty 'steps' list")
        steps = [BuzzStep.from_dict(s) for s in d["steps"]]
        catalogs = [BuzzCatalog.from_dict(c) for c in d.get("catalogs", [])]
        try:
            capacity = HCombCapacity(
                zones=int(d.get("capacity", {}).get("zones", 1))
            )
        except (AttributeError, TypeError, ValueError) as exc:
            # malformed capacity is a USER error, not an internal one — the
            # CLI/engine error contract expects the typed bad-request
            raise BuzzBadRequestError(
                f"invalid 'capacity' in query: {d.get('capacity')!r} ({exc})"
            ) from exc
        return cls(steps=steps, catalogs=catalogs, capacity=capacity)

    @classmethod
    def from_json(cls, s: str) -> BuzzQuery:
        try:
            d = json.loads(s)
        except json.JSONDecodeError as exc:
            raise BuzzBadRequestError(f"query is not valid JSON: {exc}") from exc
        return cls.from_dict(d)

    def validate_strict(self) -> None:
        """Reference-parity step-shape check (query_planner.rs:66-71): exactly
        one HBee step followed by one HComb step."""
        if (
            len(self.steps) != 2
            or self.steps[0].step_type is not BuzzStepType.HBEE
            or self.steps[1].step_type is not BuzzStepType.HCOMB
        ):
            raise BuzzBadRequestError(
                "Only single hbee step followed by single hcomb step supported for now"
            )
