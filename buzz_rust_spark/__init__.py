"""buzz_rust_spark — a PySpark-native rebuild of cloudfuse-io/buzz-rust.

Reference (read-only): /root/reference.  Blueprint: SURVEY.md at the repo root.
The reference's distributed runtime (Lambda map workers + Fargate streaming
reducer + Flight data plane) is replaced by Spark's execution model; this
package keeps the observable surface: the BuzzQuery multi-step SQL API,
catalog-level partition pruning with string partition values, strict schema
verification, and the error taxonomy — plus the scale extensions (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB training-data
pipeline needs.
"""

from .engine import BuzzEngine
from .errors import (
    BuzzBadRequestError,
    BuzzCommitAbortedError,
    BuzzCommitConflictError,
    BuzzError,
    BuzzExecutionError,
    BuzzInternalError,
    BuzzNotImplementedError,
    BuzzPlanError,
    BuzzRebootstrapError,
    BuzzSchemaError,
)
from .models import (
    BuzzCatalog,
    BuzzCatalogType,
    BuzzQuery,
    BuzzStep,
    BuzzStepType,
    HCombCapacity,
)
from .session import get_spark
from .sources import CatalogFile, DeltaCatalog, ParquetDirCatalog, StaticCatalog

__all__ = [
    "BuzzEngine",
    "BuzzError",
    "BuzzBadRequestError",
    "BuzzExecutionError",
    "BuzzInternalError",
    "BuzzNotImplementedError",
    "BuzzPlanError",
    "BuzzSchemaError",
    "BuzzCommitConflictError",
    "BuzzCommitAbortedError",
    "BuzzRebootstrapError",
    "BuzzQuery",
    "BuzzStep",
    "BuzzStepType",
    "BuzzCatalog",
    "BuzzCatalogType",
    "HCombCapacity",
    "CatalogFile",
    "StaticCatalog",
    "DeltaCatalog",
    "ParquetDirCatalog",
    "get_spark",
]

__version__ = "0.1.0"
