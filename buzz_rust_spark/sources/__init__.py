"""Data sources: catalog implementations that turn a named table into a
pruned, schema-verified Spark DataFrame.

Reference parity map:
- ``static_catalog.StaticCatalog``  ← code/src/datasource/catalog/static_catalog.rs
- ``delta_catalog.DeltaCatalog``    ← code/src/datasource/catalog/delta_catalog.rs
- ``manifest``                      ← code/src/datasource/catalog/mod.rs (file-list
  table + partition_filter evaluation)
"""

from .logstore import LogStore, register_scheme, unregister_scheme
from .manifest import CatalogFile, manifest_df, prune_manifest
from .static_catalog import StaticCatalog
from .delta_catalog import (
    DeltaCatalog,
    read_delta_changelog,
    read_delta_changes,
)
from .iceberg import (
    IcebergCatalog,
    read_iceberg_changelog,
    read_iceberg_changes,
)
from .materialize import (
    read_materialization,
    refresh_chain_materialization,
    refresh_join_materialization,
    refresh_materialization,
)
from .metadata_tables import (
    MetadataTableCatalog,
    delta_detail,
    delta_files,
    delta_history,
    delta_partitions,
    iceberg_files,
    iceberg_history,
    iceberg_manifests,
    iceberg_detail,
    iceberg_partitions,
    iceberg_refs,
    iceberg_snapshots,
)
from .iceberg_writer import (
    cherry_pick_iceberg,
    delete_iceberg,
    evolve_iceberg,
    evolve_iceberg_partition_spec,
    drop_iceberg_ref,
    fast_forward_iceberg,
    expire_iceberg_snapshots,
    add_files_iceberg,
    merge_iceberg,
    rewrite_iceberg,
    clone_iceberg,
    rewrite_iceberg_manifests,
    rollback_iceberg,
    set_iceberg_properties,
    tag_iceberg,
    truncate_iceberg,
    update_iceberg,
    vacuum_iceberg,
    write_iceberg,
)
from .delta_writer import (
    add_files_delta,
    cleanup_delta_log,
    clone_delta,
    delete_delta,
    evolve_delta,
    merge_delta,
    optimize_delta,
    restore_delta,
    set_delta_properties,
    truncate_delta,
    update_delta,
    vacuum_delta,
    write_delta,
)
from .write_store import LocalCommitStore, MemoryCommitStore
from .parquet_dir import ParquetDirCatalog
from .text_formats import CsvCatalog, JsonLinesCatalog, quarantine_split
from .warc import read_warc, read_webdataset, warc_to_documents, webdataset_samples

__all__ = [
    "LogStore",
    "register_scheme",
    "unregister_scheme",
    "CsvCatalog",
    "JsonLinesCatalog",
    "quarantine_split",
    "CatalogFile",
    "manifest_df",
    "prune_manifest",
    "StaticCatalog",
    "DeltaCatalog",
    "IcebergCatalog",
    "read_delta_changelog",
    "read_delta_changes",
    "read_iceberg_changelog",
    "read_iceberg_changes",
    "read_materialization",
    "refresh_materialization",
    "refresh_join_materialization",
    "refresh_chain_materialization",
    "iceberg_snapshots",
    "iceberg_manifests",
    "iceberg_files",
    "iceberg_partitions",
    "iceberg_history",
    "iceberg_refs",
    "iceberg_detail",
    "delta_detail",
    "MetadataTableCatalog",
    "delta_history",
    "delta_files",
    "delta_partitions",
    "write_iceberg",
    "add_files_iceberg",
    "add_files_delta",
    "cleanup_delta_log",
    "merge_iceberg",
    "delete_iceberg",
    "rewrite_iceberg",
    "rollback_iceberg",
    "tag_iceberg",
    "evolve_iceberg",
    "evolve_iceberg_partition_spec",
    "fast_forward_iceberg",
    "cherry_pick_iceberg",
    "drop_iceberg_ref",
    "evolve_delta",
    "expire_iceberg_snapshots",
    "vacuum_iceberg",
    "set_iceberg_properties",
    "LocalCommitStore",
    "MemoryCommitStore",
    "ParquetDirCatalog",
    "write_delta",
    "merge_delta",
    "delete_delta",
    "update_delta",
    "update_iceberg",
    "clone_delta",
    "clone_iceberg",
    "truncate_delta",
    "truncate_iceberg",
    "rewrite_iceberg_manifests",
    "optimize_delta",
    "restore_delta",
    "set_delta_properties",
    "vacuum_delta",
    "read_warc",
    "warc_to_documents",
    "read_webdataset",
    "webdataset_samples",
]
