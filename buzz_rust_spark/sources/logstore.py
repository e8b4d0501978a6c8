"""Scheme-agnostic filesystem access for Delta log replay.

The reference's Delta path is object-store-native — ``try_new(uri, region)``
accepts an S3 URI and reads the log through a region-scoped S3 client
(reference: code/src/datasource/catalog/delta_catalog.rs:33-48,
clients/s3.rs:19-26).  This rebuild routes all ``_delta_log`` IO (directory
listing, JSON commits, ``_last_checkpoint``, checkpoint parquet) through a
:class:`LogStore` facade backed by ``pyarrow.fs``:

- bare paths and ``file://`` URIs → the local filesystem;
- ``s3://`` / ``s3a://`` URIs → pyarrow's built-in S3 filesystem (the
  ``region`` parameter maps to the reference's region-scoped client; data
  files keep their original ``s3a://`` URI so Spark reads them through S3A);
- any other scheme → ``pyarrow.fs.FileSystem.from_uri`` (GCS, HDFS, ...);
- schemes registered via :func:`register_scheme` → a local directory mock,
  the same test seam StaticCatalog uses (``scheme='file'`` + a directory as
  the bucket, tests/test_s3_catalog.py).

The log replay itself is a bounded driver-side step in every engine (the
reference replays on the fuse Lambda); only the *data* scan is distributed.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from ..errors import BuzzExecutionError

# scheme -> resolver mapping a full "{scheme}://..." URI to a local path.
# Test seam: lets pytest exercise the non-file: code path without network.
_SCHEME_RESOLVERS: dict[str, Callable[[str], str]] = {}


def register_scheme(scheme: str, resolve: Callable[[str], str]) -> None:
    """Route ``{scheme}://`` URIs to local paths via ``resolve`` (test seam)."""
    _SCHEME_RESOLVERS[scheme] = resolve


def unregister_scheme(scheme: str) -> None:
    _SCHEME_RESOLVERS.pop(scheme, None)


class LogStore:
    """Filesystem facade rooted at a Delta table URI.

    ``root`` paths handed to pyarrow are scheme-stripped; ``spark_path``
    returns paths/URIs in the form Spark's readers expect (the original URI
    for remote schemes, a plain local path otherwise)."""

    def __init__(self, table_uri: str, region: str | None = None):
        from pyarrow import fs as pafs

        self.table_uri = table_uri.rstrip("/")
        scheme = self.table_uri.split("://", 1)[0] if "://" in self.table_uri else ""
        if scheme in _SCHEME_RESOLVERS:
            self._fs = pafs.LocalFileSystem()
            self._root = _SCHEME_RESOLVERS[scheme](self.table_uri)
            self._spark_root = self._root
        elif scheme in ("", "file"):
            local = self.table_uri.removeprefix("file://")
            self._fs = pafs.LocalFileSystem()
            self._root = local
            self._spark_root = local
        elif scheme in ("s3", "s3a"):
            bucket_path = self.table_uri.split("://", 1)[1]
            # region-scoped client, matching the reference's try_new(uri,
            # region); without a region pyarrow auto-resolves (needs network)
            self._fs = (
                pafs.S3FileSystem(region=region) if region else pafs.S3FileSystem()
            )
            self._root = bucket_path
            # data files always read through S3A — stock Spark/Hadoop binds
            # fs.s3a only, so a plain s3:// table URI is normalized here
            self._spark_root = f"s3a://{bucket_path}"
        else:
            try:
                self._fs, self._root = pafs.FileSystem.from_uri(self.table_uri)
            except Exception as exc:
                raise BuzzExecutionError(
                    f"unsupported Delta table URI {table_uri!r}: {exc}"
                ) from exc
            self._spark_root = self.table_uri

    def join(self, *parts: str) -> str:
        return posixpath.join(self._root, *parts)

    def spark_path(self, rel: str) -> str:
        """Data-file key as Spark should read it (URI for remote schemes).
        Absolute paths/URIs pass through unchanged — the Delta spec allows
        add actions to reference files OUTSIDE the table root
        (``add_files_delta`` registration), and prefixing those with the
        root would silently misresolve them."""
        if "://" in rel or rel.startswith("/"):
            return rel
        return f"{self._spark_root.rstrip('/')}/{rel}"

    def isdir(self, rel: str) -> bool:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info(self.join(rel))
        return info.type == pafs.FileType.Directory

    def exists(self, rel: str) -> bool:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info(self.join(rel))
        return info.type != pafs.FileType.NotFound

    def read_text(self, rel: str) -> str:
        with self._fs.open_input_stream(self.join(rel)) as fh:
            return fh.read().decode("utf-8")

    def read_bytes(self, rel: str) -> bytes:
        """Raw bytes of a table-relative file (deletion-vector sidecars)."""
        with self._fs.open_input_stream(self.join(rel)) as fh:
            return fh.read()

    def read_bytes_uri(self, uri: str) -> bytes:
        """Raw bytes of an ABSOLUTE path/URI (storageType='p' deletion
        vectors).  Same-filesystem paths read through this store's fs; other
        schemes resolve independently via pyarrow."""
        from pyarrow import fs as pafs

        if "://" in uri:
            scheme = uri.split("://", 1)[0]
            if scheme in _SCHEME_RESOLVERS:
                fs, path = pafs.LocalFileSystem(), _SCHEME_RESOLVERS[scheme](uri)
            else:
                fs, path = pafs.FileSystem.from_uri(uri)
        else:
            fs, path = self._fs, uri
        with fs.open_input_stream(path) as fh:
            return fh.read()

    def list_names(self, rel_dir: str) -> list[str]:
        """Basenames of files directly under ``rel_dir`` (sorted)."""
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self.join(rel_dir), recursive=False)
        return sorted(
            posixpath.basename(i.path)
            for i in self._fs.get_file_info(sel)
            if i.type == pafs.FileType.File
        )

    def read_parquet(self, rel: str):
        import pyarrow.parquet as pq

        return pq.read_table(self.join(rel), filesystem=self._fs)
