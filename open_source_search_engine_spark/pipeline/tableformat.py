"""Table-format boundary — the one seam a 100 TB deployment swaps.

SURVEY §1.4 maps Spiderdb to "Iceberg table, bucket(N, first_ip)"; this
sandbox has no Iceberg/Delta jars, so the crawl state is served by the
manifest+parquet store in :mod:`snapshots` (atomic JSON-manifest commits,
time travel, vacuum, fsck).  VERDICT r3 item 6: put that store behind a
thin interface documenting the swap, so production is a backend CHANGE,
not a rewrite.  :class:`CrawlRunner` holds a :class:`TableFormat` and
never touches paths or manifests directly.

Method-by-method mapping to a real table format:

===================  ==========================================  =========================================
TableFormat method   Iceberg                                     Delta Lake
===================  ==========================================  =========================================
``load``             load current table metadata (catalog)       read _delta_log head
``begin``            new transaction                             new OptimisticTransaction
``commit``           snapshot commit (atomic metadata swap)      transaction commit (log entry)
``data_path``        n/a (writers append via the API)            n/a
``record_write``     implicit in ``append()``/``newAppend()``    implicit in ``txn.commit(addFiles)``
``committed_paths``  file-scan planning w/ partition pruning     log-replay file listing
``read``             ``VERSION AS OF`` time travel +             ``versionAsOf`` time travel +
                     manifest min/max stats pruning              data-skipping stats
``compacted_write``  ``rewrite_data_files`` / ``RewriteAction``  ``OPTIMIZE`` (+ ``MERGE`` keep-rules)
``vacuum``           ``expireSnapshots().cleanExpiredFiles``     ``VACUUM``
``fsck``             metadata integrity (orphan-file scan)       ``FSCK REPAIR TABLE``
===================  ==========================================  =========================================

What the manifest store implements by hand and a real format gives for
free: transactional concurrent writers (we rely on one writer per state
dir), column min/max stats pruning at file level (we prune at round-dir
level via the manifest + row-level round filters), and schema evolution.
The semantic contract CrawlRunner needs — atomic visibility of a round's
writes, resume-from-snapshot byte parity, time travel, orphan cleanup —
is exactly the interface below.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import snapshots as snap

Manifest = snap.Manifest          # the snapshot token type callers pass


class TableFormat:
    """Abstract write/read contract for the crawl state store.  One
    instance == one logical database (a state dir here; a namespace in a
    real catalog)."""

    # -- transaction/snapshot lifecycle ------------------------------------
    def load(self) -> Manifest | None:
        """Current committed snapshot token, or None if never committed."""
        raise NotImplementedError

    def begin(self, **kwargs) -> Manifest:
        """A fresh, uncommitted snapshot token."""
        raise NotImplementedError

    def commit(self, m: Manifest) -> None:
        """Atomically publish every write recorded on ``m``."""
        raise NotImplementedError

    # -- write path ---------------------------------------------------------
    def data_path(self, table: str, version: int) -> str:
        """Physical path the engine writes ``table``'s ``version`` to.
        (Path-based formats only; API-appending formats fold this into
        record_write.)"""
        raise NotImplementedError

    def record_write(self, m: Manifest, table: str, version: int,
                     count: int) -> None:
        """Attach a completed data write to the pending snapshot."""
        raise NotImplementedError

    # -- read path ----------------------------------------------------------
    def committed_paths(self, table: str, m: Manifest) -> list[str]:
        """Scan-plan a table: every committed, non-empty data path."""
        raise NotImplementedError

    def read(self, spark: SparkSession, table: str,
             as_of: int | None = None) -> DataFrame | None:
        """Time-travel read: the table as of version ``as_of`` (None =
        latest); None when nothing visible is committed."""
        raise NotImplementedError

    # -- maintenance ----------------------------------------------------------
    def vacuum(self, m: Manifest, tables: tuple[str, ...]) -> list[str]:
        """Delete data unreachable from the committed snapshot."""
        raise NotImplementedError

    def fsck(self) -> list[str]:
        """Integrity report: [] = every committed path/file is present."""
        raise NotImplementedError


class ManifestParquetFormat(TableFormat):
    """The in-sandbox backend: partitioned parquet + an atomically
    committed JSON manifest (see :mod:`snapshots` for the layout and the
    crash-consistency argument).  All methods are thin delegations —
    the format logic stays in one tested module."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir

    def load(self) -> Manifest | None:
        return snap.load_manifest(self.state_dir)

    def begin(self, **kwargs) -> Manifest:
        return snap.Manifest(**kwargs)

    def commit(self, m: Manifest) -> None:
        snap.commit_manifest(self.state_dir, m)

    def data_path(self, table: str, version: int) -> str:
        return snap.round_dir(self.state_dir, table, version)

    def record_write(self, m: Manifest, table: str, version: int,
                     count: int) -> None:
        snap.record_write(m, self.state_dir, table, version, count)

    def committed_paths(self, table: str, m: Manifest) -> list[str]:
        return snap.committed_dirs(self.state_dir, table, m)

    def read(self, spark: SparkSession, table: str,
             as_of: int | None = None) -> DataFrame | None:
        return snap.read_table(spark, self.state_dir, table,
                               as_of_round=as_of)

    def vacuum(self, m: Manifest, tables: tuple[str, ...] = (
            "requests", "replies", "waves")) -> list[str]:
        return snap.vacuum(self.state_dir, m, tables=tables)

    def fsck(self) -> list[str]:
        return snap.verify_integrity(self.state_dir)

    def exists(self) -> bool:
        return os.path.exists(snap.manifest_path(self.state_dir))
