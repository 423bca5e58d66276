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


class DirectoryLogFormat(TableFormat):
    """Second backend (VERDICT r4 item 4): a Delta-style APPEND-ONLY
    commit log instead of the single mutable manifest.

    Layout::

        state_dir/
          _log/00000000000000000001.json   (commit 1: delta actions)
          _log/00000000000000000002.json   (commit 2: ...)
          <table>/v=R/*.parquet            (R < 0 = compacted generation)

    Each commit file holds the DELTA versus the previous committed
    state — changed ``rows``/``files`` entries, ``removed`` keys (how a
    compaction retires per-round history, like Delta ``remove`` actions)
    and the scalar crawl metadata — and the current state is
    reconstructed by LOG REPLAY in version order (``_replay``), exactly
    Delta's ``_delta_log`` protocol shape.  Commits are atomic via
    tmp-write + ``os.replace`` to the next version number; a crash
    mid-commit leaves an ignored ``_tmp`` file and the store serves the
    previous version (same crash-consistency argument as the manifest
    store, different mechanism).  Single writer per state dir, like the
    manifest backend (a real Delta deployment gets optimistic
    concurrency from the log protocol; we inherit the one-writer
    assumption the sandbox already makes).

    Everything CrawlRunner needs — atomic round visibility, byte-
    identical resume, time travel, vacuum, fsck — is re-implemented
    over this layout with ZERO delegation to the manifest store, so the
    parametrized checkpoint/time-travel/vacuum/fsck + crawl-resume test
    matrix proves the TableFormat seam really is swappable."""

    LOG_DIR = "_log"

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        self._committed: Manifest | None = None   # last replayed state

    # -- log mechanics ------------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.state_dir, self.LOG_DIR)

    def _versions(self) -> list[tuple[int, str]]:
        d = self._log_path()
        if not os.path.isdir(d):
            return []
        out = []
        for fn in os.listdir(d):
            if fn.endswith(".json") and not fn.startswith("_tmp"):
                try:
                    out.append((int(fn[:-5]), os.path.join(d, fn)))
                except ValueError:
                    continue
        return sorted(out)

    def _replay(self) -> Manifest | None:
        import json
        vs = self._versions()
        if not vs:
            return None
        m = Manifest()
        for _, p in vs:
            with open(p) as f:
                e = json.load(f)
            for k in e.get("removed", []):
                m.rows.pop(k, None)
                m.files.pop(k, None)
            m.rows.update(e.get("rows", {}))
            m.files.update(e.get("files", {}))
            meta = e.get("meta", {})
            for attr in ("completed_rounds", "wave_start_ms", "finished",
                         "robots_compiled_at_ms"):
                if attr in meta:
                    setattr(m, attr, meta[attr])
        return m

    @staticmethod
    def _copy(m: Manifest) -> Manifest:
        c = Manifest(completed_rounds=m.completed_rounds,
                     wave_start_ms=m.wave_start_ms, finished=m.finished,
                     robots_compiled_at_ms=m.robots_compiled_at_ms)
        c.rows = dict(m.rows)
        c.files = {k: list(v) for k, v in m.files.items()}
        return c

    # -- transaction/snapshot lifecycle ------------------------------------
    def load(self) -> Manifest | None:
        m = self._replay()
        self._committed = self._copy(m) if m is not None else None
        return m

    def begin(self, **kwargs) -> Manifest:
        return Manifest(**kwargs)

    def commit(self, m: Manifest) -> None:
        import json
        base = self._committed
        entry: dict = {
            "meta": {"completed_rounds": m.completed_rounds,
                     "wave_start_ms": m.wave_start_ms,
                     "finished": m.finished,
                     "robots_compiled_at_ms": m.robots_compiled_at_ms},
            "rows": {k: v for k, v in m.rows.items()
                     if base is None or base.rows.get(k) != v},
            "files": {k: v for k, v in m.files.items()
                      if base is None or base.files.get(k) != v},
            "removed": sorted(k for k in (base.rows if base else {})
                              if k not in m.rows),
        }
        vs = self._versions()
        next_v = (vs[-1][0] + 1) if vs else 1
        os.makedirs(self._log_path(), exist_ok=True)
        tmp = os.path.join(self._log_path(),
                           f"_tmp.{os.getpid()}.{next_v}")
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self._log_path(),
                                     f"{next_v:020d}.json"))
        self._committed = self._copy(m)

    # -- write path ---------------------------------------------------------
    def data_path(self, table: str, version: int) -> str:
        return os.path.join(self.state_dir, table, f"v={version}")

    def record_write(self, m: Manifest, table: str, version: int,
                     count: int) -> None:
        key = f"{table}/{version}"
        m.rows[key] = count
        d = self.data_path(table, version)
        if os.path.isdir(d):
            m.files[key] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet"))

    # -- read path ----------------------------------------------------------
    def committed_paths(self, table: str, m: Manifest) -> list[str]:
        prefix = table + "/"
        return sorted(self.data_path(table, int(k[len(prefix):]))
                      for k, n in m.rows.items()
                      if k.startswith(prefix) and n > 0)

    def read(self, spark: SparkSession, table: str,
             as_of: int | None = None) -> DataFrame | None:
        """Time travel with the same semantics the manifest backend
        proves: dir-level pruning of rounds past the target, row-level
        ``round`` filtering inside compacted (negative) generations."""
        m = self._replay()
        if m is None:
            return None
        prefix = table + "/"
        dirs = []
        for key, n in m.rows.items():
            if not key.startswith(prefix) or n == 0:
                continue
            rnd = int(key[len(prefix):])
            if as_of is not None and rnd > as_of and rnd >= 0:
                continue
            dirs.append(self.data_path(table, rnd))
        if not dirs:
            return None
        df = spark.read.parquet(*sorted(dirs))
        if as_of is not None and "round" in df.columns:
            df = df.filter(df["round"] <= as_of)
        return df

    # -- maintenance --------------------------------------------------------
    def vacuum(self, m: Manifest, tables: tuple[str, ...] = (
            "requests", "replies", "waves")) -> list[str]:
        import shutil
        removed = []
        for table in tables:
            base = os.path.join(self.state_dir, table)
            if not os.path.isdir(base):
                continue
            live = {f"v={k.split('/')[1]}" for k in m.rows
                    if k.startswith(table + "/")}
            for entry in os.listdir(base):
                if entry.startswith("v=") and entry not in live:
                    shutil.rmtree(os.path.join(base, entry),
                                  ignore_errors=True)
                    removed.append(os.path.join(base, entry))
        return removed

    def fsck(self) -> list[str]:
        problems: list[str] = []
        vs = self._versions()
        if not vs:
            return ["no commit log"]
        # log contiguity: versions must be 1..N with no gaps (a gap means
        # a commit file vanished — replay would silently skip history)
        want_versions = list(range(1, vs[-1][0] + 1))
        have_versions = [v for v, _ in vs]
        if have_versions != want_versions:
            problems.append(
                f"log gap: have {have_versions}, want {want_versions}")
        m = self._replay()
        for key, n in m.rows.items():
            table, rnd = key.split("/")
            if n == 0:
                continue
            d = self.data_path(table, int(rnd))
            if not os.path.isdir(d):
                problems.append(f"missing dir for {key}")
                continue
            have = {f for f in os.listdir(d) if f.endswith(".parquet")}
            missing = set(m.files.get(key, [])) - have
            if missing:
                problems.append(f"{key}: {len(missing)} data files missing")
        return problems

    def exists(self) -> bool:
        return bool(self._versions())
