"""Snapshot/commit layer — the Iceberg-analogue for the sandbox.

The reference checkpoints its in-memory trees to ``*-saved.dat`` files
(``SpiderColl.cpp:86-213``); the production design uses Iceberg snapshot
commits (SURVEY.md §1.4).  This sandbox has no Iceberg jars, so the crawl
state lives in partitioned parquet under a state dir with an atomically
committed JSON manifest per round:

    state_dir/
      requests/round=R/*.parquet     (append-only request log)
      replies/round=R/*.parquet      (append-only reply log)
      waves/round=R/*.parquet        (the committed fetch schedule)
      MANIFEST.json                  (atomic: tmp + os.replace)

A round is visible iff it is listed in the manifest — a job killed mid-round
leaves unreferenced files that the next run ignores and overwrites, so resume
is byte-identical (north rule).  The manifest also records per-round row
counts and per-partition file lists = the per-partition lineage the north
rule asks for.  Swapping this module for real Iceberg (``MERGE INTO`` +
snapshot expiry) changes no caller code.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class Manifest:
    completed_rounds: int = 0          # rounds 0..completed_rounds-1 committed
    wave_start_ms: int = 0             # clock for the NEXT round
    finished: bool = False
    robots_compiled_at_ms: int = 0     # F19 robots-cache stamp (0 = unset);
    # persisted so a resumed crawl refreshes robots at the SAME clock a
    # continuous run would (24 h TTL, Msg13.cpp:477-484)
    rows: dict = field(default_factory=dict)   # "requests/0" -> count
    files: dict = field(default_factory=dict)  # "waves/0" -> [file names]

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, sort_keys=True)


def manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "MANIFEST.json")


def load_manifest(state_dir: str) -> Manifest | None:
    p = manifest_path(state_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    m = Manifest()
    m.__dict__.update(d)
    return m


def commit_manifest(state_dir: str, m: Manifest) -> None:
    """Atomic commit: write tmp then os.replace (POSIX atomic rename) — the
    crash-consistency point of each round, like an Iceberg snapshot swap."""
    os.makedirs(state_dir, exist_ok=True)
    tmp = manifest_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(state_dir))


def round_dir(state_dir: str, table: str, rnd: int) -> str:
    return os.path.join(state_dir, table, f"round={rnd}")


def committed_dirs(state_dir: str, table: str, m: Manifest) -> list[str]:
    """Paths of all committed rounds of a table (skips empty rounds).
    Driven by the manifest, not the filesystem: files written by a crashed
    round that never committed are invisible (snapshot isolation)."""
    out = []
    prefix = table + "/"
    for key, n in m.rows.items():
        if key.startswith(prefix) and n > 0:
            out.append(round_dir(state_dir, table, int(key[len(prefix):])))
    return sorted(out)


def read_table(spark, state_dir: str, table: str,
               as_of_round: int | None = None):
    """Time-travel read — the Iceberg ``VERSION AS OF`` analogue: the
    table's committed rows as of the END of round ``as_of_round``
    (inclusive); ``None`` = the latest committed snapshot.  Returns None
    when nothing visible is committed.

    Mechanics: round dirs are pruned by the manifest (dir-level partition
    pruning — rounds after the target never reach the scan), then the
    row-level ``round`` column filters inside compacted generations
    (negative ``round=-G`` dirs, whose rows keep their logical round).
    Like Iceberg after ``expire_snapshots``, a compaction folds per-round
    request/reply history into the keep-rule winners — time travel across
    a compaction boundary is logical (round-column filter over the folded
    rows), while pre-compaction reads reconstruct the snapshot exactly.
    """
    m = load_manifest(state_dir)
    if m is None:
        return None
    prefix = table + "/"
    dirs = []
    for key, n in m.rows.items():
        if not key.startswith(prefix) or n == 0:
            continue
        rnd = int(key[len(prefix):])
        # negative rounds are compacted generations (folded history);
        # they always participate and are filtered row-level below
        if as_of_round is not None and rnd > as_of_round and rnd >= 0:
            continue
        dirs.append(round_dir(state_dir, table, rnd))
    if not dirs:
        return None
    df = spark.read.parquet(*sorted(dirs))
    if as_of_round is not None and "round" in df.columns:
        df = df.filter(df["round"] <= as_of_round)
    return df


def verify_integrity(state_dir: str) -> list[str]:
    """State fsck (Repair.cpp analogue): every manifest-referenced round
    dir must exist with its recorded files present.  Returns a list of
    problems (empty = healthy)."""
    problems: list[str] = []
    m = load_manifest(state_dir)
    if m is None:
        return ["no manifest"]
    for key, n in m.rows.items():
        table, rnd = key.split("/")
        if n == 0:
            continue
        d = round_dir(state_dir, table, int(rnd))
        if not os.path.isdir(d):
            problems.append(f"missing dir for {key}")
            continue
        have = {f for f in os.listdir(d) if f.endswith(".parquet")}
        want = set(m.files.get(key, []))
        missing = want - have
        if missing:
            problems.append(f"{key}: {len(missing)} data files missing")
    return problems


def vacuum(state_dir: str, m: Manifest,
           tables: tuple[str, ...] = ("requests", "replies", "waves")
           ) -> list[str]:
    """Remove data dirs not referenced by the committed manifest: orphans
    from crashed rounds and pre-compaction generations.  Safe strictly
    AFTER a commit (Iceberg's expire-snapshots analogue).  Returns the
    removed paths."""
    import shutil
    removed = []
    for table in tables:
        base = os.path.join(state_dir, table)
        if not os.path.isdir(base):
            continue
        live = {f"round={k.split('/')[1]}" for k in m.rows
                if k.startswith(table + "/")}
        for entry in os.listdir(base):
            if entry.startswith("round=") and entry not in live:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
                removed.append(os.path.join(base, entry))
    return removed


def record_write(m: Manifest, state_dir: str, table: str, rnd: int,
                 count: int) -> None:
    key = f"{table}/{rnd}"
    m.rows[key] = count
    d = round_dir(state_dir, table, rnd)
    if os.path.isdir(d):
        m.files[key] = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet"))
