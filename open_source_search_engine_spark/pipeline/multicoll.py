"""Multi-collection round-robin scheduling (SpiderLoop.cpp:503-539).

The reference's spider loop services N collections fairly: every pass it
launches at most one spider per collection, advancing ``m_crx`` through the
active-collection ring so no collection starves behind a busy one.  The
batch analogue rotates one ROUND per collection per pass: each collection
owns its own frontier state dir (isolated tables, isolated politeness
clocks, its own url-filter ladder), and a pass steps each unfinished
collection once in a fixed rotation.

Isolation invariant: a collection's outputs are byte-identical whether it
runs alone or interleaved with others — verified by
tests/test_multicoll.py against the single-collection oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..config import CrawlConfig
from .crawl import CrawlRunner, RoundStats


@dataclass
class LaunchRecord:
    collection: str
    round: int
    wave_rows: int


@dataclass
class MultiCrawlRunner:
    """Rotates rounds across collections until all complete.

    ``collections``: name -> (corpus_dir, state_dir, cfg).
    """
    spark: SparkSession
    runners: dict = field(default_factory=dict)
    launches: list = field(default_factory=list)

    def add_collection(self, name: str, corpus_dir: str, state_dir: str,
                       cfg: CrawlConfig | None = None) -> CrawlRunner:
        r = CrawlRunner(self.spark, corpus_dir, state_dir,
                        cfg or CrawlConfig())
        self.runners[name] = r
        return r

    def run(self, max_passes: int = 100) -> list:
        """Round-robin passes: one round per active collection per pass
        (SpiderLoop.cpp:503-539 'only launch one per coll per round'),
        rotation order = insertion order, finished collections drop out of
        the ring."""
        active = dict(self.runners)
        for _ in range(max_passes):
            if not active:
                break
            done = []
            for name, runner in active.items():
                stats: RoundStats | None = runner.step()
                if stats is None:
                    done.append(name)
                    continue
                self.launches.append(
                    LaunchRecord(name, stats.round, stats.wave_rows))
            for name in done:
                # release the finished collection's dim caches + Bloom
                # state; the runner's read paths (crawl_order etc.) stay
                # usable — they read committed parquet
                active.pop(name).close()
        return self.launches

    def close(self) -> None:
        for r in self.runners.values():
            r.close()
