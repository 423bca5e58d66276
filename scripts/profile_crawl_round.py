#!/usr/bin/env python
"""Per-stage profile of CrawlRunner rounds (VERDICT r4 item 3).

Monkeypatches timers around the sub-stages inside a crawl round —
candidates build, wave assemble+write, fetch-sim writes, Bloom
maintenance, manifest commit — and prints a per-round table, so the
fixed-overhead cut can target the measured hot stage instead of a
guess.  Run on a quiet box; stage RATIOS are robust to steal noise.

Usage: python scripts/profile_crawl_round.py [rounds]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_source_search_engine_spark.session import get_spark
from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import generate_corpus, write_parquet
from open_source_search_engine_spark.pipeline import crawl as C
from open_source_search_engine_spark.pipeline import seen as S

TIMES: dict[str, float] = {}


def timed(cls, name: str, label: str | None = None):
    orig = getattr(cls, name)
    key = label or name

    def wrap(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            TIMES[key] = TIMES.get(key, 0.0) + (time.time() - t0)

    setattr(cls, name, wrap)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for meth in ("_candidates", "_assemble_wave", "_simulate_fetch",
                 "_write", "_write_data", "_read_all", "_dedup_requests",
                 "_maybe_refresh_robots", "_compile_hosts"):
        timed(C.CrawlRunner, meth)
    timed(S.BloomState, "add_df", "bloom_add_df")
    timed(S.BloomState, "__init__", "bloom_init")
    for fn in ("filter_new_requests_incremental",):
        orig = getattr(S, fn)

        def wrap(*a, __o=orig, __k=fn, **k):
            t0 = time.time()
            try:
                return __o(*a, **k)
            finally:
                TIMES[__k] = TIMES.get(__k, 0.0) + (time.time() - t0)

        setattr(S, fn, wrap)
        setattr(C, fn, wrap)

    spark = get_spark()
    corpus = generate_corpus(seed=42, n_domains=12, n_urls=600)
    corpus_dir = tempfile.mkdtemp(prefix="prof_crawl_corpus_")
    write_parquet(corpus, corpus_dir)
    state_dir = tempfile.mkdtemp(prefix="prof_crawl_state_")
    runner = C.CrawlRunner(spark, corpus_dir, state_dir,
                           CrawlConfig(max_rounds=rounds),
                           use_bloom_seen=True)
    per_round = []
    while len(per_round) < rounds:
        snapshot = dict(TIMES)
        t0 = time.time()
        st = runner.step()
        if st is None:
            break
        wall = time.time() - t0
        delta = {k: round(v - snapshot.get(k, 0.0), 3)
                 for k, v in TIMES.items()
                 if v - snapshot.get(k, 0.0) > 0.005}
        per_round.append((st.round, wall, st.wave_rows, delta))
    runner.close()
    print()
    for rnd, wall, wrows, delta in per_round:
        print(f"round {rnd}: wall={wall:.2f}s wave={wrows}")
        for k, v in sorted(delta.items(), key=lambda kv: -kv[1]):
            print(f"    {k:35s} {v:7.3f}")
    tot = sum(w for _, w, _, _ in per_round)
    print(f"\ntotal {tot:.2f}s over {len(per_round)} rounds "
          f"= {tot / max(len(per_round), 1):.2f}s/round")


if __name__ == "__main__":
    main()
