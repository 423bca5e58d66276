"""CLI: run the multi-round crawl over a synthetic corpus and (optionally)
compare against the Python oracle.

    python -m open_source_search_engine_spark.plans.crawl_loop \
        --n-urls 200 --rounds 10 --bloom --compare-oracle

Generates a deterministic corpus (or reuses --corpus-dir), runs the Spark
pipeline to completion with checkpointed rounds, prints per-round stats and
the final parity verdict.
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus-dir", default=None,
                    help="existing corpus parquet dir (default: generate)")
    ap.add_argument("--state-dir", default=None,
                    help="checkpoint/state dir (default: temp)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-domains", type=int, default=8)
    ap.add_argument("--n-urls", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--bloom", action="store_true",
                    help="enable the Bloom URL-seen scale path (F5)")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="run frontier compaction every K rounds")
    ap.add_argument("--compare-oracle", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from ..config import CrawlConfig
    from ..corpus import generate_corpus, write_parquet
    from ..oracle import run_oracle
    from ..pipeline.crawl import CrawlRunner
    from ..session import get_spark

    cfg = CrawlConfig(max_rounds=args.rounds,
                      compact_every=args.compact_every)
    corpus = generate_corpus(seed=args.seed, n_domains=args.n_domains,
                             n_urls=args.n_urls)
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="crawl_corpus_")
    if args.corpus_dir is None:
        write_parquet(corpus, corpus_dir)
    state_dir = args.state_dir or tempfile.mkdtemp(prefix="crawl_state_")

    spark = get_spark(app="crawl_loop", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    runner = CrawlRunner(spark, corpus_dir, state_dir, cfg,
                         use_bloom_seen=args.bloom)

    def progress(st):
        # compaction cadence runs INSIDE CrawlRunner.run (cfg.compact_every)
        # where the manifest handoff is safe — not from this callback
        print(f"round={st.round:3d} wave={st.wave_rows:5d} "
              f"new_requests={st.new_requests:5d} jumped={st.jumped}")

    m = runner.run(progress=progress)
    runner.close()
    n_sched = runner.crawl_order().count()
    n_seen = runner.url_seen().count()
    print(f"done: rounds={m.completed_rounds} finished={m.finished} "
          f"scheduled={n_sched} url_seen={n_seen} state={state_dir}")

    if args.compare_oracle:
        want = run_oracle(corpus, cfg)
        got = sorted(tuple(r) for r in runner.crawl_order()
                     .select("round", "seq_in_round", "uh48", "url_norm",
                             "first_ip", "priority", "hop_count",
                             "fetch_at_ms").collect())
        want_rows = sorted(
            (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
             r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
            for r in want.crawl_order)
        ok = got == want_rows
        got_seen = {(r["uh48"], r["first_seen_round"])
                    for r in runner.url_seen().collect()}
        want_seen = {(r["uh48"], r["first_seen_round"])
                     for r in want.url_seen}
        ok_seen = got_seen == want_seen
        print(f"oracle parity: crawl_order={'MATCH' if ok else 'MISMATCH'} "
              f"({len(got)} rows)  url_seen="
              f"{'MATCH' if ok_seen else 'MISMATCH'} ({len(got_seen)} urls)")
        return 0 if (ok and ok_seen) else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
