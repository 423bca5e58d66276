#!/usr/bin/env python
"""Dual-scale contract check for the heaviest catalog keys (VERDICT r2 #5).

The driver samples the catalog at ONE scale per round; two round-1 reds
(float quantization) only appeared at sf0.1.  This runs the heaviest
SQL-oracle keys through scripts/check_contract.py at BOTH sf0.01 and
sf0.1 and tees the result to a committed log, so a scale-dependent
divergence is caught before the driver finds it.

Golden-backed keys are excluded automatically: their oracles are
parquet materializations OF the sf0.01 input, so they cannot be
revalidated against sf0.1 input by construction (their kernels are
pinned by the pytest reference-vector suites instead).

Usage:  python scripts/ci_contract_scales.py [--out BENCH/ci_scales_r03.log]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The heavy hitters: every bench-timed key plus the widest shuffles /
# biggest intermediates in the catalog (pair generators, window preludes,
# full-corpus tokenizers).  Keep ~20 after the golden filter.
HEAVY_KEYS = [
    "f9_urlfilter_ladder", "f11_winner_window", "f14_wave_caps",
    "f16_fetch_schedule", "f5_url_seen_antijoin", "f8_latest_reply_join",
    "dedup_exact", "dedup_lines", "dedup_ngram_jaccard_pairs",
    "dedup_ngram_jaccard_pairs_lsh", "dedup_embed_cosine_pairs",
    "embed_topk_bruteforce", "q1_boolean_search", "q1_synonym_search",
    "q2_posting_intersect_topk", "events_tumbling_window",
    "events_sessionize_gap", "text_quality_catalyst",
    "text_gopher_quality", "text_gopher_repetition",
    "text_dup_ngram_coverage", "training_pack_sequences", "pii_scrub",
    "decontaminate_eval_overlap", "words_segment_tokens",
    "text_sentence_segment", "linkgraph_pagerank", "domain_quota_sample",
    # round-4 (VERDICT r3 #3): the round-3 training tier, previously only
    # sampled by the driver at one scale
    "dedup_semantic_keepers", "dedup_semantic_keepers_distributed",
    "dsir_importance_select",
    "text_quality_classifier", "text_lm_perplexity",
    "training_temperature_mix", "dedup_image_dhash_pairs",
    "dedup_audio_fp_pairs", "training_shuffle_positions",
    "dedup_minhash_lsh_pairs", "dedup_simhash_pairs",
    "dedup_embed_cosine_pairs_lsh", "embed_ann_lsh", "embed_ann_ivf",
    "embed_ann_pq",
]

SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None,
                    help="tee the log here (e.g. BENCH/ci_scales_r03.log)")
    ap.add_argument("--all", action="store_true",
                    help="check EVERY catalog key at both scales, not "
                         "just the heavy set (full-catalog sf0.1 "
                         "evidence; slower)")
    args = ap.parse_args()

    from open_source_search_engine_spark.queries import (GOLDEN_QUERIES,
                                                         QUERIES)
    golden = {name for name, _, _ in GOLDEN_QUERIES}
    base = sorted(QUERIES) if args.all else HEAVY_KEYS
    keys = [k for k in base if k in QUERIES and k not in golden]
    # golden-backed keys: their oracle IS an sf0.01 materialization, so
    # the value check only exists at sf0.01; at sf0.1 they are EXECUTED
    # (rows + wall logged, rows>0 asserted) to catch scale-dependent
    # plan/row blow-ups the one-scale driver gate can't see (r3 #3)
    golden_keys = [k for k in base if k in QUERIES and k in golden]
    missing = [k for k in base if k not in QUERIES]

    lines: list[str] = []

    def emit(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    emit(f"# dual-scale contract check: {len(keys)} SQL-oracle keys x "
         f"{len(SCALES)} scales; {len(golden_keys)} golden-backed keys "
         f"(value-pinned at sf0.01, execute+rows at sf0.1); "
         f"missing: {sorted(missing)}")
    ok = True
    for sf in SCALES:
        emit(f"\n== {sf} ==")
        check = keys if sf.endswith("0.1") else keys + golden_keys
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "check_contract.py"), *check],
            env=env, capture_output=True, text=True)
        for ln in p.stdout.splitlines():
            if ln.startswith(("OK", "FAIL")) or "green" in ln:
                emit(ln)
        if p.returncode != 0:
            ok = False
            emit(f"EXIT {p.returncode}")
            emit(p.stderr[-2000:])

    # golden-backed keys at sf0.1: execute in-process, log rows + wall
    emit("\n== /root/testdata/sf0.1 (golden-backed: execute+rows) ==")
    import time

    from open_source_search_engine_spark.session import get_spark
    spark = get_spark(app="ci-scales-golden", master="local[32]",
                      shuffle_partitions=32)
    for k in golden_keys:
        t0 = time.time()
        try:
            n = QUERIES[k](spark, "/root/testdata/sf0.1").count()
            good = n > 0
            emit(f"{'OK' if good else 'FAIL'}        {k}  "
                 f"{{\"sf01_rows\": {n}, "
                 f"\"sec\": {time.time() - t0:.1f}}}")
            ok &= good
        except Exception as exc:      # noqa: BLE001 — log and fail the key
            ok = False
            emit(f"FAIL      {k}  {type(exc).__name__}: {exc}")
    emit(f"\nRESULT: {'ALL GREEN' if ok else 'FAILURES'}")
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
