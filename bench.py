#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling-evidence protocol).

Default mode: one JSON line with per-query seconds at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Headline metric: **frontier scheduling throughput** — a synthetic frontier
of ``$SPARK_GRAFT_FRONTIER_ROWS`` candidate URLs (default 5M; schema
identical to the 10^10 design, scale is a parameter) is pushed through the
REAL wave-assembly path: url-filter when()-chain, latest-reply join,
host-state join, eligible-time greatest(), salted per-IP winner top-K
(mega-host skew: 30% of rows on one IP), per-IP caps, politeness fetch_at.
Reported as ``urls_scheduled_per_sec`` = candidate rows evaluated / wall sec.

``--scaling`` mode: runs the same frontier job at local[N] and local[4N]
(N=4 — the box has 16 physical cores; see run_scaling) per BASELINE.md's
sandbox scaling protocol and reports the N→4N throughput-scaling
efficiency against the ≥0.8 gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def build_frontier(spark, n_rows: int):
    """Synthetic candidate frontier, generated JVM-side (spark.range — no
    Python in the data path).  uh48 is a bijective odd-multiplier mix of the
    row id; one mega-IP owns ~30% of rows (skew path); 20% of URLs carry a
    prior reply."""
    from pyspark.sql import functions as F

    n_ips = max(1000, n_rows // 200)
    df = (
        spark.range(n_rows)
        .withColumn("uh48", (F.col("id") * F.lit(25214903917))
                    .bitwiseAND(F.lit((1 << 48) - 1)))
        .withColumn("first_ip",
                    F.when(F.col("id") % 10 < 3, F.lit(167772160))
                    .otherwise(167772161 + F.col("id") % n_ips))
        .withColumn("hop_count", (F.col("id") % 7).cast("int"))
        .withColumn("added_time", F.lit(1700000000) + F.col("id") % 86400)
        .withColumn("discovery_time", F.col("added_time"))
        .withColumn("url",
                    F.concat(F.lit("http://h"),
                             (F.col("first_ip") - 167772160).cast("string"),
                             F.lit(".example/p"), F.col("id").cast("string"),
                             F.lit(".html")))
        .withColumn("path_cgi", F.concat(F.lit("/p"), F.col("id").cast("string"),
                                         F.lit(".html")))
        .withColumn("tld", F.lit("example"))
        .withColumn("is_add_url", F.col("hop_count") == 0)
        .withColumn("is_injecting", F.lit(False))
        .withColumn("is_www", F.lit(True))
        .withColumn("site_num_inlinks", F.lit(0))
        .withColumn("robots_delay_ms", F.lit(-1))
    )
    replies = (
        spark.range(n_rows // 5)
        .withColumn("uh48", (F.col("id") * 5 * F.lit(25214903917))
                    .bitwiseAND(F.lit((1 << 48) - 1)))
        .withColumn("err_code",
                    F.when(F.col("id") % 17 == 0, 32769).otherwise(0))
        .withColumn("err_count", (F.col("id") % 3).cast("int"))
        .withColumn("http_status", F.lit(200))
        .withColumn("is_indexed", F.col("err_code") == 0)
        .withColumn("last_spider_time_s",
                    F.lit(1700000000) - F.col("id") % 864000)
        .select("uh48", "err_code", "err_count", "http_status", "is_indexed",
                "last_spider_time_s")
    )
    return df.drop("id"), replies


def assemble_wave(spark, frontier, replies, wave_start_ms: int,
                  n_wave_shards: int = 64):
    """The production wave-assembly path — the SAME function the crawl
    runner executes (pipeline.crawl.assemble_wave_from_candidates): filter
    ladder → eligibility → salted winner top-K → per-rule + global budgets
    (sharded, the 10^10 configuration) → politeness schedule."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.config import (CrawlConfig,
                                                        default_url_filters)
    from open_source_search_engine_spark.pipeline.crawl import (
        assemble_wave_from_candidates)
    from open_source_search_engine_spark.pipeline.filters import (
        compile_rule_match, rule_arrays)

    cfg = CrawlConfig(n_wave_shards=n_wave_shards)
    cand = (
        frontier.join(replies, "uh48", "left")
        .withColumn("has_reply", F.col("last_spider_time_s").isNotNull())
        .fillna({"err_code": 0, "err_count": 0, "http_status": 0,
                 "is_indexed": False, "last_spider_time_s": 0})
        .withColumn("ip_last_end", F.lit(0).cast("long"))
        .withColumn("ufn", compile_rule_match(default_url_filters(),
                                              wave_start_ms // 1000))
    )
    for name, col in rule_arrays(default_url_filters()).items():
        cand = cand.withColumn(name, col)
    cand = (
        cand.filter((F.col("ufn") >= 0) & ~F.col("force_delete"))
        .withColumn(
            "eligible_ms",
            F.greatest(
                F.col("added_time") * 1000,
                F.col("ip_last_end") + F.col("ip_wait_ms"),
                F.when(F.col("has_reply"),
                       F.col("last_spider_time_s") * 1000
                       + F.col("spider_freq_ms"))
                .otherwise(F.lit(0).cast("long"))))
        .filter(F.col("eligible_ms") <= wave_start_ms)
    )
    # payload join-back reads the raw frontier (uh48-unique), not the
    # un-cached candidate lineage
    return assemble_wave_from_candidates(
        cand, cfg, wave_start_ms, rnd=0,
        payload=frontier.select("uh48", "url"))


def _steal_control() -> float:
    """Pure-CPython busy loop (no JVM, no IO), best of 3 — a host-weather
    thermometer for this Firecracker sandbox's CPU-steal episodes (see
    BENCH/BASELINE.md round-4 scatter disclosure: identical bench code
    measured 22.7-46.2 s totals across one afternoon while this control
    moved ~0.5 -> ~1.1 s).  Rides in the output JSON so every recorded
    artifact self-reports the conditions it was measured under: ~0.5 s
    is a calm box; >=0.9 s means wall-clock numbers are ~2x understated."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = 0
        for i in range(10_000_000):
            s += i
        best = min(best, time.perf_counter() - t0)
    return best               # the 10M-iteration loop BASELINE.md's
                              # thresholds were quoted against (r5: was
                              # a 5M loop scaled x2)


def run_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_FRONTIER_ROWS", "5000000"))
    # clamped: 0/negative would leave per-op best=None below (ADVICE r4)
    bench_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    steal = _steal_control()

    from open_source_search_engine_spark.queries import QUERIES
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    timings: dict[str, float] = {}

    # 32-core JVM control: codegen'd range-sum over 2B longs, warm
    # best-of-3 — the single-core loop above misses MULTI-core capping
    # (host burst-quota throttling shows up here while the 1-thread
    # control reads calm).  ~0.8 s on this box at full allocation;
    # >=1.5 s means every wall-clock figure below is throttled.
    def _jvm_control() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(2_000_000_000, numPartitions=2 * cpus) \
                .selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return best

    _jvm_control()                      # JIT/task-path warm-up
    jvm_control = _jvm_control()

    # headline: frontier scheduling throughput — steady-state per the
    # measurement discipline in BENCH/BASELINE.md (JVM heap first-touch in
    # this sandbox is ~20 MB/s; one warm-up run, then best of two)
    def frontier_run() -> tuple[float, int]:
        t0 = time.time()
        frontier, replies = build_frontier(spark, n_rows)
        wave = assemble_wave(spark, frontier, replies, 1700086400000)
        n = wave.count()
        return time.time() - t0, n

    # the frontier job shuffles 5M+ rows: size its partitions to the
    # data (64 — same setting the scaling protocol fixes), not to the
    # core count; restore the catalog default afterwards
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    frontier_run()
    (dt, wave_rows) = min(frontier_run() for _ in range(3))
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    timings["frontier_schedule"] = round(dt, 3)
    urls_per_sec = n_rows / dt

    # Python-worker warm-up: Arrow serialization + pandas/numpy imports
    # are a per-worker one-time cost (~2-4 s across 32 workers in this
    # sandbox), paid by whichever pandas-UDF query runs first — touch
    # every worker once so the operator timings below are steady-state
    # (same discipline as the frontier warm-up above)
    from pyspark.sql import functions as _F

    # driver-side: the catalog fns import kernel modules lazily — pay
    # that (~0.8 s) before the stopwatch starts
    import open_source_search_engine_spark.training.dedup  # noqa: F401
    import open_source_search_engine_spark.training.simsearch  # noqa: F401
    import open_source_search_engine_spark.training.textqual  # noqa: F401

    @_F.pandas_udf("long")
    def _warm(s):
        # import + exercise the kernels' per-worker state (module import,
        # tabulation table, numpy scratch) so operator timings below
        # measure steady state, not one-time init
        from open_source_search_engine_spark.training.dedup import \
            _token_hashes_batch
        _token_hashes_batch(["warm up the tabulation table once"])
        return s * 0

    spark.range(cpus * 4).repartition(cpus).select(_warm("id")).count()

    # operator sample at sf_dir (correctness catalog is driver-checked
    # separately; these time the heavier representatives)
    for key in ["f11_winner_window", "f14_wave_caps", "dedup_exact",
                "q2_posting_intersect_topk", "events_tumbling_window",
                "embed_topk_bruteforce", "dedup_minhash_sig",
                "text_quality_catalyst", "linkgraph_pagerank",
                "dedup_lines", "text_gopher_repetition",
                # round-3 additions (totals vs r2 compare on the shared
                # 12-query prefix; these time the new operators)
                "text_lm_perplexity", "training_temperature_mix",
                "dedup_semantic_keepers", "dsir_importance_select",
                "text_quality_classifier", "dedup_image_dhash_pairs",
                "dedup_audio_fp_pairs"]:
        # best of three (r4.2; was two): run 1 absorbs the remaining
        # per-plan one-time costs (codegen compile, worker-side Arrow
        # state) this sandbox pays unusually slowly, and the extra rep
        # rides out the box's CPU-steal episodes (BASELINE.md round-4
        # scatter disclosure: identical code measured 22.7-46.2 s totals
        # across one afternoon) — min-of-3 is the steal-robust estimator
        best = None
        for _ in range(bench_reps):
            t0 = time.time()
            QUERIES[key](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[key] = round(best, 3)

    crawl = run_crawl_loop_bench(spark)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "frontier_rows": n_rows,
        "wave_rows": wave_rows,
        "urls_scheduled_per_sec": round(urls_per_sec, 1),
        "cpus": cpus,
        "bench_reps": bench_reps,
        "steal_control_loop_sec": round(steal, 3),
        "jvm_control_sec": round(jvm_control, 3),
        "crawl_loop": crawl,
    }


def run_crawl_loop_bench(spark) -> dict:
    """Per-stage / per-round scheduler visibility (VERDICT r2 item 9):
    drive the REAL multi-round CrawlRunner (Bloom URL-seen path) over a
    small synthetic corpus and report

    - per-round wall seconds split by stage (assemble_wave_write /
      replies_and_requests_writes — the r4-fused action boundaries
      inside CrawlRunner._run_round: wave agg+write are one
      Observation-carrying job, and the replies and requests writes —
      each re-running the DELIBERATELY-unpersisted fetch lineage
      column-pruned to its own projection, see the "NOT cached" note in
      pipeline/crawl.py — run on concurrent driver threads, so the
      second stage's wall is max(replies, requests), not the sum), and
    - the statsdb bridge's per-second scheduler stats
      (pipeline.statsdb.crawl_stats_to_statsdb — the reference's
      Statsdb/PagePerf per-stage graphs),

    so a perf regression in one crawl stage is visible per stage in
    BENCH_r{N}.json instead of hiding in a query total."""
    import tempfile

    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    from open_source_search_engine_spark.pipeline.statsdb import (
        crawl_stats_to_statsdb)
    from pyspark.sql import functions as F

    # sized for stage VISIBILITY, not throughput (the headline above owns
    # throughput): per-round cost at this scale is dominated by fixed
    # stage-scheduling latency, which is exactly the regression signal a
    # per-stage breakdown exists to catch
    n_domains = int(os.environ.get("SPARK_GRAFT_CRAWL_DOMAINS", "12"))
    n_urls = int(os.environ.get("SPARK_GRAFT_CRAWL_URLS", "600"))
    max_rounds = int(os.environ.get("SPARK_GRAFT_CRAWL_ROUNDS", "4"))
    corpus = generate_corpus(seed=42, n_domains=n_domains, n_urls=n_urls)
    corpus_dir = tempfile.mkdtemp(prefix="bench_crawl_corpus_")
    write_parquet(corpus, corpus_dir)
    state_dir = tempfile.mkdtemp(prefix="bench_crawl_state_")
    cfg = CrawlConfig(max_rounds=max_rounds)
    runner = CrawlRunner(spark, corpus_dir, state_dir, cfg,
                         use_bloom_seen=True)
    rounds = []
    stage_totals: dict[str, float] = {}
    while len(rounds) < max_rounds:
        t0 = time.time()
        st = runner.step()
        if st is None:
            break
        entry = {"round": st.round, "sec": round(time.time() - t0, 3),
                 "wave_rows": st.wave_rows, "new_requests": st.new_requests}
        for k, v in runner.last_round_timings.items():
            entry[f"t_{k}"] = round(v, 3)
            stage_totals[k] = stage_totals.get(k, 0.0) + v
        runner.last_round_timings = {}
        rounds.append(entry)

    stats = crawl_stats_to_statsdb(runner.replies_log(),
                                   cfg.fetch_duration_ms)
    fetch = (stats.filter(F.col("label") == "spider_fetch")
             .agg(F.count("*").alias("buckets"),
                  F.max("total_ops_ppm").alias("peak_ops_ppm"),
                  F.sum("total_ops_ppm").alias("total_ops_ppm"))
             .collect()[0])
    err = (stats.filter(F.col("label") == "spider_error")
           .agg(F.sum("total_ops_ppm").alias("total_ops_ppm"))
           .collect()[0])
    runner.close()
    return {
        "rounds": rounds,
        "stage_seconds": {k: round(v, 3) for k, v in stage_totals.items()},
        "statsdb": {
            "fetch_seconds_buckets": int(fetch["buckets"] or 0),
            "peak_fetches_per_sec":
                round((fetch["peak_ops_ppm"] or 0) / 1e6, 3),
            "total_fetches":
                round((fetch["total_ops_ppm"] or 0) / 1e6, 3),
            "total_errors": round((err["total_ops_ppm"] or 0) / 1e6, 3),
        },
    }


def run_scaling(n_small: int = 4, reps: int = 3,
                interleave: bool = False) -> dict:
    """BASELINE.md sandbox scaling protocol: same job, same input, local[N]
    vs local[4N], one process.

    Why N=4 → 4N=16: the 32 logical CPUs are 16 physical + SMT — a raw
    multiprocess probe measures 4→16 procs at 0.99 hardware efficiency but
    8→32 at only 0.65, so an 8→32 comparison would gate on SMT, not on the
    pipeline.

    Measurement discipline: this sandbox faults JVM heap pages at ~20 MB/s
    per touching thread, so a cold low-parallelism run understates steady
    state by 2-3x.  The JVM persists across SparkSessions within one
    process, so we (1) pre-warm the heap with the same-size job at
    local[32], then (2) measure each level warm: one throwaway run + best
    of ``reps`` measured runs.

    Partitioning is FIXED across the two levels (shuffle_partitions=64,
    a multiple of both core counts): on a real cluster the job config is
    identical at N and 4N executors — partitions are sized to the DATA,
    and growing the cluster only adds task parallelism.  Tying partitions
    to the core count (the r2 protocol) conflated two variables: the
    low-core side ran 24M-row shuffle partitions (spill/GC territory)
    and understated N-side throughput.  Fixed 64 is faster at BOTH
    levels (r3, idle box: local[4] 93->75 s, local[16] 32->21 s)."""
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    # 96M (not 48M): sized so the 4N run is ~20+ s — well past the fixed
    # per-job costs that scatter a ~14 s measurement across the gate
    # (BENCH/BASELINE.md "Input sizing")
    n_rows = int(os.environ.get("SPARK_GRAFT_FRONTIER_ROWS", "96000000"))
    from open_source_search_engine_spark.session import get_spark

    def measure(cpus: int, n_runs: int) -> list[float]:
        spark = get_spark(app=f"scale{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=64)
        times = []
        for _ in range(n_runs):
            t0 = time.time()
            frontier, replies = build_frontier(spark, n_rows)
            assemble_wave(spark, frontier, replies, 1700086400000).count()
            times.append(time.time() - t0)
        spark.stop()
        return times

    steal_before = _steal_control()
    measure(32, 2)                       # global heap/codegen warm-up
    if interleave:
        # alternate N,4N,N,4N,… (the r5 A/B discipline): a weather
        # episode hits both arms equally instead of skewing whichever
        # phase it lands on; each context restart pays one throwaway
        # run so the measured run is warm
        t_n, t_4n = [], []
        for _ in range(reps):
            t_n.append(measure(n_small, 2)[1])
            t_4n.append(measure(n_small * 4, 2)[1])
        steal_mid = _steal_control()
    else:
        t_n = measure(n_small, reps + 1)[1:]
        steal_mid = _steal_control()     # weather SHIFT between the two
        t_4n = measure(n_small * 4, reps + 1)[1:]  # phases skews the ratio
    steal_after = _steal_control()
    tp_n = round(n_rows / min(t_n), 1)
    tp_4n = round(n_rows / min(t_4n), 1)
    eff = (tp_4n / tp_n) / 4
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n_small,
        "throughput_at_N": tp_n,
        "throughput_at_4N": tp_4n,
        "times_at_N": [round(t, 2) for t in t_n],
        "times_at_4N": [round(t, 2) for t in t_4n],
        "frontier_rows": n_rows,
        "gate": 0.8,
        "pass": eff >= 0.8,
        # the efficiency is a ratio, so uniform host slowdown cancels —
        # but a steal episode starting or ending BETWEEN the N and 4N
        # phases does not; these three thermometer readings say whether
        # the ratio was measured under stable weather (BENCH/BASELINE.md
        # round-4 scatter disclosure)
        "steal_control_loop_sec": [round(steal_before, 3),
                                   round(steal_mid, 3),
                                   round(steal_after, 3)],
        "protocol": "interleaved" if interleave else "sequential",
    }


def run_frontier_only() -> dict:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_FRONTIER_ROWS", "5000000"))
    from open_source_search_engine_spark.session import get_spark
    spark = get_spark(app="bench-frontier", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    def one_run() -> tuple[float, int]:
        t0 = time.time()
        frontier, replies = build_frontier(spark, n_rows)
        wave = assemble_wave(spark, frontier, replies, 1700086400000)
        n = wave.count()
        return time.time() - t0, n

    one_run()                      # same-size warmup (heap page-in, codegen)
    runs = [one_run() for _ in range(2)]
    dt, wave_rows = min(runs)
    return {
        "metric": "frontier_schedule_seconds", "value": round(dt, 3),
        "unit": "sec", "queries": {"frontier_schedule": round(dt, 3)},
        "sf": "synthetic", "frontier_rows": n_rows, "wave_rows": wave_rows,
        "urls_scheduled_per_sec": round(n_rows / dt, 1), "cpus": cpus,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("SPARK_GRAFT_BENCH_MODE") == "frontier_only":
        print(json.dumps(run_frontier_only()))
    else:
        print(json.dumps(run_bench()))
