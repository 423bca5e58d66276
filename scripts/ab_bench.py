#!/usr/bin/env python
"""Interleaved A/B bench between two committed HEADs (VERDICT r4 item 2).

Round 4 closed with every committed r4 bench run 10-45% slower than
round 3's on the same shared query set, under committed steal controls
that prove +/-2x host scatter exists — scatter is an alibi, not a
diagnosis.  This script produces the evidence the verdict asked for: the
two HEADs checked out side by side (git worktrees), the full bench run
ALTERNATING A,B,A,B,... >=5 pairs on one box, min-of-N per side, each
run self-reporting its steal/jvm thermometers.  Interleaving means any
weather episode hits both arms equally; min-of-N rides out the episodes
entirely when at least one rep per arm lands on a calm window.

Usage:
  python scripts/ab_bench.py A_DIR B_DIR [pairs] [out.json]

where A_DIR/B_DIR are worktree checkouts (e.g. /tmp/ab_r3 at the r3
round commit, /tmp/ab_r4 at the r4 round commit).  Each arm runs ITS
OWN bench.py exactly as committed, in its own process, so the measured
code path is the one the round's artifacts were recorded with.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_arm(workdir: str, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir, env=env,
        capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    line = None
    for ln in (proc.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"queries"' in ln:
            line = ln
    if line is None:
        raise RuntimeError(
            f"no bench JSON from {workdir}:\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}")
    out = json.loads(line)
    out["_wall_sec"] = round(wall, 1)
    return out


def summarize(runs: list[dict]) -> dict:
    """min over runs per query + totals; thermometer range."""
    keys = sorted({k for r in runs for k in r["queries"]})
    per_q = {k: min(r["queries"][k] for r in runs if k in r["queries"])
             for k in keys}
    return {
        "n_runs": len(runs),
        "min_total_sec": round(min(r["value"] for r in runs), 3),
        "min_of_n_per_query_total": round(sum(per_q.values()), 3),
        "queries_min": per_q,
        "urls_scheduled_per_sec_max": max(
            r.get("urls_scheduled_per_sec", 0) for r in runs),
        "steal_controls": [r.get("steal_control_loop_sec") for r in runs],
        "jvm_controls": [r.get("jvm_control_sec") for r in runs],
        "totals": [r["value"] for r in runs],
    }


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH/ab_result.json"
    env_extra = {"SPARK_GRAFT_SF_DIR":
                 os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.1")}
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    for i in range(pairs):
        print(f"pair {i + 1}/{pairs}: arm A ({a_dir})", flush=True)
        a_runs.append(run_arm(a_dir, env_extra))
        print(f"  A total={a_runs[-1]['value']} "
              f"steal={a_runs[-1].get('steal_control_loop_sec')}",
              flush=True)
        print(f"pair {i + 1}/{pairs}: arm B ({b_dir})", flush=True)
        b_runs.append(run_arm(b_dir, env_extra))
        print(f"  B total={b_runs[-1]['value']} "
              f"steal={b_runs[-1].get('steal_control_loop_sec')}",
              flush=True)
    a_sum, b_sum = summarize(a_runs), summarize(b_runs)
    shared = sorted(set(a_sum["queries_min"]) & set(b_sum["queries_min"]))
    per_query_delta = {
        k: {"a": a_sum["queries_min"][k], "b": b_sum["queries_min"][k],
            "b_over_a": round(b_sum["queries_min"][k]
                              / max(a_sum["queries_min"][k], 1e-9), 3)}
        for k in shared}
    result = {
        "protocol": "interleaved A/B, min-of-%d per arm, per-run steal "
                    "and jvm thermometers embedded" % pairs,
        "arm_a": {"dir": a_dir, **a_sum},
        "arm_b": {"dir": b_dir, **b_sum},
        "shared_min_total_a": round(sum(
            a_sum["queries_min"][k] for k in shared), 3),
        "shared_min_total_b": round(sum(
            b_sum["queries_min"][k] for k in shared), 3),
        "per_query": per_query_delta,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("shared_min_total_a", "shared_min_total_b")}))
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
