#!/usr/bin/env python
"""sf1.0 LSH-family bench (VERDICT r3 item 8).

The driver testdata tops out at sf0.1 (5k documents / 2k embeddings);
block-LSH regressions that only show at bigger corpora (a band/segment
sized so buckets go quadratic) are invisible there.  This script
deterministically scales sf0.1 up 10x IN PLACE (no external data, no
RNG seeds beyond fixed integers) and runs every LSH-blocked dedup key
once, asserting the candidate-pair volume stays O(n*k):

  documents  5k -> 50k : each source doc yields 10 variants —
    v0 the original, v1-v2 near-dups (one token substituted at a
    deterministic position: the MinHash/SimHash recall band), v3-v9
    distinct rewrites (deterministic token rotation + suffix salt).
  embeddings 2k -> 20k : v0 original, v1-v2 tiny deterministic
    perturbations (cosine ~0.999), v3-v9 decorrelated deterministic
    vectors re-normalized to unit length.

Pair-count law: near-dup structure is 10 planted clusters-of-3 per 30
rows, so recovered pairs grow LINEARLY in n (<= PAIRS_PER_ROW_MAX * n);
a quadratic blow-up (the r2 h=16 SimHash regression class) trips the
assert long before it trips a wall-clock budget.

Run:   python scripts/bench_lsh_sf1.py --out BENCH/lsh_sf1_r04.json
Wall:  ~10-15 min on 32 cores (image/audio decode dominates).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
N_VARIANTS = 10
NEAR_DUP_VARIANTS = (1, 2)          # near-dup copies per source row
# planted pairs per cluster-of-3 = 3; conservative linear bound per row
# across ALL keys (text keys also recover organic sf0.1 dups x variants)
PAIRS_PER_ROW_MAX = 8.0

# the LSH-blocked dedup family; law = how the output size is judged:
#   linear  — planted/organic near-dup structure is bounded per row, so
#             recovered pairs must stay <= PAIRS_PER_ROW_MAX * n
#   exact   — the base corpus has FIXED-count embedding clusters, so
#             TRUE near-dup pairs grow quadratically when n grows at
#             fixed cluster count; no correct pair op can emit fewer
#             than the truth.  Judged instead against a NumPy brute
#             force: precision must be exact (pairs <= true, integer
#             Gram verify guarantees it) and recall >= RECALL_MIN
#             (the 4x8 banding dial).
#   rows_n  — verdict table, rows == n by contract
KEYS = [
    ("dedup_minhash_lsh_pairs", "linear"),
    ("dedup_simhash_pairs", "linear"),
    ("dedup_embed_cosine_pairs_lsh", "exact"),
    ("dedup_image_dhash_pairs", "linear"),
    ("dedup_audio_fp_pairs", "linear"),
    ("dedup_semantic_keepers", "rows_n"),
]
MIN_DOT_Q = 150000    # must match _embed_neardup_lsh's emit threshold
# The emit threshold is LOOSE (cosine ~0.15, where sign-LSH collision
# prob 1-(1-p^8)^4 is only ~3% by design — banding is tuned for true
# near-dups, not vaguely-correlated pairs), so overall recall vs the
# brute force is intrinsically small and only REPORTED.  What is PINNED
# is recall in the actual near-dup band (cosine >= 0.9, collision ~74%
# by the same formula): a banding/bucketing regression shows up there.
HIGH_DOT_Q = 900000
RECALL_HIGH_MIN = 0.5


def scale_documents(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(len(text)):
        toks = text[i].split(" ")
        for v in range(N_VARIANTS):
            new_id = doc_id[i] * N_VARIANTS + v
            if v == 0:
                body = text[i]
            elif v in NEAR_DUP_VARIANTS:
                # one deterministic token substitution — inside the
                # MinHash(threshold .3)/SimHash(h<=6) recall band
                j = (doc_id[i] + v) % max(1, len(toks))
                body = " ".join(
                    toks[:j] + [f"v{v}tok{new_id % 997}"] + toks[j + 1:])
            else:
                # distinct rewrite: rotate token order and salt every
                # 3rd token so shingles/fingerprints decorrelate
                r = (v * 7 + int(doc_id[i])) % max(1, len(toks))
                rot = toks[r:] + toks[:r]
                body = " ".join(
                    w if (k + v) % 3 else f"{w}x{(new_id + k) % 9973}"
                    for k, w in enumerate(rot))
            ids.append(new_id)
            texts.append(body)
            langs.append(lang[i])
            sources.append(source[i])
            n_chars.append(len(body))
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"))
    return out.num_rows


def scale_embeddings(out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    label = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    n, d = emb.shape

    ids, vecs, labels = [], [], []
    for v in range(N_VARIANTS):
        new_ids = vec_id * N_VARIANTS + v
        if v == 0:
            new = emb
        elif v in NEAR_DUP_VARIANTS:
            # deterministic tiny perturbation: cosine ~0.999 vs v0
            delta = np.sin(
                (vec_id[:, None] * d + np.arange(d)[None, :]) * (v + 1)
            ).astype(np.float32) * 0.01
            new = emb + delta
        else:
            # decorrelated deterministic vector: fixed-seed Gaussian
            # (a trig mix of vec_id is PERIODIC — the first cut of this
            # script coined thousands of genuinely near-identical
            # vectors and the true pair count went quadratic; kept here
            # as the cautionary note)
            rng = np.random.default_rng(100003 + v)
            new = rng.standard_normal((n, d)).astype(np.float32)
        new = new / np.linalg.norm(new, axis=1, keepdims=True)
        ids.append(new_ids)
        vecs.append(new)
        labels.append(label)
    ids = np.concatenate(ids)
    vecs = np.concatenate(vecs)
    labels = np.concatenate(labels)
    order = np.argsort(ids, kind="stable")
    out = pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "embedding": pa.array(list(vecs[order]), pa.list_(pa.float32())),
        "label": pa.array(labels[order], pa.int32()),
    })
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"))
    return out.num_rows


def true_embed_pairs(emb_path: str) -> tuple[int, int]:
    """Exact pair counts by chunked NumPy brute force, replicating the
    engine's integer quantization bit-for-bit (HALF_UP round(x*1000),
    integer dot).  Returns (pairs >= MIN_DOT_Q, pairs >= HIGH_DOT_Q).
    O(n^2 d) flops — fine at 20k vectors, and the point: the sf1
    artifact judges the LSH path against ground truth."""
    t = pq.read_table(emb_path)
    v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1000.0
    q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    n = len(q)
    total = high = 0
    chunk = 2048
    for i in range(0, n, chunk):
        dots = q[i:i + chunk] @ q.T            # (c, n) float64, exact
        for r in range(dots.shape[0]):
            row = dots[r, i + r + 1:]          # upper triangle only
            total += int((row >= MIN_DOT_Q).sum())
            high += int((row >= HIGH_DOT_Q).sum())
    return total, high


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dir", default="/tmp/spark_graft_sf1")
    args = ap.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    n_docs = scale_documents(args.dir)
    n_vecs = scale_embeddings(args.dir)
    print(f"scaled corpus at {args.dir}: {n_docs} docs, {n_vecs} vecs",
          flush=True)

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.queries import QUERIES
    from open_source_search_engine_spark.session import get_spark
    spark = get_spark(app="lsh-sf1", master="local[32]",
                      shuffle_partitions=64)

    truth, truth_high = true_embed_pairs(
        os.path.join(args.dir, "embeddings.parquet"))
    print(f"brute-force true embed pairs: {truth} (dot_q>={MIN_DOT_Q}), "
          f"{truth_high} (dot_q>={HIGH_DOT_Q})", flush=True)

    results, ok = {}, True
    for key, law in KEYS:
        n = n_vecs if "embed" in key or "semantic" in key else n_docs
        t0 = time.time()
        df = QUERIES[key](spark, args.dir)
        if law == "exact":
            agg = df.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum((F.col("dot_q") >= HIGH_DOT_Q).cast("long"))
                .alias("high")).collect()[0]
            rows, rows_high = int(agg["rows"]), int(agg["high"] or 0)
        else:
            rows = df.count()
        dt = time.time() - t0
        res = {"sec": round(dt, 2), "rows": rows, "n": n, "law": law}
        if law == "linear":
            res["pairs_per_row"] = round(rows / n, 3)
            res["ok"] = rows <= PAIRS_PER_ROW_MAX * n
        elif law == "exact":
            res["true_pairs"] = truth
            res["recall_loose"] = round(rows / truth, 4) if truth else 1.0
            res["true_pairs_high"] = truth_high
            res["recall_high"] = (round(rows_high / truth_high, 4)
                                  if truth_high else 1.0)
            res["ok"] = (rows <= truth and rows_high <= truth_high
                         and res["recall_high"] >= RECALL_HIGH_MIN)
        else:
            res["ok"] = rows == n
        ok &= res["ok"]
        results[key] = res
        print(f"{key}: {dt:.1f}s rows={rows} n={n} law={law} "
              f"ok={res['ok']} {res.get('recall_high', '')}", flush=True)

    artifact = {"metric": "lsh_family_sf1", "sf": 1.0,
                "n_docs": n_docs, "n_vecs": n_vecs,
                "pairs_per_row_bound": PAIRS_PER_ROW_MAX,
                "min_dot_q": MIN_DOT_Q, "high_dot_q": HIGH_DOT_Q,
                "recall_high_min": RECALL_HIGH_MIN,
                "keys": results, "pass": ok}
    line = json.dumps(artifact)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
