"""CLI: the full tier glue in one command — crawl a corpus, take the
pages the crawl indexed (titledb analogue), run the training-data
curation pipeline over them, and pack the survivors into fixed-length
training context windows:

    python -m open_source_search_engine_spark.plans.train_corpus \
        --n-urls 200 --rounds 8 --context-len 256 --out /tmp/train_out

Stages (each the production operator, see STATUS.md):
  1. CrawlRunner.run        — frontier rounds to exhaustion (F1-F29)
  2. CrawlRunner.indexed_docs — crawl -> corpus hand-off
  3. training.pipeline.curate — shape/repetition/lang/line-dedup/near-dup
     (--lm-gate adds the CCNet perplexity-tail gate, LM trained on the
     crawl's own survivors of the earlier gates)
  4. training.mixing.temperature_sample — per-source q ∝ p^α flattening
     (--mix-alpha; off by default, 1.0 = identity)
  5. training.shuffle — deterministic global corpus shuffle
     (--shuffle-seed; off by default = per-site stratified packing)
  6. training.packing.pack_sequences — concat-and-chunk
Writes: kept docs, packed spans, attrition summary (one parquet each)
and prints the per-stage attrition + packing efficiency.
"""

from __future__ import annotations

import argparse
import os
import tempfile


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus-dir", default=None)
    ap.add_argument("--state-dir", default=None)
    ap.add_argument("--out", default=None, help="output dir")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-domains", type=int, default=8)
    ap.add_argument("--n-urls", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--context-len", type=int, default=256)
    ap.add_argument("--lang", default="en",
                    help="comma-separated languages to keep")
    ap.add_argument("--gates", default=None,
                    help="comma-separated curation gates "
                         "(default: all; see training.pipeline.GATES)")
    ap.add_argument("--lm-gate", action="store_true",
                    help="add the CCNet LM perplexity-tail gate")
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature-mix alpha (e.g. 0.3); default off")
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="global-shuffle the stream before packing "
                         "(deterministic hash permutation); default off "
                         "= per-source stratified packing")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from ..config import CrawlConfig
    from ..corpus import generate_corpus, write_parquet
    from ..pipeline.crawl import CrawlRunner
    from ..session import get_spark

    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="train_corpus_")
    if args.corpus_dir is None:
        write_parquet(generate_corpus(seed=args.seed,
                                      n_domains=args.n_domains,
                                      n_urls=args.n_urls), corpus_dir)
    state_dir = args.state_dir or tempfile.mkdtemp(prefix="train_state_")
    out_dir = args.out or tempfile.mkdtemp(prefix="train_out_")

    spark = get_spark(app="train_corpus", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    runner = CrawlRunner(spark, corpus_dir, state_dir,
                         CrawlConfig(max_rounds=args.rounds))
    runner.run()

    kept, spans, attrition, stats = build_training_corpus(
        runner, context_len=args.context_len,
        lang_keep=tuple(args.lang.split(",")),
        gates=tuple(args.gates.split(",")) if args.gates else None,
        lm_gate=args.lm_gate, mix_alpha=args.mix_alpha,
        shuffle_seed=args.shuffle_seed)

    kept.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    spans.write.mode("overwrite").parquet(os.path.join(out_dir, "spans"))
    attrition.write.mode("overwrite").parquet(
        os.path.join(out_dir, "attrition"))

    print("attrition by stage:")
    for r in attrition.collect():
        print(f"  {r.stage:18s} {r.n_docs}")
    print("packing by site:")
    for r in stats.collect():
        print(f"  {r.group:24s} chunks={r.n_chunks} tokens={r.n_tokens} "
              f"pad={r.pad_tokens}")
    print(f"outputs in {out_dir}")
    return 0


def build_training_corpus(runner, context_len: int = 256,
                          lang_keep: tuple[str, ...] = ("en",),
                          gates: tuple[str, ...] | None = None,
                          lm_gate: bool = False,
                          mix_alpha: float | None = None,
                          shuffle_seed: int | None = None):
    """crawl state -> (kept_docs, packed_spans, attrition, pack_stats).
    Separated from main() so tests drive it on an in-memory runner.

    Curation runs over tag-stripped text (a production pipeline curates
    extracted text, not markup); ``gates`` selects the curation recipe
    (default: every gate — see ``training.pipeline.GATES``).

    ``lm_gate`` adds the CCNet perplexity-tail gate with the LM trained
    on the crawl corpus itself (self-perplexity terciles — CCNet trains
    on external Wikipedia; callers with a trusted corpus pass it to
    ``training.pipeline.curate`` directly).  ``mix_alpha`` runs the kept
    docs through ``training.mixing.temperature_sample`` — upsampled
    copies re-enter the stream as distinct doc ids (uh48·16+copy, the
    epoch repetition the packer then lays out).

    ``shuffle_seed`` adds the deterministic global corpus shuffle
    (``training.shuffle``) between mixing and packing: each doc's id is
    remapped to its exact shuffled stream position, so the packer lays
    chunks out in shuffled order as ONE global stream (group_col off) —
    the layout a trainer consumes.  Off by default to keep the
    per-source stratified layout."""
    from urllib.parse import urlparse

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ..training.packing import pack_sequences, packing_stats
    from ..training.pipeline import GATES, attrition_summary, curate

    indexed = runner.indexed_docs()

    @pandas_udf("string")
    def _host(urls):
        return urls.map(lambda u: urlparse(u or "").netloc)

    docs = indexed.select(
        F.col("uh48").alias("doc_id"),
        _host("url").alias("source"),
        F.trim(F.regexp_replace("text", r"<[^>]*>", " ")).alias("text"))
    verdict = curate(docs, lang_keep=lang_keep,
                     gates=GATES if gates is None else gates,
                     lm_ref_docs=docs if lm_gate else None)
    attrition = attrition_summary(verdict)
    kept = (docs.join(verdict.filter("keep").select("doc_id"), "doc_id")
            .select("doc_id", "source", "text"))
    if mix_alpha is not None:
        from ..training.mixing import temperature_sample
        mix = temperature_sample(kept, alpha=mix_alpha)
        kept = (kept.join(mix.select("doc_id", "copy"), "doc_id")
                .select((F.col("doc_id") * 16 + F.col("copy"))
                        .alias("doc_id"), "source", "text"))
    if shuffle_seed is not None:
        from ..training.shuffle import shuffle_positions
        pos = shuffle_positions(kept, seed=shuffle_seed)
        kept = (kept.join(pos.select("doc_id", "position"), "doc_id")
                .select(F.col("position").alias("doc_id"), "source",
                        "text"))
        spans = pack_sequences(kept, context_len=context_len)
    else:
        spans = pack_sequences(kept, context_len=context_len,
                               group_col="source")
    return kept, spans, attrition, packing_stats(spans, context_len)


if __name__ == "__main__":
    raise SystemExit(main())
