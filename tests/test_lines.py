"""Behavioral tests for line-tier corpus ops: corpus-wide line dedup,
C4 line filtering, Gopher repetition measures, dup-ngram coverage."""

from __future__ import annotations


def test_line_dedup_cross_doc_boilerplate(spark):
    from open_source_search_engine_spark.training.lines import line_dedup

    boiler = "accept our cookie policy to continue"
    rows = [
        (1, f"unique alpha text one\n{boiler}\nmore alpha body"),
        (2, f"{boiler}\nunique beta body text"),
        (3, f"unique gamma body\n{boiler}"),
        (4, boiler),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}

    # doc 1 is the first occurrence in (doc_id, line_no) order -> keeps it
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert boiler in out[1]["text_dedup"]
    # every later doc loses the boilerplate line but keeps its own lines
    assert out[2]["n_kept"] == 1
    assert out[2]["text_dedup"] == "unique beta body text"
    assert out[3]["n_kept"] == 1
    assert out[3]["text_dedup"] == "unique gamma body"
    # a doc that is nothing but boilerplate dedups to empty, not a dropped row
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 0
    assert out[4]["text_dedup"] == ""


def test_line_dedup_within_doc_repeat(spark):
    from open_source_search_engine_spark.training.lines import line_dedup

    docs = spark.createDataFrame(
        [(7, "same line\nsame line\nsame line\nother line")],
        "doc_id long, text string")
    r = line_dedup(docs).collect()[0]
    assert r["n_lines"] == 4 and r["n_kept"] == 2
    assert r["text_dedup"] == "same line\nother line"


def test_segment_text_ten_token_lines(spark):
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.training.lines import segment_text

    text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame([(text,)], "text string")
    seg = df.select(segment_text("text").alias("s")).collect()[0]["s"]
    parts = seg.split("\n")
    assert [len(p.split()) for p in parts] == [10, 10, 5]
    assert " ".join(parts).split() == text.split()   # lossless


def test_c4_line_filter_rules(spark):
    from open_source_search_engine_spark.training.lines import c4_line_filter

    docs = spark.createDataFrame(
        [(1, "This is a fine long sentence here.\n"
             "ok\n"
             "Please accept our Cookie Policy now\n"
             "function() { return 1 }\n"
             "Another genuinely useful content line")],
        "doc_id long, text string")
    r = c4_line_filter(docs).collect()[0]
    assert r["n_lines"] == 5
    # dropped: "ok" (<3 words), cookie-policy line, curly-brace line
    assert r["n_kept"] == 2
    assert r["text_clean"] == ("This is a fine long sentence here.\n"
                               "Another genuinely useful content line")


def _repeated_block_doc():
    # 40 tokens, all length 5: tokens 0-9 repeated at 10-19, then 20 unique
    a = [f"aa{i:03d}" for i in range(10)]
    b = [f"bb{i:03d}" for i in range(20)]
    return " ".join(a + a + b)


def test_gopher_repetition_exact_measures(spark):
    from open_source_search_engine_spark.training.gopher import (
        gopher_repetition)

    docs = spark.createDataFrame([(1, _repeated_block_doc())],
                                 "doc_id long, text string")
    r = gopher_repetition(docs).collect()[0]
    # 4 ten-token lines; line 2 repeats line 1
    assert r["n_lines"] == 4
    assert r["dup_line_frac_x1000"] == 250          # 1/4
    assert r["dup_line_chars_x1000"] == 250         # 59/236
    # 9 bigrams occur twice (c*chars = 2*10); total token chars = 200
    assert r["top2_chars_x1000"] == 1000 * 20 // 200
    assert r["top3_chars_x1000"] == 1000 * 30 // 200
    assert r["top4_chars_x1000"] == 1000 * 40 // 200
    assert r["rep_pass"] is False                   # top4 200 > 160


def test_gopher_repetition_clean_doc_passes(spark):
    from open_source_search_engine_spark.training.gopher import (
        gopher_repetition)

    docs = spark.createDataFrame(
        [(1, " ".join(f"uni{i:03d}" for i in range(40)))],
        "doc_id long, text string")
    r = gopher_repetition(docs).collect()[0]
    assert r["dup_line_frac_x1000"] == 0
    assert r["top2_chars_x1000"] == 0
    assert r["rep_pass"] is True


def test_dup_ngram_coverage_exact(spark):
    from open_source_search_engine_spark.training.gopher import (
        dup_ngram_coverage)

    docs = spark.createDataFrame(
        [(1, _repeated_block_doc()),
         (2, " ".join(f"uni{i:03d}" for i in range(40)))],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_ngram_coverage(docs).collect()}
    # the 10-token repeated block covers tokens 0..19 for every n in 5..10:
    # 100 of 200 chars -> 500
    for n in (5, 6, 7, 8, 9, 10):
        assert out[1][f"dup{n}_x1000"] == 500
        assert out[2][f"dup{n}_x1000"] == 0
    assert out[1]["dupngram_pass"] is False
    assert out[2]["dupngram_pass"] is True


_EN60 = ("the quick brown fox jumps over a lazy dog while seventeen "
         "curious students quietly examine several ancient manuscripts "
         "inside the village library and discuss their findings with "
         "visiting scholars from distant universities about history "
         "language science philosophy music painting architecture trade "
         "farming medicine astronomy navigation poetry drama sculpture "
         "weaving pottery carpentry fishing hunting cooking brewing")


def test_curation_pipeline_reasons(spark):
    from open_source_search_engine_spark.training.pipeline import (
        attrition_summary, curate)

    words = _EN60.split()
    a_block = [f"aa{i:03d}" for i in range(10)]
    uniq = [f"uu{i:03d}" for i in range(35)]
    docs = spark.createDataFrame(
        [
            (1, _EN60),                                     # kept
            (2, "far too short"),                           # gopher_shape
            # duplicate 10-token lines (4x) + 20 unique -> rep fails first
            (3, " ".join(a_block * 4 + [f"cc{i:03d}" for i in range(20)])),
            # one 10-gram repeated, not line-aligned -> only dup_ngram fails
            (4, " ".join(a_block + uniq + a_block)),
            # 50 words (shape-clean), every line already in doc 1 ->
            # boilerplate_only
            (6, " ".join(words[:50])),
            # doc-level near dup of doc 1 (tail words changed)
            (7, " ".join(words[:-2] + ["altered", "ending"])),
        ],
        "doc_id long, text string")

    out = {r["doc_id"]: r for r in curate(docs).collect()}
    assert out[1]["keep"] is True and out[1]["reason"] is None
    assert out[2]["reason"] == "gopher_shape"
    assert out[3]["reason"] == "gopher_repetition"
    assert out[4]["reason"] == "dup_ngram"
    assert out[6]["reason"] == "boilerplate_only"
    assert out[7]["reason"] == "near_dup"
    assert all(not out[d]["keep"] for d in (2, 3, 4, 6, 7))

    summ = {r["stage"]: r["n_docs"]
            for r in attrition_summary(curate(docs)).collect()}
    assert summ["kept"] == 1 and sum(summ.values()) == 6


def test_curation_lang_gate(spark):
    from open_source_search_engine_spark.training.pipeline import curate

    docs = spark.createDataFrame([(1, _EN60)], "doc_id long, text string")
    r = curate(docs, lang_keep=("fr",)).collect()[0]
    assert r["keep"] is False and r["reason"] == "lang"


def test_domain_quota_caps_mega_source(spark):
    from open_source_search_engine_spark.training.pipeline import (
        domain_quota_sample)

    # mega source: 8 docs x 10 tokens; small: 2 docs x 10 -> total 100
    rows = ([(i, " ".join(f"m{i}w{j}" for j in range(10)), "mega")
             for i in range(8)]
            + [(100 + i, " ".join(f"s{i}w{j}" for j in range(10)), "small")
               for i in range(2)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in
           domain_quota_sample(docs, max_share_x1000=300).collect()}
    # budget = 30 tokens per source: mega keeps docs 0-2 (cum 10,20,30)
    assert [out[i]["keep"] for i in range(8)] == [True] * 3 + [False] * 5
    assert out[2]["cum_tokens"] == 30 and out[3]["cum_tokens"] == 40
    # small source fits entirely
    assert out[100]["keep"] is True and out[101]["keep"] is True


def test_sharded_quota_equals_plain(spark):
    from open_source_search_engine_spark.training.pipeline import (
        domain_quota_sample, domain_quota_sample_sharded)

    # skewed synthetic corpus: one mega source, tiny range width so the
    # prefix sum genuinely spans many ranges
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(1 + i % 7)),
             "mega" if i % 5 else f"src{i % 11}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plain = domain_quota_sample(docs, max_share_x1000=400)
    sharded = domain_quota_sample_sharded(docs, max_share_x1000=400,
                                          range_width=16)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, sharded.collect()))
    assert a == b


def test_coverage_fracs_matches_naive_reference():
    # property check, no Spark: the vectorized coverage kernel equals a
    # naive O(n^2) recomputation on random small token streams
    import random

    from open_source_search_engine_spark.training.gopher import (
        DUP_NGRAM_NS, _coverage_fracs)

    def naive(text):
        toks = text.lower().split()
        total = sum(len(t) for t in toks)
        out = []
        for n in DUP_NGRAM_NS:
            grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            from collections import Counter
            cnt = Counter(grams)
            covered = set()
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered.update(range(i, i + n))
            c = sum(len(toks[i]) for i in covered)
            out.append(1000 * c // total if total else 0)
        return out

    rng = random.Random(1234)
    for trial in range(40):
        n_toks = rng.randint(0, 60)
        vocab = [f"t{i}" for i in range(rng.randint(1, 8))]
        text = " ".join(rng.choice(vocab) for _ in range(n_toks))
        assert _coverage_fracs(text) == naive(text), text


def test_curation_optional_pii_and_decontam_gates(spark):
    """max_pii / eval_docs are off by default (goldens unchanged); when
    on, a PII-laden doc reports 'pii' and an eval-overlapping doc reports
    'contaminated', each as its FIRST failing stage."""
    from open_source_search_engine_spark.training.pipeline import curate

    words = _EN60.split()
    qq = [f"qq{i:03d}" for i in range(13)]
    docs = spark.createDataFrame(
        [
            (1, _EN60),                                          # kept
            # shape/lang-clean but carries an email + phone -> pii
            (2, _EN60 + " contact admin@example.org or call 555-123-4567"),
            # 40 English words + the eval 13-gram appended -> contaminated
            (3, " ".join(words[13:53] + qq)),
        ],
        "doc_id long, text string")
    evals = spark.createDataFrame([(9, " ".join(qq))],
                                  "doc_id long, text string")

    out = {r["doc_id"]: r for r in
           curate(docs, max_pii=0, eval_docs=evals,
                  decontam_n=13).collect()}
    assert out[1]["keep"] is True and out[1]["reason"] is None
    assert out[2]["keep"] is False and out[2]["reason"] == "pii"
    assert out[3]["keep"] is False and out[3]["reason"] == "contaminated"

    # defaults: both gates off -> doc 2 survives to near-dup (it IS a
    # near-dup of doc 1), doc 3 is kept
    base = {r["doc_id"]: r for r in curate(docs).collect()}
    assert base[2]["reason"] == "near_dup"
    assert base[3]["keep"] is True
