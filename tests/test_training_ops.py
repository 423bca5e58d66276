"""Behavioral tests for the training-data operators (dedup, similarity,
text analysis, multimodal plumbing)."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.training.dedup import (
    minhash_signature, simhash64)


def test_minhash_identical_docs_identical_sigs():
    a = minhash_signature("the quick brown fox jumps over the lazy dog " * 5)
    b = minhash_signature("the quick brown fox jumps over the lazy dog " * 5)
    assert (a == b).all()


def test_minhash_estimates_jaccard():
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3).split()
    doc_a = " ".join(base)
    doc_b = " ".join(base[: int(len(base) * 0.8)])  # ~0.8 shingle overlap
    doc_c = " ".join(reversed(base))                # shared words, few shingles
    sa, sb, sc = (minhash_signature(d) for d in (doc_a, doc_b, doc_c))
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    assert est_ab > 0.5
    assert est_ac < est_ab


def test_minhash_disjoint_docs_low_similarity():
    sa = minhash_signature("one two three four five six seven eight " * 4)
    sb = minhash_signature("neuf dix onze douze treize quatorze quinze " * 4)
    assert (sa == sb).mean() < 0.1


def test_simhash_near_dup_small_hamming():
    a = simhash64("spark window join aggregate shuffle partition " * 10)
    b = simhash64("spark window join aggregate shuffle partition " * 10
                  + " extra")
    far = simhash64("completely different words entirely other topic " * 10)
    ham_ab = bin(a ^ b).count("1")
    ham_af = bin(a ^ far).count("1")
    assert ham_ab < ham_af
    assert ham_ab <= 16


def test_simhash_deterministic():
    assert simhash64("hello world") == simhash64("hello world")
    assert simhash64("") == 0


def test_lsh_pairs_find_planted_dup(spark):
    from open_source_search_engine_spark.training.dedup import (
        lsh_candidate_pairs, minhash_signatures)
    rows = [
        (1, "the cat sat on the mat and looked at the dog very quietly " * 4),
        (2, "the cat sat on the mat and looked at the dog very quietly " * 4),
        (3, "entirely different content about spark windows and shuffles " * 4),
        (4, "more unrelated text concerning benchmark throughput numbers " * 4),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_candidate_pairs(minhash_signatures(docs), 0.9).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["est_jaccard"] == 1.0


def test_ann_lsh_agrees_with_brute_force_on_top1(spark):
    from open_source_search_engine_spark.training.simsearch import (
        brute_force_topk, lsh_buckets)
    rng = np.random.RandomState(3)
    base = rng.standard_normal(64)
    rows = [(0, base.tolist())]
    rows.append((1, (base + 0.01 * rng.standard_normal(64)).tolist()))  # near
    for i in range(2, 30):
        rows.append((i, rng.standard_normal(64).tolist()))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = brute_force_topk(emb, 0, k=1).collect()
    assert top[0]["vec_id"] == 1
    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, 4).collect()}
    assert b[0] == b[1]  # near-identical vectors share the sign bucket


def test_language_id(spark):
    from open_source_search_engine_spark.training.textqual import language_id
    rows = [
        (1, "the cat and the dog in the house is that it"),
        (2, "der hund und die katze ist nicht ein problem mit"),
        (3, "le chat est dans la maison et le chien pour"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "unknown"}


def test_token_counts(spark):
    from open_source_search_engine_spark.training.textqual import token_counts
    docs = spark.createDataFrame(
        [(1, "hello world, it's 42 degrees!")], ["doc_id", "text"])
    r = token_counts(docs).collect()[0]
    assert r["ws_tokens"] == 5
    # hello | world | , | it | ' | s | 42 | degrees | !
    assert r["bpe_tokens"] == 9


def test_multimodal_codec_roundtrips():
    """The pure-NumPy codecs must round-trip exactly (PPM, BMP, WAV, RV01)."""
    import numpy as np
    from open_source_search_engine_spark.training.multimodal import (
        decode_bmp, decode_image, decode_ppm, decode_video, decode_wav,
        encode_bmp, encode_ppm, encode_video, encode_wav)
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    # header grammar: comments + arbitrary whitespace
    body = encode_ppm(px).split(b"\n", 1)[1]
    weird = b"P6 # c\n# comment line\n 13\t9\n255\n" + body.split(b"\n", 2)[2]
    assert np.array_equal(decode_ppm(weird), px)
    # comments glued to tokens with NO separating whitespace are legal PNM:
    # the token ends at the '#', the comment runs to end-of-line
    raster = px.tobytes()
    glued = b"P6\n13#c\n9\n255\n" + raster
    assert np.array_equal(decode_ppm(glued), px)
    glued_maxval = b"P6\n13 9 255#tail comment\n" + raster
    assert np.array_equal(decode_ppm(glued_maxval), px)
    samples = (np.sin(np.arange(400) / 7.0) * 20000).astype(np.int16)
    sr, got = decode_wav(encode_wav(samples, 8000))
    assert sr == 8000 and np.array_equal(got, samples)
    frames = rng.integers(0, 256, size=(3, 6, 8, 3), dtype=np.uint8)
    assert np.array_equal(decode_video(encode_video(frames)), frames)
    assert np.array_equal(decode_image(encode_ppm(px)), px)  # dispatch


def test_multimodal_features_are_real_statistics():
    """Features are real content statistics, not payload hashes."""
    import numpy as np
    from open_source_search_engine_spark.training.multimodal import (
        audio_features, encode_wav, image_features)
    red = np.zeros((4, 4, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    f = image_features(red)
    assert abs(f[0] - 1.0) < 1e-6 and f[1] == 0.0 and f[2] == 0.0
    assert f[3] == 0.0 and f[4] == 0.0          # flat image: no edges
    silence = np.zeros(256, dtype=np.int16)
    sr_f = audio_features(*__import__(
        "open_source_search_engine_spark.training.multimodal",
        fromlist=["decode_wav"]).decode_wav(encode_wav(silence)))
    assert sr_f[0] == 0.0 and sr_f[2] == 0.0    # silent: zero rms/peak
    loud = (np.ones(256) * 30000).astype(np.int16)
    assert audio_features(8000, loud)[0] > 0.9


def test_multimodal_plumbing(spark):
    """End-to-end: synthesize REAL payloads, decode, extract features."""
    from open_source_search_engine_spark.training.multimodal import (
        extract_features, media_from_documents, synthesize_payload)
    docs = spark.createDataFrame(
        [(6, "an image doc"), (7, "an audio doc"), (8, "a video doc")],
        ["doc_id", "text"])
    out = {r["media_id"]: r
           for r in extract_features(media_from_documents(docs)).collect()}
    assert {out[6]["kind"], out[7]["kind"], out[8]["kind"]} == \
        {"image", "audio", "video"}
    for mid, text in [(6, "an image doc"), (7, "an audio doc"),
                      (8, "a video doc")]:
        _, payload, _, _ = synthesize_payload(mid, text)
        assert out[mid]["payload_bytes"] == len(payload)
        assert len(out[mid]["feature"]) == 8
    # real payload magic per format
    assert synthesize_payload(6, "an image doc")[1][:2] == b"P6"
    assert synthesize_payload(7, "an audio doc")[1][:4] == b"RIFF"
    assert synthesize_payload(8, "a video doc")[1][:4] == b"RV01"
    # deterministic: same doc → same feature
    out2 = {r["media_id"]: r
            for r in extract_features(media_from_documents(docs)).collect()}
    assert all(out[m]["feature"] == out2[m]["feature"] for m in out)


def test_salted_topk_equals_plain_window(spark):
    """The mega-host-safe two-phase top-K must equal the single Window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.pipeline.scale import (
        salted_topk_per_key)
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("first_ip"),
        (F.col("id") * 7919 % 100000).alias("uh48"),
        (F.col("id") % 11).alias("score"))
    order = [F.desc("score"), F.asc("uh48")]
    got = sorted((r["first_ip"], r["uh48"], r["ip_rn"]) for r in
                 salted_topk_per_key(df, "first_ip", order, k=25).collect())
    w = Window.partitionBy("first_ip").orderBy(*order)
    want = sorted((r["first_ip"], r["uh48"], r["ip_rn"]) for r in
                  df.withColumn("ip_rn", F.row_number().over(w))
                  .filter(F.col("ip_rn") <= 25).collect())
    assert got == want


def test_winnow_fingerprints_detect_containment():
    from open_source_search_engine_spark.training.dedup import (
        winnow_similarity)
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight ") * 3
    partial = base[: len(base) // 2]
    other = "completely different material about spark shuffles " * 6
    assert winnow_similarity(base, base) == 1.0
    assert winnow_similarity(base, partial) > 0.3
    assert winnow_similarity(base, other) < 0.05


def test_winnow_profile_deterministic(spark):
    from open_source_search_engine_spark.training.dedup import winnow_profile
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 10), (2, "")], ["doc_id", "text"])
    a = sorted(tuple(r) for r in winnow_profile(docs).collect())
    b = sorted(tuple(r) for r in winnow_profile(docs).collect())
    assert a == b
    byid = {r[0]: r for r in a}
    assert byid[1][1] > 0 and byid[2][1] == 0


def test_ivf_topk_contains_planted_neighbor(spark):
    import numpy as np
    from open_source_search_engine_spark.training.simsearch import (
        brute_force_topk, ivf_topk)
    rng = np.random.RandomState(9)
    base = rng.standard_normal(64)
    rows = [(0, base.tolist()), (1, (base * 0.99).tolist())]
    rows += [(i, rng.standard_normal(64).tolist()) for i in range(2, 60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    ivf = [r["vec_id"] for r in ivf_topk(emb, 0, k=5, n_centroids=4).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(emb, 0, k=1).collect()]
    assert exact[0] == 1
    assert 1 in ivf  # the planted near-duplicate survives list pruning


@pytest.mark.slow
def test_ivf_recall_vs_bruteforce(spark):
    """VERDICT r3 item 5: recall@10 of the Lloyd-refined IVF vs exact
    brute force at sf0.1, pinned at the measured floors (the whole path
    is deterministic — fixed-order sample, no RNG).  Seed-only centroids
    measured 0.45 at nprobe=2; the refinement buys 0.53 (nprobe=2) and
    0.65 (nprobe=4, the recall/scan dial)."""
    from open_source_search_engine_spark.training.simsearch import (
        brute_force_topk, ivf_topk)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb = emb.cache()
    qids = [0, 17, 101, 555, 999, 1500]
    truths = {q: {r["vec_id"] for r in brute_force_topk(emb, q, k=10)
                  .collect()} for q in qids}

    def recall(nprobe):
        hit = sum(len(truths[q] & {r["vec_id"] for r in
                                   ivf_topk(emb, q, k=10, nprobe=nprobe)
                                   .collect()}) for q in qids)
        return hit / (10 * len(qids))

    try:
        assert recall(2) >= 0.53
        assert recall(4) >= 0.65
    finally:
        emb.unpersist()


def test_pq_topk_recovers_planted_neighbor(spark):
    import numpy as np
    from open_source_search_engine_spark.training.simsearch import (
        brute_force_topk, pq_codebooks, pq_encode, pq_topk)
    rng = np.random.RandomState(21)
    base = rng.standard_normal(64)
    rows = [(0, base.tolist()), (1, (base * 0.99).tolist())]
    rows += [(i, rng.standard_normal(64).tolist()) for i in range(2, 80)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # codes are m ids in [0, ksub)
    books = pq_codebooks(emb, m=8, ksub=16)
    codes = pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 8 and
               all(0 <= c < 16 for c in r["codes"]) for r in codes)
    # ADC scan + exact re-rank finds the planted near-duplicate first
    got = [r["vec_id"] for r in pq_topk(emb, 0, k=5).collect()]
    assert got[0] == 1
    # with refine >= corpus size the result equals exact brute force
    exact = [(r["vec_id"], r["dot_q"])
             for r in brute_force_topk(emb, 0, k=5).collect()]
    full = [(r["vec_id"], r["dot_q"])
            for r in pq_topk(emb, 0, k=5, refine=100).collect()]
    assert full == exact
    # deterministic codebooks → deterministic results
    assert got == [r["vec_id"] for r in pq_topk(emb, 0, k=5).collect()]
    # misuse fails loudly at train time, not as an opaque reshape error
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, m=7, ksub=16)
    from open_source_search_engine_spark.training.simsearch import \
        pq_adc_scan
    with pytest.raises(ValueError, match="does not match"):
        pq_adc_scan(pq_encode(emb, books), books, np.zeros(63))


def test_multimodal_resize_and_frames(spark):
    import struct
    from open_source_search_engine_spark.training.multimodal import (
        fit_box, media_from_documents, resize_media, sample_frames,
        synthesize_payload)
    docs = spark.createDataFrame(
        [(2, "video-ish payload content here"),
         (3, "image payload content here")], ["doc_id", "text"])
    media = media_from_documents(docs)   # doc_id 2 -> video, 3 -> image
    rz = {r["media_id"]: r for r in resize_media(media).collect()}
    # aspect-fit: out dims honor the real source aspect ratio (pnmscale
    # -xysize semantics) and the re-encoded PPM byte count is exact
    for mid in (2, 3):
        kind, payload, w, h = synthesize_payload(
            mid, "video-ish payload content here" if mid == 2
            else "image payload content here")
        ow, oh = fit_box(w, h, 160, 120)
        assert (rz[mid]["out_width"], rz[mid]["out_height"]) == (ow, oh)
        header = b"P6\n%d %d\n255\n" % (ow, oh)
        assert rz[mid]["payload_out_bytes"] == len(header) + ow * oh * 3
    frames = sample_frames(media).collect()
    # frame count == min(4, container frame count), read from the header
    _, vid_payload, _, _ = synthesize_payload(
        2, "video-ish payload content here")
    n_in_container = struct.unpack_from("<H", vid_payload, 8)[0]
    assert len(frames) == min(4, n_in_container)
    assert all(len(f["frame_feature"]) == 8 for f in frames)
    # deterministic frame features
    again = sample_frames(media).collect()
    assert [f["frame_feature"] for f in frames] == \
        [f["frame_feature"] for f in again]


def test_exact_verify_and_dedup_keepers(spark):
    from open_source_search_engine_spark.training.dedup import (
        dedup_keepers, lsh_candidate_pairs, minhash_signatures,
        verify_pairs_exact)
    rows = [
        (1, "the cat sat on the mat and looked at the dog very quietly " * 4),
        (2, "the cat sat on the mat and looked at the dog very quietly " * 4),
        (3, "totally different text about spark executors and shuffles " * 4),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_candidate_pairs(minhash_signatures(docs), 0.8)
    verified = verify_pairs_exact(docs, pairs).collect()
    assert [(v["doc_a"], v["doc_b"], v["exact_jaccard"])
            for v in verified] == [(1, 2, 1.0)]
    keep = {r["doc_id"]: r["keep"] for r in dedup_keepers(docs).collect()}
    assert keep == {1: True, 2: False, 3: True}


def test_simhash_recall_at_configured_threshold(spark):
    """Pigeonhole segmentation must guarantee recall AT max_hamming, not
    just at hamming<=3: plant a pair at hamming 10 that differs in every
    16-bit quarter (the old fixed 4x16 split missed it)."""
    from open_source_search_engine_spark.training.dedup import (
        simhash_near_dups)
    a = 0
    b = 0
    for bit in (0, 7, 14, 21, 28, 35, 42, 49, 56, 63):  # 10 bits, all quarters
        b |= 1 << bit
    if b >= 1 << 63:                      # LongType is signed int64
        b -= 1 << 64
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") == 10
    assert all((a >> (16 * s)) & 0xFFFF != (b >> (16 * s)) & 0xFFFF
               for s in range(4))  # old segmentation would have dropped it
    fps = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "simhash"])
    found = simhash_near_dups(fps, max_hamming=10).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in found] == \
        [(1, 2, 10)]
    # and the popcount verify still rejects past the threshold
    assert simhash_near_dups(fps, max_hamming=9).count() == 0


def test_simhash_catalog_candidate_count_subquadratic(spark):
    """The catalog entry runs max_hamming=6 (9-10-bit segments).  Assert
    the pre-verify candidate-pair count on the real sf0.01 corpus stays
    O(n·k), nowhere near the ~n²/16 the round-2 h=16 config produced
    (41,047 of 124,750 possible pairs) — this is the scale guarantee, not
    just the recall one."""
    import os

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.queries import _docs_long
    from open_source_search_engine_spark.training.dedup import (
        _simhash_block_tables, simhash_fingerprints)

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        import pytest
        pytest.skip("sf0.01 testdata missing")
    fps = simhash_fingerprints(_docs_long(spark, sf)).cache()
    n = fps.count()
    blocks, tables = _simhash_block_tables(6)
    block_cols = [
        F.shiftrightunsigned("simhash", off).bitwiseAND(F.lit((1 << w) - 1))
        for off, w in blocks]
    keys = []
    for t, combo in enumerate(tables):
        key = F.lit(t)
        for b in combo:
            key = F.shiftleft(key, 16).bitwiseOR(block_cols[b])
        keys.append(key)
    segs = fps.select("doc_id", F.explode(F.array(*keys)).alias("bkey"))
    # candidate pairs before popcount verify = sum over buckets of C(c,2)
    cand = (segs.groupBy("bkey").count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                    .alias("pairs")).collect()[0]["pairs"])
    biggest = (segs.groupBy("bkey").count()
               .agg(F.max("count")).collect()[0][0])
    fps.unpersist()
    # h=16 single-segment gave ~n^2/3 candidates here and a 234-doc
    # mega-bucket; the 3-of-9 block scheme must stay linear-ish.
    assert cand < 32 * n, f"candidate join too dense: {cand} pairs for n={n}"
    assert biggest < n // 8, f"mega-bucket survived: {biggest} docs (n={n})"


def test_lsh_self_joins_read_cached_signatures(spark):
    """Both LSH pair joins must read their signature relation from cache:
    no ReusedExchange fires across the explode+self-join, so without the
    persist the Arrow map feeding the signatures (text simhash, image
    dHash, audio spectral hash, minhash over full text) runs once PER
    JOIN SIDE — measured 14.3 s -> 2.5 s on dedup_audio_fp_pairs at
    sf0.1.  The public wrappers persist the signatures for exactly the
    duration of their eager checkpoint (see the cache-ownership
    contract), so the pin is on the internal pair plan over a persisted
    input: each join side must resolve to the cache."""
    from open_source_search_engine_spark.memutil import safe_unpersist
    from open_source_search_engine_spark.training.dedup import (
        N_HASHES, _lsh_pairs_plan, _simhash_pairs_plan)

    def _assert_cached_per_side(df):
        # Pin on the OPTIMIZED logical plan: each join side must resolve
        # to an InMemoryRelation (the cache), which is stable across AQE
        # and physical-node renames.  The executedPlan substring count
        # alone is Spark-version-coupled (ADVICE r3): a renamed/collapsed
        # physical cache-scan node could pass or fail spuriously.
        qe = df._jdf.queryExecution()
        opt = qe.optimizedPlan().toString()
        assert opt.count("InMemoryRelation") >= 2, opt
        phys = qe.executedPlan().toString()
        assert phys.count("InMemoryTableScan") >= 2, phys

    fps = spark.createDataFrame([(1, 7), (2, 5), (3, 7)],
                                ["doc_id", "simhash"]).persist()
    _assert_cached_per_side(_simhash_pairs_plan(fps, 6, None))
    safe_unpersist(fps)

    sigs = spark.createDataFrame(
        [(1, list(range(N_HASHES))), (2, list(range(N_HASHES)))],
        ["doc_id", "sig"]).persist()
    _assert_cached_per_side(_lsh_pairs_plan(sigs, 0.5))
    safe_unpersist(sigs)


def test_no_cache_outlives_pair_calls(spark):
    """lsh_candidate_pairs / simhash_near_dups release their internal
    signature persist before returning (same contract as semdedup /
    dsir_select, ADVICE r4): after a call the only surviving blocks are
    the returned checkpointed pairs' own, freed by
    release_local_checkpoint — so a catalog/bench pass leaves storage
    empty once results are released."""
    from open_source_search_engine_spark.memutil import (
        release_local_checkpoint)
    from open_source_search_engine_spark.training.dedup import (
        lsh_candidate_pairs, minhash_signatures, simhash_fingerprints,
        simhash_near_dups)

    def persistent_rdds():
        return {int(k) for k in
                spark.sparkContext._jsc.getPersistentRDDs().keySet()
                .toArray()}

    docs = spark.createDataFrame(
        [(i, f"common shared tokens plus doc {i % 4}") for i in range(16)],
        ["doc_id", "text"])
    before = persistent_rdds()

    pairs = lsh_candidate_pairs(minhash_signatures(docs), threshold=0.3)
    pairs.count()
    release_local_checkpoint(pairs)
    assert persistent_rdds() - before == set()

    nd = simhash_near_dups(simhash_fingerprints(docs), max_hamming=6)
    nd.count()
    release_local_checkpoint(nd)
    assert persistent_rdds() - before == set()


def test_ngram_jaccard_lsh_recall_vs_exact(spark):
    """dedup_ngram_jaccard_pairs_lsh (MinHash-LSH blocked, no label
    columns) must recover essentially every pair the exact all-pairs
    unigram-Jaccard >= 0.8 computation finds at sf0.01.  With 16 bands x 4
    rows and a 0.5 est prefilter the per-pair miss probability at j=0.8 is
    (1-0.8^4)^16 ~= 2e-4, so demand >= 99.5% recall and perfect precision
    (the exact verify guarantees the latter by construction)."""
    import os

    import duckdb
    import pytest

    from open_source_search_engine_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("sf0.01 testdata missing")
    got = {(r["da"], r["db"]): r["jacc_x10000"]
           for r in QUERIES["dedup_ngram_jaccard_pairs_lsh"](spark, sf)
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf}/documents.parquet'")
    exact = {(r[0], r[1]): r[2] for r in con.execute("""
        WITH t AS (SELECT doc_id,
                          list_distinct(string_split(text, ' ')) AS toks
                   FROM documents)
        SELECT CAST(a.doc_id AS BIGINT), CAST(b.doc_id AS BIGINT),
               CAST(ROUND(10000.0 * len(list_intersect(a.toks, b.toks))
                    / len(list_distinct(a.toks || b.toks))) AS BIGINT) AS j
        FROM t a, t b WHERE a.doc_id < b.doc_id
        """).fetchall() if r[2] >= 8000}
    # precision: every emitted pair is a true pair with the exact score
    assert all(exact.get(k) == v for k, v in got.items())
    recall = len(got) / len(exact)
    assert recall >= 0.995, f"recall {recall:.4f} ({len(got)}/{len(exact)})"


def test_dedup_keepers_chain_clusters(spark):
    """a~b and b~c (no a~c pair) must keep only the cluster minimum a —
    and must NOT over-drop when a doc's only duplicate was itself dropped
    (connected components, not per-pair doc_b drops)."""
    from open_source_search_engine_spark.training.dedup import (
        connected_components)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["doc_a", "doc_b"])
    comp = {r["doc_id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_trigram_langid_broad_coverage():
    """CT trigram profiles + script fast path (LanguageIdentifier.cpp
    analogue): each language's ordinary sentence must classify correctly,
    deterministically."""
    from open_source_search_engine_spark.training.textqual import (
        identify_language)
    cases = {
        "en": "The cat is on the table and the weather is nice today",
        "de": "Der Hund ist im Garten und das Wetter ist heute schön",
        "es": "El gato está en la mesa y el tiempo es muy bueno hoy",
        "fr": "Le chat est sur la table et le temps est beau aujourd'hui",
        "it": "Il gatto è sul tavolo e il tempo è molto bello oggi",
        "pt": "O gato está na mesa e o tempo está muito bom hoje",
        "nl": "De kat zit op de tafel en het weer is vandaag erg mooi",
        "ru": "Это предложение написано на русском языке для проверки",
        "zh": "这是一个用中文写的句子用来测试语言识别",
        "ar": "هذه جملة مكتوبة باللغة العربية للاختبار",
    }
    for want, text in cases.items():
        got, conf = identify_language(text)
        assert got == want, (want, got)
        assert conf > 0
    assert identify_language("") == ("unknown", 0)
    # determinism
    assert identify_language(cases["fr"]) == identify_language(cases["fr"])


def test_lsh_neardup_pairs_planted_and_exact_precision(spark):
    """Banded sign-LSH embedding near-dup (the no-label 100 TB path):
    planted high-cosine duplicates are recovered (an identical copy shares
    every band bucket, so recall for true dups is structural, not luck),
    and every emitted pair passes the exact integer-Gram threshold —
    precision is exact by construction."""
    import numpy as np

    from open_source_search_engine_spark.training.simsearch import (
        lsh_neardup_pairs)

    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = list(base)
    # plant: ids 40/41 are exact copies of 0/1; id 42 is a 0.99-cosine
    # perturbation of vector 2
    vecs.append(base[0])
    vecs.append(base[1])
    v = base[2] + 0.08 * rng.standard_normal(64)
    vecs.append(v / np.linalg.norm(v))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {(r["va"], r["vb"]): r["dot_q"]
           for r in lsh_neardup_pairs(emb, min_dot_q=900000).collect()}
    assert (0, 40) in got and (1, 41) in got   # exact copies always collide
    assert got[(0, 40)] >= 990000
    # exact verify: recompute every emitted dot from the quantized vectors
    q = {i: np.round(np.array(v, dtype=np.float32).astype(np.float64) * 1000)
         for i, v in rows}
    for (a, b), dot in got.items():
        assert int(q[a] @ q[b]) == dot
        assert dot >= 900000
    # determinism
    again = {(r["va"], r["vb"]): r["dot_q"]
             for r in lsh_neardup_pairs(emb, min_dot_q=900000).collect()}
    assert again == got


def test_gopher_quality_rules(spark):
    from open_source_search_engine_spark.training.gopher import gopher_quality

    good = " ".join(f"word{i}" for i in range(100))
    short = "too short"
    repetitive = "again again " * 60                 # one bigram dominates
    symbols = " ".join("##tag" for _ in range(80))   # symbol words
    rows = [(1, good), (2, short), (3, repetitive), (4, symbols)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gopher_pass"] is False            # n_words < 50
    assert out[2]["n_words"] == 2
    assert out[3]["gopher_pass"] is False            # top bigram covers all
    assert out[3]["top_bigram_x1000"] > 180
    assert out[4]["gopher_pass"] is False            # symbol ratio
    assert out[4]["symbol_ratio_x1000"] == 1000
    # scaled-integer measures are exact: mean word len of doc 2
    assert out[2]["mean_word_len_x100"] == (100 * len("tooshort")) // 2
