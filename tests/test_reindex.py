"""Query-based reindex/delete (PageReindex.cpp:224-426 Msg1c)."""

from open_source_search_engine_spark.pipeline.reindex import (
    reindex_query, reindex_requests)


def test_reindex_firstip_domain_bits(spark):
    # REINDEX: firstIp = (docId >> 6) & 0xff, 0 -> 1
    # (PageReindex.cpp:351-371)
    ids = spark.createDataFrame([(0,), (64,), (255 << 6,), (1 << 20,)],
                                "doc_id long")
    got = {r["uh48"]: r["first_ip"]
           for r in reindex_requests(ids, now=1700, ).collect()}
    assert got == {0: 1, 64: 1, 255 << 6: 255, 1 << 20: 1}


def test_delete_firstip_low16(spark):
    # DELETE: firstIp = docId & 0xffff (PageReindex.cpp:346-349)
    ids = spark.createDataFrame([(0x12345,), (0x10000,)], "doc_id long")
    got = {r["uh48"]: (r["first_ip"], r["force_delete"])
           for r in reindex_requests(ids, 1700,
                                     force_delete=True).collect()}
    assert got == {0x12345: (0x2345, True), 0x10000: (1, True)}


def test_reindex_query_flags_and_dedup(spark):
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    docs = spark.createDataFrame(
        [(100, "data join data"), (200, "data scan"), (300, "other")],
        "doc_id long, text string")
    p = build_postings(docs)
    rows = reindex_query(p, "data", now=1700).collect()
    assert sorted(r["uh48"] for r in rows) == [100, 200]
    for r in rows:
        # url IS the decimal docid; flags per PageReindex.cpp:375-390
        assert r["url"] == str(r["uh48"])
        assert r["is_page_reindex"] and r["url_is_doc_id"]
        assert r["fake_first_ip"] and r["hop_count"] == -1
        assert not r["force_delete"] and r["added_time"] == 1700
