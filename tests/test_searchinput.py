"""SearchInput parameter surface (SearchInput.cpp / Parms.cpp OBJ_SI)."""

import dataclasses

from open_source_search_engine_spark.search.searchinput import (
    MAX_DOCS_WANTED, MAX_FIRST_RESULT_NUM, SI_PARMS, SearchInput,
    execute_search_input, parse_search_input)


class TestParmTable:
    def test_every_parm_has_a_field_with_its_default(self):
        names = {f.name for f in dataclasses.fields(SearchInput)}
        fresh = SearchInput()
        for cgi, f_, t, d in SI_PARMS:
            assert f_ in names
            assert getattr(fresh, f_) == d, (cgi, f_)

    def test_parm_count_matches_the_obj_si_table(self):
        # 63 OBJ_SI rows in Parms.cpp plus the 3 setQueryBuffers-only
        # request keys (any/gblang/mininlinks) minus the 'c' dup = 65
        assert len(SI_PARMS) == 65

    def test_reference_defaults(self):
        # spot-check the Parms.cpp m_def values (incl. CollectionRec-
        # inherited: pss=90, qe=1, langw=20, tml=80, sw=80, smxcpl=180)
        si = SearchInput()
        assert si.docs_wanted == 10
        assert si.percent_similar_summary == 90
        assert si.query_expansion is True
        assert si.same_lang_weight == 20.0
        assert si.title_max_len == 80
        assert si.summary_max_width == 80
        assert si.summary_max_chars_per_line == 180
        assert si.use_cache == -1 and si.wcache == -1
        assert si.format_str == "html"


class TestParse:
    def test_type_coercion_and_unknown_keys_ignored(self):
        si = parse_search_input({"q": "cat", "n": "25", "ff": "1",
                                 "langw": "5.5", "nosuchparm": "zz"})
        assert si.query == "cat" and si.docs_wanted == 25
        assert si.family_filter is True and si.same_lang_weight == 5.5

    def test_bad_value_keeps_default(self):
        si = parse_search_input({"n": "lots"})
        assert si.docs_wanted == 10

    def test_msg40_hard_caps(self):
        # Msg40.cpp:153-158, Conf max_results_per_page=100 / offset=200
        si = parse_search_input({"n": "5000", "s": "9999"})
        assert si.docs_wanted == MAX_DOCS_WANTED == 100
        assert si.first_result_num == MAX_FIRST_RESULT_NUM == 200

    def test_negative_first_result_clamped(self):
        # SearchInput.cpp:435
        assert parse_search_input({"s": "-5"}).first_result_num == 0

    def test_site_field_disables_clustering(self):
        # SearchInput.cpp:421-423 m_hasPositiveSiteField
        si = parse_search_input({"q": "site:x.example data", "sc": "1"})
        assert si.do_site_clustering is False
        assert si.hide_all_clustered is False

    def test_quota_field_disables_clustering_and_dedup(self):
        # SearchInput.cpp:425-428
        si = parse_search_input({"q": "gbquota data", "sc": "1", "dr": "1"})
        assert si.do_site_clustering is False
        assert si.do_dup_content_removal is False

    def test_use_cache_ladder(self):
        # SearchInput.cpp:438-466: site:/url:/ip: queries default to no
        # cache; otherwise on; wcache follows
        off = parse_search_input({"q": "site:x.example data"})
        assert off.use_cache == 0 and off.wcache == 0
        assert off.rcache is False
        on = parse_search_input({"q": "plain words"})
        assert on.use_cache == 1 and on.wcache == 1
        assert on.rcache is True


class TestComposeQuery:
    """setQueryBuffers (SearchInput.cpp:473-741), emit-order-exact."""

    def test_emit_order(self):
        si = parse_search_input({
            "q": "cat", "plus": 'dog "big fish"', "quotea": "fast sort",
            "link": "http://x.example/", "filetype": "pdf", "sortby": "2"})
        assert si.compose_query() == (
            "gbrevsortbyint:gbspiderdate filetype:pdf "
            '+link:http://x.example/ | cat +"fast sort" +dog +"big fish"')

    def test_any_terms_make_a_boolean_or_group(self):
        si = parse_search_input({"q": "cat", "any": 'dog "big fish"'})
        assert si.compose_query() == '(dog OR "big fish") AND cat'
        # boolq mode switches the plus/quote connectors to AND
        si2 = parse_search_input({"q": "cat", "any": "dog",
                                  "quotea": "fast sort"})
        assert si2.compose_query() == '(dog) AND cat AND "fast sort"'

    def test_minus_loop_quirk(self):
        # SearchInput.cpp:697 `if (s2 < send) break;`: a minus token not
        # reaching end-of-string aborts the loop before appending — two
        # minus terms produce NO exclusions, one trailing term works
        assert parse_search_input(
            {"q": "cat", "minus": "bird fish"}).compose_query() == "cat"
        assert parse_search_input(
            {"q": "cat", "minus": "bird"}).compose_query() == "cat -bird"

    def test_secsback_and_mininlinks(self):
        si = parse_search_input({"q": "cat", "secsback": "100",
                                 "mininlinks": "5"})
        assert si.compose_query(now_ts=1700000100) == (
            "gbminint:gbspiderdate:1700000000 cat gbkeyword:numinlinks")

    def test_filetype_any_is_no_op(self):
        si = parse_search_input({"q": "cat", "filetype": "any"})
        assert si.compose_query() == "cat"

    def test_gblang(self):
        si = parse_search_input({"q": "cat", "gblang": "5"})
        assert si.compose_query() == "+gblang:5 | cat"


def test_execute_paging_and_knobs(spark):
    # end-to-end: n/s paging over the Msg40 path, site clustering off
    from pyspark.sql import functions as F
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("data join stream row batch doc "),
                 F.col("id").cast("string")).alias("text"),
        F.concat(F.lit("http://h"), (F.col("id") % 4).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string"))
        .alias("url"))
    si = parse_search_input({"q": "data join", "n": "5", "s": "3",
                             "sc": "0", "qh": "0"})
    page = execute_search_input(si, docs, url_col="url",
                                content_type="text").collect()
    assert len(page) == 5
    assert [r["rank"] for r in page] == [3, 4, 5, 6, 7]
