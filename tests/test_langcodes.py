"""Lang.cpp language-code tables (functions/langcodes.py) and the
gblang:/gbcountry:/gbisadult:/gbpermalink:/gbhasthumbnail: query fields
(queryparse meta-term dimension, XmlDoc_Indexing.cpp:1856-1966)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.functions.langcodes import (
    LANG_ABBR, LANG_NAMES, lang_abbr, lang_id_from_abbr,
    lang_id_from_detector)


def test_tables_aligned():
    # Lang.h:13-69: ids 0..55, both tables indexed by langId
    assert len(LANG_ABBR) == 56
    assert len(LANG_NAMES) == 56
    assert LANG_ABBR[0] == "xx" and LANG_NAMES[0] == "Unknown"
    assert LANG_ABBR[1] == "en" and LANG_NAMES[1] == "English"
    assert LANG_ABBR[10] == "de" and LANG_NAMES[10] == "German"
    assert LANG_ABBR[55] == "et" and LANG_NAMES[55] == "Estonian"


def test_abbr_round_trip():
    for i, a in enumerate(LANG_ABBR):
        assert lang_abbr(i) == a
        assert lang_id_from_abbr(a) == i
    assert lang_abbr(56) is None       # past the table = NULL (Lang.cpp:112)
    assert lang_abbr(-1) is None


def test_abbr_lookup_semantics():
    # getLangIdFromAbbr (Lang.cpp:91): strcasecmp + the en_uk/en_us
    # hard aliases + unknown -> langUnknown
    assert lang_id_from_abbr("DE") == 10
    assert lang_id_from_abbr("Zh_Cn") == 8
    assert lang_id_from_abbr("en_uk") == 1
    assert lang_id_from_abbr("EN_US") == 1
    assert lang_id_from_abbr("qq") == 0
    assert lang_id_from_abbr("") == 0
    assert lang_id_from_abbr(None) == 0


def test_detector_mapping():
    # the trigram detector's bare codes land in the id space; zh (no
    # simplified/traditional split at script level) -> zh_cn slot
    assert lang_id_from_detector("en") == 1
    assert lang_id_from_detector("zh") == 8
    assert lang_id_from_detector("ja") == 6
    assert lang_id_from_detector("el") == 21
    assert lang_id_from_detector("xx") == 0
    assert lang_id_from_detector(None) == 0


def test_catalyst_twins_match_python(spark):
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.functions.langcodes import (
        lang_abbr_col, lang_id_from_detector_col)
    ids = spark.createDataFrame([(i,) for i in range(-1, 58)], ["lid"])
    got = {r["lid"]: r["a"]
           for r in ids.select("lid", lang_abbr_col("lid").alias("a"))
           .collect()}
    for i in range(-1, 58):
        # column twin falls back to 'xx' where the Python form is None
        assert got[i] == (lang_abbr(i) or "xx")
    codes = ([(a,) for a in LANG_ABBR] +
             [("zh",), ("EN_US",), ("qq",), ("",)])
    cdf = spark.createDataFrame(codes, ["code"])
    got2 = {r["code"]: r["lid"] for r in
            cdf.select("code",
                       lang_id_from_detector_col(F.col("code"))
                       .alias("lid")).collect()}
    for (c,) in codes:
        assert got2[c] == lang_id_from_detector(c), c


# ------------------------------------------------------- meta query fields

@pytest.fixture(scope="module")
def meta_idx(spark):
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    rows = [
        (1, "web data here"), (2, "web data there"), (3, "web data again"),
        (4, "web data more"), (5, "no match term"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # (doc_id, lang_id, country_id, is_adult, is_permalink, has_thumbnail)
    meta = spark.createDataFrame(
        [(1, 10, 73, False, True, False),     # de, fr
         (2, 1, 226, True, False, True),      # en, us
         (3, 10, 226, False, False, False),   # de, us
         (4, 8, 73, False, True, True),       # zh_cn, fr
         (5, 10, 73, False, True, True)],
        ["doc_id", "lang_id", "country_id", "is_adult",
         "is_permalink", "has_thumbnail"])
    return build_postings(docs), meta


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_gblang_field_both_forms(spark, meta_idx):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    postings, meta = meta_idx
    # abbreviation form (hashLanguageString) and numeric form
    # (hashLanguage) hit the same docs
    assert _ids(search_query(postings, "web gblang:de",
                             doc_meta=meta)) == {1, 3}
    assert _ids(search_query(postings, "web gblang:10",
                             doc_meta=meta)) == {1, 3}
    assert _ids(search_query(postings, "web gblang:zh_cn",
                             doc_meta=meta)) == {4}
    # unresolvable abbr was never indexed -> nothing
    assert _ids(search_query(postings, "web gblang:qq",
                             doc_meta=meta)) == set()


def test_gbcountry_field(spark, meta_idx):
    from open_source_search_engine_spark.functions.country import COUNTRY_ID
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    assert COUNTRY_ID["fr"] == 73 and COUNTRY_ID["us"] == 226
    postings, meta = meta_idx
    assert _ids(search_query(postings, "web gbcountry:fr",
                             doc_meta=meta)) == {1, 4}
    assert _ids(search_query(postings, "web gbcountry:us",
                             doc_meta=meta)) == {2, 3}
    assert _ids(search_query(postings, "web gbcountry:zz",
                             doc_meta=meta)) == set()


def test_boolean_meta_fields(spark, meta_idx):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    postings, meta = meta_idx
    assert _ids(search_query(postings, "web gbisadult:1",
                             doc_meta=meta)) == {2}
    assert _ids(search_query(postings, "web gbisadult:0",
                             doc_meta=meta)) == {1, 3, 4}
    assert _ids(search_query(postings, "web gbpermalink:1",
                             doc_meta=meta)) == {1, 4}
    assert _ids(search_query(postings, "web gbhasthumbnail:1",
                             doc_meta=meta)) == {2, 4}
    # the reference hashes exactly "1"/"0" — anything else matches nothing
    assert _ids(search_query(postings, "web gbisadult:yes",
                             doc_meta=meta)) == set()


def test_meta_fields_compose(spark, meta_idx):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    postings, meta = meta_idx
    got = _ids(search_query(postings,
                            "web (gblang:de OR gbcountry:fr) gbisadult:0",
                            doc_meta=meta))
    assert got == {1, 3, 4}


def test_meta_fields_without_dimension(spark, meta_idx):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    postings, _ = meta_idx
    # no doc_meta dimension -> the termlists were never indexed
    assert _ids(search_query(postings, "web gblang:de")) == set()
