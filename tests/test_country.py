"""Country identification (XmlDoc::getCountryId / guessCountryTLD)."""

from open_source_search_engine_spark.functions.country import (
    COUNTRY_CODES, COUNTRY_ID, country_id_col, get_country_abbr,
    get_country_id, guess_country_tld,
)


class TestTables:
    def test_table_shape(self):
        # CountryCode.cpp:14-276 — 254 codes, zz is the Unknown slot
        assert len(COUNTRY_CODES) == 254
        assert COUNTRY_CODES[0] == "zz"
        assert len(set(COUNTRY_CODES)) == 254
        # spot-pin ids the reference order fixes (de=53, fr=70, jp=103,
        # us=222 by construction of the table)
        assert COUNTRY_ID["ad"] == 1
        assert COUNTRY_ID["de"] == COUNTRY_CODES.index("de")
        assert COUNTRY_CODES.index("tl") == 253

    def test_get_country_id_case_folds(self):
        assert get_country_id("DE") == COUNTRY_ID["de"]
        assert get_country_id("fr") == COUNTRY_ID["fr"]
        assert get_country_id("q7") == 0
        assert get_country_id(None) == 0
        assert get_country_abbr(COUNTRY_ID["jp"]) == "jp"
        assert get_country_abbr(9999) == "zz"


class TestGuess:
    def test_prefix_label_wins(self):
        assert guess_country_tld("http://de.wikipedia.org/wiki/x") \
            == COUNTRY_ID["de"]
        # prefix beats ccTLD (LanguageIdentifier.cpp:10-16 runs first)
        assert guess_country_tld("http://fr.site.co.uk/") \
            == COUNTRY_ID["fr"]

    def test_cctld(self):
        assert guess_country_tld("http://a.b.fr/") == COUNTRY_ID["fr"]
        assert guess_country_tld("http://x.co.jp/p") == COUNTRY_ID["jp"]
        assert guess_country_tld("http://x.co.jp:8080/p") \
            == COUNTRY_ID["jp"]

    def test_unknown(self):
        assert guess_country_tld("http://example.com/") == 0
        assert guess_country_tld("http://x.info/") == 0
        # 2-letter first label that is NOT a country falls through to TLD
        assert guess_country_tld("http://xx.site.fr/") == COUNTRY_ID["fr"]
        assert guess_country_tld("http://xx.site.example/") == 0


class TestCatalystTwin:
    def test_col_matches_kernel(self, spark):
        urls = ["http://de.wikipedia.org/wiki/x", "http://fr.site.co.uk/",
                "http://a.b.fr/", "http://x.co.jp:8080/p",
                "http://example.com/", "http://x.info/",
                "http://xx.site.fr/", "http://xx.site.example/",
                "http://zz.site.example/", "http://d7.example/a"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r.url: r.cid for r in df.select(
            "url", country_id_col("url").alias("cid")).collect()}
        for u in urls:
            assert got[u] == guess_country_tld(u), u
