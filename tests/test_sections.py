"""Sections.cpp analogue: tag-path hashing, sectiondb voting, site-wide
boilerplate stripping."""

import pytest

from open_source_search_engine_spark.functions.sections import (
    build_sections, section_rows, site_dup_sections,
    strip_site_boilerplate)

NAV = '<div class="nav">home products about contact</div>'


def page(body, nav=NAV):
    return f"<html><body>{nav}<div class='main'><p>{body}</p></div></body></html>"


class TestSectionRows:
    def test_direct_text_only(self):
        rows = section_rows("<div>outer <p>inner</p> tail</div>")
        texts = {t for _, _, t in rows}
        # the div's own text excludes the <p>'s
        assert "inner" in texts
        assert "outer tail" in texts

    def test_same_path_same_hash(self):
        a = section_rows(page("alpha"))
        b = section_rows(page("beta"))
        nav_a = [r for r in a if "home products" in r[2]][0]
        nav_b = [r for r in b if "home products" in r[2]][0]
        assert nav_a[0] == nav_b[0]      # same tag path
        assert nav_a[1] == nav_b[1]      # same content

    def test_attrs_distinguish_paths(self):
        # <div class=nav> vs <div class=other>: different baseHash
        # (Sections.cpp:896-938 hashes attribute alnum chars)
        a = section_rows('<div class="nav">same text</div>')
        b = section_rows('<div class="other">same text</div>')
        assert a[0][0] != b[0][0]
        assert a[0][1] == b[0][1]

    def test_nested_path_hash_differs(self):
        a = section_rows("<div><p>x</p></div>")
        b = section_rows("<ul><p>x</p></ul>")
        pa = [r for r in a if r[2] == "x"][0]
        pb = [r for r in b if r[2] == "x"][0]
        assert pa[0] != pb[0]            # parent chain differs

    def test_script_skipped(self):
        rows = section_rows("<div>keep<script>drop()</script></div>")
        assert all("drop" not in t for _, _, t in rows)


DOCS = [
    (1, "s1", page("unique text one")),
    (2, "s1", page("totally different body two")),
    (3, "s1", page("third page body")),
    # same nav markup but a different site: votes do not cross sites
    (4, "s2", page("other site page")),
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, site string, content string")


class TestSiteVote:
    def test_dup_detection_and_strip(self, spark, docs_df):
        secs = build_sections(docs_df)
        dup = site_dup_sections(secs, min_docs=2)
        rows = dup.collect()
        # only the s1 nav (3 docs); s2's single copy doesn't qualify
        assert len(rows) == 1
        assert rows[0]["site"] == "s1" and rows[0]["n_docs"] == 3
        out = {r["doc_id"]: r for r in
               strip_site_boilerplate(docs_df, dup).collect()}
        assert "home products" not in out[1]["text"]
        assert "unique text one" in out[1]["text"]
        assert out[1]["n_boilerplate"] == 1
        # the s2 page keeps its nav
        assert "home products" in out[4]["text"]
        assert out[4]["n_boilerplate"] == 0

    def test_same_text_different_path_not_dup(self, spark):
        docs = spark.createDataFrame(
            [(1, "s", '<div class="a">promo</div>'),
             (2, "s", '<div class="b">promo</div>')],
            "doc_id long, site string, content string")
        assert site_dup_sections(build_sections(docs), 2).count() == 0

    def test_changed_content_not_dup(self, spark):
        docs = spark.createDataFrame(
            [(1, "s", '<div class="a">v1</div>'),
             (2, "s", '<div class="a">v2</div>')],
            "doc_id long, site string, content string")
        assert site_dup_sections(build_sections(docs), 2).count() == 0
