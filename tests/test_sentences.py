"""Sections.cpp sentence machine + Abbreviations table
(functions/sentences.py)."""

from open_source_search_engine_spark.functions.sentences import (
    ABBREVIATIONS,
    is_abbr,
    sentence_spans,
    sentences,
    sentences_batch,
)
from open_source_search_engine_spark.functions.words import segment


class TestAbbrTable:
    def test_case_insensitive(self):
        assert is_abbr("St") == (True, False)
        assert is_abbr("st") == (True, False)
        assert is_abbr("OCT") == (True, False)

    def test_has_word_after(self):
        assert is_abbr("vs") == (True, True)
        assert is_abbr("Mr") == (True, True)
        assert is_abbr("etc") == (True, False)

    def test_duplicate_last_wins(self):
        # "Ft",1 then "ft",0 — HashTableX addKey overwrite semantics
        assert is_abbr("ft") == (True, False)
        # "Fig",0 then "fig",1
        assert is_abbr("fig") == (True, True)

    def test_not_abbr(self):
        assert is_abbr("library") == (False, False)

    def test_middle_initials(self):
        assert is_abbr("q") == (True, False)
        assert is_abbr("v") == (True, True)     # versus


class TestSentenceBreaks:
    def test_simple_periods(self):
        assert sentences("First one. Second one. Third.") == \
            ["First one", "Second one", "Third"]

    def test_question_exclamation_pipe(self):
        assert sentences("Really? Yes! Menu | Home") == \
            ["Really", "Yes", "Menu", "Home"]

    def test_breadcrumb_gt(self):
        assert sentences("Home > Events > Love Song") == \
            ["Home", "Events", "Love Song"]

    def test_hostname_not_split(self):
        # '.' with alnum right after: hostname/ip (Sections.cpp:1700)
        assert sentences("visit example.com today. Next one") == \
            ["visit example.com today", "Next one"]

    def test_ip_not_split(self):
        assert sentences("ping 10.0.0.1 now. Done") == \
            ["ping 10.0.0.1 now", "Done"]


class TestAbbrRules:
    def test_capitalized_abbr_no_break(self):
        # "Oct. 15" — capitalized abbr keeps the sentence going
        assert sentences("Winter hours Oct. 15 start early. Next") == \
            ["Winter hours Oct. 15 start early", "Next"]

    def test_word_after_abbr_never_breaks(self):
        # "vs." requires a word after — never a sentence end
        assert sentences("red vs. Blue match. Done") == \
            ["red vs. Blue match", "Done"]

    def test_lower_abbr_capitalized_next_breaks(self):
        # lower-case abbr + capitalized next word: period does double
        # duty and DOES end the sentence (Sections.cpp:1722-1736)
        assert sentences("open 9 am. Monday we close") == \
            ["open 9 am", "Monday we close"]

    def test_lower_abbr_lower_next_no_break(self):
        assert sentences("open 9 am. to 5 pm daily") == \
            ["open 9 am. to 5 pm daily"]

    def test_enumeration_number_no_break(self):
        # "1. library name" (Sections.cpp:1740-1744)
        assert sentences("1. library name") == ["1. library name"]

    def test_non_leading_number_breaks(self):
        # the number rule only guards a sentence-LEADING number
        assert sentences("we open at 9. Monday is closed") == \
            ["we open at 9", "Monday is closed"]


class TestTags:
    def test_breaking_tags_end_sentences(self):
        assert sentences("<p>First para</p><p>Second para</p>") == \
            ["First para", "Second para"]
        assert sentences("one line<br>next line") == \
            ["one line", "next line"]

    def test_nonbreaking_tags_skipped(self):
        assert sentences("some <b>bold</b> words. More") == \
            ["some <b>bold</b> words", "More"]

    def test_sentence_never_ends_on_tag(self):
        # trailing tag trimmed: span ends at last alnum word
        out = sentences("hello world <b>!</b>")
        assert out == ["hello world"]

    def test_span_is_breaking(self):
        # the reference deliberately breaks on <span>
        assert sentences("one<span>two</span>") == ["one", "two"]


class TestSpans:
    def test_spans_are_token_indices(self):
        toks = segment("Hi there. Bye", has_tags=True)
        spans = sentence_spans(toks)
        assert len(spans) == 2
        a, b = spans[0]
        assert "".join(t.text for t in toks[a:b]) == "Hi there"

    def test_batch(self):
        import pandas as pd
        out = sentences_batch(pd.Series(["A b. C d", None]))
        assert list(out) == [["A b", "C d"], []]
