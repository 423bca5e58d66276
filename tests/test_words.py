"""Words.cpp segmentation kernel (functions/words.py)."""

import pytest

from open_source_search_engine_spark.functions.ghash import (
    hash64_lower_utf8,
    hash64b,
)
from open_source_search_engine_spark.functions.words import (
    alnum_words,
    is_tag_start,
    segment,
    tag_len,
    word_ids,
    words_batch,
)


def kinds(text, **kw):
    return [(t.text, t.kind) for t in segment(text, **kw)]


class TestBasicSegmentation:
    def test_alternating_runs(self):
        assert kinds("foo, bar!") == [
            ("foo", "alnum"), (", ", "punct"),
            ("bar", "alnum"), ("!", "punct")]

    def test_leading_punct(self):
        assert kinds(" x") == [(" ", "punct"), ("x", "alnum")]

    def test_concat_roundtrip(self):
        for s in ("a,b c!d", "we're 1,000.5 java++ c# end.",
                  "<p>hi</p>", "  ", "", "x"):
            assert "".join(t.text for t in segment(s, has_tags=True)) == s

    def test_empty(self):
        assert segment("") == []


class TestWordExtensions:
    """Words.cpp:362-404 — the suffix/continuation exception ladder."""

    def test_cplusplus(self):
        assert alnum_words("java++ rocks") == ["java++", "rocks"]
        assert alnum_words("A+ grade") == ["A+", "grade"]

    def test_plus_followed_by_alnum_not_joined(self):
        # '+' followed by alnum is a separator, not a suffix
        assert alnum_words("a+b") == ["a", "b"]

    def test_csharp(self):
        assert alnum_words("c# and f#!") == ["c#", "and", "f#"]
        assert alnum_words("c#d") == ["c", "d"]

    def test_digit_grouping(self):
        assert alnum_words("1,000,000 units") == ["1,000,000", "units"]
        assert alnum_words("12,345") == ["12,345"]
        # leading group of 4 digits: not a grouped number
        assert alnum_words("1234,567") == ["1234", "567"]
        # group not exactly 3 digits: stops
        assert alnum_words("1,00") == ["1", "00"]
        # non-digit left neighbor: no grouping
        assert alnum_words("ab,123") == ["ab", "123"]

    def test_decimal_point(self):
        assert alnum_words("3.14159 pie") == ["3.14159", "pie"]
        assert alnum_words("1,000.50") == ["1,000.50"]
        assert alnum_words("a.5") == ["a", "5"]
        assert alnum_words("5.a") == ["5", "a"]

    def test_apostrophe_once(self):
        assert alnum_words("we're dave's o'clock") == \
            ["we're", "dave's", "o'clock"]
        # the hadApostrophe latch: only ONE continuation per word
        assert alnum_words("a'b'c") == ["a'b", "c"]
        # trailing apostrophe never joins
        assert alnum_words("dogs' toys") == ["dogs", "toys"]

    def test_cplusplus_apostrophe_chain(self):
        # after the ++ suffix the apostrophe rule still applies
        assert alnum_words("c++'s") == ["c++'s"]


class TestUnicode:
    def test_nfd_inherited_mark_splits(self):
        # e + COMBINING ACUTE (U+0301): the mark is UC_WORDCHAR but its
        # script is Inherited (scripts.dat value 24) != common, so the
        # reference's script-change break (Words.cpp:357) fires and NFD
        # "cafe\u0301" really segments as "cafe" + the mark.  Verified
        # against the compiled ucdata tables (properties.dat/scripts.dat
        # read back through UCPropTable::deserialize).
        assert alnum_words("cafe\u0301 au") == ["cafe", "\u0301", "au"]
        # precomposed \u00e9 (Latin -> common) stays one word
        assert alnum_words("caf\u00e9 au") == ["caf\u00e9", "au"]

    def test_latin1_not_breaking(self):
        # Latin script maps to common: né is one word
        assert alnum_words("né x") == ["né", "x"]

    def test_cjk_one_char_per_word(self):
        # ideographs: include then break (Words.cpp:348-353)
        assert alnum_words("中文ok") == ["中", "文", "ok"]

    def test_hiragana_single(self):
        assert alnum_words("あい") == ["あ", "い"]

    def test_script_change_breaks(self):
        # greek then cyrillic: break at the script boundary
        words = alnum_words("x αβаб y")
        assert "αβ" in words and "аб" in words

    def test_start_of_text_script_quirk(self):
        # reference emits a zero-length word before a leading non-Latin
        # script word (oldScript still common); alnum_words drops it
        toks = segment("αβ")
        assert [t.text for t in toks] == ["", "αβ"]
        assert alnum_words("αβ") == ["αβ"]

    def test_ascii_joins_any_script(self):
        # ascii alnum accumulates regardless of current script
        assert alnum_words("αβa") == ["αβa"]

    def test_long_tail_scripts_break_on_change(self):
        # r5: long-tail blocks carry their own script id, so adjacent
        # different-script runs break like Greek|Cyrillic does —
        # Tamil|Bengali, Georgian|Cyrillic, Khmer|Thai
        ta, bn = "கங", "বং"          # Tamil, Bengali
        assert alnum_words(ta + bn) == [ta, bn]
        ka, ru = "აბ", "аб"          # Georgian, Cyrillic
        assert alnum_words(ka + ru) == [ka, ru]
        km, lo = "កខ", "ກຂ"          # Khmer, Lao
        assert alnum_words(km + lo) == [km, lo]
        # a BREAK-script char (Thai) is include-then-break (Words.cpp
        # checks UC_THAI before the script-change test), so it joins
        # the preceding Khmer run and the break lands after it
        assert alnum_words(km + "ก") == [km + "ก"]

    def test_long_tail_scripts_keep_whole_runs(self):
        # same-script runs stay one word (no per-char break: these are
        # NOT in the UC_IDEOGRAPH/HIRAGANA/THAI break set)
        for run in ("கஙச",      # Tamil
                    "ကခဂ",      # Myanmar
                    "ሀሁሂ"):     # Ethiopic
            assert alnum_words(run) == [run]


class TestUCPropTableVectors:
    """Adversarial codepoints where Python's unicodedata and the
    reference's UCPropTable classify differently.  Each expectation was
    verified against the reference's COMPILED tables
    (ucdata/properties.dat + scripts.dat, deserialized per
    UCPropTable.cpp:111 and probed for UC_WORDCHAR/UC_IGNORABLE/script),
    not against the generator source — the shipped table is what the
    reference actually runs."""

    def test_devanagari_vowel_sign_continues(self):
        # U+093E (Mc) is NOT isalnum in Python, but DerivedCoreProps
        # Alphabetic -> UC_WORDCHAR in the reference, and its script is
        # Devanagari — same as the base letter, so the word survives.
        # (Round-2 behavior split this word at every matra.)
        assert alnum_words("कार") == ["कार"]

    def test_devanagari_visarga_continues(self):
        assert alnum_words("कः") == ["कः"]

    def test_hebrew_point_continues(self):
        # U+05B0 (Mn) scripts.dat says Hebrew (22), same as the letters
        assert alnum_words("אְב") == ["אְב"]

    def test_arabic_haraka_splits(self):
        # U+064B fathatan is WORDCHAR but script=Inherited in the
        # reference's (old-UCD) scripts.dat — script change breaks
        assert alnum_words("اً") == ["ا", "ً"]

    def test_thai_mark_is_own_word(self):
        # U+0E31 carries UC_THAI -> include-then-break like base Thai
        assert alnum_words("กัน") == \
            ["ก", "ั", "น"]

    def test_zwnj_zwj_absorbed_midword(self):
        # U+200C/200D: UC_WORDCHAR AND UC_IGNORABLE; the ignorable check
        # runs first (Words.cpp:334) so they continue the word — the
        # Persian ZWNJ compound stays one token, bytes preserved
        assert alnum_words("می‌خ") == \
            ["می‌خ"]
        assert alnum_words("a‍b") == ["a‍b"]

    def test_zwnj_starts_word_after_punct(self):
        # the punct scan stops at ZWNJ because ucIsWordChar is TRUE for
        # it — the next word starts AT the ZWNJ and absorbs it
        assert alnum_words("a ‌b") == ["a", "‌b"]

    def test_plain_cf_ignorables_absorbed_not_word_starting(self):
        # soft hyphen / ZWSP / word joiner / FEFF: IGNORABLE only, NOT
        # WORDCHAR -> absorbed mid-word, punct between words
        assert alnum_words("x­yz") == ["x­yz"]
        assert alnum_words("x​yz") == ["x​yz"]
        assert alnum_words("a ⁠ b") == ["a", "b"]
        assert alnum_words("a﻿b") == ["a﻿b"]

    def test_variation_selector_absorbed(self):
        # U+FE0F is Mn (wordchar-ish) AND Default_Ignorable: the
        # reference table sets both bits; ignorable-first absorbs it
        # even across a script boundary
        assert alnum_words("a️中") == ["a️中"]

    def test_superscript_and_fraction_are_wordchars(self):
        # No-category digits: N* -> UC_WORDCHAR (and Python agrees here)
        assert alnum_words("x²y") == ["x²y"]
        assert alnum_words("4½") == ["4½"]

    def test_hiragana_voiced_mark_breaks(self):
        # U+3099 sits INSIDE the Hiragana block but scripts.dat says
        # Inherited, and its props carry no UC_HIRAGANA bit — so it is
        # its own (script-change-broken) word, not an include-break char
        assert alnum_words("あ゙") == ["あ", "゙"]

    def test_combining_mark_run_after_split_stays_together(self):
        # after the inherited-script break, consecutive marks share the
        # Inherited script and accumulate into ONE word with following
        # ascii (ascii fast path never script-breaks)
        assert alnum_words("é̂s") == ["e", "́̂s"]


class TestPresentationForms:
    """Presentation-form blocks (VERDICT r2 item 8).  Every expectation
    was probed against the reference's COMPILED scripts.dat
    (UCPropTable::deserialize layout, valueSize=1 tableBits=10):
    U+FB01→Latin(30), U+FB14→Armenian(2), U+FB2A→Hebrew(22),
    U+FB50/U+FEDB/U+FEFC→Arabic(1), U+FD3E/U+FEFF→Common(0)."""

    def test_arabic_presentation_joins_standard(self):
        # standard kaf U+0643 + final-form kaf U+FEDA: same script in
        # scripts.dat, so NO break (a COMMON fallback would split here)
        assert alnum_words("كﻚ") == ["كﻚ"]
        assert alnum_words("ﻚك") == ["ﻚك"]

    def test_arabic_presentation_word_stays_whole(self):
        # fully shaped word, Pres-B forms: one token
        w = "ﻛﺘﺎﺏ"
        assert alnum_words(w) == [w]

    def test_arabic_presentation_script_change_breaks(self):
        # Arabic pres form then Greek: script change still splits
        assert alnum_words("ﺏγ") == ["ﺏ", "γ"]

    def test_arabic_presentation_start_of_text_quirk(self):
        # a doc starting with a non-Latin-script word emits the
        # zero-length quirk word (Words.cpp:341-356) — pres forms are
        # Arabic, so the quirk fires exactly like for U+0643
        toks = [t for t in segment("ﻛ") if t.kind == "alnum"]
        assert [t.text for t in toks] == ["", "ﻛ"]

    def test_hebrew_presentation_joins_standard(self):
        # U+FB2A (shin with shin dot) is Hebrew in scripts.dat
        assert alnum_words("שׁא") == ["שׁא"]

    def test_latin_ligature_joins_ascii(self):
        # U+FB01 'fi' is Latin → treated as common, joins ascii
        assert alnum_words("ﬁsh") == ["ﬁsh"]

    def test_armenian_ligature_joins_standard(self):
        # U+FB14 Armenian men-yech ligature + U+0561 ayb: one word
        assert alnum_words("ﬔա") == ["ﬔա"]


class TestTags:
    def test_tag_tokens(self):
        toks = segment("<p>hi <b>x</b></p>", has_tags=True)
        assert [(t.kind, t.tag) for t in toks if t.kind == "tag"] == \
            [("tag", "p"), ("tag", "b"), ("tag", "/b"), ("tag", "/p")]
        assert alnum_words("<p>hi <b>x</b></p>", has_tags=True) == \
            ["hi", "x"]

    def test_not_a_tag_without_flag(self):
        assert alnum_words("<p>hi</p>", has_tags=False) == ["p", "hi", "p"]

    def test_lt_in_text_is_punct(self):
        # "< 5" is not a tag start — stays punct
        assert alnum_words("a < 5", has_tags=True) == ["a", "5"]

    def test_is_tag_start_forms(self):
        for s in ("<p>", "</p>", "</>", "<?xml", "<!--c-->", "<![CDATA[",
                  "<!DOCTYPE"):
            assert is_tag_start(s, 0), s
        for s in ("< p", "<3", "<-", "<'a'"):
            assert not is_tag_start(s, 0), s

    def test_tag_len_quoted_gt(self):
        # '>' inside a quoted attribute value doesn't close the tag
        s = '<a href="x>y">link'
        assert tag_len(s, 0) == len('<a href="x>y">')

    def test_tag_len_unquoted_attr_quote(self):
        # a quote NOT preceded by '=' doesn't open a string
        s = "<a b\"c>rest"
        assert tag_len(s, 0) == len('<a b"c>')

    def test_tag_len_unbalanced_recovery(self):
        # '">' with a dangling open quote: the "> recovery rule
        s = '<a href="x">'
        assert tag_len(s, 0) == len(s)


class TestWordIds:
    def test_lower_hash_matches_hash64b_of_lowered(self):
        # for ascii, hash64Lower == hash64b of the lowered bytes
        assert hash64_lower_utf8("HeLLo") == hash64b("hello")
        assert hash64_lower_utf8("hello") == hash64b("hello")

    def test_case_insensitive(self):
        assert hash64_lower_utf8("FOO") == hash64_lower_utf8("foo")
        assert hash64_lower_utf8("foo") != hash64_lower_utf8("bar")

    def test_word_ids_batch(self):
        ws = ["The", "the", "Café"]
        ids = word_ids(ws)
        assert ids[0] == ids[1]
        assert ids[2] == hash64_lower_utf8("café")


class TestBatch:
    def test_words_batch_series(self):
        import pandas as pd
        out = words_batch(pd.Series(["a,b", None, "we're 1,000"]))
        assert list(out) == [["a", "b"], [], ["we're", "1,000"]]


class TestRefTokenPostings:
    def test_build_postings_ref_tokens(self, spark):
        from open_source_search_engine_spark.search.postings import (
            build_postings_ref_tokens,
        )
        docs = spark.createDataFrame(
            [(1, "<p>Java++ wins, Java++ LOSES</p>"),
             (2, "we're 1,000 strong")],
            "doc_id long, text string")
        rows = {(r.term, r.doc_id): (r.tf, r.positions)
                for r in build_postings_ref_tokens(docs).collect()}
        # tags dropped, suffix kept, lowercased, positions = word index
        assert rows[("java++", 1)] == (2, [0, 2])
        assert rows[("wins", 1)] == (1, [1])
        assert rows[("loses", 1)] == (1, [3])
        assert rows[("we're", 2)] == (1, [0])
        assert rows[("1,000", 2)] == (1, [1])
        assert ("p", 1) not in rows
