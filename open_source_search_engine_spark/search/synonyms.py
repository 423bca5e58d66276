"""Query-side synonym expansion (Synonyms.cpp / Conf::m_synonymWeight).

The reference expands each query word into alternate forms two ways:

1. **Dictionary synsets** — Wiktionary-backed lookups
   (`Synonyms.cpp:186` ``g_wiktionary.getSynSet``).  The wiktionary data
   itself is an external corpus the reference ships as a blob; here the
   synset source is a caller-provided mapping (term -> synonyms), which a
   deployment derives from any public thesaurus.  The lookup also retries
   with a trailing ``'s`` stripped (`Synonyms.cpp:187-194`).
2. **Generated forms** — computed from the word itself with no
   dictionary: the accent-stripped variant (`Synonyms.cpp:505-545`
   ``addStripped``: only when the word contains non-ASCII and the
   stripped form differs) and the apostrophe-s strip
   (`Synonyms.cpp:398-403` ``addWithoutApostrophe``: ``bob's`` -> ``bob``).
   The ``D & B`` -> ``d and b`` bigram form (``addAmpPhrase``,
   `Synonyms.cpp:447-519`) applies to three-token phrases and is handled
   at parse level, not per-word.

At scoring time a synonym termlist carries the synonym flag
(`Posdb.h:25` key bit, ``MAXISSYNONYM``) and scores at **synonym weight
0.9** relative to the original word (`Parms.cpp:4369-4374`,
``Conf::m_synonymWeight`` default "0.900000").  Score parts here are
integer-exact: a base-term hit contributes ``tf*10``; a synonym hit
``tf*9`` (0.9 * 10, exact in integers).  A doc matching several forms of
one query word scores the BEST form, like the reference keeps the best
position run per term group, so expansion never double-counts.

Spark shape: each variant is one more filter on the same postings scan
(`term IN (forms)`), then a single groupBy(doc_id) max — no extra
shuffle beyond the term-group aggregate; the synset map rides inside the
plan as a literal (query terms are few), never a driver loop per doc.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# integer-exact weights: base = 10/10, synonym = 9/10
# (Conf::m_synonymWeight default 0.9, Parms.cpp:4369-4374)
BASE_WEIGHT = 10
SYN_WEIGHT = 9


def strip_accents(word: str) -> str | None:
    """Accent-stripped variant (Synonyms.cpp:505-545 addStripped).

    Returns None unless the word contains a non-ASCII char (``hadUtf8``
    gate, Synonyms.cpp:509-517) AND the stripped form differs."""
    if word.isascii():
        return None
    out = "".join(c for c in unicodedata.normalize("NFD", word)
                  if not unicodedata.combining(c))
    out = unicodedata.normalize("NFC", out)
    if not out or out == word:
        return None
    return out


def strip_apostrophe_s(word: str) -> str | None:
    """``bob's`` -> ``bob`` (Synonyms.cpp:398-403, wlen>=3 gate)."""
    if len(word) >= 3 and word.endswith(("'s", "’s")):
        return word[:-2]
    return None


def generated_forms(word: str) -> list[str]:
    """Dictionary-free alternate forms, in reference emit order."""
    out = []
    s = strip_accents(word)
    if s is not None:
        out.append(s)
    a = strip_apostrophe_s(word)
    if a is not None:
        out.append(a)
    return out


def expand_term(word: str,
                synsets: dict[str, tuple[str, ...]] | None = None
                ) -> list[tuple[str, int]]:
    """One query word -> [(form, integer weight)] with the base first.

    Synset lookup retries with 's stripped like the reference
    (Synonyms.cpp:187-194); generated forms are always added; dups keep
    their first (highest) weight."""
    seen = {word: BASE_WEIGHT}
    order = [word]

    def add(form: str):
        if form and form not in seen:
            seen[form] = SYN_WEIGHT
            order.append(form)

    if synsets:
        for f in synsets.get(word, ()):
            add(f)
        base = strip_apostrophe_s(word)
        if base is not None and word not in synsets:
            for f in synsets.get(base, ()):
                add(f)
    for f in generated_forms(word):
        add(f)
    return [(f, seen[f]) for f in order]


def synonym_term_docs(postings: DataFrame, word: str,
                      synsets: dict[str, tuple[str, ...]] | None = None
                      ) -> DataFrame:
    """Termlist for one query word with synonym expansion:
    (doc_id, score_part) where score_part = max over matched forms of
    tf * weight (10 base / 9 synonym).  One scan, one aggregate."""
    forms = expand_term(word, synsets)
    w = F.lit(forms[0][1])
    for form, wt in forms[1:]:
        w = F.when(F.col("term") == form, F.lit(wt)).otherwise(w)
    return (postings
            .filter(F.col("term").isin([f for f, _ in forms]))
            .select("doc_id", (F.col("tf") * w).alias("_sp"))
            .groupBy("doc_id")
            .agg(F.max("_sp").alias("score_part")))
