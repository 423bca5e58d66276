"""Adult-content scoring (AdultCheck.cpp analogue) — the signal behind
the family filter's CR_DIRTY result level (Msg51.cpp:511) and the
crawl's isadult classification.

Reference shape (``AdultCheck.cpp:498`` getAdultPoints): a needle table
of substrings, each carrying a weight — +2 for unambiguous terms, +1
for borderline ones, negative for known-clean phrases that would
otherwise false-positive ("the id is positive for dirty words, - for
clean ... +2/-2 for really dirty, +1/-1 for borderline").  A document
scores the SUM OF WEIGHTS OF MATCHED NEEDLES — each needle counts once
no matter how often it occurs (``m_count <= 0 continue; points +=
m_id``) — and is adult when the total crosses the caller's threshold.

Spark shape: one Catalyst projection summing ``CASE WHEN instr(lower
(text), needle) > 0 THEN weight`` per needle — whole-stage-codegen'd,
zero UDFs, zero shuffles; the needle table is a plain broadcast-free
literal list.  The default list here is a deliberately small
structural stand-in (the mechanism, weights, and once-per-needle
semantics are the reference's; its full 400-entry term table is data,
not logic) — production callers pass their own vetted list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (needle, weight) — substring match, case-insensitive, like the
# reference's Needle entries {"smut", 0, 2, ...}.  Negative-weight
# entries offset known-clean phrases containing a dirty needle, the
# reference's clean-word subtraction.
DEFAULT_NEEDLES: tuple[tuple[str, int], ...] = (
    ("porn", 2),
    ("xxx", 2),
    ("smut", 2),
    ("erotic", 2),
    ("escort", 1),
    ("nude", 1),
    ("adult", 1),
    ("sex", 1),
    ("adultery", -1),       # clean-word offset: not the genre
    ("sussex", -1),         # ...matches 'sex' inside a place name
    ("essex", -1),
    ("middlesex", -1),
)

ADULT_THRESHOLD = 2         # XmlDoc.cpp:3142: total >= 2 -> m_isAdult


def adult_points_col(text: Column | str,
                     needles: tuple[tuple[str, int], ...] = DEFAULT_NEEDLES
                     ) -> Column:
    """Sum of weights of needles present in the text (each once)."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    total = F.lit(0)
    for needle, weight in needles:
        total = total + F.when(t.contains(needle),
                               F.lit(weight)).otherwise(F.lit(0))
    return total.cast("int")


def is_adult_col(text: Column | str,
                 needles: tuple[tuple[str, int], ...] = DEFAULT_NEEDLES,
                 threshold: int = ADULT_THRESHOLD) -> Column:
    """The family-filter bit (Clusterdb adult bit; Msg51 CR_DIRTY)."""
    return adult_points_col(text, needles) >= threshold


def adult_points(text: str,
                 needles: tuple[tuple[str, int], ...] = DEFAULT_NEEDLES
                 ) -> int:
    """Python twin for tests/oracles."""
    low = (text or "").lower()
    return sum(w for n, w in needles if n in low)
