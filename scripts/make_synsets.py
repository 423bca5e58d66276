#!/usr/bin/env python
"""Build the dictionary-synset fixture parquet.

The reference ships a Wiktionary-derived synset blob
(Wiktionary.cpp:1-2051, loaded from wiktionary-buf.txt) that
Synonyms.cpp:186 queries per word.  That blob is an external corpus; this
repo's equivalent is a small hand-authored table of common English
synonym groups (general-knowledge thesaurus pairs, no external dataset)
with the same access pattern: headword -> ordered alternate forms.

Schema (flat, one row per (term, alt)):
    term : string   headword, lowercase
    alt  : string   alternate form, lowercase
    rank : int32    position within the headword's synset (emit order)

Round 4 grows the fixture from the ~230-headword hand-authored core to a
few-thousand-entry set the way the reference's blob actually gets its
bulk: a Wiktionary dump carries the *inflected wordforms* beside every
lemma (merge/merges/merged/merging), and Gigablast's synset lookup
returns those forms as 0.9-weight alternates just like thesaurus
synonyms.  We close each hand-authored synset over deterministic regular
English morphology (-s/-es, -ed, -ing with standard orthography) plus an
irregular-forms override table for the lemmas we ship, and add the
REVERSE wordform headwords (``merging`` -> merge + its synset) so a
query on an inflected form reaches the lemma's synset exactly like
``g_wiktionary.getSynSet`` does.  Hand-authored alternates always come
first in rank order, so the round-3 synset prefixes are unchanged.

Regenerate with:  python scripts/make_synsets.py
Output:           fixtures/synsets/synsets.parquet
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

# Hand-authored common-English synsets.  Each entry: headword -> ordered
# alternates.  The first block covers the synthetic corpus vocabulary
# (the words that appear in testdata documents.text) so catalog queries
# exercise real dictionary hits; the rest is a general-English tail so
# the lookup table has realistic size and miss behavior.
SYNSETS: dict[str, tuple[str, ...]] = {
    # --- corpus-vocabulary headwords -----------------------------------
    "merge": ("join", "combine", "unite", "fuse", "meld"),
    "join": ("merge", "connect", "unite", "link"),
    "sort": ("order", "arrange", "classify", "categorize"),
    "order": ("sort", "arrange", "sequence", "command"),
    "fast": ("quick", "rapid", "swift", "speedy"),
    "slow": ("sluggish", "unhurried", "gradual", "leisurely"),
    "big": ("large", "huge", "vast", "immense"),
    "small": ("little", "tiny", "minute", "compact"),
    "line": ("row", "queue", "string"),
    "row": ("line", "rank", "tier"),
    "scan": ("sweep", "survey", "examine", "inspect"),
    "filter": ("sieve", "screen", "strain"),
    "stream": ("flow", "current", "brook", "creek"),
    "group": ("cluster", "bunch", "set", "collection"),
    "part": ("piece", "portion", "segment", "section"),
    "batch": ("lot", "bunch", "set"),
    "value": ("worth", "amount", "merit"),
    "key": ("crucial", "essential", "central", "pivotal"),
    "query": ("question", "inquiry", "request"),
    "data": ("information", "facts", "figures"),
    "table": ("chart", "grid", "tabulation"),
    "window": ("pane", "opening", "casement"),
    "hash": ("jumble", "muddle", "mishmash"),
    "column": ("pillar", "post", "shaft"),
    "vector": ("direction", "course", "bearing"),
    "customer": ("client", "patron", "buyer", "shopper"),
    "dup": ("duplicate", "copy"),
    # --- general-English tail ------------------------------------------
    "begin": ("start", "commence", "initiate"),
    "start": ("begin", "commence", "launch"),
    "end": ("finish", "conclude", "terminate"),
    "finish": ("end", "complete", "conclude"),
    "stop": ("halt", "cease", "quit"),
    "happy": ("glad", "joyful", "cheerful", "content"),
    "sad": ("unhappy", "sorrowful", "dejected", "gloomy"),
    "angry": ("mad", "furious", "irate", "enraged"),
    "calm": ("tranquil", "serene", "placid", "composed"),
    "smart": ("clever", "intelligent", "bright", "sharp"),
    "stupid": ("foolish", "dumb", "dim", "obtuse"),
    "brave": ("courageous", "bold", "valiant", "fearless"),
    "afraid": ("scared", "frightened", "fearful"),
    "strong": ("powerful", "sturdy", "robust", "mighty"),
    "weak": ("feeble", "frail", "flimsy"),
    "rich": ("wealthy", "affluent", "prosperous"),
    "poor": ("impoverished", "destitute", "needy"),
    "new": ("fresh", "novel", "recent", "modern"),
    "old": ("aged", "ancient", "elderly", "antique"),
    "young": ("youthful", "juvenile", "adolescent"),
    "good": ("fine", "excellent", "superb", "decent"),
    "bad": ("poor", "awful", "terrible", "dreadful"),
    "beautiful": ("pretty", "lovely", "gorgeous", "attractive"),
    "ugly": ("hideous", "unsightly", "unattractive"),
    "clean": ("spotless", "tidy", "immaculate"),
    "dirty": ("filthy", "grimy", "soiled", "unclean"),
    "easy": ("simple", "effortless", "straightforward"),
    "hard": ("difficult", "tough", "arduous", "firm"),
    "difficult": ("hard", "tough", "challenging"),
    "simple": ("easy", "plain", "uncomplicated"),
    "important": ("significant", "crucial", "vital", "essential"),
    "trivial": ("minor", "petty", "insignificant"),
    "true": ("correct", "accurate", "genuine"),
    "false": ("untrue", "incorrect", "bogus"),
    "real": ("actual", "genuine", "authentic"),
    "fake": ("counterfeit", "phony", "sham"),
    "whole": ("entire", "complete", "total"),
    "empty": ("vacant", "hollow", "bare"),
    "full": ("filled", "complete", "replete"),
    "open": ("ajar", "unlocked", "accessible"),
    "close": ("shut", "seal", "near"),
    "near": ("close", "nearby", "adjacent"),
    "far": ("distant", "remote", "faraway"),
    "high": ("tall", "lofty", "elevated"),
    "low": ("short", "shallow", "reduced"),
    "wide": ("broad", "expansive", "vast"),
    "narrow": ("slim", "thin", "tight"),
    "thick": ("dense", "heavy", "broad"),
    "thin": ("slender", "slim", "lean", "sparse"),
    "hot": ("warm", "scorching", "heated"),
    "cold": ("chilly", "frigid", "icy", "cool"),
    "wet": ("damp", "moist", "soaked"),
    "dry": ("arid", "parched", "dehydrated"),
    "bright": ("brilliant", "radiant", "luminous"),
    "dark": ("dim", "gloomy", "murky", "shadowy"),
    "loud": ("noisy", "deafening", "thunderous"),
    "quiet": ("silent", "hushed", "still"),
    "make": ("create", "build", "construct", "produce"),
    "build": ("construct", "erect", "assemble"),
    "break": ("shatter", "fracture", "smash", "crack"),
    "fix": ("repair", "mend", "patch"),
    "destroy": ("demolish", "ruin", "wreck", "raze"),
    "create": ("make", "produce", "generate", "form"),
    "change": ("alter", "modify", "transform", "vary"),
    "move": ("shift", "relocate", "transfer"),
    "turn": ("rotate", "spin", "twist", "pivot"),
    "pull": ("tug", "drag", "haul", "yank"),
    "push": ("shove", "press", "thrust"),
    "throw": ("toss", "hurl", "fling", "pitch"),
    "catch": ("grab", "seize", "capture", "snag"),
    "hold": ("grasp", "grip", "clutch", "retain"),
    "drop": ("release", "discard", "fall"),
    "lift": ("raise", "hoist", "elevate"),
    "carry": ("haul", "transport", "convey", "bear"),
    "send": ("dispatch", "transmit", "forward", "ship"),
    "receive": ("get", "obtain", "accept"),
    "give": ("donate", "grant", "provide", "offer"),
    "take": ("grab", "seize", "accept", "acquire"),
    "get": ("obtain", "acquire", "receive", "fetch"),
    "keep": ("retain", "hold", "preserve", "maintain"),
    "lose": ("misplace", "forfeit", "drop"),
    "find": ("locate", "discover", "uncover", "detect"),
    "search": ("seek", "hunt", "look", "probe"),
    "look": ("glance", "gaze", "peer", "watch"),
    "see": ("view", "observe", "notice", "spot"),
    "watch": ("observe", "view", "monitor"),
    "hear": ("listen", "perceive", "overhear"),
    "say": ("state", "speak", "utter", "declare"),
    "speak": ("talk", "converse", "utter"),
    "talk": ("speak", "chat", "converse", "discuss"),
    "tell": ("inform", "notify", "relate", "recount"),
    "ask": ("inquire", "question", "request", "query"),
    "answer": ("reply", "respond", "retort"),
    "show": ("display", "exhibit", "reveal", "demonstrate"),
    "hide": ("conceal", "cover", "mask", "obscure"),
    "help": ("assist", "aid", "support"),
    "hurt": ("harm", "injure", "wound", "damage"),
    "walk": ("stroll", "march", "stride", "amble"),
    "run": ("sprint", "dash", "jog", "race"),
    "jump": ("leap", "hop", "bound", "spring"),
    "fall": ("drop", "tumble", "plunge", "collapse"),
    "rise": ("ascend", "climb", "increase"),
    "grow": ("expand", "increase", "develop", "enlarge"),
    "shrink": ("contract", "diminish", "dwindle"),
    "increase": ("grow", "expand", "augment", "raise"),
    "decrease": ("decline", "diminish", "reduce", "lessen"),
    "buy": ("purchase", "acquire", "procure"),
    "sell": ("vend", "market", "trade", "peddle"),
    "pay": ("compensate", "remit", "settle"),
    "cost": ("price", "charge", "expense"),
    "work": ("labor", "toil", "function", "operate"),
    "rest": ("relax", "repose", "pause"),
    "sleep": ("slumber", "doze", "nap", "snooze"),
    "wake": ("awaken", "rouse", "stir"),
    "eat": ("consume", "devour", "dine", "ingest"),
    "drink": ("sip", "gulp", "imbibe", "swallow"),
    "cook": ("prepare", "bake", "roast"),
    "cut": ("slice", "chop", "sever", "trim"),
    "think": ("ponder", "consider", "reflect", "contemplate"),
    "know": ("understand", "comprehend", "recognize"),
    "learn": ("study", "master", "absorb"),
    "teach": ("instruct", "educate", "train", "tutor"),
    "remember": ("recall", "recollect", "retain"),
    "forget": ("overlook", "neglect", "omit"),
    "choose": ("select", "pick", "elect", "opt"),
    "decide": ("determine", "resolve", "settle", "conclude"),
    "plan": ("scheme", "design", "arrange", "devise"),
    "try": ("attempt", "endeavor", "strive"),
    "win": ("triumph", "prevail", "succeed"),
    "fail": ("flop", "falter", "flounder"),
    "fight": ("battle", "combat", "brawl", "clash"),
    "argue": ("quarrel", "dispute", "debate", "bicker"),
    "agree": ("concur", "consent", "accept"),
    "refuse": ("decline", "reject", "rebuff"),
    "allow": ("permit", "let", "authorize", "sanction"),
    "forbid": ("prohibit", "ban", "bar", "outlaw"),
    "need": ("require", "want", "demand"),
    "want": ("desire", "wish", "crave", "covet"),
    "like": ("enjoy", "fancy", "relish"),
    "love": ("adore", "cherish", "treasure"),
    "hate": ("despise", "loathe", "detest", "abhor"),
    "fear": ("dread", "terror", "fright"),
    "hope": ("wish", "expect", "anticipate"),
    "believe": ("trust", "accept", "suppose"),
    "doubt": ("question", "distrust", "suspect"),
    "house": ("home", "dwelling", "residence", "abode"),
    "car": ("automobile", "vehicle", "auto"),
    "road": ("street", "avenue", "route", "path"),
    "path": ("trail", "track", "route", "way"),
    "city": ("town", "metropolis", "municipality"),
    "country": ("nation", "state", "land"),
    "world": ("earth", "globe", "planet"),
    "sea": ("ocean", "deep"),
    "mountain": ("peak", "summit", "mount"),
    "river": ("stream", "brook", "waterway"),
    "forest": ("woods", "woodland", "grove"),
    "rain": ("shower", "drizzle", "downpour"),
    "wind": ("breeze", "gust", "gale"),
    "storm": ("tempest", "squall", "gale"),
    "fire": ("blaze", "flame", "inferno"),
    "light": ("illumination", "glow", "radiance"),
    "sound": ("noise", "tone", "din"),
    "smell": ("odor", "scent", "aroma", "fragrance"),
    "taste": ("flavor", "savor", "tang"),
    "money": ("cash", "currency", "funds", "capital"),
    "job": ("work", "occupation", "employment", "position"),
    "boss": ("manager", "supervisor", "chief", "employer"),
    "friend": ("companion", "pal", "buddy", "comrade"),
    "enemy": ("foe", "adversary", "opponent", "rival"),
    "child": ("kid", "youngster", "youth", "minor"),
    "man": ("gentleman", "fellow", "male"),
    "woman": ("lady", "female", "gentlewoman"),
    "doctor": ("physician", "medic", "clinician"),
    "teacher": ("instructor", "educator", "tutor"),
    "student": ("pupil", "learner", "scholar"),
    "book": ("volume", "tome", "publication"),
    "story": ("tale", "narrative", "account", "yarn"),
    "picture": ("image", "photo", "illustration"),
    "song": ("tune", "melody", "ballad"),
    "gift": ("present", "donation", "offering"),
    "mistake": ("error", "blunder", "fault", "slip"),
    "problem": ("issue", "trouble", "difficulty", "dilemma"),
    "idea": ("notion", "concept", "thought"),
    "reason": ("cause", "motive", "grounds", "rationale"),
    "result": ("outcome", "consequence", "effect", "upshot"),
    "goal": ("aim", "objective", "target", "purpose"),
    "chance": ("opportunity", "possibility", "likelihood"),
    "danger": ("peril", "hazard", "risk", "threat"),
    "safety": ("security", "protection", "refuge"),
    "truth": ("fact", "reality", "veracity"),
    "lie": ("falsehood", "fib", "untruth", "fabrication"),
    "beauty": ("loveliness", "elegance", "grace"),
    "strength": ("power", "might", "force", "vigor"),
    "speed": ("velocity", "pace", "rapidity", "swiftness"),
    "size": ("dimension", "magnitude", "bulk", "extent"),
    "shape": ("form", "figure", "contour", "outline"),
    "color": ("hue", "shade", "tint", "tone"),
    "piece": ("part", "fragment", "portion", "chunk"),
    "edge": ("border", "rim", "margin", "brink"),
    "middle": ("center", "core", "midst"),
    "top": ("peak", "summit", "apex", "crown"),
    "bottom": ("base", "foot", "underside"),
    "front": ("fore", "face", "facade"),
    "back": ("rear", "reverse", "behind"),
    "inside": ("interior", "within", "inner"),
    "outside": ("exterior", "outer", "without"),
    # a few accented headwords so dictionary + generated forms compose
    "café": ("coffeehouse", "bistro"),
    "naïve": ("innocent", "ingenuous", "unsophisticated"),
    "résumé": ("cv", "vita"),
}


# Irregular inflections for lemmas that appear in SYNSETS (head or alt).
# A real Wiktionary dump ships these per-lemma; the regular-orthography
# closure below would otherwise coin "childs"/"runned".
IRREGULAR: dict[str, tuple[str, ...]] = {
    "man": ("men",), "woman": ("women",), "child": ("children",),
    "foot": ("feet",), "tooth": ("teeth",), "mouse": ("mice",),
    "run": ("runs", "ran", "running"), "begin": ("begins", "began", "begun", "beginning"),
    "break": ("breaks", "broke", "broken", "breaking"),
    "build": ("builds", "built", "building"),
    "buy": ("buys", "bought", "buying"),
    "catch": ("catches", "caught", "catching"),
    "choose": ("chooses", "chose", "chosen", "choosing"),
    "cut": ("cuts", "cutting"), "drink": ("drinks", "drank", "drunk", "drinking"),
    "eat": ("eats", "ate", "eaten", "eating"),
    "fall": ("falls", "fell", "fallen", "falling"),
    "fight": ("fights", "fought", "fighting"),
    "find": ("finds", "found", "finding"),
    "forbid": ("forbids", "forbade", "forbidden", "forbidding"),
    "forget": ("forgets", "forgot", "forgotten", "forgetting"),
    "get": ("gets", "got", "gotten", "getting"),
    "give": ("gives", "gave", "given", "giving"),
    "grow": ("grows", "grew", "grown", "growing"),
    "hear": ("hears", "heard", "hearing"),
    "hide": ("hides", "hid", "hidden", "hiding"),
    "hold": ("holds", "held", "holding"),
    "keep": ("keeps", "kept", "keeping"),
    "know": ("knows", "knew", "known", "knowing"),
    "learn": ("learns", "learned", "learnt", "learning"),
    "lie": ("lies", "lied", "lying"),
    "lose": ("loses", "lost", "losing"),
    "make": ("makes", "made", "making"),
    "pay": ("pays", "paid", "paying"),
    "rise": ("rises", "rose", "risen", "rising"),
    "say": ("says", "said", "saying"),
    "see": ("sees", "saw", "seen", "seeing"),
    "sell": ("sells", "sold", "selling"),
    "send": ("sends", "sent", "sending"),
    "shrink": ("shrinks", "shrank", "shrunk", "shrinking"),
    "sleep": ("sleeps", "slept", "sleeping"),
    "speak": ("speaks", "spoke", "spoken", "speaking"),
    "stop": ("stops", "stopped", "stopping"),
    "take": ("takes", "took", "taken", "taking"),
    "teach": ("teaches", "taught", "teaching"),
    "tell": ("tells", "told", "telling"),
    "think": ("thinks", "thought", "thinking"),
    "throw": ("throws", "threw", "thrown", "throwing"),
    "wake": ("wakes", "woke", "woken", "waking"),
    "win": ("wins", "won", "winning"),
    "dig": ("digs", "dug", "digging"),
    "drop": ("drops", "dropped", "dropping"),
    "grab": ("grabs", "grabbed", "grabbing"),
    "jog": ("jogs", "jogged", "jogging"),
    "nap": ("naps", "napped", "napping"),
    "plan": ("plans", "planned", "planning"),
    "quit": ("quits", "quitting"),
    "ship": ("ships", "shipped", "shipping"),
    "slip": ("slips", "slipped", "slipping"),
    "spot": ("spots", "spotted", "spotting"),
    "chat": ("chats", "chatted", "chatting"),
    "stir": ("stirs", "stirred", "stirring"),
    "chop": ("chops", "chopped", "chopping"),
    "trim": ("trims", "trimmed", "trimming"),
    "tug": ("tugs", "tugged", "tugging"),
    "pat": ("pats", "patted", "patting"),
    "hop": ("hops", "hopped", "hopping"),
    "spin": ("spins", "spun", "spinning"),
    "dim": ("dims", "dimmed", "dimming"),
    "ban": ("bans", "banned", "banning"),
    "bar": ("bars", "barred", "barring"),
    "let": ("lets", "letting"),
    "fit": ("fits", "fitted", "fitting"),
    "swim": ("swims", "swam", "swum", "swimming"),
    "sit": ("sits", "sat", "sitting"),
    "set": ("sets", "setting"),
    "put": ("puts", "putting"),
    "shut": ("shuts", "shutting"),
}


def inflections(word: str) -> tuple[str, ...]:
    """Deterministic inflected forms of one lowercase lemma.

    Irregulars come from the override table; everything else follows
    regular English orthography (sibilant ``-es``, consonant-``y`` ->
    ``-ies``/``-ied``, silent-``e`` drop before ``-ing``).  Multiword or
    non-ASCII-alpha entries get no forms (same gate as the reference's
    single-word synonym path)."""
    if word in IRREGULAR:
        return IRREGULAR[word]
    if not word.isascii() or not word.isalpha() or len(word) < 3:
        return ()
    out: list[str] = []
    # -s / -es (noun plural == verb 3rd person for regulars)
    if word.endswith(("s", "x", "z", "ch", "sh")):
        out.append(word + "es")
    elif word.endswith("y") and word[-2] not in "aeiou":
        out.append(word[:-1] + "ies")
    else:
        out.append(word + "s")
    # -ed
    if word.endswith("e"):
        out.append(word + "d")
    elif word.endswith("y") and word[-2] not in "aeiou":
        out.append(word[:-1] + "ied")
    else:
        out.append(word + "ed")
    # -ing
    if word.endswith("e") and not word.endswith(("ee", "ye", "oe")):
        out.append(word[:-1] + "ing")
    else:
        out.append(word + "ing")
    return tuple(dict.fromkeys(out))


def expanded_synsets() -> dict[str, tuple[str, ...]]:
    """SYNSETS closed over morphology: hand-authored alternates keep
    their rank prefix, wordforms of the headword and of each alternate
    follow, and every wordform gains a reverse headword entry pointing
    back at its lemma + the lemma's synset (first-wins on collisions)."""
    out: dict[str, list[str]] = {}

    def add(term: str, forms) -> None:
        lst = out.setdefault(term, [])
        for f in forms:
            if f and f != term and f not in lst:
                lst.append(f)

    for head, hand in SYNSETS.items():
        add(head, hand)                       # authored prefix, in order
        add(head, inflections(head))          # lemma's own wordforms
        for alt in hand:                      # each alternate's wordforms
            add(head, inflections(alt))
    # reverse wordform headwords: merging -> merge + merge's synset
    for head, hand in SYNSETS.items():
        for form in inflections(head):
            if form in out:     # authored headword or an earlier lemma's
                continue        # wordform — never shadow; first wins
            add(form, (head,))
            add(form, (f for f in inflections(head) if f != form))
            add(form, hand)
    return {t: tuple(a) for t, a in out.items()}


def build_table() -> pa.Table:
    terms, alts, ranks = [], [], []
    for term, forms in expanded_synsets().items():
        for i, alt in enumerate(forms):
            terms.append(term)
            alts.append(alt)
            ranks.append(i)
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "alt": pa.array(alts, pa.string()),
        "rank": pa.array(ranks, pa.int32()),
    })


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "fixtures", "synsets")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "synsets.parquet")
    table = build_table()
    pq.write_table(table, out, compression="zstd")
    n_heads = len(set(table["term"].to_pylist()))
    print(f"wrote {out}: {table.num_rows} rows, {n_heads} headwords "
          f"({len(SYNSETS)} hand-authored lemmas + wordform closure)")


if __name__ == "__main__":
    main()
