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


def build_table() -> pa.Table:
    terms, alts, ranks = [], [], []
    for term, forms in SYNSETS.items():
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
    print(f"wrote {out}: {table.num_rows} rows, "
          f"{len(SYNSETS)} headwords")


if __name__ == "__main__":
    main()
