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
    # --- round-4 breadth batch: verbs ----------------------------------
    "accept": ("take", "receive", "approve"),
    "admit": ("confess", "acknowledge", "concede"),
    "announce": ("declare", "proclaim", "reveal"),
    "arrive": ("come", "appear", "reach"),
    "attack": ("assault", "strike", "raid"),
    "avoid": ("evade", "dodge", "shun"),
    "call": ("phone", "summon", "name"),
    "cancel": ("annul", "revoke", "scrap"),
    "check": ("verify", "inspect", "test"),
    "climb": ("ascend", "scale", "mount"),
    "collect": ("gather", "amass", "accumulate"),
    "compare": ("contrast", "liken", "match"),
    "connect": ("attach", "link", "couple"),
    "copy": ("duplicate", "imitate", "replicate"),
    "count": ("tally", "number", "enumerate"),
    "cover": ("wrap", "shield", "conceal"),
    "defend": ("protect", "guard", "shield"),
    "deliver": ("convey", "distribute", "hand"),
    "demand": ("insist", "require", "claim"),
    "describe": ("depict", "portray", "characterize"),
    "divide": ("split", "separate", "partition"),
    "examine": ("inspect", "scrutinize", "review"),
    "expect": ("anticipate", "await", "foresee"),
    "explain": ("clarify", "describe", "illustrate"),
    "follow": ("pursue", "trail", "succeed"),
    "gather": ("collect", "assemble", "convene"),
    "guess": ("estimate", "surmise", "suppose"),
    "improve": ("enhance", "better", "upgrade"),
    "invite": ("summon", "request", "welcome"),
    "judge": ("assess", "evaluate", "appraise"),
    "lead": ("guide", "direct", "steer"),
    "lend": ("loan", "advance"),
    "manage": ("handle", "direct", "administer"),
    "measure": ("gauge", "quantify", "assess"),
    "mention": ("note", "cite", "remark"),
    "notice": ("observe", "perceive", "note"),
    "obtain": ("acquire", "secure", "procure"),
    "offer": ("propose", "present", "tender"),
    "own": ("possess", "hold", "have"),
    "perform": ("execute", "conduct", "accomplish"),
    "persuade": ("convince", "coax", "sway"),
    "praise": ("commend", "applaud", "laud"),
    "prevent": ("avert", "thwart", "hinder"),
    "promise": ("pledge", "vow", "swear"),
    "protect": ("shield", "guard", "defend"),
    "prove": ("demonstrate", "verify", "confirm"),
    "provide": ("supply", "furnish", "deliver"),
    "raise": ("lift", "elevate", "boost"),
    "reach": ("attain", "achieve", "arrive"),
    "reduce": ("lessen", "decrease", "curtail"),
    "remove": ("delete", "eliminate", "extract"),
    "repair": ("fix", "mend", "restore"),
    "repeat": ("reiterate", "echo", "recur"),
    "replace": ("substitute", "supplant", "swap"),
    "reply": ("respond", "answer", "retort"),
    "report": ("announce", "relate", "recount"),
    "return": ("revert", "restore", "recur"),
    "save": ("rescue", "preserve", "conserve"),
    "share": ("divide", "apportion", "split"),
    "shout": ("yell", "scream", "bellow"),
    "solve": ("resolve", "unravel", "crack"),
    "spend": ("expend", "disburse"),
    "spread": ("scatter", "disperse", "strew"),
    "steal": ("pilfer", "swipe", "thieve"),
    "suggest": ("propose", "recommend", "advise"),
    "supply": ("provide", "furnish", "stock"),
    "travel": ("journey", "roam", "voyage"),
    "visit": ("call", "attend", "frequent"),
    "wait": ("linger", "remain", "pause"),
    "warn": ("caution", "alert", "advise"),
    "wash": ("cleanse", "rinse", "scrub"),
    "wear": ("don", "sport"),
    "write": ("compose", "draft", "record"),
    # --- round-4 breadth batch: nouns ----------------------------------
    "animal": ("beast", "creature"),
    "boat": ("ship", "vessel", "craft"),
    "box": ("container", "crate", "carton"),
    "bridge": ("span", "overpass"),
    "building": ("structure", "edifice"),
    "clothes": ("garments", "attire", "apparel"),
    "coast": ("shore", "seaboard"),
    "corner": ("angle", "nook"),
    "crowd": ("throng", "mob", "multitude"),
    "door": ("entrance", "gateway", "portal"),
    "dream": ("vision", "fantasy", "reverie"),
    "earth": ("soil", "ground", "dirt"),
    "face": ("visage", "countenance"),
    "farm": ("ranch", "homestead"),
    "field": ("meadow", "pasture"),
    "food": ("fare", "nourishment", "sustenance"),
    "game": ("match", "contest", "sport"),
    "hill": ("mound", "knoll", "rise"),
    "hole": ("gap", "cavity", "opening"),
    "island": ("isle", "islet"),
    "king": ("monarch", "ruler", "sovereign"),
    "lake": ("pond", "lagoon"),
    "land": ("terrain", "territory", "ground"),
    "leader": ("chief", "head", "commander"),
    "letter": ("note", "missive", "epistle"),
    "map": ("chart", "plan"),
    "meal": ("repast", "feast"),
    "meeting": ("assembly", "gathering", "conference"),
    "noise": ("sound", "racket", "clamor"),
    "ocean": ("sea", "deep"),
    "pain": ("ache", "agony", "discomfort"),
    "paper": ("document", "sheet"),
    "party": ("celebration", "gathering", "festivity"),
    "peace": ("calm", "tranquility", "harmony"),
    "person": ("individual", "human", "being"),
    "place": ("location", "spot", "site"),
    "power": ("energy", "force", "might"),
    "price": ("cost", "charge", "fee"),
    "prize": ("award", "trophy", "reward"),
    "question": ("query", "inquiry"),
    "roof": ("top", "covering"),
    "room": ("chamber", "space"),
    "rule": ("regulation", "law", "principle"),
    "school": ("academy", "institute"),
    "shop": ("store", "boutique", "market"),
    "sky": ("heavens", "firmament"),
    "stone": ("rock", "pebble", "boulder"),
    "street": ("road", "avenue", "boulevard"),
    "task": ("chore", "duty", "assignment"),
    "team": ("squad", "crew", "group"),
    "time": ("era", "epoch", "period"),
    "tool": ("instrument", "implement", "utensil"),
    "trip": ("journey", "voyage", "excursion"),
    "village": ("hamlet", "settlement"),
    "wall": ("barrier", "partition"),
    "war": ("conflict", "combat", "warfare"),
    "wave": ("ripple", "surge", "swell"),
    "winner": ("victor", "champion"),
    "worker": ("laborer", "employee"),
    # a few accented headwords so dictionary + generated forms compose
    "café": ("coffeehouse", "bistro"),
    "naïve": ("innocent", "ingenuous", "unsophisticated"),
    "résumé": ("cv", "vita"),
}


# Part of speech per SYNSETS headword.  A synset's alternates share its
# POS (that is what makes them substitutable), so one tag per headword
# covers the whole group.  Morphology is POS-gated: verbs take the full
# -s/-ed/-ing paradigm, nouns take the plural only, adjectives take
# -er/-est only where English gradation is regular (monosyllables,
# consonant-y and -ow disyllables; longer adjectives grade
# periphrastically with more/most, which is not a wordform) — exactly
# how a Wiktionary dump ships forms per (lemma, POS) entry.
_VERB_HEADS = (
    "merge join sort order scan filter begin start end finish stop "
    "make build break fix destroy create change move turn pull push "
    "throw catch hold drop lift carry send receive give take get keep "
    "lose find search look see watch hear say speak talk tell ask "
    "answer show hide help hurt walk run jump fall rise grow shrink "
    "increase decrease buy sell pay work rest sleep wake eat drink "
    "cook cut think know learn teach remember forget choose decide "
    "plan try win fail fight argue agree refuse allow forbid need "
    "want like love hate hope believe doubt close "
    "accept admit announce arrive attack avoid call cancel check climb "
    "collect compare connect copy count cover defend deliver demand "
    "describe divide examine expect explain follow gather guess improve "
    "invite judge lead lend manage measure mention notice obtain offer "
    "own perform persuade praise prevent promise protect prove provide "
    "raise reach reduce remove repair repeat replace reply report "
    "return save share shout solve spend spread steal suggest supply "
    "travel visit wait warn wash wear write")
_ADJ_HEADS = (
    "fast slow big small key happy sad angry calm smart stupid brave "
    "afraid strong weak rich poor new old young good bad beautiful "
    "ugly clean dirty easy hard difficult simple important trivial "
    "true false real fake whole empty full open near far high "
    "low wide narrow thick thin hot cold wet dry bright dark loud "
    "quiet inside outside naïve")
POS: dict[str, str] = (
    {h: "v" for h in _VERB_HEADS.split()}
    | {h: "adj" for h in _ADJ_HEADS.split()})
# every other headword is a noun
POS |= {h: "n" for h in SYNSETS if h not in POS}

# Adjective gradation.  English -er/-est is regular ONLY for
# monosyllables, consonant-y disyllables (happy -> happier), -ow/-le
# disyllables (narrow, simple) and a couple of lexical stragglers
# (quiet); everything longer takes periphrastic more/most, which is not
# a wordform.  Non-gradable adjectives (key, inside) coin nothing.
ADJ_IRREGULAR: dict[str, tuple[str, ...]] = {
    "good": ("better", "best"),
    "bad": ("worse", "worst"),
    "far": ("farther", "further", "farthest", "furthest"),
}
# Gradable but only periphrastically, or not gradable at all.
ADJ_NO_GRADE = frozenset(
    "key afraid inside outside naïve beautiful difficult important "
    "trivial stupid open real fake false whole content sham nearby "
    "still vast moist".split())
# Words that do take -er/-est despite failing the shape rules.
ADJ_GRADE_ALLOW = frozenset("lovely".split())

# Mass / plurale-tantum nouns: no generated plural ("informations",
# "fundses" are not words).
NO_FORMS = frozenset(
    "data information facts figures funds cash money currency grounds "
    "woods clothes garments attire apparel nourishment sustenance "
    "peace harmony tranquility heavens firmament soil dirt terrain "
    "warfare might deep".split())

# Noun irregular plurals (the only IRREGULAR entries a noun context may
# use; the verb entries below would otherwise attach e.g. "setting" to
# the noun synset of "set").
NOUN_IRREGULAR: dict[str, tuple[str, ...]] = {
    "man": ("men",), "woman": ("women",), "child": ("children",),
    "foot": ("feet",), "tooth": ("teeth",), "mouse": ("mice",),
    "person": ("people",),
    # velar -ch (/k/): plain -s, not the sibilant -es the rule coins
    "monarch": ("monarchs",), "epoch": ("epochs",),
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
    # final-stress doubling (the one-vowel-group heuristic below can't
    # see stress, so multi-syllable doubled verbs are listed)
    "permit": ("permits", "permitted", "permitting"),
    "omit": ("omits", "omitted", "omitting"),
    "transmit": ("transmits", "transmitted", "transmitting"),
    "remit": ("remits", "remitted", "remitting"),
    "transfer": ("transfers", "transferred", "transferring"),
    "abhor": ("abhors", "abhorred", "abhorring"),
    "concur": ("concurs", "concurred", "concurring"),
    # round-4 breadth-batch irregular verbs
    "admit": ("admits", "admitted", "admitting"),
    "come": ("comes", "came", "coming"),
    "strike": ("strikes", "struck", "striking"),
    "split": ("splits", "splitting"),
    "foresee": ("foresees", "foresaw", "foreseen", "foreseeing"),
    "lead": ("leads", "led", "leading"),
    "lend": ("lends", "lent", "lending"),
    "have": ("has", "had", "having"),
    "swear": ("swears", "swore", "sworn", "swearing"),
    "prove": ("proves", "proved", "proven", "proving"),
    "recur": ("recurs", "recurred", "recurring"),
    "spend": ("spends", "spent", "spending"),
    "spread": ("spreads", "spreading"),
    "strew": ("strews", "strewed", "strewn", "strewing"),
    "steal": ("steals", "stole", "stolen", "stealing"),
    "wear": ("wears", "wore", "worn", "wearing"),
    "write": ("writes", "wrote", "written", "writing"),
    "echo": ("echoes", "echoed", "echoing"),
    "annul": ("annuls", "annulled", "annulling"),
    # irregular pasts that only occur as alternates
    "bear": ("bears", "bore", "borne", "bearing"),
    "seek": ("seeks", "sought", "seeking"),
    "sweep": ("sweeps", "swept", "sweeping"),
    "strive": ("strives", "strove", "striven", "striving"),
    "fling": ("flings", "flung", "flinging"),
    "stride": ("strides", "strode", "striding"),
    "spring": ("springs", "sprang", "sprung", "springing"),
    "overhear": ("overhears", "overheard", "overhearing"),
    "understand": ("understands", "understood", "understanding"),
}


_VOWELS = "aeiou"


def _s_form(word: str) -> str:
    """Regular -s form (noun plural == verb 3rd person)."""
    if word.endswith(("s", "x", "z", "ch", "sh")):
        return word + "es"
    if word.endswith("y") and word[-2] not in _VOWELS:
        return word[:-1] + "ies"
    return word + "s"


def _vowel_groups(word: str) -> int:
    """Count runs of vowel letters (orthographic syllable proxy)."""
    groups = 0
    prev_vowel = False
    for ch in word:
        is_vowel = ch in _VOWELS
        if is_vowel and not prev_vowel:
            groups += 1
        prev_vowel = is_vowel
    return groups


def _one_vowel_group(word: str) -> bool:
    """Orthographic monosyllable test: exactly one run of vowel letters."""
    return _vowel_groups(word) == 1


def _doubles_final(word: str) -> bool:
    """Monosyllabic consonant-vowel-consonant words double the final
    consonant before a vowel suffix (scan -> scanned, hot -> hotter).
    Stress is invisible to orthography, so multi-syllable doubled verbs
    (permit) ride the IRREGULAR table instead."""
    if len(word) < 3 or word[-1] in _VOWELS or word[-1] in "wxy":
        return False
    if word[-2] not in _VOWELS or word[-3] in _VOWELS:
        return False
    return _one_vowel_group(word)


def inflections(word: str, pos: str) -> tuple[str, ...]:
    """Deterministic inflected forms of one lowercase (lemma, POS).

    Verbs take the full -s/-ed/-ing paradigm; nouns the plural only;
    adjectives/adverbs coin nothing.  Irregulars come from the override
    tables (verbs: IRREGULAR; nouns: NOUN_IRREGULAR, so a verb entry
    like set->setting never attaches to the noun synset of "set").
    Everything else follows regular English orthography (sibilant
    ``-es``, consonant-``y`` -> ``-ies``/``-ied``, silent-``e`` drop
    before ``-ing``, monosyllabic CVC doubling).  Multiword or
    non-ASCII-alpha entries get no forms (same gate as the reference's
    single-word synonym path)."""
    if pos == "n":
        if word in NO_FORMS:
            return ()
        if word in NOUN_IRREGULAR:
            return NOUN_IRREGULAR[word]
        if not word.isascii() or not word.isalpha() or len(word) < 3:
            return ()
        return (_s_form(word),)
    if pos == "adj":
        if word in ADJ_IRREGULAR:
            return ADJ_IRREGULAR[word]
        if (word in ADJ_NO_GRADE or len(word) < 3
                or not word.isascii() or not word.isalpha()):
            return ()
        # -er/-est is regular only where the stem stays one syllable
        # (orthographically: one vowel-letter group before the suffix
        # slot) or for -ow disyllables (narrow/hollow/shallow).
        if word in ADJ_GRADE_ALLOW:
            gradable = True
        elif word.endswith("e"):            # wide, brave, simple, little
            gradable = _vowel_groups(word[:-1]) == 1
        elif word.endswith("y") and word[-2] not in _VOWELS:
            gradable = _vowel_groups(word[:-1]) <= 1   # happy, icy, dry
        elif word.endswith("ow"):
            gradable = _vowel_groups(word) <= 2        # low, narrow
        else:
            gradable = _one_vowel_group(word)          # fast, big, calm
        if not gradable:
            return ()
        if word.endswith("e"):
            stem = word[:-1]
        elif word.endswith("y") and word[-2] not in _VOWELS:
            stem = word[:-1] + "i"
        elif _doubles_final(word):
            stem = word + word[-1]
        else:
            stem = word
        return (stem + "er", stem + "est")
    if pos != "v":
        return ()
    if word in IRREGULAR:
        return IRREGULAR[word]
    if not word.isascii() or not word.isalpha() or len(word) < 3:
        return ()
    out: list[str] = [_s_form(word)]
    # -ed
    if word.endswith("e"):
        out.append(word + "d")
    elif word.endswith("y") and word[-2] not in _VOWELS:
        out.append(word[:-1] + "ied")
    elif _doubles_final(word):
        out.append(word + word[-1] + "ed")
    else:
        out.append(word + "ed")
    # -ing
    if word.endswith("e") and not word.endswith(("ee", "ye", "oe")):
        out.append(word[:-1] + "ing")
    elif _doubles_final(word):
        out.append(word + word[-1] + "ing")
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
        pos = POS[head]                       # alternates share the POS
        add(head, hand)                       # authored prefix, in order
        add(head, inflections(head, pos))     # lemma's own wordforms
        for alt in hand:                      # each alternate's wordforms
            add(head, inflections(alt, pos))
    # reverse wordform headwords: merging -> merge + merge's synset
    for head, hand in SYNSETS.items():
        pos = POS[head]
        for form in inflections(head, pos):
            if form in out:     # authored headword or an earlier lemma's
                continue        # wordform — never shadow; first wins
            add(form, (head,))
            add(form, (f for f in inflections(head, pos) if f != form))
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
