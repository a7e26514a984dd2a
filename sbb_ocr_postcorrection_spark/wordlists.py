"""Deterministic vocabulary resources shared by datagen, detector and corrector.

The confusion-pair table follows the public ``noisy:clean`` pattern of the
reference's heuristics resources
(/root/reference/qurator/sbb_ocr_postcorrection/misc/heuristics/resources/
ocr_errors.txt:1-30); the pairs themselves are our own. Word lists are small
synthetic German/English-ish vocabularies — the point is determinism, not
linguistics: datagen injects noise into these words, the corrector restores
them, and both sides agree on the dictionary.
"""

from __future__ import annotations

# (noisy, clean) substitution patterns — the corrector applies noisy→clean,
# datagen applies clean→noisy. 1:1, 1:many, many:1 and many:many classes, as
# in the reference's alternative-spelling generator (heuristics.py:130-178).
CONFUSION_PAIRS: tuple[tuple[str, str], ...] = (
    ("c", "e"),
    ("e", "c"),
    ("rn", "m"),
    ("m", "rn"),
    ("ii", "n"),
    ("u", "n"),
    ("l", "i"),
    ("i", "l"),
    ("v", "u"),
    ("1", "l"),
    ("0", "o"),
    ("5", "s"),
    ("fh", "sh"),
    ("cl", "d"),
    ("li", "h"),
)

# Noise-introducing direction used by the generator: clean char → noisy char.
NOISE_SUBS: tuple[tuple[str, str], ...] = tuple(
    (clean, noisy) for noisy, clean in CONFUSION_PAIRS
)

GERMAN_WORDS: tuple[str, ...] = (
    "der", "die", "das", "und", "nicht", "mit", "ist", "von", "sich", "auf",
    "wort", "seite", "zeile", "buch", "text", "fehler", "sprache", "herren",
    "wissen", "zeit", "jahr", "stadt", "land", "wasser", "himmel", "licht",
    "nacht", "morgen", "abend", "arbeit", "leben", "welt", "mensch", "kind",
    "haus", "garten", "strasse", "brief", "papier", "druck", "schrift",
    "korrektur", "muster", "probe", "nummer", "ordnung", "gruppe", "klasse",
)

ENGLISH_WORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "in", "is", "was", "for", "with", "that",
    "word", "page", "line", "book", "text", "error", "language", "letter",
    "knowledge", "time", "year", "city", "country", "water", "sky", "light",
    "night", "morning", "evening", "work", "life", "world", "human", "child",
    "house", "garden", "street", "paper", "print", "script", "pattern",
    "correction", "sample", "number", "order", "group", "class", "value",
)

GERMAN_STOPWORDS: frozenset[str] = frozenset(
    ("der", "die", "das", "und", "nicht", "mit", "ist", "von", "sich", "auf",
     "ein", "eine", "dem", "den", "des", "zu", "im", "am", "auch", "als")
)

ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    ("the", "and", "of", "to", "in", "is", "was", "for", "with", "that",
     "a", "an", "on", "at", "it", "as", "by", "be", "this", "are")
)

# The corrector's dictionary: every clean word either generator can emit.
DICTIONARY: frozenset[str] = frozenset(GERMAN_WORDS) | frozenset(ENGLISH_WORDS)

# Boilerplate vocabulary — never part of main content; used by datagen for
# nav/footer link farms so the extractor has real boilerplate to strip.
BOILERPLATE_WORDS: tuple[str, ...] = (
    "home", "login", "signup", "contact", "about", "imprint", "privacy",
    "terms", "sitemap", "archive", "category", "tags", "share", "follow",
    "subscribe", "newsletter", "copyright", "cookie", "settings", "menu",
)
