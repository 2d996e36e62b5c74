"""Frozen NFKC-class fold tables (VERDICT r08 #5): width folding,
common confusable homoglyphs, compatibility ligatures, and
combining-mark stripping — the normalization tier a multilingual
curation pipeline runs before dedup/fingerprinting, expressed as an
EXPLICIT mapping table (no ICU dependency; the sandbox has none, and
at 100 TB you want the mapping frozen and versioned with the code, not
drifting with a system library).

Every entry is a plain codepoint→string mapping, so the whole fold is
two engine-native string ops (a replace chain for the 1:N ligatures,
one ``translate`` for the 1:1 maps + deletions) — pure codegen in
Spark, and DuckDB's Postgres-semantics ``translate``/``replace``
replay it exactly (both operate per codepoint).
"""

from __future__ import annotations

# Fullwidth ASCII variants U+FF01..U+FF5E -> U+0021..U+007E, plus the
# ideographic space. This IS the NFKC <wide> decomposition class.
WIDTH_FOLD: dict[str, str] = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}
WIDTH_FOLD["　"] = " "

# Curated confusable homoglyphs -> ASCII (the UTS #39 pairs that show
# up in scraped corpora: Cyrillic and Greek letters visually identical
# to Latin). Deliberately small and explicit — a frozen safelist, not
# a transliteration scheme.
CONFUSABLES: dict[str, str] = {
    "а": "a",  # CYRILLIC SMALL A
    "е": "e",  # CYRILLIC SMALL IE
    "о": "o",  # CYRILLIC SMALL O
    "р": "p",  # CYRILLIC SMALL ER
    "с": "c",  # CYRILLIC SMALL ES
    "у": "y",  # CYRILLIC SMALL U
    "х": "x",  # CYRILLIC SMALL HA
    "А": "A",  # CYRILLIC CAPITAL A
    "В": "B",  # CYRILLIC CAPITAL VE
    "Е": "E",  # CYRILLIC CAPITAL IE
    "К": "K",  # CYRILLIC CAPITAL KA
    "М": "M",  # CYRILLIC CAPITAL EM
    "Н": "H",  # CYRILLIC CAPITAL EN
    "О": "O",  # CYRILLIC CAPITAL O
    "Р": "P",  # CYRILLIC CAPITAL ER
    "С": "C",  # CYRILLIC CAPITAL ES
    "Т": "T",  # CYRILLIC CAPITAL TE
    "Х": "X",  # CYRILLIC CAPITAL HA
    "ο": "o",  # GREEK SMALL OMICRON
    "Α": "A",  # GREEK CAPITAL ALPHA
    "Β": "B",  # GREEK CAPITAL BETA
    "Ε": "E",  # GREEK CAPITAL EPSILON
    "Ζ": "Z",  # GREEK CAPITAL ZETA
    "Η": "H",  # GREEK CAPITAL ETA
    "Ι": "I",  # GREEK CAPITAL IOTA
    "Κ": "K",  # GREEK CAPITAL KAPPA
    "Μ": "M",  # GREEK CAPITAL MU
    "Ν": "N",  # GREEK CAPITAL NU
    "Ο": "O",  # GREEK CAPITAL OMICRON
    "Ρ": "P",  # GREEK CAPITAL RHO
    "Τ": "T",  # GREEK CAPITAL TAU
    "Υ": "Y",  # GREEK CAPITAL UPSILON
    "Χ": "X",  # GREEK CAPITAL CHI
}

# NFKC 1:N compatibility expansions (can't ride translate — applied as
# a literal replace chain first).
LIGATURES: dict[str, str] = {
    "ﬁ": "fi",  # LATIN SMALL LIGATURE FI
    "ﬂ": "fl",  # LATIN SMALL LIGATURE FL
    "ﬃ": "ffi",  # LATIN SMALL LIGATURE FFI
    "ﬄ": "ffl",  # LATIN SMALL LIGATURE FFL
    "Ĳ": "IJ",  # LATIN CAPITAL LIGATURE IJ
    "ĳ": "ij",  # LATIN SMALL LIGATURE IJ
    "№": "No",  # NUMERO SIGN
    "™": "TM",  # TRADE MARK SIGN
}

# Combining diacritical marks U+0300..U+036F: DELETED (the mark-strip
# half of a compatibility fold — 'e' + COMBINING ACUTE -> 'e').
COMBINING_STRIP: tuple[str, ...] = tuple(chr(c) for c in range(0x0300, 0x0370))

# The translate() argument pair: 1:1 maps first, then delete-only chars
# (translate semantics in Spark AND DuckDB/Postgres: a from-char beyond
# the end of `to` is removed).
_ONE_TO_ONE = {**WIDTH_FOLD, **CONFUSABLES}
TRANSLATE_FROM = "".join(_ONE_TO_ONE) + "".join(COMBINING_STRIP)
TRANSLATE_TO = "".join(_ONE_TO_ONE.values())


def fold_py(s: str) -> str:
    """Pure-Python reference implementation (tests compare both engines
    against this)."""
    for k, v in LIGATURES.items():
        s = s.replace(k, v)
    out = []
    for ch in s:
        if ch in COMBINING_STRIP:
            continue
        out.append(_ONE_TO_ONE.get(ch, ch))
    return "".join(out)
