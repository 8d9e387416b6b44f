"""Character classes from the RDF 1.1 Turtle grammar (W3C REC,
grammar productions [163s]-[173s]) — equivalent of the reference's
``is_alpha/is_digit``/PN_CHARS tables (ref: src/string_utils.h).

These are the Unicode codepoint ranges where conformance is won or
lost (SURVEY.md §7 hard part (a)), so they are transcribed exactly
from the published grammar, not approximated.
"""

from __future__ import annotations

import bisect

# PN_CHARS_BASE ::= [A-Z] | [a-z] | [#xC0-#xD6] | [#xD8-#xF6]
#   | [#xF8-#x2FF] | [#x370-#x37D] | [#x37F-#x1FFF] | [#x200C-#x200D]
#   | [#x2070-#x218F] | [#x2C00-#x2FEF] | [#x3001-#xD7FF]
#   | [#xF900-#xFDCF] | [#xFDF0-#xFFFD] | [#x10000-#xEFFFF]
_PN_CHARS_BASE_RANGES = [
    (0x41, 0x5A),
    (0x61, 0x7A),
    (0xC0, 0xD6),
    (0xD8, 0xF6),
    (0xF8, 0x2FF),
    (0x370, 0x37D),
    (0x37F, 0x1FFF),
    (0x200C, 0x200D),
    (0x2070, 0x218F),
    (0x2C00, 0x2FEF),
    (0x3001, 0xD7FF),
    (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD),
    (0x10000, 0xEFFFF),
]

# PN_CHARS ::= PN_CHARS_U | '-' | [0-9] | #xB7 | [#x300-#x36F]
#   | [#x203F-#x2040]     (PN_CHARS_U = PN_CHARS_BASE | '_')
_PN_CHARS_EXTRA_RANGES = [
    (0x2D, 0x2D),  # '-'
    (0x30, 0x39),  # 0-9
    (0x5F, 0x5F),  # '_'
    (0xB7, 0xB7),
    (0x300, 0x36F),
    (0x203F, 0x2040),
]


def _build(ranges: list[tuple[int, int]]) -> tuple[list[int], list[int]]:
    rs = sorted(ranges)
    return [r[0] for r in rs], [r[1] for r in rs]


_BASE_LO, _BASE_HI = _build(_PN_CHARS_BASE_RANGES)
_ALL_LO, _ALL_HI = _build(_PN_CHARS_BASE_RANGES + _PN_CHARS_EXTRA_RANGES)


def _in_ranges(cp: int, lo: list[int], hi: list[int]) -> bool:
    i = bisect.bisect_right(lo, cp) - 1
    return i >= 0 and cp <= hi[i]


def is_pn_chars_base(ch: str) -> bool:
    return _in_ranges(ord(ch), _BASE_LO, _BASE_HI)


def is_pn_chars_u(ch: str) -> bool:
    return ch == "_" or is_pn_chars_base(ch)


def is_pn_chars(ch: str) -> bool:
    return _in_ranges(ord(ch), _ALL_LO, _ALL_HI)


# PN_LOCAL_ESC ::= '\' one of:
PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")

HEX_DIGITS = set("0123456789ABCDEFabcdef")

# String escapes (ECHAR ::= '\' [tbnrf"'\]) — shared by Turtle
# strings and the N-Triples writer (ref: src/writer.c#write_text
# escape rules; grammar production [159s]).
ECHAR_DECODE = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

WS = set(" \t\r\n")
