"""Character/text normalization kernels (operators T3-T5, SURVEY.md §2.2).

Semantics mirror the reference:
- char-confusion normalizer over a 97-char whitelist
  (`material_parsers/commons/utils.py:4-20`). Note: for single characters a
  difflib close-match with cutoff 0.8 can only succeed on exact equality, so
  the map is memoized into an identity-preserving table once per process.
- comparison-symbol rewrite (`commons/utils.py:23-33`): ``"0 <"`` -> ``"> 0"``.
- OCR symbol replacement tables
  (`material_parser/material_parser_ml.py:13-27`).
"""

from __future__ import annotations

import difflib
import re
from functools import lru_cache

ALLOWED_CHARS_MATERIAL_PARSER = [
    '', 'g', 'S', '7', 'j', 'X', 'w', 'υ', ')', 'h', 'α', 'y', 'v', '1', 'O',
    '·', 'r', 'ς', 'p', 'b', 'E', 'B', 'd', 'ω', 'Z', 'β', '□', 'ε', 'c', 'J',
    'R', 'U', 'q', 'n', 'u', '9', 'Q', 'H', 't', '0', 'N', 'Y', 'ψ', '5', 'o',
    'M', 'T', 'ο', 'G', '8', 'σ', 'φ', 'A', '∓', 'τ', 'I', 'μ', 'λ', 'x', 'f',
    'η', 'θ', '.', '+', '/', '2', 'K', 'e', 'χ', '3', 's', 'l', 'm', 'V', '(',
    'P', 'ρ', '*', 'ν', 'F', 'γ', 'π', 'ξ', '±', 'k', '-', 'δ', 'L', 'ζ', 'W',
    'D', 'a', 'i', 'κ', 'ι', 'C', 'z', ',', '4', '6',
]

_ALLOWED_SET = frozenset(ALLOWED_CHARS_MATERIAL_PARSER)


@lru_cache(maxsize=4096)
def find_closest_character(input_char: str) -> str | None:
    matches = difflib.get_close_matches(
        input_char, ALLOWED_CHARS_MATERIAL_PARSER, n=1, cutoff=0.8
    )
    return matches[0] if matches else None


def replace_with_closest(text: str) -> str:
    """Map each char to its closest allowed char; keep when no match."""
    out = []
    for char in text:
        closest = find_closest_character(char)
        out.append(closest if closest is not None else char)
    return "".join(out)


_COMPARISON_PATTERN = re.compile(r"\s*([0-9]+)\s*(≤|<)\s*")


def rewrite_comparison_symbol(expression: str) -> str:
    """``"0 <"`` -> ``"> 0"``; inverts ``<`` -> ``>`` and ``≤`` -> ``>=``."""
    result = _COMPARISON_PATTERN.sub(r"\2 \1", expression)
    result = result.replace("<", ">")
    result = result.replace("≤", ">=")
    return result


COMPARE_SIGNS = ["≤", "<", "⩽"]

REPLACEMENT_SYMBOLS_VARIABLES = [(" ͑", "")]

REPLACEMENT_SYMBOLS_VALUES = [
    (" ͑", ""),
    ("¼", ""),
    ("et al", ""),
    ("etc\\.?", ""),
    ("≃", "="),
]

REPLACEMENT_SYMBOLS = [
    ("À", "-"),
    ("Ϸ", "≈"),
    ("¼", "-"),
    (" ͑", ""),
]


def post_process_value(value: str) -> str:
    temp = value
    for old, new in REPLACEMENT_SYMBOLS_VALUES:
        temp = temp.replace(old, new)
    return temp


def post_process_variable(variable: str) -> str:
    temp = variable
    for old, new in REPLACEMENT_SYMBOLS_VARIABLES:
        temp = temp.replace(old, new)
    return temp


_VALUE_SPLIT = re.compile(r",|;|or|and")


def extract_and_filter_variable_values(value: str) -> list[str]:
    """Split a ``<value>`` span on ``,|;|or|and``; strip and drop blanks."""
    split = _VALUE_SPLIT.split(value)
    return list(filter(str.strip, map(post_process_value, map(str.strip, split))))
